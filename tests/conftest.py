"""Test configuration: virtual 8-device CPU mesh + persistent compile cache.

Must set platform flags before the first jax import in the test process.
XLA CPU compiles are slow in this environment (~1s per primitive), so the
persistent compilation cache is essential to keep reruns fast.
"""
import os

# Force CPU: the suite targets the virtual 8-device CPU mesh; an inherited
# JAX_PLATFORMS (e.g. the TPU tunnel) must not leak in.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the TPU-tunnel PJRT plugin and
# pins the platform programmatically, which outranks JAX_PLATFORMS — so pin
# it back via the config API and verify.
jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', (
    'test suite must run on the virtual CPU mesh, got '
    f'{jax.devices()[0].platform}')

# Key the CPU cache by this machine's CPU features: XLA:CPU AOT blobs
# compiled on another host (the judge/driver box shares this repo) abort
# with SIGILL/Fatal-Aborted when loaded under a different feature set
# (seen as a flaky hard crash in test_multidevice under the shared dir).
import hashlib


def _machine_cache_tag():
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache', f'cpu-{_machine_cache_tag()}'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption('--run-slow', action='store_true', default=False,
                     help='run tests marked slow (multi-minute XLA-CPU '
                          'compiles); smoke variants cover them by default')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: multi-minute XLA-CPU compile; skipped unless '
                   '--run-slow (a smoke variant runs every time)')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--run-slow'):
        return
    skip = pytest.mark.skip(reason='slow (use --run-slow)')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
