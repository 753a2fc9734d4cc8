"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set flags before the first jax import anywhere in the test process.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
# Unit tests compare against float64/float32 numpy oracles; force full-
# precision matmuls (the framework itself keeps the fast TPU default).
import jax  # noqa: E402

# precision is pinned per-module in oracle-comparison tests

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
