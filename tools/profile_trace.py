"""Device-trace attribution for the flagship bench (no prefix recompiles).

Runs the full jitted eval forward under ``jax.profiler.trace`` and
aggregates per-op device time from the dumped .trace.json.gz — one compile
(cached from bench.py) instead of one 10-40 min prefix compile per stage
(tools/profile_stages.py). Falls back with a clear message if the tunneled
backend doesn't support device tracing.

Usage (repo root, chip free):
    nohup python -u tools/profile_trace.py [frames] > /tmp/trace.log 2>&1 &

Prints the top ops by total device time plus a coarse stage bucketing by
op-name heuristics (sort/scatter/gather/conv/fusion).
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = '/tmp/jax_trace_r4'


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp
    import bench

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else bench.FRAMES
    forward, eval_vars, batch, _tail = bench.build_full_scale(frames=frames)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, batch,
        is_leaf=lambda x: x is None)
    out = forward(eval_vars, batch)
    print(f'warm: {float(out["batch_box_preds"].sum()):.3f}', flush=True)

    try:
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(2):
                out = forward(eval_vars, batch)
            float(out['batch_box_preds'].sum())
    except Exception as e:  # tunneled backend may not support tracing
        print(f'TRACE FAILED: {type(e).__name__}: {e}')
        return 1

    files = glob.glob(os.path.join(
        TRACE_DIR, 'plugins/profile/*/*.trace.json.gz'))
    if not files:
        print('TRACE EMPTY: no trace.json.gz produced '
              f'(contents: {glob.glob(TRACE_DIR + "/**", recursive=True)})')
        return 1
    events = []
    for f in files:
        with gzip.open(f, 'rt') as fh:
            data = json.load(fh)
        events.extend(data.get('traceEvents', []))

    # keep complete events from device lanes (TensorFlow-style trace)
    pid_names = {e.get('pid'): e.get('args', {}).get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name'}
    dev_pids = {p for p, n in pid_names.items()
                if 'TPU' in n or 'tpu' in n or '/device' in n}
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if dev_pids and e.get('pid') not in dev_pids:
            continue
        name = e.get('name', '?')
        per_op[name] += e['dur']
        total += e['dur']
    if not per_op:
        print('TRACE PARSE: no complete device events found; pids='
              f'{pid_names}')
        return 1

    print(f'\ntotal device-event time: {total / 1e6:.3f}s '
          f'(2 iters, {frames} frame(s))')
    print('--- top 40 ops ---')
    for name, dur in per_op.most_common(40):
        print(f'{dur / 1e6:8.4f}s  {name[:110]}')

    buckets = collections.Counter()
    for name, dur in per_op.items():
        low = name.lower()
        if 'sort' in low:
            b = 'sort'
        elif 'scatter' in low:
            b = 'scatter'
        elif 'gather' in low or 'dynamic-slice' in low:
            b = 'gather/slice'
        elif 'conv' in low or 'dot' in low:
            b = 'dot/conv'
        elif 'custom-call' in low or 'tpu_custom_call' in low:
            b = 'custom-call(pallas)'
        elif 'fusion' in low:
            b = 'fusion'
        elif 'copy' in low or 'transpose' in low:
            b = 'copy/transpose'
        else:
            b = 'other'
        buckets[b] += dur
    print('--- buckets ---')
    for b, dur in buckets.most_common():
        print(f'{dur / 1e6:8.4f}s  {b}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
