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

    # "XLA Ops" lane of the TPU device pid: leaf HLO ops with source-scoped
    # names. Exclude region wrappers (conditional/while/call and the
    # whole-program jit event) so nested events are not double-counted —
    # ops inside cond branches appear as their own events with a
    # .../cond/branch_i_fun/... scope.
    pid_names = {e.get('pid'): e.get('args', {}).get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name'}
    tid_names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            tid_names[(e.get('pid'), e.get('tid'))] = \
                e.get('args', {}).get('name', '')
    op_lanes = {k for k, n in tid_names.items() if n == 'XLA Ops'}
    per_op = {}
    total = 0.0
    wrappers = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        if (e.get('pid'), e.get('tid')) not in op_lanes:
            continue
        args = e.get('args') or {}
        cat = args.get('hlo_category', '')
        name = e.get('name', '?')
        if (cat in ('conditional', 'while', 'call')
                or name.startswith('jit_')):
            wrappers += e['dur']
            continue
        a = per_op.setdefault(name, {'dur': 0.0, 'args': args})
        a['dur'] += e['dur']
        total += e['dur']
    if not per_op:
        print(f'TRACE PARSE: no XLA Ops events; lanes={tid_names}, '
              f'pids={pid_names}')
        return 1

    print(f'\nleaf-op device time: {total / 1e6:.3f}s over 2 iters '
          f'({frames} frame(s); wrapper events excluded: '
          f'{wrappers / 1e6:.3f}s)')
    items = sorted(per_op.items(), key=lambda kv: -kv[1]['dur'])
    print('--- top 30 leaf ops ---')
    for name, a in items[:30]:
        src = (a['args'].get('source_info', '')
               or a['args'].get('tf_op', ''))[:95]
        ba = int(a['args'].get('bytes_accessed', 0)) / 1e6
        print(f"{a['dur'] / 1e6:8.4f}s {ba:9.1f}MB  {name[:24]:24s} {src}")

    scopes = collections.Counter()
    for name, a in per_op.items():
        src = a['args'].get('source_info', '') or a['args'].get('tf_op', '')
        scope = 'unattributed'
        for pat, label in (
                ('/backbone/mm/', 'backbone/mm'),
                ('/backbone/lidar/', 'backbone/lidar'),
                ('/roi_head/', 'roi_head'),
                ('/dense_head/', 'dense_head'),
                ('/bev_backbone/', 'bev_backbone'),
                ('_voxelize', 'voxelize'),
                ('VoxelRCNN', 'detector-other')):
            if pat in src:
                scope = label
                break
        scopes[scope] += a['dur']
    print('--- per-scope (leaf ops, 2 iters) ---')
    for s, dur in scopes.most_common():
        print(f'{dur / 1e6:8.4f}s  {s}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
