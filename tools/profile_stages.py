"""Stage attribution for the flagship bench: times jitted prefixes of the
detector (voxelize / backbone / bev / rpn / full). Each prefix returns a
scalar probe so XLA dead-code-eliminates downstream stages; differences
between consecutive prefixes are per-stage costs.

NOTE: ``tools/profile_trace.py`` (round 4) supersedes this for most uses —
one cached compile of the FULL model yields per-op device durations with
source-scoped names via ``jax.profiler.trace``, where each prefix here
costs its own 10-40 min compile. Keep this tool for cases where wall-clock
prefix timing is the question (e.g. validating that trace-derived sums
match dispatch reality).

Run from the repo root on the TPU (one process at a time on the tunnel):
    nohup python -u tools/profile_stages.py > /tmp/stages.log 2>&1 &
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    import jax.numpy as jnp
    import bench

    frames = int(sys.argv[2]) if len(sys.argv) > 2 else bench.FRAMES
    forward, eval_vars, batch, _tail = bench.build_full_scale(frames=frames)
    del forward
    from virconv_tpu.config import CfgNode, cfg_from_yaml_file
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
    cfg = cfg_from_yaml_file('tools/cfgs/models/kitti/VirConv-T.yaml',
                             CfgNode({'ROOT_DIR': '.'}))
    model = VoxelRCNN(model_cfg=cfg.MODEL, dataset_cfg=cfg.DATA_CONFIG,
                      num_class=len(cfg.CLASS_NAMES))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, batch,
        is_leaf=lambda x: x is None)

    all_stages = ['voxelize', 'backbone', 'bev', 'rpn',
                  'pool0', 'stage0', 'stage1', None]
    if len(sys.argv) > 1:
        # e.g. `profile_stages.py backbone,rpn,full` — targeted prefixes
        # (each fresh prefix compile costs 10-40 min on the tunnel)
        stages = [None if s in ('full', 'None') else s
                  for s in sys.argv[1].split(',')]
    else:
        stages = all_stages
    times = {}
    for s in stages:
        fn = jax.jit(functools.partial(model.apply, train=False, stage=s))

        def run_once():
            out = fn(eval_vars, batch)
            if s is None:
                val = (out['batch_box_preds'].sum()
                       + out['batch_cls_preds'].sum())
            else:
                val = out['probe']
            return float(val)   # host fetch = real sync on the tunnel

        t0 = time.perf_counter()
        run_once()
        print(f'{s}: compile+run {time.perf_counter() - t0:.1f}s',
              flush=True)
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            run_once()
        times[s] = (time.perf_counter() - t0) / iters
        print(f'{s}: {times[s]:.3f}s', flush=True)

    # deltas are per-stage costs ONLY between consecutive prefixes of the
    # full pipeline; with a user-selected subset they are "vs previous
    # listed prefix" (and the first has no baseline) — label accordingly
    subset = len(sys.argv) > 1 and stages != all_stages
    prev = 0.0
    print('--- stage attribution ---')
    for i, s in enumerate(stages):
        name = s or 'roi(full)'
        if subset:
            delta = (f'delta vs prev listed {times[s] - prev:7.3f}s'
                     if i else 'delta n/a (no baseline prefix)')
        else:
            delta = f'delta {times[s] - prev:7.3f}s'
        print(f'{name:12s} cumulative {times[s]:7.3f}s   {delta}')
        prev = times[s]


if __name__ == '__main__':
    main()
