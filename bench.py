"""Headline benchmark: VirConv-T END-TO-END inference frames/sec/chip.

Runs the full-scale flagship detector (dual-stream NRConv backbone,
ROT_NUM=3 transform-ensemble, TED cascade head, KITTI geometry: 0.05m
voxels over [0, -40, -3, 70.4, 40, 1], 40k voxels/stream/replica) on
synthetic KITTI-scale inputs and reports END-TO-END frames/sec on the
attached chip — the scope of the reference's ``sec_per_example``
(``/root/reference/tools/eval_utils/eval_utils.py:85-86``): jitted model
forward PLUS the host tail (score threshold, WBF clustering, lidar->camera
box conversion, KITTI-format prediction dicts). Host post-processing of
batch k overlaps the device compute of batch k+1, exactly as the serving
loop would pipeline it; the device stream is synced before timestamps.

Batching: FRAMES=2 (6 batch entries with the ROT_NUM=3 replicas) — the
measured-best dispatch size on v5e as of round 5: B=2 312.5 ms/frame e2e
(3.200 fps/frame) vs B=1 320.4 (3.122) vs B=3 354 (2.803, round-4
measurement after the strided band-conv slow-path fix). The batching
curve is a tradeoff between amortizing plan builds / small-layer
dispatch (wins at B=2) and the superlinear tail the round-4 trace work
attributed to n log n sorts and per-entry dense-table builds (loses at
B=3, where batch*replicas hits the int32 key-space cap of 9 entries —
see ops/sparse.py). VIRCONV_BENCH_FRAMES overrides for A/Bs.

Baseline note: the reference publishes no throughput (SURVEY.md §6); the
VirConv paper reports ~92 ms/frame for VirConv-T on an RTX 3090-class GPU
(~11 fps), which we use as the provisional vs_baseline denominator until
the reference is measured on shared hardware.
"""

import json
import sys
import time

import numpy as np

import os as _os

BASELINE_FPS = 11.0
# frames per dispatch (see Batching note above); VIRCONV_BENCH_FRAMES
# overrides for batching A/Bs without editing the file
FRAMES = int(_os.environ.get('VIRCONV_BENCH_FRAMES', '2'))


def build_full_scale(frames=FRAMES):
    import functools
    import os
    import jax
    from virconv_tpu.config import CfgNode, cfg_from_yaml_file
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
    from virconv_tpu.utils.calibration import Calibration

    root = os.path.dirname(os.path.abspath(__file__))
    cfg = cfg_from_yaml_file(
        os.path.join(root, 'tools/cfgs/models/kitti/VirConv-T.yaml'),
        CfgNode({'ROOT_DIR': root}))
    model = VoxelRCNN(model_cfg=cfg.MODEL, dataset_cfg=cfg.DATA_CONFIG,
                      num_class=len(cfg.CLASS_NAMES))

    rng = np.random.default_rng(0)
    n_rep = cfg.DATA_CONFIG.ROT_NUM
    # per-stream pads match KITTI statistics: FOV-cropped LiDAR is ~20-30k
    # points (32k cap), the fused real+virtual cloud ~56k (64k cap) — the
    # loader likewise pads to per-stream MAX_POINTS
    n_lpts, n_pts = 32768, 65536

    def synth_points(n_entries):
        """KITTI-statistics street scenes (ground + cars + walls), one per
        entry: ~18-20k occupied LiDAR voxels and a fused real+virtual cloud
        that saturates the 40k mm voxel cap — matching real eval load
        (virconv_tpu.utils.synth_scene docstring has the derivation)."""
        from virconv_tpu.utils.synth_scene import make_scene, scene_stats
        lpts = np.zeros((n_entries, n_lpts, 8), np.float32)
        lval = np.zeros((n_entries, n_lpts), bool)
        mpts = np.zeros((n_entries, n_pts, 8), np.float32)
        mval = np.zeros((n_entries, n_pts), bool)
        for e in range(n_entries):
            s = make_scene(seed=e)
            lidar8 = np.concatenate(
                [s['lidar'][:, :4],
                 np.zeros((len(s['lidar']), 3), np.float32),
                 np.ones((len(s['lidar']), 1), np.float32)], -1)
            if len(lidar8) > n_lpts:
                lidar8 = lidar8[rng.choice(len(lidar8), n_lpts,
                                           replace=False)]
            fused = np.concatenate([lidar8, s['virtual']], 0)
            if len(fused) > n_pts:
                keep = rng.choice(len(fused), n_pts, replace=False)
                fused = fused[keep]
            lpts[e, :len(lidar8)] = lidar8
            lval[e, :len(lidar8)] = True
            mpts[e, :len(fused)] = fused
            mval[e, :len(fused)] = True
            if e == 0:
                lp, lv = scene_stats(s['lidar'])
                fp, fv = scene_stats(fused)
                print(f'[bench scene] lidar {lp} pts/{lv} vox; fused '
                      f'{fp} pts/{fv} vox (mm stream capped at 40k)',
                      file=sys.stderr)
        return lpts, lval, mpts, mval

    # KITTI-typical calibration
    p2 = np.array([[721.5, 0., 609.6, 44.9],
                   [0., 721.5, 172.9, 0.2],
                   [0., 0., 1., 0.003]], np.float32)
    v2c = np.array([[7.5e-03, -1.0, -1.8e-04, -4.1e-03],
                    [2.0e-03, 1.9e-04, -1.0, -7.6e-02],
                    [1.0, 7.5e-03, 2.0e-03, -2.7e-01]], np.float32)
    calib = Calibration({'P2': p2, 'R0': np.eye(3, dtype=np.float32),
                         'Tr_velo2cam': v2c})
    v2r, p2t = calib.device_matrices()

    params = np.array([[0.3, 0.0, 0.98], [0.3, 1.0, 1.02], [0.0, 1.0, 1.0]],
                      np.float32)[:n_rep]
    lpts, lval, mpts, mval = synth_points(frames)

    def world_transform(p, prm):
        # each replica carries its own [rot, flip, scale] world transform,
        # genuinely applied to the points (like X_TRANS in the loader)
        rot, flip, scale = prm
        q = p.copy()
        ca, sa = np.cos(rot), np.sin(rot)
        x, y = q[..., 0].copy(), q[..., 1].copy()
        q[..., 0] = ca * x - sa * y
        q[..., 1] = sa * x + ca * y
        if flip == 1:
            q[..., 1] = -q[..., 1]
        q[..., :3] *= scale
        return q

    def replicate(pts):
        # entry layout b*R + i: frame-major, replica-minor
        reps = np.stack([world_transform(pts, p) for p in params], 1)
        return reps.reshape(frames * n_rep, *pts.shape[1:])

    lrep = replicate(lpts)
    mrep = replicate(mpts)
    batch = {
        'points': lrep,
        'points_valid': np.repeat(lval, n_rep, axis=0),
        'points_mm': mrep,
        'points_mm_valid': np.repeat(mval, n_rep, axis=0),
        'v2r': np.tile(v2r, (frames * n_rep, 1, 1)),
        'p2t': np.tile(p2t, (frames * n_rep, 1, 1)),
        'transform_param': np.tile(params[None], (frames, 1, 1)),
        'trans_params': np.tile(params, (frames, 1)),
        'gt_boxes': None, 'gt_valid': None,
    }

    import jax
    train_batch = dict(batch)
    train_batch['transform_param'] = None
    train_batch['trans_params'] = params[:1]
    train_batch['points'] = lrep[:1]
    train_batch['points_valid'] = batch['points_valid'][:1]
    train_batch['points_mm'] = mrep[:1].copy()
    train_batch['points_mm_valid'] = batch['points_mm_valid'][:1]
    train_batch['v2r'] = batch['v2r'][:1]
    train_batch['p2t'] = batch['p2t'][:1]
    gt = np.zeros((1, 64, 8), np.float32)
    gt[0, 0] = [20, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    train_batch['gt_boxes'] = gt
    train_batch['gt_valid'] = gt[..., 0] > 0

    variables = jax.jit(functools.partial(model.init, train=True))(
        {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
         'sampling': jax.random.PRNGKey(2),
         'dropout': jax.random.PRNGKey(3)}, train_batch)
    eval_vars = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    forward = jax.jit(functools.partial(model.apply, train=False))

    post_cfg = CfgNode(cfg.MODEL.POST_PROCESSING)
    meta = {'calib': [calib] * frames,
            'image_shape': [np.array([375, 1242])] * frames,
            'frame_id': [f'{i:06d}' for i in range(frames)]}

    def host_tail(out):
        """The reference sec_per_example host scope: score threshold +
        WBF clustering + camera/image box conversion + KITTI-format
        prediction dicts (kitti_dataset_mm.generate_prediction_dicts —
        self is unused by the method, so it runs unbound)."""
        from virconv_tpu.datasets.kitti.kitti_dataset_mm import KittiDatasetMM
        from virconv_tpu.utils.postprocess import post_process_batch
        pred_dicts = post_process_batch(out, post_cfg,
                                        len(cfg.CLASS_NAMES))
        return KittiDatasetMM.generate_prediction_dicts(
            None, meta, pred_dicts, cfg.CLASS_NAMES)

    return forward, eval_vars, batch, host_tail


def main():
    import os
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    forward, eval_vars, batch, host_tail = build_full_scale()
    import jax.numpy as jnp
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, batch,
        is_leaf=lambda x: x is None)

    # warmup / compile; the scalar fetch forces real execution on the
    # tunneled backend (block_until_ready can return early there)
    out = forward(eval_vars, batch)
    n_dets = sum(len(p['score']) for p in host_tail(out))
    print(f'[bench] warm, {n_dets} detections/batch', file=sys.stderr)
    # second warm round: the first timed dispatch after a cold compile
    # intermittently absorbs a multi-second tunnel stall (seen as a
    # 12 s "model-only frame" while e2e stays at ~330 ms); flush it
    # outside the timed loops
    for _ in range(2):
        out = forward(eval_vars, batch)
    float(out['batch_box_preds'].sum())

    iters = 6

    # model-only throughput: dispatch every iteration back-to-back (the
    # device queue serializes them), sync once via the last output
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(eval_vars, batch)
    float(out['batch_box_preds'].sum())
    dt_model = (time.perf_counter() - t0) / (iters * FRAMES)
    print(f'[bench] model-only: {1.0 / dt_model:.3f} fps '
          f'({dt_model * 1e3:.1f} ms/frame)', file=sys.stderr)

    # end-to-end: host tail of batch k overlaps device compute of k+1
    # (np.asarray inside the tail blocks on batch k's buffers)
    t0 = time.perf_counter()
    prev = forward(eval_vars, batch)
    for _ in range(iters - 1):
        cur = forward(eval_vars, batch)
        host_tail(prev)
        prev = cur
    host_tail(prev)
    dt_e2e = (time.perf_counter() - t0) / (iters * FRAMES)
    fps = 1.0 / dt_e2e
    print(f'[bench] end-to-end: {fps:.3f} fps '
          f'({dt_e2e * 1e3:.1f} ms/frame)', file=sys.stderr)
    print(json.dumps({
        'metric': 'virconv_t_e2e_inference_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
