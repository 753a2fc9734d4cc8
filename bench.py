"""Headline benchmark: VirConv-T end-to-end inference frames/sec/chip.

Runs the full-scale flagship detector (dual-stream NRConv backbone, ROT_NUM=3
transform-ensemble, TED cascade head, KITTI geometry: 0.05m voxels over
[0, -40, -3, 70.4, 40, 1], 40k voxels/stream/replica) on synthetic
KITTI-scale inputs and reports frames/sec on the attached chip.

Baseline note: the reference publishes no throughput (SURVEY.md §6); the
VirConv paper reports ~92 ms/frame for VirConv-T on an RTX 3090-class GPU
(~11 fps), which we use as the provisional vs_baseline denominator until the
reference is measured on shared hardware.
"""

import json
import time

import numpy as np

BASELINE_FPS = 11.0


def build_full_scale():
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
    n_pts = 65536
    pcr = cfg.DATA_CONFIG.POINT_CLOUD_RANGE

    def synth_points(n_entries):
        """KITTI-statistics street scenes (ground + cars + walls), one per
        entry: ~18-20k occupied LiDAR voxels and a fused real+virtual cloud
        that saturates the 40k mm voxel cap — matching real eval load
        (virconv_tpu.utils.synth_scene docstring has the derivation)."""
        import sys
        from virconv_tpu.utils.synth_scene import make_scene, scene_stats
        lpts = np.zeros((n_entries, n_pts, 8), np.float32)
        lval = np.zeros((n_entries, n_pts), bool)
        mpts = np.zeros((n_entries, n_pts, 8), np.float32)
        mval = np.zeros((n_entries, n_pts), bool)
        for e in range(n_entries):
            s = make_scene(seed=e)
            lidar8 = np.concatenate(
                [s['lidar'][:, :4],
                 np.zeros((len(s['lidar']), 3), np.float32),
                 np.ones((len(s['lidar']), 1), np.float32)], -1)
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
    lpts, lval, mpts, mval = synth_points(1)

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

    lrep = np.concatenate([world_transform(lpts, p) for p in params], 0)
    mrep = np.concatenate([world_transform(mpts, p) for p in params], 0)
    batch = {
        'points': lrep, 'points_valid': np.tile(lval, (n_rep, 1)),
        'points_mm': mrep, 'points_mm_valid': np.tile(mval, (n_rep, 1)),
        'v2r': np.tile(v2r, (n_rep, 1, 1)),
        'p2t': np.tile(p2t, (n_rep, 1, 1)),
        'transform_param': params[None],
        'trans_params': params,
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
    return forward, eval_vars, batch


def main():
    import os
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    forward, eval_vars, batch = build_full_scale()
    import jax.numpy as jnp
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, batch,
        is_leaf=lambda x: x is None)

    # Timing note: on the tunneled TPU backend block_until_ready can return
    # before execution finishes; a host fetch of a scalar derived from the
    # outputs forces real synchronization (RPC overhead ~25 ms, negligible
    # at current frame times).
    def run_once():
        out = forward(eval_vars, batch)
        s = (out['batch_box_preds'].sum()
             + out['batch_cls_preds'].sum())
        return float(s)

    run_once()   # warmup / compile

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt
    print(json.dumps({
        'metric': 'virconv_t_inference_fps_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / BASELINE_FPS, 3),
    }))


if __name__ == '__main__':
    main()
