"""Full-scale VirConv-T train-step benchmark on the attached chip.

Reference analog: the 8xV100 training loop (batch 2/GPU, ROT_NUM=3
replicas per sample, ``/root/reference/tools/train_utils/train_utils.py``).
Measures one optimizer step (forward + loss + backward + Adam) at KITTI
scale with realistic synthetic scenes, prints s/iter and the per-term tb
dict of the last step (observability for loss-spike hunting).

Usage: python tools/bench_train.py [--iters 20] [--batch 2]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--batch', type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from virconv_tpu.config import CfgNode, cfg_from_yaml_file
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
    from virconv_tpu.train.trainer import init_state, make_train_step

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = cfg_from_yaml_file(
        os.path.join(root, 'tools/cfgs/models/kitti/VirConv-T.yaml'),
        CfgNode({'ROOT_DIR': root}))
    model = VoxelRCNN(model_cfg=cfg.MODEL, dataset_cfg=cfg.DATA_CONFIG,
                      num_class=len(cfg.CLASS_NAMES))

    # Build a realistic train batch: B samples x R replicas on the entry
    # axis, each replica world-transformed (like the loader's X_TRANS).
    n_rep = cfg.DATA_CONFIG.ROT_NUM
    b = args.batch
    rng = np.random.default_rng(0)
    from virconv_tpu.utils.calibration import Calibration
    from virconv_tpu.utils.synth_scene import make_scene
    n_pts = 65536
    lpts = np.zeros((b, n_pts, 8), np.float32)
    lval = np.zeros((b, n_pts), bool)
    mpts = np.zeros((b, n_pts, 8), np.float32)
    mval = np.zeros((b, n_pts), bool)
    gt = np.zeros((b, 64, 8), np.float32)
    gt_valid = np.zeros((b, 64), bool)
    for e in range(b):
        s = make_scene(seed=e)
        lidar8 = np.concatenate(
            [s['lidar'][:, :4], np.zeros((len(s['lidar']), 3), np.float32),
             np.ones((len(s['lidar']), 1), np.float32)], -1)
        fused = np.concatenate([lidar8, s['virtual']], 0)
        if len(fused) > n_pts:
            fused = fused[rng.choice(len(fused), n_pts, replace=False)]
        lpts[e, :len(lidar8)] = lidar8
        lval[e, :len(lidar8)] = True
        mpts[e, :len(fused)] = fused
        mval[e, :len(fused)] = True
        boxes = s.get('boxes')
        if boxes is not None and len(boxes):
            k = min(len(boxes), 64)
            gt[e, :k, :7] = boxes[:k, :7]
            gt[e, :k, 7] = 1
            gt_valid[e, :k] = True
        else:
            gt[e, 0] = [20, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
            gt_valid[e, 0] = True

    p2 = np.array([[721.5, 0., 609.6, 44.9], [0., 721.5, 172.9, 0.2],
                   [0., 0., 1., 0.003]], np.float32)
    v2c = np.array([[7.5e-03, -1.0, -1.8e-04, -4.1e-03],
                    [2.0e-03, 1.9e-04, -1.0, -7.6e-02],
                    [1.0, 7.5e-03, 2.0e-03, -2.7e-01]], np.float32)
    calib = Calibration({'P2': p2, 'R0': np.eye(3, dtype=np.float32),
                         'Tr_velo2cam': v2c})
    v2r, p2t = calib.device_matrices()

    params = np.array([[0.3, 0.0, 0.98], [0.3, 1.0, 1.02], [0.0, 1.0, 1.0]],
                      np.float32)[:n_rep]

    def wt(p, prm):
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

    # entries ordered replica-major like the loader collate: e' = e*R + i
    def rep(arr, transform):
        out = []
        for e in range(b):
            for i in range(n_rep):
                out.append(wt(arr[e], params[i]) if transform else arr[e])
        return np.stack(out)

    def rep_gt(boxes):
        out = []
        for e in range(b):
            for i in range(n_rep):
                g = boxes[e].copy()
                rot, flip, scale = params[i]
                ca, sa = np.cos(rot), np.sin(rot)
                x, y = g[:, 0].copy(), g[:, 1].copy()
                g[:, 0] = ca * x - sa * y
                g[:, 1] = sa * x + ca * y
                g[:, 6] += rot
                if flip == 1:
                    g[:, 1] = -g[:, 1]
                    g[:, 6] = -g[:, 6]
                g[:, :6] *= scale
                out.append(g)
        return np.stack(out)

    batch = {
        'points': rep(lpts, True),
        'points_valid': np.repeat(lval, n_rep, 0),
        'points_mm': rep(mpts, True),
        'points_mm_valid': np.repeat(mval, n_rep, 0),
        'v2r': np.tile(v2r, (b * n_rep, 1, 1)),
        'p2t': np.tile(p2t, (b * n_rep, 1, 1)),
        'transform_param': None,
        'trans_params': np.tile(params, (b, 1)),
        'gt_boxes': rep_gt(gt), 'gt_valid': np.repeat(gt_valid, n_rep, 0),
    }
    batch = {k: (jnp.asarray(v) if v is not None else None)
             for k, v in batch.items()}

    opt_cfg = cfg.OPTIMIZATION
    rngs = {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
            'sampling': jax.random.PRNGKey(2),
            'dropout': jax.random.PRNGKey(3)}
    t0 = time.time()
    state, tx, _ = init_state(model, batch, rngs, opt_cfg, total_steps=1000)
    print(f'init done in {time.time() - t0:.1f}s', file=sys.stderr)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    t0 = time.time()
    state, loss, tb = step(state, batch, jax.random.PRNGKey(7))
    print(f'first step (compile) {time.time() - t0:.1f}s '
          f'loss={float(loss):.3f}', file=sys.stderr)

    t0 = time.perf_counter()
    for it in range(args.iters):
        state, loss, tb = step(state, batch, jax.random.PRNGKey(100 + it))
    lv = float(loss)   # host fetch forces execution on the tunnel backend
    dt = (time.perf_counter() - t0) / args.iters
    tb_host = {k: round(float(v), 4) for k, v in tb.items()}
    print(f'last-step tb: {tb_host}', file=sys.stderr)
    print(json.dumps({
        'metric': 'virconv_t_train_sec_per_iter',
        'value': round(dt, 4),
        'unit': f's/iter (batch={b}x{n_rep} replicas)',
        'loss': round(lv, 4),
    }))


if __name__ == '__main__':
    main()
