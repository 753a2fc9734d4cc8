"""One-off: the FULL-WIDTH flagship model on the 8-virtual-device dp mesh.

Closes the round-4 verdict gap "full-width multi-device execution": the
driver dryrun (`__graft_entry__.dryrun_multichip`) and the always-on
multidevice tests run a width-shrunk preset — the full-scale model had
never executed on >1 device, even virtually. This script builds the REAL
VirConv-T config (`tools/cfgs/models/kitti/VirConv-T.yaml`: every channel
width, MLP, grid size, ROI count, NMS size, and cascade stage at YAML
values), shards a synthetic-KITTI batch over an 8-virtual-CPU-device dp
mesh, and runs ONE train step (8 frames, one per device) plus ONE eval
step (8 frames x ROT_NUM=3 replicas = 24 entries, 3 per device), asserting
finite loss and non-empty merged detections through the full host tail.

The ONLY reductions vs the production config are host-side data budgets
(point pads and the voxelizer caps), sized ~1/4 of KITTI load so the
single host core behind the 8 virtual devices finishes in minutes — the
compiled GRAPH (widths, layer counts, static ROI shapes) is the
production one. Reference analog: 8-GPU DDP is the reference's default
training mode (`/root/reference/tools/dist_train.sh:3`).

Run:  python tools/run_fullwidth_mesh.py        (takes ~10-30 min on CPU)
Result is printed as one JSON line and recorded in PARITY.md.
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in _flags:
    _flags = (_flags + ' --xla_force_host_platform_device_count=8').strip()
if 'collective_call_terminate' not in _flags:
    # 8 virtual devices on ONE host core: device threads reach each
    # collective minutes apart, far beyond XLA:CPU's default 40 s
    # rendezvous termination (first attempt died in rendezvous.cc with
    # "only 3 of 8 arrived"). Harmless on real multi-chip topologies.
    _flags += (' --xla_cpu_collective_call_warn_stuck_timeout_seconds=600'
               ' --xla_cpu_collective_call_terminate_timeout_seconds=7200'
               ' --xla_cpu_collective_timeout_seconds=7200')
os.environ['XLA_FLAGS'] = _flags

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

T0 = time.time()


def progress(msg):
    print(f'[fullwidth +{time.time() - T0:7.1f}s] {msg}', flush=True)


def main():
    import functools
    import hashlib
    import jax
    import jax.numpy as jnp

    want = os.environ.get('JAX_PLATFORMS')
    if want:
        try:
            jax.config.update('jax_platforms', want)
        except RuntimeError:
            pass
    # CPU-feature-keyed persistent cache (same guard as __graft_entry__):
    # XLA:CPU AOT blobs from a different host ISA abort with SIGILL.
    tag = 'cpu'
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    tag = 'cpu-' + hashlib.sha1(line.encode()).hexdigest()[:8]
                    break
    except OSError:
        pass
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(ROOT, '.jax_cache', tag))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    progress(f'backend={jax.default_backend()} devices={jax.device_count()}')
    assert jax.device_count() >= 8, 'needs the 8-virtual-device CPU mesh'

    from virconv_tpu.config import CfgNode, cfg_from_yaml_file
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
    from virconv_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from virconv_tpu.train.trainer import init_state, make_train_step
    from virconv_tpu.utils.calibration import Calibration
    from virconv_tpu.utils.synth_scene import make_scene

    cfg = cfg_from_yaml_file(
        os.path.join(ROOT, 'tools/cfgs/models/kitti/VirConv-T.yaml'),
        CfgNode({'ROOT_DIR': ROOT}))
    # Host-side data budgets only (~1/4 KITTI load); the model section is
    # untouched — full channel widths, ROI counts, grid sizes, NMS sizes.
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            p.MAX_NUMBER_OF_VOXELS = {'train': 10000, 'test': 10000}
    n_lpts, n_pts = 8192, 16384
    frames = 8
    n_rep = cfg.DATA_CONFIG.ROT_NUM

    model = VoxelRCNN(model_cfg=cfg.MODEL, dataset_cfg=cfg.DATA_CONFIG,
                      num_class=len(cfg.CLASS_NAMES))

    rng = np.random.default_rng(0)
    p2 = np.array([[721.5, 0., 609.6, 44.9],
                   [0., 721.5, 172.9, 0.2],
                   [0., 0., 1., 0.003]], np.float32)
    v2c = np.array([[7.5e-03, -1.0, -1.8e-04, -4.1e-03],
                    [2.0e-03, 1.9e-04, -1.0, -7.6e-02],
                    [1.0, 7.5e-03, 2.0e-03, -2.7e-01]], np.float32)
    calib = Calibration({'P2': p2, 'R0': np.eye(3, dtype=np.float32),
                         'Tr_velo2cam': v2c})
    v2r, p2t = calib.device_matrices()

    def synth(n_entries):
        lpts = np.zeros((n_entries, n_lpts, 8), np.float32)
        lval = np.zeros((n_entries, n_lpts), bool)
        mpts = np.zeros((n_entries, n_pts, 8), np.float32)
        mval = np.zeros((n_entries, n_pts), bool)
        gts = []
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
                fused = fused[rng.choice(len(fused), n_pts, replace=False)]
            lpts[e, :len(lidar8)] = lidar8
            lval[e, :len(lidar8)] = True
            mpts[e, :len(fused)] = fused
            mval[e, :len(fused)] = True
            gts.append(s.get('boxes'))
        return lpts, lval, mpts, mval, gts

    # ---- train: 8 frames, one per device, single replica each ----------
    lpts, lval, mpts, mval, gts = synth(frames)
    gt = np.zeros((frames, 64, 8), np.float32)
    gt_valid = np.zeros((frames, 64), bool)
    for e, g in enumerate(gts):
        if g is None or len(g) == 0:
            g = np.array([[20, 0, -1, 3.9, 1.6, 1.56, 0.3]], np.float32)
        k = min(len(g), 64)
        gt[e, :k, :7] = g[:k, :7]
        gt[e, :k, 7] = 1
        gt_valid[e, :k] = True
    train_batch = {
        'points': lpts, 'points_valid': lval,
        'points_mm': mpts, 'points_mm_valid': mval,
        'v2r': np.tile(v2r, (frames, 1, 1)),
        'p2t': np.tile(p2t, (frames, 1, 1)),
        'transform_param': None,
        'trans_params': np.tile(np.array([[0.1, 1.0, 1.01]], np.float32),
                                (frames, 1)),
        'gt_boxes': gt, 'gt_valid': gt_valid,
    }
    opt_cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.003,
                       'WEIGHT_DECAY': 0.01, 'MOMS': [0.95, 0.85],
                       'PCT_START': 0.4, 'DIV_FACTOR': 10,
                       'GRAD_NORM_CLIP': 10, 'NUM_EPOCHS': 1})
    mesh = make_mesh(8)
    rngs = {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
            'sampling': jax.random.PRNGKey(2),
            'dropout': jax.random.PRNGKey(3)}
    with mesh:
        sharded = shard_batch(train_batch, mesh)
        progress('train batch sharded (8 frames over 8 devices); init params')
        state, tx, _ = init_state(model, sharded, rngs, opt_cfg,
                                  total_steps=10)
        state = jax.device_put(state, replicated(mesh))
        progress('params initialized; compiling FULL-WIDTH train step')
        step = jax.jit(make_train_step(model, tx))
        new_state, loss, aux = step(state, sharded, jax.random.PRNGKey(7))
        progress('train step dispatched; waiting for execution')
        loss_val = float(loss)
        t_train = time.time() - T0
        progress(f'train step done: loss={loss_val:.4f}')
        assert np.isfinite(loss_val), loss_val

        # ---- eval: 8 frames x ROT_NUM replicas, 3 entries per device ---
        params_rep = np.array([[0.3, 0.0, 0.98], [0.3, 1.0, 1.02],
                               [0.0, 1.0, 1.0]], np.float32)[:n_rep]
        elp, elv, emp, emv, _ = synth(frames)

        def world_transform(p, prm):
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
            reps = np.stack([world_transform(pts, p) for p in params_rep], 1)
            return reps.reshape(frames * n_rep, *pts.shape[1:])

        eval_batch = {
            'points': replicate(elp),
            'points_valid': np.repeat(elv, n_rep, axis=0),
            'points_mm': replicate(emp),
            'points_mm_valid': np.repeat(emv, n_rep, axis=0),
            'v2r': np.tile(v2r, (frames * n_rep, 1, 1)),
            'p2t': np.tile(p2t, (frames * n_rep, 1, 1)),
            'transform_param': np.tile(params_rep[None], (frames, 1, 1)),
            'trans_params': np.tile(params_rep, (frames, 1)),
            'gt_boxes': None, 'gt_valid': None,
        }
        eval_sharded = shard_batch(eval_batch, mesh)
        eval_vars = {'params': new_state.params,
                     'batch_stats': new_state.batch_stats}
        progress('eval batch sharded (24 entries / 8 devices); compiling '
                 'eval step')
        fwd = jax.jit(functools.partial(model.apply, train=False))
        out = fwd(eval_vars, eval_sharded)
        out = jax.tree_util.tree_map(np.asarray, out)
        t_eval = time.time() - T0
        progress('eval step executed; running host merge tail')

    from virconv_tpu.utils.postprocess import post_process_batch
    pred_dicts = post_process_batch(out, CfgNode(cfg.MODEL.POST_PROCESSING),
                                    len(cfg.CLASS_NAMES))
    n_dets = [int((p['pred_scores'] > 0).sum()) for p in pred_dicts]
    finite = all(np.isfinite(p['pred_boxes']).all() for p in pred_dicts)
    progress(f'merged detections/frame: {n_dets} (finite={finite})')
    assert len(pred_dicts) == frames
    assert finite
    assert sum(n_dets) > 0, 'no detections survived the merge'

    rec = {
        'what': 'fullwidth_8dev_mesh',
        'devices': 8,
        'train_frames': frames,
        'eval_entries': frames * n_rep,
        'loss': round(loss_val, 4),
        'dets_per_frame': n_dets,
        'train_done_s': round(t_train, 1),
        'total_s': round(time.time() - T0, 1),
        'data_caps': {'voxels': 10000, 'lidar_pts': n_lpts,
                      'mm_pts': n_pts},
        'ok': True,
    }
    print(json.dumps(rec))
    with open(os.path.join(ROOT, 'FULLWIDTH_MESH.json'), 'w') as f:
        json.dump(rec, f, indent=1)


if __name__ == '__main__':
    main()
