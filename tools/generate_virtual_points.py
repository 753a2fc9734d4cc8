"""Offline virtual-point generation (the reference's PENet pipeline).

Parity target ``/root/reference/tools/PENet/main.py`` ``--detpath`` mode
(``:178,296-394``): run PENet depth completion over a KITTI detection split
and write fused real+virtual ``velodyne_depth/<frame>.npy`` files. The
reference loads pretrained torch weights; here either an orbax checkpoint of
the flax PENetC2 or a converted torch state dict (see
``virconv_tpu/models/depth_completion/torch_import.py``) is accepted.

Usage:
    python tools/generate_virtual_points.py --detpath data/kitti/training \
        --ckpt <penet_ckpt>
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CROP_H, CROP_W = 352, 1216


def prepare_frame(root, frame_id):
    import cv2
    from virconv_tpu.utils.calibration import Calibration
    rgb = cv2.imread(str(root / 'image_2' / f'{frame_id}.png'))[:, :, ::-1]
    calib = Calibration(root / 'calib' / f'{frame_id}.txt')
    lidar = np.fromfile(str(root / 'velodyne' / f'{frame_id}.bin'),
                        dtype=np.float32).reshape(-1, 4)

    # bottom crop to 352x1216 like the reference loader
    h, w = rgb.shape[:2]
    oh, ow = h - CROP_H, (w - CROP_W) // 2
    rgb_c = rgb[oh:, ow:ow + CROP_W]

    # project lidar into the cropped image -> sparse depth
    pts_img, depth = calib.lidar_to_img(lidar[:, :3])
    u = np.round(pts_img[:, 0]).astype(np.int64) - ow
    v = np.round(pts_img[:, 1]).astype(np.int64) - oh
    ok = (depth > 0) & (u >= 0) & (u < CROP_W) & (v >= 0) & (v < CROP_H)
    sparse = np.zeros((CROP_H, CROP_W), np.float32)
    sparse[v[ok], u[ok]] = depth[ok]

    # normalized position channels + shifted intrinsics for the crop
    us, vs = np.meshgrid(np.arange(CROP_W), np.arange(CROP_H))
    position = np.stack([2 * us / (CROP_W - 1) - 1,
                         2 * vs / (CROP_H - 1) - 1], -1).astype(np.float32)
    k_mat = np.array([[calib.fu, 0, calib.cu - ow],
                      [0, calib.fv, calib.cv - oh],
                      [0, 0, 1]], np.float32)
    return rgb, rgb_c, sparse, position, k_mat, calib, lidar, (oh, ow)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--detpath', type=str, required=True)
    parser.add_argument('--ckpt', type=str, default=None,
                        help='PENet checkpoint (orbax dir or torch .pth.tar)')
    parser.add_argument('--limit', type=int, default=None)
    args = parser.parse_args()

    import functools
    import jax
    import jax.numpy as jnp
    from virconv_tpu.models.depth_completion.penet import PENetC2
    from virconv_tpu.models.depth_completion.depth2points import (
        depth_to_points_rgb, fuse_virtual_and_lidar)
    from virconv_tpu.utils.calibration import Calibration

    root = Path(args.detpath)
    out_dir = root / 'velodyne_depth'
    out_dir.mkdir(exist_ok=True)

    model = PENetC2()
    rng = jax.random.PRNGKey(0)
    dummy = (jnp.zeros((1, CROP_H, CROP_W, 3)),
             jnp.zeros((1, CROP_H, CROP_W, 1)),
             jnp.zeros((1, CROP_H, CROP_W, 2)),
             jnp.eye(3)[None])
    variables = jax.jit(functools.partial(model.init, train=False))(
        rng, *dummy)
    if args.ckpt:
        if args.ckpt.endswith(('.pth', '.pth.tar')):
            from virconv_tpu.models.depth_completion.torch_import import (
                load_torch_penet)
            variables = load_torch_penet(args.ckpt, variables)
        else:
            from virconv_tpu.train.trainer import load_checkpoint
            variables = load_checkpoint(args.ckpt)
    forward = jax.jit(functools.partial(model.apply, train=False))

    frames = sorted(p.stem for p in (root / 'velodyne').glob('*.bin'))
    if args.limit:
        frames = frames[:args.limit]
    for fid in frames:
        rgb, rgb_c, sparse, position, k_mat, calib, lidar, (oh, ow) = \
            prepare_frame(root, fid)
        depth = forward(
            variables,
            jnp.asarray(rgb_c[None], jnp.float32),
            jnp.asarray(sparse[None, :, :, None]),
            jnp.asarray(position[None]),
            jnp.asarray(k_mat[None]))
        depth = np.asarray(depth)[0, :, :, 0]
        # shift crop back: build a full-frame calib-consistent projection by
        # operating in the cropped intrinsics
        crop_calib = Calibration({
            'P2': np.array([[k_mat[0, 0], 0, k_mat[0, 2], 0],
                            [0, k_mat[1, 1], k_mat[1, 2], 0],
                            [0, 0, 1, 0]], np.float32),
            'R0': calib.R0, 'Tr_velo2cam': calib.V2C})
        virtual = depth_to_points_rgb(depth, rgb_c, crop_calib)
        fused = fuse_virtual_and_lidar(virtual, lidar)
        np.save(out_dir / f'{fid}.npy', fused)
        print(f'{fid}: {len(fused)} points')


if __name__ == '__main__':
    main()
