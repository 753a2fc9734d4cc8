"""Synthetic on-disk mini-KITTI builder (no real data in this environment).

Writes velodyne/velodyne_depth/calib/label_2/planes/image_2 for a few
frames, then info pkls + the multimodal gt database — the minimum tree
KittiDatasetMM needs (reference layout: ``/root/reference/pcdet/datasets/
kitti/kitti_dataset_mm.py:434-487``). Used by tests/test_data_pipeline.py
and by CLI smoke runs:

    python tools/make_mini_kitti.py /tmp/minikitti [--frames 4]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def build_mini_kitti(root, n_frames=4, seed=0, n_train=None):
    """Write raw files for ``n_frames`` frames; last frame(s) go to val."""
    root = Path(root)
    rng = np.random.default_rng(seed)
    (root / 'ImageSets').mkdir(parents=True, exist_ok=True)
    for sub in ('velodyne', 'velodyne_depth', 'calib', 'label_2', 'planes',
                'image_2'):
        (root / 'training' / sub).mkdir(parents=True, exist_ok=True)

    frame_ids = [f'{i:06d}' for i in range(n_frames)]
    calib_txt = (
        'P0: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0\n'
        'P1: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0\n'
        'P2: 707.0 0.0 601.8 45.7 0.0 707.0 183.1 -0.3 0.0 0.0 1.0 0.004\n'
        'P3: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0\n'
        'R0_rect: 0.9999 0.0098 -0.0074 -0.0099 0.9999 -0.0043 0.0074 '
        '0.0044 0.9999\n'
        'Tr_velo_to_cam: 0.0075 -0.9999 -0.0002 -0.0040 0.0029 0.0002 '
        '-1.0 -0.0763 0.9999 0.0075 0.0029 -0.2718\n'
        'Tr_imu_to_velo: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0\n')

    from virconv_tpu.utils.calibration import Calibration

    for fid in frame_ids:
        try:
            import cv2
            cv2.imwrite(str(root / 'training' / 'image_2' / f'{fid}.png'),
                        np.zeros((375, 1242, 3), np.uint8))
        except ImportError:
            (root / 'training' / 'image_2' / f'{fid}.png').write_bytes(b'')
        with open(root / 'training' / 'calib' / f'{fid}.txt', 'w') as f:
            f.write(calib_txt)
        calib = Calibration(root / 'training' / 'calib' / f'{fid}.txt')

        # objects in front of the ego, in camera frame
        n_obj = 3
        labels = []
        boxes_lidar = []
        for i in range(n_obj):
            x_l = 10.0 + 12 * i + rng.uniform(-1, 1)
            y_l = rng.uniform(-3, 3)
            z_l = -1.0
            loc_cam = calib.lidar_to_rect(
                np.array([[x_l, y_l, z_l - 1.56 / 2 + 1.56 / 2]]))[0]
            # bottom-center in camera frame
            loc_cam[1] += 1.56 / 2
            ry = rng.uniform(-np.pi, np.pi)
            labels.append(
                f'Car 0.0 0 0.0 300.0 150.0 400.0 250.0 '
                f'1.56 1.60 3.90 {loc_cam[0]:.2f} {loc_cam[1]:.2f} '
                f'{loc_cam[2]:.2f} {ry:.2f}')
            boxes_lidar.append([x_l, y_l, z_l, 3.9, 1.6, 1.56,
                                -(np.pi / 2 + ry)])
        with open(root / 'training' / 'label_2' / f'{fid}.txt', 'w') as f:
            f.write('\n'.join(labels) + '\n')
        with open(root / 'training' / 'planes' / f'{fid}.txt', 'w') as f:
            f.write('# Plane\nWidth 4\nHeight 1\n0.0 -1.0 0.0 -1.73\n')

        # mm points: background + in-box clusters, 8-dim
        n_bg = 4000
        pts = np.zeros((n_bg, 8), np.float32)
        pts[:, 0] = rng.uniform(1, 68, n_bg)
        pts[:, 1] = rng.uniform(-30, 30, n_bg)
        pts[:, 2] = rng.uniform(-2.5, 0.5, n_bg)
        pts[:, 3] = rng.uniform(0, 10, n_bg)
        pts[:, 4:7] = rng.uniform(0, 0.33, (n_bg, 3))
        pts[:, 7] = rng.integers(1, 3, n_bg)
        clusters = []
        for b in boxes_lidar:
            m = 200
            c = np.zeros((m, 8), np.float32)
            # sample in the box's LOCAL frame (elongated along length) and
            # rotate by the gt heading — an axis-aligned blob would carry
            # ZERO heading information, making heading regression (and any
            # IoU-based AP) unlearnable by construction (round-4 campaign
            # post-mortem: centers/dims converged, headings stayed noise)
            lx = rng.uniform(-0.48, 0.48, m) * b[3]
            ly = rng.uniform(-0.48, 0.48, m) * b[4]
            ca, sa = np.cos(b[6]), np.sin(b[6])
            c[:, 0] = b[0] + lx * ca - ly * sa
            c[:, 1] = b[1] + lx * sa + ly * ca
            c[:, 2] = b[2] + rng.uniform(-0.45, 0.45, m) * b[5]
            c[:, 3] = rng.uniform(0, 10, m)
            c[:, 7] = rng.integers(1, 3, m)
            clusters.append(c)
        mm = np.concatenate([pts] + clusters)
        np.save(root / 'training' / 'velodyne_depth' / f'{fid}.npy',
                mm.astype(np.float16))
        mm[:, 4:8] = 0
        mm[:, :4].astype(np.float32).tofile(
            root / 'training' / 'velodyne' / f'{fid}.bin')

    n_train = n_train if n_train is not None else max(1, n_frames - 1)
    with open(root / 'ImageSets' / 'train.txt', 'w') as f:
        f.write('\n'.join(frame_ids[:n_train]) + '\n')
    with open(root / 'ImageSets' / 'val.txt', 'w') as f:
        f.write('\n'.join(frame_ids[n_train:]) + '\n')
    return root


def build_infos(root, class_names=('Car',)):
    """Create kitti_infos_{train,val}.pkl + the mm gt database."""
    import pickle
    import yaml
    from virconv_tpu.config import CfgNode, merge_new_config
    from virconv_tpu.datasets.kitti.kitti_dataset_mm import KittiDatasetMM

    root = Path(root)
    repo = Path(__file__).resolve().parent.parent
    cfg = CfgNode(yaml.safe_load(open(
        repo / 'tools/cfgs/models/kitti/VirConv-T.yaml')))['DATA_CONFIG']
    base = CfgNode(yaml.safe_load(open(
        repo / 'tools/cfgs/dataset_configs/kitti_dataset.yaml')))
    merged = merge_new_config(base, {k: v for k, v in cfg.items()
                                     if k != '_BASE_CONFIG_'})
    merged.DATA_PATH = str(root)
    ds = KittiDatasetMM(merged, list(class_names), training=False,
                        root_path=root)
    for split, fname in (('train', 'kitti_infos_train.pkl'),
                         ('val', 'kitti_infos_val.pkl')):
        ds.set_split(split)
        infos = ds.get_infos(num_workers=1)
        with open(root / fname, 'wb') as f:
            pickle.dump(infos, f)
    ds.create_groundtruth_database(root / 'kitti_infos_train.pkl',
                                   used_classes=list(class_names),
                                   split='train')
    return root


if __name__ == '__main__':
    import argparse
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    ap = argparse.ArgumentParser()
    ap.add_argument('root')
    ap.add_argument('--frames', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    a = ap.parse_args()
    build_mini_kitti(a.root, n_frames=a.frames, seed=a.seed)
    build_infos(a.root)
    print(f'mini-KITTI ready at {a.root}')
