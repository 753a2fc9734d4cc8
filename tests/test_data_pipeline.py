"""End-to-end host data pipeline on a synthetic on-disk mini-KITTI.

Writes fake velodyne_depth/calib/label/plane files, builds infos + gt
database, then exercises KittiDatasetMM with full augmentation (gt/DA
sampling, local noise, world transforms, pyramid augs, StVD) and collation
in both train and eval (ROT_NUM replicas) modes.
"""
import copy

import numpy as np
import pytest
import yaml

from virconv_tpu.config import CfgNode, cfg_from_yaml_file


@pytest.fixture(scope='module')
def mini_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp('kitti')
    rng = np.random.default_rng(0)
    (root / 'ImageSets').mkdir()
    for sub in ('velodyne', 'velodyne_depth', 'calib', 'label_2', 'planes',
                'image_2'):
        (root / 'training' / sub).mkdir(parents=True)

    frame_ids = ['000000', '000001', '000002', '000003']
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
        import cv2
        cv2.imwrite(str(root / 'training' / 'image_2' / f'{fid}.png'),
                    np.zeros((375, 1242, 3), np.uint8))
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
            c[:, 0] = b[0] + rng.uniform(-1.5, 1.5, m)
            c[:, 1] = b[1] + rng.uniform(-0.7, 0.7, m)
            c[:, 2] = b[2] + rng.uniform(-0.7, 0.7, m)
            c[:, 3] = rng.uniform(0, 10, m)
            c[:, 7] = rng.integers(1, 3, m)
            clusters.append(c)
        mm = np.concatenate([pts] + clusters)
        np.save(root / 'training' / 'velodyne_depth' / f'{fid}.npy',
                mm.astype(np.float16))
        mm[:, 4:8] = 0
        mm[:, :4].astype(np.float32).tofile(
            root / 'training' / 'velodyne' / f'{fid}.bin')

    with open(root / 'ImageSets' / 'train.txt', 'w') as f:
        f.write('\n'.join(frame_ids[:3]) + '\n')
    with open(root / 'ImageSets' / 'val.txt', 'w') as f:
        f.write('\n'.join(frame_ids[3:]) + '\n')
    return root


def make_dataset_cfg(root, rot_num=2):
    cfg = CfgNode(yaml.safe_load(
        open('tools/cfgs/models/kitti/VirConv-T.yaml')))['DATA_CONFIG']
    base = CfgNode(yaml.safe_load(
        open('tools/cfgs/dataset_configs/kitti_dataset.yaml')))
    from virconv_tpu.config import merge_new_config
    merged = merge_new_config(base, {k: v for k, v in cfg.items()
                                     if k != '_BASE_CONFIG_'})
    merged.DATA_PATH = str(root)
    merged.ROT_NUM = rot_num
    merged.MAX_POINTS = {'lidar': 8192, 'mm': 8192}
    # db pkls created by the test
    merged.DATA_AUGMENTOR.AUG_CONFIG_LIST[0].DB_INFO_PATH = \
        ['kitti_dbinfos_train_mm.pkl']
    merged.DATA_AUGMENTOR.AUG_CONFIG_LIST[1].DB_INFO_PATH = \
        ['kitti_dbinfos_train_mm.pkl']
    return merged


@pytest.fixture(scope='module')
def infos_ready(mini_kitti):
    from virconv_tpu.datasets.kitti.kitti_dataset_mm import KittiDatasetMM
    import pickle
    cfg = make_dataset_cfg(mini_kitti)
    ds = KittiDatasetMM(cfg, ['Car'], training=False,
                        root_path=mini_kitti)
    for split, fname in (('train', 'kitti_infos_train.pkl'),
                         ('val', 'kitti_infos_val.pkl')):
        ds.set_split(split)
        infos = ds.get_infos(num_workers=1)
        with open(mini_kitti / fname, 'wb') as f:
            pickle.dump(infos, f)
    ds.create_groundtruth_database(mini_kitti / 'kitti_infos_train.pkl',
                                   used_classes=['Car'], split='train')
    return mini_kitti


class TestPipeline:
    def test_info_generation(self, infos_ready):
        import pickle
        infos = pickle.load(open(infos_ready / 'kitti_infos_train.pkl',
                                 'rb'))
        assert len(infos) == 3
        assert infos[0]['annos']['gt_boxes_lidar'].shape[1] == 7
        assert (infos[0]['annos']['num_points_in_gt'] > 0).all()
        db = pickle.load(open(infos_ready / 'kitti_dbinfos_train_mm.pkl',
                              'rb'))
        assert len(db['Car']) == 9

    def test_train_getitem_and_collate(self, infos_ready):
        from virconv_tpu.datasets import build_dataloader
        cfg = make_dataset_cfg(infos_ready)
        np.random.seed(0)
        dataset, loader, _ = build_dataloader(
            dataset_cfg=cfg, class_names=['Car'], batch_size=2,
            root_path=infos_ready, training=True)
        batch, meta = next(iter(loader))
        assert batch['points'].shape == (2, 8192, 8)
        assert batch['points_mm'].shape == (2, 8192, 8)
        assert batch['points_valid'].dtype == bool
        assert batch['gt_boxes'].shape[0] == 2
        assert batch['gt_valid'].any()
        assert batch['trans_params'].shape == (2, 3)
        assert batch['v2r'].shape == (2, 4, 3)
        # lidar stream only contains indicator==2 points among valid
        valid_pts = batch['points'][0][batch['points_valid'][0]]
        assert set(np.unique(valid_pts[:, 7])) <= {2.0}
        assert meta['batch_size'] == 2

    def test_eval_getitem_with_replicas(self, infos_ready):
        from virconv_tpu.datasets import build_dataloader
        cfg = make_dataset_cfg(infos_ready, rot_num=2)
        dataset, loader, _ = build_dataloader(
            dataset_cfg=cfg, class_names=['Car'], batch_size=1,
            root_path=infos_ready, training=False)
        batch, meta = next(iter(loader))
        assert batch['points'].shape[0] == 2          # B * R entries
        assert batch['transform_param'].shape == (1, 2, 3)
        assert batch['trans_params'].shape == (2, 3)
        # replica 1 is the transformed scene: params differ from replica 0
        assert not np.allclose(batch['transform_param'][0, 0],
                               batch['transform_param'][0, 1])


class TestSemiDataset:
    def test_trainsemi_mixes_splits(self, infos_ready):
        """KittiDatasetSemi resolves raw data against the per-info split
        subdir (training/ vs semi/) and mixes the id lists."""
        import pickle
        import shutil
        from virconv_tpu.datasets.kitti.kitti_dataset_semi import \
            KittiDatasetSemi

        root = infos_ready
        # fabricate a pseudo-labeled semi/ frame by cloning a training frame
        for sub in ('velodyne_depth', 'calib', 'label_2'):
            (root / 'semi' / sub).mkdir(parents=True, exist_ok=True)
        src = root / 'training'
        for sub, fn in (('velodyne_depth', '000000.npy'),
                        ('calib', '000000.txt'), ('label_2', '000000.txt')):
            shutil.copy(src / sub / fn, root / 'semi' / sub / fn)
        with open(root / 'ImageSets' / 'semi.txt', 'w') as f:
            f.write('000000\n')

        with open(root / 'kitti_infos_train.pkl', 'rb') as f:
            train_infos = pickle.load(f)
        for info in train_infos:
            info['split'] = 'training'
        semi_info = copy.deepcopy(train_infos[0])
        semi_info['split'] = 'semi'
        with open(root / 'kitti_infos_trainsemi.pkl', 'wb') as f:
            pickle.dump(train_infos + [semi_info], f)

        cfg = make_dataset_cfg(root)
        cfg.DATA_SPLIT = {'train': 'trainsemi', 'test': 'val'}
        cfg.INFO_PATH = {'train': ['kitti_infos_trainsemi.pkl'],
                         'test': ['kitti_infos_val.pkl']}
        ds = KittiDatasetSemi(dataset_cfg=cfg, class_names=['Car'],
                              training=True, root_path=root)
        subs = {tuple(s)[0] for s in ds.sample_id_list}
        assert subs == {'training', 'semi'}
        assert len(ds.kitti_infos) == len(train_infos) + 1

        # the semi info (last) must load points from semi/velodyne_depth
        item = ds[len(ds.kitti_infos) - 1]
        assert item is None or 'points' in item
