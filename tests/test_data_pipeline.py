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
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'tools'))
    from make_mini_kitti import build_mini_kitti
    return build_mini_kitti(tmp_path_factory.mktemp('kitti'), n_frames=4,
                            seed=0, n_train=3)


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


class TestPlainKittiDataset:
    """The legacy LiDAR-only 4-dim dataset (reference kitti_dataset.py,
    registered but unused by the shipped configs)."""

    def test_plain_getitem(self, infos_ready):
        from virconv_tpu.datasets.kitti.kitti_dataset import KittiDataset
        cfg = make_dataset_cfg(infos_ready)
        ds = KittiDataset(cfg, ['Car'], training=False,
                          root_path=infos_ready)
        item = ds[0]
        # raw velodyne points are 4-dim [x, y, z, intensity]; the feature
        # encoder may widen with configured features but the source must
        # NOT be the 8-dim velodyne_depth stream
        assert 'points' in item and item['points'].shape[0] > 0
        pts = item['points']
        assert np.isfinite(pts).all()
        assert 'gt_boxes' in item or not ds.kitti_infos[0].get('annos')
