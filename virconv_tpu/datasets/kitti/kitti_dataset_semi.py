"""Semi-supervised KITTI dataset: train split + pseudo-labeled odometry.

Parity target ``/root/reference/pcdet/datasets/kitti/kitti_datasetsemi.py``:
sample ids are ``[split_dir, frame]`` pairs mixing ``training/`` and
``semi/`` (pseudo-labeled odometry frames produced by
``tools/create_semi_dataset.py`` + a trained VirConv-T). Infos carry a
``split`` field so raw data resolves against the right subdirectory.
"""

from __future__ import annotations

import copy

import numpy as np

from ...utils import common as common_utils
from ...utils.calibration import Calibration
from . import kitti_utils
from .kitti_dataset_mm import KittiDatasetMM


class KittiDatasetSemi(KittiDatasetMM):
    def __init__(self, dataset_cfg, class_names, training=True,
                 root_path=None, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        self.sample_id_list = self.include_id_list()

    def include_id_list(self):
        split = self.split
        root = self.root_path

        def read(name):
            p = root / 'ImageSets' / f'{name}.txt'
            return [x.strip() for x in open(p).readlines()] if p.exists() \
                else []

        if split in ('train', 'val', 'trainval', 'test', 'semi'):
            sub = {'test': 'testing', 'semi': 'semi'}.get(split, 'training')
            return [[sub, i] for i in read(split)]
        if split == 'trainsemi':
            return ([['training', i] for i in read('train')]
                    + [['semi', i] for i in read('semi')])
        if split == 'trainvalsemi':
            return ([['training', i] for i in read('trainval')]
                    + [['semi', i] for i in read('semi')])
        return None

    def _split_root(self, info):
        sub = info.get('split', 'training')
        return self.root_path / sub

    def get_lidar_mm_split(self, sub, idx):
        f = self.root_path / sub / self.dataset_cfg.MM_PATH / f'{idx}.npy'
        return np.load(f).astype(np.float32)

    def get_calib_split(self, sub, idx):
        return Calibration(self.root_path / sub / 'calib' / f'{idx}.txt')

    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.kitti_infos)
        info = copy.deepcopy(self.kitti_infos[index])
        sample_idx = info['point_cloud']['lidar_idx']
        sub = info.get('split', 'training')
        points = self.get_lidar_mm_split(sub, sample_idx)
        calib = self.get_calib_split(sub, sample_idx)
        img_shape = info['image']['image_shape']
        if self.dataset_cfg.FOV_POINTS_ONLY:
            pts_rect = calib.lidar_to_rect(points[:, 0:3])
            points = points[self.get_fov_flag(pts_rect, img_shape, calib)]

        input_dict = {'points': points, 'frame_id': sample_idx,
                      'calib': calib, 'mm': np.ones((1, 1))}
        if 'annos' in info:
            annos = common_utils.drop_info_with_name(info['annos'],
                                                     name='DontCare')
            loc, dims = annos['location'], annos['dimensions']
            rots = annos['rotation_y']
            gt_names = annos['name']
            if self.dataset_cfg.get('USE_VAN', None) is True and self.training:
                gt_names = np.array(['Car' if n == 'Van' else n
                                     for n in gt_names])
            cam = np.concatenate([loc, dims, rots[..., None]],
                                 axis=1).astype(np.float32)
            gt_boxes = kitti_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
            if self.training and 'num_points_in_gt' in annos:
                nmask = annos['num_points_in_gt'] > 0
                gt_names = gt_names[nmask]
                gt_boxes = gt_boxes[nmask]
            input_dict['gt_names'] = gt_names
            input_dict['gt_boxes'] = gt_boxes
            plane = self.get_road_plane(sample_idx) \
                if sub == 'training' else None
            if plane is not None:
                input_dict['road_plane'] = plane

        data_dict = self.prepare_data(input_dict)
        if data_dict is None:
            return self.__getitem__(np.random.randint(len(self)))
        data_dict['image_shape'] = img_shape
        data_dict['calib'] = calib
        return data_dict
