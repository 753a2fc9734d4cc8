"""Plain LiDAR-only KITTI dataset (4-dim points, legacy path).

Parity target ``/root/reference/pcdet/datasets/kitti/kitti_dataset.py`` —
registered but unused by the shipped VirConv configs; kept for API parity.
"""

from __future__ import annotations

import copy

import numpy as np

from ...utils import common as common_utils
from . import kitti_utils
from .kitti_dataset_mm import KittiDatasetMM


class KittiDataset(KittiDatasetMM):
    def __getitem__(self, index):
        if self._merge_all_iters_to_one_epoch:
            index = index % len(self.kitti_infos)
        info = copy.deepcopy(self.kitti_infos[index])
        sample_idx = info['point_cloud']['lidar_idx']
        points = self.get_lidar(sample_idx)
        calib = self.get_calib(sample_idx)
        img_shape = info['image']['image_shape']
        if self.dataset_cfg.FOV_POINTS_ONLY:
            pts_rect = calib.lidar_to_rect(points[:, 0:3])
            points = points[self.get_fov_flag(pts_rect, img_shape, calib)]

        input_dict = {'points': points, 'frame_id': sample_idx,
                      'calib': calib}
        if 'annos' in info:
            annos = common_utils.drop_info_with_name(info['annos'],
                                                     name='DontCare')
            loc, dims = annos['location'], annos['dimensions']
            rots = annos['rotation_y']
            gt_names = annos['name']
            cam = np.concatenate([loc, dims, rots[..., None]],
                                 axis=1).astype(np.float32)
            input_dict['gt_names'] = gt_names
            input_dict['gt_boxes'] = \
                kitti_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
            plane = self.get_road_plane(sample_idx)
            if plane is not None:
                input_dict['road_plane'] = plane

        data_dict = self.prepare_data(input_dict)
        if data_dict is None:
            return self.__getitem__(np.random.randint(len(self)))
        data_dict['image_shape'] = img_shape
        data_dict['calib'] = calib
        return data_dict
