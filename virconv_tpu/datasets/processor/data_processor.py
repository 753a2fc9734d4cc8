"""Host-side data processing: range mask, shuffle, pad-to-capacity.

Parity target ``/root/reference/pcdet/datasets/processor/data_processor.py``
with one deliberate difference: ``transform_points_to_voxels`` is NOT a host
step here — voxelization + mean-VFE run fused on the TPU inside the jitted
forward (``virconv_tpu.ops.sparse.voxelize``). The host step instead pads
each point stream to the configured static capacity (``MAX_POINTS``) so the
device sees fixed shapes. ``LIDAR_FIRST`` ordering (VirConv-L fused stream,
``data_processor.py:128-187``) is preserved by concatenation order upstream.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ...ops import boxes_np
from ...utils import common as common_utils


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 rot_num=1, num_point_features=8, max_points=None):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.rot_num = rot_num
        self.num_point_features = num_point_features
        self.mode = 'train' if training else 'test'
        self.max_points = max_points or {'lidar': 65536, 'mm': 65536}
        self.grid_size = None
        self.voxel_size = None
        self.voxel_cfg = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            self.data_processor_queue.append(
                getattr(self, cur_cfg.NAME)(config=cur_cfg))

    # every processor is a closure factory like the reference registry
    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range,
                           config=config)
        for i in range(self.rot_num):
            sid = '' if i == 0 else str(i)
            for key in (f'points{sid}', f'points_mm{sid}'):
                if key in data_dict:
                    pts = data_dict[key]
                    mask = common_utils.mask_points_by_range(
                        pts, self.point_cloud_range)
                    data_dict[key] = pts[mask]
        if data_dict.get('gt_boxes', None) is not None and self.training \
                and config.get('REMOVE_OUTSIDE_BOXES', True):
            keep = boxes_np.mask_boxes_outside_range(
                data_dict['gt_boxes'], self.point_cloud_range,
                min_num_corners=1)
            data_dict['gt_boxes'] = data_dict['gt_boxes'][keep]
            for extra in ('gt_names',):
                if extra in data_dict and len(data_dict[extra]) == len(keep):
                    data_dict[extra] = data_dict[extra][keep]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if not config.SHUFFLE_ENABLED[self.mode]:
            return data_dict
        for i in range(self.rot_num):
            sid = '' if i == 0 else str(i)
            for key in (f'points{sid}', f'points_mm{sid}'):
                if key in data_dict:
                    pts = data_dict[key]
                    data_dict[key] = pts[np.random.permutation(len(pts))]
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        """Record voxelization params (device-side) and pad point streams."""
        if data_dict is None:
            self.voxel_cfg = config
            self.voxel_size = np.asarray(config.VOXEL_SIZE, np.float32)
            grid = (self.point_cloud_range[3:6]
                    - self.point_cloud_range[0:3]) / self.voxel_size
            self.grid_size = np.round(grid).astype(np.int64)
            return partial(self.transform_points_to_voxels, config=config)

        for i in range(self.rot_num):
            sid = '' if i == 0 else str(i)
            for key, cap_key in ((f'points{sid}', 'lidar'),
                                 (f'points_mm{sid}', 'mm')):
                if key not in data_dict:
                    continue
                cap = self.max_points[cap_key]
                pts = data_dict[key]
                if len(pts) > cap:
                    sel = np.random.choice(len(pts), cap, replace=False)
                    pts = pts[sel]
                padded = np.zeros((cap, pts.shape[1]), np.float32)
                padded[:len(pts)] = pts
                data_dict[key] = padded
                data_dict[key + '_valid'] = np.arange(cap) < len(pts)
        return data_dict

    def forward(self, data_dict):
        for processor in self.data_processor_queue:
            data_dict = processor(data_dict=data_dict)
        return data_dict
