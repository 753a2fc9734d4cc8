"""X_TRANS: the invertible test-time transform ensemble (host side).

Thin object wrapper over ``virconv_tpu.utils.transforms`` mirroring the
reference API (``/root/reference/pcdet/datasets/augmentor/X_transform.py``):
``input_transform`` replicates a test scene into ``points``, ``points1``, ...
with recorded per-replica params; ``forward_with_param`` /
``backward_with_param`` apply/invert one replica's transform.
"""

from __future__ import annotations

import numpy as np

from ...utils import transforms as tr


class X_TRANS:
    def __init__(self, augmentor_configs=None, rot_num=1):
        self.rot_num = rot_num
        self.augmentor_configs = augmentor_configs

    def get_params(self):
        return tr.get_transform_params(self.augmentor_configs, self.rot_num)

    @staticmethod
    def forward_with_param(data_dict):
        param = np.asarray(data_dict['transform_param'], np.float32)
        out = dict(data_dict)
        if 'points' in data_dict:
            out['points'] = tr.transform_points_np(data_dict['points'], param)
        if 'boxes' in data_dict:
            out['boxes'] = tr.transform_boxes_np(data_dict['boxes'], param)
        return out

    @staticmethod
    def backward_with_param(data_dict):
        param = np.asarray(data_dict['transform_param'], np.float32)
        out = dict(data_dict)
        if 'points' in data_dict:
            out['points'] = tr.transform_points_np(data_dict['points'], param,
                                                   inverse=True)
        if 'boxes' in data_dict:
            out['boxes'] = tr.transform_boxes_np(data_dict['boxes'], param,
                                                 inverse=True)
        return out

    def input_transform(self, data_dict, trans_boxes=False):
        params = self.get_params()
        src_points = data_dict['points'].copy()
        src_boxes = data_dict['gt_boxes'].copy() if trans_boxes else None
        for i in range(self.rot_num):
            sid = '' if i == 0 else str(i)
            d = {'points': src_points.copy(),
                 'transform_param': params[i]}
            if trans_boxes:
                d['boxes'] = src_boxes.copy()
            out = self.forward_with_param(d)
            data_dict['points' + sid] = out['points']
            if trans_boxes:
                data_dict['gt_boxes' + sid] = out['boxes']
        data_dict['transform_param'] = params
        return data_dict
