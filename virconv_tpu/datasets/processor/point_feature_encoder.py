"""Point feature encoder: selects/casts point feature columns per replica.

Parity target ``/root/reference/pcdet/datasets/processor/
point_feature_encoder.py``: ``absolute_coordinates_encoding`` keeps
[x, y, z, intensity]; the ``_mm`` variant keeps all 8 multimodal features
and applies to every rot replica plus the ``points_mm`` streams.
"""

from __future__ import annotations

import numpy as np


class PointFeatureEncoder:
    def __init__(self, config, point_cloud_range=None, rot_num=1):
        self.config = config
        self.rot_num = rot_num
        self.encoding_type = config.encoding_type
        self.used_feature_list = list(config.used_feature_list)
        self.src_feature_list = list(config.src_feature_list)
        self.point_cloud_range = point_cloud_range

    @property
    def num_point_features(self):
        if self.encoding_type == 'absolute_coordinates_encoding_mm':
            return self.config.get('num_features', 8)
        return 3 + len(self.used_feature_list) - 3

    def forward(self, data_dict):
        for i in range(self.rot_num):
            sid = '' if i == 0 else str(i)
            for key in (f'points{sid}', f'points_mm{sid}'):
                if key not in data_dict:
                    continue
                pts = data_dict[key]
                if self.encoding_type == 'absolute_coordinates_encoding_mm':
                    data_dict[key] = pts.astype(np.float32)
                elif self.encoding_type == 'absolute_coordinates_encoding':
                    cols = [0, 1, 2]
                    for f in self.used_feature_list:
                        if f in ('x', 'y', 'z'):
                            continue
                        cols.append(3 + self.src_feature_list.index(f) - 3
                                    + 3)
                    data_dict[key] = pts[:, cols].astype(np.float32)
                else:
                    raise NotImplementedError(self.encoding_type)
        data_dict['use_lead_xyz'] = True
        return data_dict
