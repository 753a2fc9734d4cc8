"""Dataset template: StVD input discard, replica transforms, batching.

Parity target ``/root/reference/pcdet/datasets/dataset.py``: distance-bin
point partitioning + stochastic input discard of virtual points (StVD,
``:120-189``), train scene-swap along x, test X_TRANS replication, and batch
collation. Collation here produces *fixed-shape* padded arrays (the TPU
contract of ``virconv_tpu.models.detectors.voxel_rcnn``): per (sample,
replica) padded point streams, per-entry calib matrices and transform
params, padded gt boxes with validity masks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..utils import common as common_utils
from .augmentor.data_augmentor import DataAugmentor
from .augmentor.x_transform import X_TRANS
from .processor.data_processor import DataProcessor
from .processor.point_feature_encoder import PointFeatureEncoder

MAX_GT_BOXES = 64


class DatasetTemplate:
    def __init__(self, dataset_cfg=None, class_names=None, training=True,
                 root_path=None, logger=None):
        self.dataset_cfg = dataset_cfg
        self.training = training
        self.class_names = class_names
        self.logger = logger
        self.root_path = Path(root_path) if root_path is not None \
            else Path(dataset_cfg.DATA_PATH)
        if self.dataset_cfg is None or class_names is None:
            return
        self.rot_num = 1 if training else self.dataset_cfg.get('ROT_NUM', 1)
        self.point_cloud_range = np.array(dataset_cfg.POINT_CLOUD_RANGE,
                                          dtype=np.float32)
        self.point_feature_encoder = PointFeatureEncoder(
            dataset_cfg.POINT_FEATURE_ENCODING,
            point_cloud_range=self.point_cloud_range, rot_num=self.rot_num)
        self.data_augmentor = DataAugmentor(
            self.root_path, dataset_cfg.DATA_AUGMENTOR, class_names,
            logger=logger) if training else None
        max_points = dict(dataset_cfg.get(
            'MAX_POINTS', {'lidar': 65536, 'mm': 65536}))
        self.data_processor = DataProcessor(
            dataset_cfg.DATA_PROCESSOR,
            point_cloud_range=self.point_cloud_range, training=training,
            rot_num=self.rot_num,
            num_point_features=self.point_feature_encoder.num_point_features,
            max_points=max_points)
        x_trans_cfg = dataset_cfg.get('X_TRANS', None)
        self.x_trans = X_TRANS(x_trans_cfg, rot_num=self.rot_num) \
            if x_trans_cfg is not None else None
        self.input_discard_rate = dataset_cfg.get('INPUT_DISCARD_RATE', 0.8)
        self.grid_size = self.data_processor.grid_size
        self.voxel_size = self.data_processor.voxel_size
        self._merge_all_iters_to_one_epoch = False
        self.total_epochs = 0

    @property
    def mode(self):
        return 'train' if self.training else 'test'

    def merge_all_iters_to_one_epoch(self, merge=True, epochs=None):
        self._merge_all_iters_to_one_epoch = merge
        self.total_epochs = epochs

    # --------------------------------------------------------- StVD ---------
    @staticmethod
    def partition(points, num=10, max_dis=60, rate=0.2):
        """Split points into distance bins along x; find the bin position
        below which subsampling is needed to hit the retain rate
        (reference ``partition``, dataset.py:120-170)."""
        inter = max_dis / num
        all_num = max(points.shape[0], 1)
        points_list = []
        acc = 0
        position = num - 1
        distant_acc = 0
        for j in range(num):
            i = num - j - 1
            if i == num - 1:
                mask = points[:, 0] >= inter * i
            else:
                mask = (points[:, 0] >= inter * i) & \
                       (points[:, 0] < inter * (i + 1))
            this = points[mask]
            acc += this.shape[0]
            if (acc + i * this.shape[0]) / all_num < rate:
                position = i
                distant_acc = acc
            points_list.append(this)
        return points_list, max(position, 0), distant_acc

    def input_point_discard(self, points, bin_num=2, rate=0.8):
        """Bin-based stochastic discard keeping distant points
        (reference ``input_point_discard``, dataset.py:172-189)."""
        retain = 1 - rate
        parts, pos, distant_acc = self.partition(points, num=bin_num,
                                                 rate=retain)
        out_num = int(points.shape[0] * retain)
        per_bin = int((out_num - distant_acc) / (pos + 1e-4))
        for i in range(len(parts) - pos, len(parts)):
            if parts[i].shape[0] > per_bin and per_bin >= 0:
                sel = np.random.permutation(parts[i].shape[0])[:per_bin]
                parts[i] = parts[i][sel]
        return np.concatenate(parts) if parts else points

    # ------------------------------------------------------ pipeline --------
    def prepare_data(self, data_dict):
        if self.training:
            assert 'gt_boxes' in data_dict
            data_dict = self.data_augmentor.forward(data_dict)
            data_dict.pop('road_plane', None)
        elif self.x_trans is not None:
            data_dict = self.x_trans.input_transform(data_dict)

        if data_dict.get('gt_boxes', None) is not None:
            selected = common_utils.keep_arrays_by_name(
                data_dict['gt_names'], self.class_names)
            data_dict['gt_names'] = data_dict['gt_names'][selected]
            for i in range(self.rot_num):
                sid = '' if i == 0 else str(i)
                key = 'gt_boxes' + sid
                if key in data_dict:
                    boxes = data_dict[key][selected]
                    classes = np.array(
                        [self.class_names.index(n) + 1
                         for n in data_dict['gt_names']], np.int32)
                    data_dict[key] = np.concatenate(
                        [boxes, classes.reshape(-1, 1).astype(np.float32)],
                        axis=1)

        for i in range(self.rot_num):
            sid = '' if i == 0 else str(i)
            # scene swap along x (train only, random)
            if self.training and np.random.choice([0, 1]):
                randx = np.random.random() * 70.4
                randx_1 = 70.4 - randx
                points = data_dict['points' + sid]
                points[points[:, 0] > 70.4] = 0
                p1 = points[points[:, 0] <= randx].copy()
                p1[:, 0] += randx_1
                p2 = points[points[:, 0] > randx].copy()
                p2[:, 0] -= randx
                data_dict['points' + sid] = np.concatenate([p1, p2])
                boxes = data_dict['gt_boxes' + sid]
                b1 = boxes[boxes[:, 0] <= randx].copy()
                b1[:, 0] += randx_1
                b2 = boxes[boxes[:, 0] > randx].copy()
                b2[:, 0] -= randx
                data_dict['gt_boxes' + sid] = np.concatenate([b1, b2])

            if 'mm' in data_dict:
                pts = data_dict['points' + sid]
                points_mm = pts[pts[:, -1] == 1]
                points = pts[pts[:, -1] == 2]
                if self.training:
                    points_mm2 = self.input_point_discard(
                        points_mm, rate=self.input_discard_rate)
                else:
                    points_mm2 = self.input_point_discard(
                        points_mm, bin_num=10, rate=self.input_discard_rate)
                if self.dataset_cfg.get('LATER_FUSION', True):
                    data_dict['points_mm' + sid] = points_mm2
                    data_dict['points' + sid] = points
                else:
                    # fused single stream, lidar first; intensity rescaled
                    final = np.concatenate([points, points_mm2])
                    final[:, 3] /= 10
                    data_dict['points' + sid] = final

        if not self.dataset_cfg.get('LATER_FUSION', True):
            data_dict.pop('mm', None)

        data_dict = self.point_feature_encoder.forward(data_dict)
        data_dict = self.data_processor.forward(data_dict)

        if self.training and len(data_dict.get('gt_boxes', [])) == 0:
            return None   # caller resamples another index

        data_dict.pop('gt_names', None)
        data_dict.pop('valid_noise', None)
        return data_dict

    # ------------------------------------------------------ collation -------
    def collate_batch(self, batch_list, _unused=False):
        """Fixed-shape batch pytree for the jitted model."""
        b = len(batch_list)
        rot_num = self.rot_num
        is_mm = any('points_mm' in s for s in batch_list)
        ret = {}

        def stack_entries(base, suffix=''):
            arrs = []
            for s in batch_list:
                for i in range(rot_num):
                    sid = '' if i == 0 else str(i)
                    arrs.append(s[base + sid + suffix])
            return np.stack(arrs)

        ret['points'] = stack_entries('points').astype(np.float32)
        ret['points_valid'] = stack_entries('points', '_valid')
        if is_mm:
            ret['points_mm'] = stack_entries('points_mm').astype(np.float32)
            ret['points_mm_valid'] = stack_entries('points_mm', '_valid')

        # calibration matrices per entry
        v2r, p2t = [], []
        for s in batch_list:
            calib = s['calib']
            m1, m2 = calib.device_matrices()
            for _ in range(rot_num):
                v2r.append(m1)
                p2t.append(m2)
        ret['v2r'] = np.stack(v2r)
        ret['p2t'] = np.stack(p2t)

        # gt boxes travel with the batch whenever annotations exist (train
        # targets; eval recall records) — replica 0 frame
        if all('gt_boxes' in s for s in batch_list):
            gt = np.zeros((b, MAX_GT_BOXES, 8), np.float32)
            gt_valid = np.zeros((b, MAX_GT_BOXES), bool)
            for k, s in enumerate(batch_list):
                n = min(len(s['gt_boxes']), MAX_GT_BOXES)
                gt[k, :n] = s['gt_boxes'][:n]
                gt_valid[k, :n] = True
        else:
            gt, gt_valid = None, None

        if self.training:
            ret['gt_boxes'] = gt
            ret['gt_valid'] = gt_valid
            if 'aug_param' in batch_list[0]:
                ret['trans_params'] = np.stack(
                    [s['aug_param'][:3].astype(np.float32)
                     for s in batch_list])
            else:
                ret['trans_params'] = None
            ret['transform_param'] = None
        else:
            if 'transform_param' in batch_list[0]:
                tp = np.stack([s['transform_param'].astype(np.float32)
                               for s in batch_list])     # (B, R, 3)
                ret['transform_param'] = tp
                ret['trans_params'] = tp.reshape(-1, 3)
            else:
                ret['transform_param'] = None
                ret['trans_params'] = None
            ret['gt_boxes'] = None
            ret['gt_valid'] = None

        meta = {'gt_boxes': gt, 'gt_valid': gt_valid,
                'frame_id': [s.get('frame_id') for s in batch_list],
                'calib': [s['calib'] for s in batch_list],
                'image_shape': [s.get('image_shape') for s in batch_list],
                'batch_size': b}
        return ret, meta
