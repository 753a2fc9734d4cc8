"""Training-time augmentation queue.

Parity target ``/root/reference/pcdet/datasets/augmentor/data_augmentor.py``:
gt-sampling, DA-sampling, per-object local noise, recorded world
rotation/flip/scale (``aug_param`` = [rot, flip, scale], consumed by the
in-model NRConv back-projection), local translation, pyramid augs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ...utils import common as common_utils
from . import augmentor_utils, database_sampler


class DataAugmentor:
    def __init__(self, root_path, augmentor_configs, class_names,
                 logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.data_augmentor_queue = []
        cfg_list = augmentor_configs if isinstance(augmentor_configs, list) \
            else augmentor_configs.AUG_CONFIG_LIST
        for cur_cfg in cfg_list:
            if not isinstance(augmentor_configs, list) and \
                    cur_cfg.NAME in augmentor_configs.DISABLE_AUG_LIST:
                continue
            self.data_augmentor_queue.append(
                getattr(self, cur_cfg.NAME)(config=cur_cfg))

    def __getstate__(self):
        d = dict(self.__dict__)
        d.pop('logger', None)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)

    def gt_sampling(self, config=None):
        return database_sampler.DataBaseSampler(
            root_path=self.root_path, sampler_cfg=config,
            class_names=self.class_names, logger=self.logger)

    def da_sampling(self, config=None):
        return database_sampler.DADataBaseSampler(
            root_path=self.root_path, sampler_cfg=config,
            class_names=self.class_names, logger=self.logger)

    def random_world_rotation(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_rotation, config=config)
        rot_range = config['WORLD_ROT_ANGLE']
        if not isinstance(rot_range, list):
            rot_range = [-rot_range, rot_range]
        gt_boxes, points, param = augmentor_utils.global_rotation(
            data_dict['gt_boxes'], data_dict['points'], rot_range)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        # aug_param convention is [rot, flip, scale] (consumed by the
        # in-model NRConv inverse transform) — rotation must come FIRST in
        # the augmentor queue; fail loudly on a misordered config instead of
        # silently dropping an earlier flip/scale param.
        assert 'aug_param' not in data_dict, (
            'random_world_rotation must precede random_world_flip/'
            'random_world_scaling in DATA_AUGMENTOR.AUG_CONFIG_LIST '
            '(aug_param convention is [rot, flip, scale])')
        data_dict['aug_param'] = [param]
        return data_dict

    def random_world_flip(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_flip, config=config)
        gt_boxes, points = data_dict['gt_boxes'], data_dict['points']
        param = 0
        for axis in config['ALONG_AXIS_LIST']:
            assert axis == 'x'
            gt_boxes, points, param = augmentor_utils.random_flip_along_x(
                gt_boxes, points)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        data_dict.setdefault('aug_param', []).append(int(param))
        return data_dict

    def random_world_scaling(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_world_scaling, config=config)
        gt_boxes, points, param = augmentor_utils.global_scaling(
            data_dict['gt_boxes'], data_dict['points'],
            config['WORLD_SCALE_RANGE'])
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        data_dict.setdefault('aug_param', []).append(param)
        return data_dict

    def random_local_noise(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_noise, config=config)
        data_dict['gt_boxes'][:, 6] = -data_dict['gt_boxes'][:, 6]
        augmentor_utils.noise_per_object(
            data_dict['gt_boxes'], data_dict['points'], None,
            data_dict.get('valid_noise', None),
            config['LOCAL_ROT_RANGE'], config['TRANSLATION_STD'],
            config['GLOBAL_ROT_RANGE'], config['EXTRA_WIDTH'])
        data_dict['gt_boxes'][:, 6] = -data_dict['gt_boxes'][:, 6]
        data_dict.pop('valid_noise', None)
        return data_dict

    def random_local_trans(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_trans, config=config)
        std = config.TRANSLATION_STD
        shift = (np.random.random(3) - 0.5) * np.asarray(std)
        data_dict['gt_boxes'][:, 0:3] += shift
        data_dict['points'][:, 0:3] += shift
        return data_dict

    def random_local_pyramid_aug(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.random_local_pyramid_aug, config=config)
        gt_boxes, points = data_dict['gt_boxes'], data_dict['points']
        gt_boxes, points, pyramids = augmentor_utils.local_pyramid_dropout(
            gt_boxes, points, config['DROP_PROB'])
        gt_boxes, points, pyramids = augmentor_utils.local_pyramid_sparsify(
            gt_boxes, points, config['SPARSIFY_PROB'],
            config['SPARSIFY_MAX_NUM'], pyramids)
        gt_boxes, points = augmentor_utils.local_pyramid_swap(
            gt_boxes, points, config['SWAP_PROB'], config['SWAP_MAX_NUM'],
            pyramids)
        data_dict['gt_boxes'] = gt_boxes
        data_dict['points'] = points
        return data_dict

    def forward(self, data_dict):
        for aug in self.data_augmentor_queue:
            data_dict = aug(data_dict=data_dict)
        data_dict['gt_boxes'][:, 6] = common_utils.limit_period(
            data_dict['gt_boxes'][:, 6], offset=0.5, period=2 * np.pi)
        if 'aug_param' in data_dict:
            data_dict['aug_param'] = np.array(data_dict['aug_param'],
                                              dtype=np.float32)
        data_dict.pop('calib_obj', None)
        data_dict.pop('road_plane', None)
        return data_dict
