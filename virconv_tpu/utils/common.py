"""Common host utilities: geometry helpers, logging, seeding.

Numpy analogs of ``/root/reference/pcdet/utils/common_utils.py`` (rotation,
range mask, voxel centers, logger, seeding) without the torch dependency.
"""

from __future__ import annotations

import logging
import os
import pickle
import random
import shutil

import numpy as np


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """points (B, N, 3+C), angle (B,)."""
    from ..ops.boxes_np import rotate_points_along_z as _r
    return _r(points, angle)


def mask_points_by_range(points, limit_range):
    return ((points[:, 0] >= limit_range[0])
            & (points[:, 0] <= limit_range[3])
            & (points[:, 1] >= limit_range[1])
            & (points[:, 1] <= limit_range[4]))


def get_voxel_centers(voxel_coords, downsample_times, voxel_size,
                      point_cloud_range):
    """voxel_coords (N, 3) [z, y, x] -> centers (N, 3) xyz."""
    centers = voxel_coords[:, [2, 1, 0]].astype(np.float32)
    vs = np.asarray(voxel_size, np.float32) * downsample_times
    return (centers + 0.5) * vs + np.asarray(point_cloud_range[:3],
                                             np.float32)


def keep_arrays_by_name(gt_names, used_classes):
    inds = [i for i, name in enumerate(gt_names) if name in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info, name):
    keep = [i for i, x in enumerate(info['name']) if x != name]
    return {key: info[key][keep] for key in info.keys()}


def create_logger(log_file=None, rank=0, log_level=logging.INFO):
    logger = logging.getLogger(__name__ + ('%d' % (id(log_file) % 10000)))
    logger.setLevel(log_level if rank == 0 else 'ERROR')
    formatter = logging.Formatter(
        '%(asctime)s  %(levelname)5s  %(message)s')
    console = logging.StreamHandler()
    console.setLevel(log_level if rank == 0 else 'ERROR')
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file is not None:
        fh = logging.FileHandler(filename=log_file)
        fh.setLevel(log_level if rank == 0 else 'ERROR')
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)
