"""KITTI label parsing and camera<->lidar box conversions (host numpy).

Parity targets: ``/root/reference/pcdet/utils/object3d_kitti.py`` and the
coordinate-conversion helpers of ``pcdet/utils/box_utils.py``. KITTI camera
boxes are [x, y, z, l, h, w, ry] with the origin at the box bottom; lidar
boxes are [x, y, z, dx(l), dy(w), dz(h), heading] centered.
"""

from __future__ import annotations

import numpy as np

CLS_TO_ID = {'Car': 1, 'Pedestrian': 2, 'Cyclist': 3, 'Van': 4,
             'Person_sitting': 5, 'Truck': 6}


class Object3d:
    def __init__(self, line):
        label = line.strip().split(' ')
        self.src = line
        self.cls_type = label[0]
        self.truncation = float(label[1])
        self.occlusion = float(label[2])
        self.alpha = float(label[3])
        self.box2d = np.array(
            [float(label[4]), float(label[5]), float(label[6]),
             float(label[7])], dtype=np.float32)
        self.h = float(label[8])
        self.w = float(label[9])
        self.l = float(label[10])
        self.loc = np.array(
            [float(label[11]), float(label[12]), float(label[13])],
            dtype=np.float32)
        self.dis_to_cam = np.linalg.norm(self.loc)
        self.ry = float(label[14])
        self.score = float(label[15]) if label.__len__() == 16 else -1.0
        self.level = self.get_kitti_obj_level()

    def get_kitti_obj_level(self):
        height = float(self.box2d[3]) - float(self.box2d[1]) + 1
        if height >= 40 and self.truncation <= 0.15 and self.occlusion <= 0:
            return 0   # easy
        if height >= 25 and self.truncation <= 0.3 and self.occlusion <= 1:
            return 1   # moderate
        if height >= 25 and self.truncation <= 0.5 and self.occlusion <= 2:
            return 2   # hard
        return -1


def get_objects_from_label(label_file):
    with open(label_file, 'r') as f:
        lines = f.readlines()
    return [Object3d(line) for line in lines if line.strip()]


def boxes3d_kitti_camera_to_lidar(boxes3d_camera, calib):
    """camera [x, y, z, l, h, w, r] (bottom origin) -> lidar
    [x, y, z, l, w, h, heading] (center origin)."""
    boxes = boxes3d_camera.copy()
    xyz_camera = boxes[:, 0:3]
    l, h, w = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    r = boxes[:, 6:7]
    xyz_lidar = calib.rect_to_lidar(xyz_camera)
    xyz_lidar[:, 2] += h[:, 0] / 2
    return np.concatenate(
        [xyz_lidar, l, w, h, -(np.pi / 2 + r)], axis=-1)


def boxes3d_lidar_to_kitti_camera(boxes3d_lidar, calib):
    boxes = boxes3d_lidar.copy()
    xyz_lidar = boxes[:, 0:3].copy()
    l, w, h = boxes[:, 3:4], boxes[:, 4:5], boxes[:, 5:6]
    r = boxes[:, 6:7]
    xyz_lidar[:, 2] -= h[:, 0] / 2
    xyz_cam = calib.lidar_to_rect(xyz_lidar)
    r = -r - np.pi / 2
    return np.concatenate([xyz_cam, l, h, w, r], axis=-1)


def boxes3d_kitti_camera_to_imageboxes(boxes3d, calib, image_shape=None):
    """camera boxes -> 2D image [x1, y1, x2, y2] via projected 3D corners."""
    from ...ops import boxes_np
    n = boxes3d.shape[0]
    l, h, w = boxes3d[:, 3:4], boxes3d[:, 4:5], boxes3d[:, 5:6]
    x_c = np.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=np.float32) / 2
    z_c = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.float32) / 2
    y_c = np.array([0, 0, 0, 0, -1, -1, -1, -1], dtype=np.float32)
    corners = np.stack([l * x_c[None], h * y_c[None], w * z_c[None]],
                       axis=-1)                         # (N, 8, 3)
    ry = boxes3d[:, 6]
    cosa, sina = np.cos(ry), np.sin(ry)
    x = corners[..., 0] * cosa[:, None] + corners[..., 2] * sina[:, None]
    z = -corners[..., 0] * sina[:, None] + corners[..., 2] * cosa[:, None]
    corners = np.stack([x, corners[..., 1], z], axis=-1)
    corners += boxes3d[:, None, 0:3]
    boxes2d, _ = calib.corners3d_to_img_boxes(corners)
    if image_shape is not None:
        boxes2d[:, 0] = np.clip(boxes2d[:, 0], 0, image_shape[1] - 1)
        boxes2d[:, 1] = np.clip(boxes2d[:, 1], 0, image_shape[0] - 1)
        boxes2d[:, 2] = np.clip(boxes2d[:, 2], 0, image_shape[1] - 1)
        boxes2d[:, 3] = np.clip(boxes2d[:, 3], 0, image_shape[0] - 1)
    return boxes2d
