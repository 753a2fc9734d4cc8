"""X-transform round-trip and calibration tests."""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.utils import transforms as tr
from virconv_tpu.utils.calibration import identity_calib, project_lidar_to_img_jax
from virconv_tpu.config import CfgNode


def test_params_from_config():
    cfg = CfgNode({'AUG_CONFIG_LIST': [
        {'NAME': 'world_rotation', 'WORLD_ROT_ANGLE': [0.3, 0.3, 0]},
        {'NAME': 'world_flip', 'ALONG_AXIS_LIST': [0, 1.0, 1.0]},
        {'NAME': 'world_scaling', 'WORLD_SCALE_RANGE': [0.98, 1.02, 1.0]},
    ]})
    p = tr.get_transform_params(cfg, 3)
    np.testing.assert_allclose(p, [[0.3, 0, 0.98], [0.3, 1, 1.02], [0, 1, 1]])


def test_numpy_round_trip_points_boxes():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((50, 5)).astype(np.float32)
    boxes = rng.standard_normal((10, 8)).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 1
    for param in ([0.3, 0, 0.98], [0.3, 1, 1.02], [0.0, 1, 1.0]):
        param = np.array(param, np.float32)
        p2 = tr.transform_points_np(
            tr.transform_points_np(pts, param), param, inverse=True)
        np.testing.assert_allclose(p2, pts, atol=1e-5)
        b2 = tr.transform_boxes_np(
            tr.transform_boxes_np(boxes, param), param, inverse=True)
        np.testing.assert_allclose(b2, boxes, atol=1e-5)


def test_jax_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((30, 3)).astype(np.float32)
    boxes = rng.standard_normal((6, 7)).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 1
    for inverse in (False, True):
        for param in ([0.3, 0, 0.98], [0.3, 1, 1.02]):
            param = np.array(param, np.float32)
            want = tr.transform_points_np(pts, param, inverse=inverse)
            got = np.asarray(tr.transform_points_jax(
                jnp.asarray(pts), jnp.asarray(param), inverse=inverse))
            np.testing.assert_allclose(got, want[:, :3], atol=1e-5)
            wantb = tr.transform_boxes_np(boxes, param, inverse=inverse)
            gotb = np.asarray(tr.transform_boxes_jax(
                jnp.asarray(boxes), jnp.asarray(param), inverse=inverse))
            np.testing.assert_allclose(gotb, wantb, atol=1e-5)


def test_calibration_projection_consistency():
    calib = identity_calib()
    rng = np.random.default_rng(2)
    pts = rng.uniform([5, -10, -2], [60, 10, 1], (40, 3)).astype(np.float32)
    uv_np, depth_np = calib.lidar_to_img(pts)
    v2r, p2t = calib.device_matrices()
    uv_j, depth_j = project_lidar_to_img_jax(
        jnp.asarray(pts), jnp.asarray(v2r), jnp.asarray(p2t))
    np.testing.assert_allclose(np.asarray(uv_j), uv_np, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth_j), depth_np, rtol=1e-4,
                               atol=1e-3)
    # forward x must be camera depth for the synthetic calib
    np.testing.assert_allclose(depth_np, pts[:, 0], atol=1e-4)


def test_rect_lidar_round_trip():
    calib = identity_calib()
    rng = np.random.default_rng(3)
    pts = rng.uniform([5, -10, -2], [60, 10, 1], (20, 3)).astype(np.float32)
    back = calib.rect_to_lidar(calib.lidar_to_rect(pts))
    np.testing.assert_allclose(back, pts, atol=1e-4)
