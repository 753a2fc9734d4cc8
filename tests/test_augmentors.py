"""Host-side augmentation unit tests (pure numpy — no device needed)."""
import numpy as np
import pytest

from virconv_tpu.datasets.augmentor import augmentor_utils as au
from virconv_tpu.datasets.dataset import DatasetTemplate
from virconv_tpu.ops import boxes_np


def boxes(rng, n, span=40):
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(5, span, n)
    b[:, 1] = rng.uniform(-15, 15, n)
    b[:, 2] = -1
    b[:, 3:6] = [3.9, 1.6, 1.56]
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


class TestWorldAugs:
    def test_rotation_records_param_and_rotates(self):
        rng = np.random.default_rng(0)
        np.random.seed(0)
        gt = boxes(rng, 4)
        pts = rng.standard_normal((100, 4)).astype(np.float32)
        gt2, pts2, angle = au.global_rotation(gt.copy(), pts.copy(),
                                              [-0.5, 0.5])
        assert -0.5 <= angle <= 0.5
        # distances from origin preserved
        np.testing.assert_allclose(
            np.linalg.norm(pts2[:, :2], axis=1),
            np.linalg.norm(pts[:, :2], axis=1), rtol=1e-4)

    def test_scaling(self):
        rng = np.random.default_rng(1)
        np.random.seed(1)
        gt = boxes(rng, 3)
        pts = rng.standard_normal((50, 4)).astype(np.float32)
        gt2, pts2, s = au.global_scaling(gt.copy(), pts.copy(), [0.9, 1.1])
        np.testing.assert_allclose(pts2[:, :3], pts[:, :3] * s, rtol=1e-5)
        np.testing.assert_allclose(gt2[:, :6], gt[:, :6] * s, rtol=1e-5)


class TestNoisePerObject:
    def test_boxes_stay_collision_free_and_points_follow(self):
        rng = np.random.default_rng(2)
        np.random.seed(2)
        gt = boxes(rng, 5)
        gt[:, 0] = [10, 20, 30, 40, 50]   # well separated
        gt[:, 1] = 0
        pts_list = []
        for b in gt:
            p = np.zeros((30, 4), np.float32)
            p[:, 0] = b[0] + rng.uniform(-1.5, 1.5, 30)
            p[:, 1] = b[1] + rng.uniform(-0.6, 0.6, 30)
            p[:, 2] = b[2] + rng.uniform(-0.6, 0.6, 30)
            pts_list.append(p)
        pts = np.concatenate(pts_list)
        gt_after = gt.copy()
        au.noise_per_object(gt_after, pts, rotation_perturb=[-0.5, 0.5],
                            center_noise_std=0.5)
        moved = np.abs(gt_after[:, :3] - gt[:, :3]).sum() > 0
        assert moved
        # boxes still collision-free
        iou = boxes_np.boxes_iou_bev(gt_after, gt_after)
        np.fill_diagonal(iou, 0)
        assert iou.max() < 1e-4
        # points moved with their boxes: each box still contains points
        idx = boxes_np.points_in_boxes(pts, gt_after)
        for i in range(5):
            assert (idx == i).sum() > 10, f'box {i} lost its points'


class TestPyramidAugs:
    def test_dropout_removes_points(self):
        rng = np.random.default_rng(3)
        np.random.seed(3)
        gt = boxes(rng, 3)
        pts = np.concatenate([
            gt[:, None, :3] + rng.uniform(-0.5, 0.5, (3, 200, 3)),
        ]).reshape(-1, 3)
        pts = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        n0 = len(pts)
        _, pts2, _ = au.local_pyramid_dropout(gt, pts, dropout_prob=1.0)
        assert len(pts2) < n0

    def test_sparsify_caps_points(self):
        rng = np.random.default_rng(4)
        np.random.seed(4)
        gt = boxes(rng, 2)
        pts = gt[:, None, :3] + rng.uniform(-0.4, 0.4, (2, 500, 3))
        pts = pts.reshape(-1, 3)
        pts = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        _, pts2, _ = au.local_pyramid_sparsify(gt, pts, prob=1.0,
                                               max_num_pts=20)
        assert len(pts2) < len(pts)


class TestStVD:
    def _dataset(self):
        ds = DatasetTemplate.__new__(DatasetTemplate)
        return ds

    def test_input_point_discard_rate(self):
        ds = self._dataset()
        rng = np.random.default_rng(5)
        np.random.seed(5)
        pts = np.zeros((10000, 8), np.float32)
        pts[:, 0] = rng.uniform(0, 60, 10000)
        out = ds.input_point_discard(pts.copy(), bin_num=10, rate=0.8)
        # roughly the retain rate survives (bin quantization tolerance)
        assert 0.1 * len(pts) < len(out) < 0.45 * len(pts)

    def test_distant_points_kept(self):
        ds = self._dataset()
        np.random.seed(6)
        rng = np.random.default_rng(6)
        pts = np.zeros((5000, 8), np.float32)
        pts[:4900, 0] = rng.uniform(0, 20, 4900)     # dense near field
        pts[4900:, 0] = rng.uniform(55, 60, 100)     # sparse far field
        out = ds.input_point_discard(pts.copy(), bin_num=10, rate=0.8)
        far = out[out[:, 0] > 55]
        assert len(far) == 100   # far bin untouched


class TestDASampler:
    def test_la_sampling_thins(self):
        from virconv_tpu.datasets.augmentor.database_sampler import \
            DADataBaseSampler
        rng = np.random.default_rng(7)
        pts = np.zeros((2000, 8), np.float32)
        pts[:, 0] = rng.uniform(10, 12, 2000)
        pts[:, 1] = rng.uniform(-1, 1, 2000)
        pts[:, 2] = rng.uniform(-1, 1, 2000)
        out = DADataBaseSampler.la_sampling(pts)
        assert 5 <= len(out) < len(pts)
