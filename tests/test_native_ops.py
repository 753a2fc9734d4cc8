"""Native C++ box ops vs numpy reference (lockstep check)."""
import numpy as np
import pytest

from virconv_tpu.ops import boxes_np, native


@pytest.fixture(scope='module', autouse=True)
def need_native():
    if not native.available():
        pytest.skip('native ops unavailable (no compiler?)')


def random_boxes(rng, n, span=20.0):
    b = np.zeros((n, 7), np.float32)
    b[:, 0:2] = rng.uniform(-span / 2, span / 2, (n, 2))
    b[:, 2] = rng.uniform(-1, 1, n)
    b[:, 3:5] = rng.uniform(1.0, 4.5, (n, 2))
    b[:, 5] = rng.uniform(1.0, 2.5, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_overlap_iou_match_numpy():
    rng = np.random.default_rng(0)
    a, b = random_boxes(rng, 30), random_boxes(rng, 25)
    np.testing.assert_allclose(native.boxes_overlap_bev(a, b),
                               boxes_np.boxes_overlap_bev(a, b), atol=1e-4)
    np.testing.assert_allclose(native.boxes_iou_bev(a, b),
                               boxes_np.boxes_iou_bev(a, b), atol=1e-4)
    np.testing.assert_allclose(native.boxes_iou3d(a, b),
                               boxes_np.boxes_iou3d(a, b), atol=1e-4)


def test_nms_matches_numpy():
    rng = np.random.default_rng(1)
    boxes = random_boxes(rng, 200, span=40.0)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    got = native.nms_bev(boxes, scores, 0.5, post_max=100)
    want = boxes_np.nms_bev(boxes, scores, 0.5, post_max=100)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_points_in_boxes_matches_numpy():
    rng = np.random.default_rng(2)
    boxes = random_boxes(rng, 10)
    pts = rng.uniform(-12, 12, (500, 3)).astype(np.float32)
    got = native.points_in_boxes(pts, boxes)
    want = boxes_np.points_in_boxes(pts, boxes)
    np.testing.assert_array_equal(got, want)


def test_speedup_sanity():
    import time
    rng = np.random.default_rng(3)
    a, b = random_boxes(rng, 300), random_boxes(rng, 300)
    t0 = time.perf_counter()
    native.boxes_iou_bev(a, b)
    t_native = time.perf_counter() - t0
    assert t_native < 2.0   # 90k pairs well under 2s
