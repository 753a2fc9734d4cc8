"""KITTI eval metric + WBF sanity tests on synthetic annotations."""
import numpy as np

from virconv_tpu.datasets.kitti.eval import get_official_eval_result
from virconv_tpu.ops.wbf import compute_wbf


def make_anno(boxes_cam, names, scores=None, heights=50.0):
    n = len(names)
    bbox = np.zeros((n, 4))
    bbox[:, 2] = 100
    bbox[:, 3] = heights
    anno = {
        'name': np.asarray(names),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n),
        'alpha': np.zeros(n),
        'bbox': bbox,
        'dimensions': boxes_cam[:, 3:6].reshape(-1, 3),
        'location': boxes_cam[:, 0:3].reshape(-1, 3),
        'rotation_y': boxes_cam[:, 6],
    }
    if scores is not None:
        anno['score'] = np.asarray(scores, np.float64)
    else:
        anno['score'] = -np.ones(n)
    return anno


def random_cam_boxes(rng, n):
    out = np.zeros((n, 7))
    out[:, 0] = rng.uniform(-20, 20, n)       # x
    out[:, 1] = rng.uniform(0.5, 2.0, n)      # y (bottom)
    out[:, 2] = rng.uniform(5, 60, n)         # z
    out[:, 3] = rng.uniform(3.5, 4.5, n)      # l
    out[:, 4] = rng.uniform(1.4, 1.8, n)      # h
    out[:, 5] = rng.uniform(1.5, 1.8, n)      # w
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


class TestKittiEval:
    def test_perfect_predictions_score_100(self):
        rng = np.random.default_rng(0)
        gt_annos, dt_annos = [], []
        for _ in range(20):
            boxes = random_cam_boxes(rng, 8)
            # keep boxes far apart to avoid accidental overlap
            boxes[:, 0] = np.arange(8) * 12 - 45
            names = ['Car'] * 8
            gt_annos.append(make_anno(boxes, names))
            dt_annos.append(make_anno(boxes, names,
                                      scores=rng.uniform(0.5, 1, 8)))
        result, ret = get_official_eval_result(gt_annos, dt_annos, ['Car'])
        assert ret['Car_3d/easy_R40'] > 99.0, result
        assert ret['Car_3d/moderate_R40'] > 99.0
        assert ret['Car_bev/hard_R40'] > 99.0

    def test_no_predictions_score_0(self):
        rng = np.random.default_rng(1)
        gt_annos, dt_annos = [], []
        for _ in range(4):
            boxes = random_cam_boxes(rng, 3)
            gt_annos.append(make_anno(boxes, ['Car'] * 3))
            dt_annos.append(make_anno(np.zeros((0, 7)), []))
        _, ret = get_official_eval_result(gt_annos, dt_annos, ['Car'])
        assert ret['Car_3d/easy_R40'] == 0.0

    def test_half_predictions(self):
        rng = np.random.default_rng(2)
        gt_annos, dt_annos = [], []
        for _ in range(8):
            boxes = random_cam_boxes(rng, 4)
            boxes[:, 0] = np.arange(4) * 15 - 20
            gt_annos.append(make_anno(boxes, ['Car'] * 4))
            dt_annos.append(make_anno(boxes[:2], ['Car'] * 2,
                                      scores=[0.9, 0.8]))
        _, ret = get_official_eval_result(gt_annos, dt_annos, ['Car'])
        ap = ret['Car_3d/easy_R40']
        assert 30.0 < ap < 60.0, ap   # recall caps at 0.5


class TestWBF:
    def test_clusters_merge_to_mean(self):
        base = np.array([10.0, 5.0, -1.0, 4.0, 1.6, 1.5, 0.3])
        jitter = base + np.array([0.05, -0.05, 0.01, 0.02, 0, 0, 0.01])
        far = np.array([40.0, -5.0, -1.0, 4.0, 1.6, 1.5, -1.0])
        boxes = np.stack([base, jitter, far])
        scores = np.array([0.9, 0.85, 0.7])
        names = np.array([1, 1, 1])
        out_names, out_scores, out_boxes = compute_wbf(
            names, scores, boxes, iou_thresh=0.6)
        assert len(out_boxes) == 2
        merged = out_boxes[np.argmax(out_scores)]
        np.testing.assert_allclose(merged[:3], (base[:3] + jitter[:3]) / 2,
                                   atol=1e-6)
        assert np.max(out_scores) == 0.9

    def test_empty(self):
        n, s, b = compute_wbf(np.zeros(0), np.zeros(0), np.zeros((0, 7)))
        assert len(b) == 0

    def test_retain_low_keeps_mid_iou_high_score(self):
        base = np.array([10.0, 5.0, -1.0, 4.0, 1.6, 1.5, 0.0])
        shifted = base.copy()
        shifted[0] += 2.2    # mid IoU with base
        boxes = np.stack([base, shifted])
        scores = np.array([0.9, 0.8])
        names = np.array([1, 1])
        _, s_lo, b_lo = compute_wbf(names, scores, boxes, iou_thresh=0.85,
                                    retain_low=True, score_thresh=0.4)
        # the shifted box survives at score_thresh
        assert len(b_lo) == 2
        assert np.isclose(sorted(s_lo)[0], 0.4)
