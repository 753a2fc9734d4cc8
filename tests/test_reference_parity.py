"""Golden parity vs the reference host pipeline (VERDICT item 5).

The reference's StVD input discard, WBF, and the official KITTI AP metric
are host-side numpy/numba code; ``reference_harness`` executes the actual
reference sources in-process (numba stubbed to plain python, the
numba.cuda rotated IoU replaced by our exact overlap backend, which
test_boxes.py proves against an independent oracle). These tests assert
the rebuild's implementations reproduce the reference bit-for-bit on the
logic itself: binning and RNG order, clustering/retain-low rules,
difficulty filtering + 41-point PR + R40 AP.
"""

import numpy as np
import pytest

from reference_harness import (load_reference_kitti_eval,
                               load_reference_stvd, load_reference_wbf)

from virconv_tpu.datasets.dataset import DatasetTemplate
from virconv_tpu.datasets.kitti import eval as our_eval
from virconv_tpu.ops import wbf as our_wbf


# ------------------------------------------------------------------- StVD --
def _stvd_points(rng, n):
    pts = np.zeros((n, 8), np.float32)
    pts[:, 0] = rng.uniform(0.0, 70.0, n)       # x: drives the binning
    pts[:, 1] = rng.uniform(-40.0, 40.0, n)
    pts[:, 2] = rng.uniform(-3.0, 1.0, n)
    pts[:, 3:] = rng.standard_normal((n, 5)).astype(np.float32)
    return pts


class _OurStvdHost:
    partition = staticmethod(DatasetTemplate.partition)
    input_point_discard = DatasetTemplate.input_point_discard


@pytest.mark.parametrize('bin_num,rate,seed', [
    (2, 0.8, 0),     # train-time discard (VirConv-T DATA_CONFIG)
    (10, 0.9, 1),    # test-time discard
    (10, 0.8, 2),
])
def test_stvd_input_discard_matches_reference(bin_num, rate, seed):
    rng = np.random.default_rng(seed)
    pts = _stvd_points(rng, 4000)

    ref = load_reference_stvd()
    np.random.seed(123 + seed)
    want = ref.input_point_discard(pts.copy(), bin_num=bin_num, rate=rate)

    np.random.seed(123 + seed)
    got = _OurStvdHost().input_point_discard(pts.copy(), bin_num=bin_num,
                                             rate=rate)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_stvd_partition_matches_reference():
    rng = np.random.default_rng(7)
    pts = _stvd_points(rng, 1500)
    ref = load_reference_stvd()
    ref_parts, ref_pos, ref_acc = ref.partition(pts, num=10, rate=0.2)
    our_parts, our_pos, our_acc = _OurStvdHost.partition(pts, num=10,
                                                         rate=0.2)
    assert (our_pos, our_acc) == (ref_pos, ref_acc)
    assert len(our_parts) == len(ref_parts)
    for a, b in zip(our_parts, ref_parts):
        np.testing.assert_array_equal(a, b)


# -------------------------------------------------------------------- WBF --
def _wbf_dets(rng, n_clusters=6, max_dups=4):
    boxes, scores, names = [], [], []
    for c in range(n_clusters):
        center = rng.uniform([0, -30, -1.5], [60, 30, 0.5])
        dims = rng.uniform([3.2, 1.4, 1.3], [4.6, 1.9, 1.8])
        ang = rng.uniform(-np.pi, np.pi)
        for _ in range(rng.integers(1, max_dups + 1)):
            jitter = rng.normal(0, 0.05, 3)
            djit = rng.normal(0, 0.02, 3)
            ajit = rng.normal(0, 0.03)
            boxes.append(np.concatenate(
                [center + jitter, dims + djit, [ang + ajit]]))
            scores.append(rng.uniform(0.05, 1.0))
            names.append(['Car', 'Pedestrian', 'Cyclist'][c % 3])
    # a couple of mid-IoU stragglers to exercise the retain-low branches
    for c in range(2):
        base = np.asarray(boxes[c * 2])
        shifted = base.copy()
        shifted[0] += 1.8
        boxes.append(shifted)
        scores.append(rng.uniform(0.3, 0.9))
        names.append('Car')
    return (np.array(names), np.array(scores, np.float32),
            np.array(boxes, np.float32))


@pytest.mark.parametrize('retain_low,seed', [(False, 0), (True, 1),
                                             (True, 2), (False, 3)])
def test_wbf_matches_reference(retain_low, seed):
    rng = np.random.default_rng(seed)
    names, scores, boxes = _wbf_dets(rng)
    ref_wbf = load_reference_wbf()
    wn, ws, wb = ref_wbf(names.copy(), scores.copy(),
                         boxes.copy().astype(np.float64),
                         retain_low=retain_low)
    gn, gs, gb = our_wbf.compute_wbf(names.copy(), scores.copy(),
                                     boxes.copy(), retain_low=retain_low)
    assert list(gn) == list(wn)
    np.testing.assert_allclose(np.asarray(gs, np.float64),
                               np.asarray(ws, np.float64), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb, np.float64),
                               np.asarray(wb, np.float64), atol=1e-6)


# ------------------------------------------------------------- KITTI AP ----
def _synth_annos(rng, n_images=6):
    """Plausible KITTI annos: gt plus detections with jitter, misses, and
    false positives, spanning all three difficulties — including the
    metric's ignore branches: 'Van' gt (neighbor class of Car),
    'Person_sitting' gt (neighbor of Pedestrian), 'DontCare' regions
    (image-plane dc-overlap suppression of detections), and an empty image
    (reference eval.py clean_data semantics)."""
    gt_annos, dt_annos = [], []
    for img in range(n_images):
        n_gt = 0 if img == n_images - 1 else int(rng.integers(3, 8))
        name, trunc, occl, alpha, bbox = [], [], [], [], []
        dims, loc, rot = [], [], []
        for g in range(n_gt):
            cls = ['Car', 'Car', 'Car', 'Pedestrian', 'Cyclist', 'Van',
                   'Person_sitting'][int(rng.integers(0, 7))]
            z = float(rng.uniform(5, 55))
            x = float(rng.uniform(-0.4, 0.4)) * z
            y = float(rng.uniform(1.3, 1.8))
            if cls == 'Car':
                d = [float(rng.uniform(3.4, 4.5)),
                     float(rng.uniform(1.4, 1.8)),
                     float(rng.uniform(1.5, 1.8))]
            else:
                d = [float(rng.uniform(0.5, 1.8)),
                     float(rng.uniform(1.5, 1.9)),
                     float(rng.uniform(0.4, 0.8))]
            ry = float(rng.uniform(-np.pi, np.pi))
            h2d = float(np.clip(900.0 / z, 18, 180))
            u = float(rng.uniform(100, 1100))
            v = float(rng.uniform(150, 300))
            name.append(cls)
            trunc.append(float(rng.uniform(0, 0.4)))
            occl.append(int(rng.integers(0, 3)))
            alpha.append(float(rng.uniform(-np.pi, np.pi)))
            bbox.append([u, v, u + h2d * 1.2, v + h2d])
            dims.append(d)
            loc.append([x, y, z])
            rot.append(ry)
        # DontCare regions: image-plane boxes with the KITTI placeholder
        # 3D fields; detections overlapping them by >= 0.5 (image criterion)
        # are neither TP nor FP (reference eval.py clean_data dc handling)
        for _ in range(int(rng.integers(0, 3)) if n_gt else 0):
            u = float(rng.uniform(100, 1100))
            v = float(rng.uniform(150, 300))
            wdt, hgt = float(rng.uniform(40, 160)), float(rng.uniform(25, 90))
            name.append('DontCare')
            trunc.append(-1.0)
            occl.append(-1)
            alpha.append(-10.0)
            bbox.append([u, v, u + wdt, v + hgt])
            dims.append([-1.0, -1.0, -1.0])
            loc.append([-1000.0, -1000.0, -1000.0])
            rot.append(-10.0)
        gt = {'name': np.array(name), 'truncated': np.array(trunc),
              'occluded': np.array(occl), 'alpha': np.array(alpha),
              'bbox': np.array(bbox, np.float64).reshape(-1, 4),
              'dimensions': np.array(dims, np.float64).reshape(-1, 3),
              'location': np.array(loc, np.float64).reshape(-1, 3),
              'rotation_y': np.array(rot, np.float64)}
        gt_annos.append(gt)
        n_dc = sum(1 for n in name if n == 'DontCare')
        n_gt_all = len(name)

        # detections: jittered gt (some dropped) + false positives
        dn, da, db, dd, dl, dr, ds = [], [], [], [], [], [], []
        for g in range(n_gt):
            if rng.uniform() < 0.15:
                continue
            dn.append(name[g])
            da.append(alpha[g] + float(rng.normal(0, 0.05)))
            db.append(list(np.asarray(bbox[g]) + rng.normal(0, 2.0, 4)))
            dd.append(list(np.asarray(dims[g]) + rng.normal(0, 0.03, 3)))
            dl.append(list(np.asarray(loc[g]) + rng.normal(0, 0.08, 3)))
            dr.append(rot[g] + float(rng.normal(0, 0.03)))
            ds.append(float(rng.uniform(0.3, 1.0)))
        for _ in range(int(rng.integers(0, 3))):
            z = float(rng.uniform(5, 50))
            dn.append('Car')
            da.append(float(rng.uniform(-np.pi, np.pi)))
            u, v = float(rng.uniform(100, 1100)), float(rng.uniform(150, 300))
            db.append([u, v, u + 60, v + 45])
            dd.append([4.0, 1.6, 1.7])
            dl.append([float(rng.uniform(-15, 15)), 1.6, z])
            dr.append(float(rng.uniform(-np.pi, np.pi)))
            ds.append(float(rng.uniform(0.05, 0.6)))
        # detections inside DontCare regions (dc-overlap branch: these must
        # be excluded from the FP count by both implementations)
        for dc in range(n_gt, n_gt_all):
            if rng.uniform() < 0.3:
                continue
            u0, v0, u1, v1 = bbox[dc]
            dn.append('Car' if rng.uniform() < 0.7 else 'Pedestrian')
            da.append(float(rng.uniform(-np.pi, np.pi)))
            db.append([u0 + 1, v0 + 1, u1 - 1, v1 - 1])
            dd.append([4.0, 1.6, 1.7])
            dl.append([float(rng.uniform(-15, 15)), 1.6,
                       float(rng.uniform(5, 50))])
            dr.append(float(rng.uniform(-np.pi, np.pi)))
            ds.append(float(rng.uniform(0.05, 0.9)))
        dt = {'name': np.array(dn), 'alpha': np.array(da),
              'bbox': np.array(db, np.float64).reshape(-1, 4),
              'dimensions': np.array(dd, np.float64).reshape(-1, 3),
              'location': np.array(dl, np.float64).reshape(-1, 3),
              'rotation_y': np.array(dr, np.float64),
              'score': np.array(ds, np.float64),
              'truncated': np.full(len(dn), -1.0),
              'occluded': np.full(len(dn), -1)}
        dt_annos.append(dt)
    return gt_annos, dt_annos


def test_kitti_ap_matches_reference_metric():
    rng = np.random.default_rng(0)
    gt_annos, dt_annos = _synth_annos(rng, n_images=6)
    ref = load_reference_kitti_eval()
    _, ref_dict = ref.get_official_eval_result(
        [dict(a) for a in gt_annos], [dict(a) for a in dt_annos],
        ['Car', 'Pedestrian', 'Cyclist'])
    _, our_dict = our_eval.get_official_eval_result(
        [dict(a) for a in gt_annos], [dict(a) for a in dt_annos],
        ['Car', 'Pedestrian', 'Cyclist'])
    shared = sorted(set(ref_dict) & set(our_dict))
    # every R40 AP key we emit must exist in, and match, the reference
    r40 = [k for k in our_dict if k.endswith('_R40')]
    assert set(r40) <= set(ref_dict)
    for key in sorted(r40):
        assert np.isclose(our_dict[key], ref_dict[key], atol=1e-9), \
            (key, our_dict[key], ref_dict[key])
    assert shared, 'no overlapping metric keys to compare'
