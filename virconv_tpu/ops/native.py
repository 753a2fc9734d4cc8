"""ctypes bindings for the native host box ops (csrc/box_ops.cpp).

Builds on demand with the repo Makefile; every entry point has a numpy
fallback (``virconv_tpu.ops.boxes_np``), so the framework works without a
compiler. When available, the native kernels accelerate the host-side hot
paths: gt-sampler collision tests, WBF clustering, and the KITTI eval IoU.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False
_CSRC = Path(__file__).resolve().parent.parent.parent / 'csrc'


def build(verbose=False):
    res = subprocess.run(['make', '-C', str(_CSRC)], capture_output=True,
                         text=True)
    if verbose or res.returncode != 0:
        print(res.stdout, res.stderr)
    return res.returncode == 0


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _CSRC / 'libbox_ops.so'
    src = _CSRC / 'box_ops.cpp'
    stale = (so.exists() and src.exists()
             and src.stat().st_mtime > so.stat().st_mtime)
    if not so.exists() or stale:
        try:
            if not build() and not so.exists():
                import sys
                print('[virconv_tpu.ops.native] libbox_ops.so build FAILED; '
                      'host IoU/eval fall back to the slow numpy path. '
                      'Remedy: make -C csrc (needs g++).', file=sys.stderr)
                return None
        except Exception:
            if not so.exists():
                return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    f64p = np.ctypeslib.ndpointer(np.float64, flags='C_CONTIGUOUS')
    i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    for name in ('boxes_overlap_bev', 'boxes_iou_bev', 'boxes_iou3d'):
        fn = getattr(lib, name)
        fn.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, f64p]
        fn.restype = None
    lib.nms_bev.argtypes = [f32p, f32p, ctypes.c_int64, ctypes.c_double,
                            ctypes.c_int64, i64p]
    lib.nms_bev.restype = ctypes.c_int64
    lib.points_in_boxes.argtypes = [f32p, ctypes.c_int64, f32p,
                                    ctypes.c_int64, i32p]
    lib.points_in_boxes.restype = None
    lib.kitti_compute_statistics.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p, f64p, i64p, i64p,
        f64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_double,
        ctypes.c_double, ctypes.c_int32, ctypes.c_int32, f64p, f64p]
    lib.kitti_compute_statistics.restype = ctypes.c_int64
    lib.kitti_eval_image_pr.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64, f64p, f64p, f64p, i64p, i64p,
        f64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_double, f64p,
        ctypes.c_int64, ctypes.c_int32, f64p]
    lib.kitti_eval_image_pr.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _pair_call(name, boxes_a, boxes_b):
    lib = _load()
    a = np.ascontiguousarray(boxes_a[:, :7], np.float32)
    b = np.ascontiguousarray(boxes_b[:, :7], np.float32)
    out = np.empty((len(a), len(b)), np.float64)
    getattr(lib, name)(a, len(a), b, len(b), out)
    return out


def boxes_overlap_bev(boxes_a, boxes_b):
    if _load() is None:
        from . import boxes_np
        return boxes_np.boxes_overlap_bev(boxes_a, boxes_b)
    return _pair_call('boxes_overlap_bev', boxes_a, boxes_b)


def boxes_iou_bev(boxes_a, boxes_b):
    if _load() is None:
        from . import boxes_np
        return boxes_np.boxes_iou_bev(boxes_a, boxes_b)
    return _pair_call('boxes_iou_bev', boxes_a, boxes_b)


def boxes_iou3d(boxes_a, boxes_b):
    if _load() is None:
        from . import boxes_np
        return boxes_np.boxes_iou3d(boxes_a, boxes_b)
    return _pair_call('boxes_iou3d', boxes_a, boxes_b)


def nms_bev(boxes, scores, thresh, pre_max=None, post_max=None):
    if _load() is None:
        from . import boxes_np
        return boxes_np.nms_bev(boxes, scores, thresh, pre_max, post_max)
    order = np.argsort(-scores)
    if pre_max is not None:
        order = order[:pre_max]
    b = np.ascontiguousarray(boxes[order][:, :7], np.float32)
    s = np.ascontiguousarray(scores[order], np.float32)
    keep = np.empty(len(b), np.int64)
    post = post_max if post_max is not None else len(b)
    cnt = _LIB.nms_bev(b, s, len(b), float(thresh), post, keep)
    return order[keep[:cnt]]


def points_in_boxes(points, boxes):
    if _load() is None:
        from . import boxes_np
        return boxes_np.points_in_boxes(points, boxes)
    p = np.ascontiguousarray(points[:, :3], np.float32)
    b = np.ascontiguousarray(boxes[:, :7], np.float32)
    out = np.empty(len(p), np.int32)
    _LIB.points_in_boxes(p, len(p), b, len(b), out)
    return out


def kitti_eval_image_pr(overlaps, dt_scores, dt_alphas, gt_alphas,
                        ignored_gt, ignored_det, dt_dc_overlap, metric,
                        min_overlap, thresholds, compute_aos, pr):
    """Accumulate the (n_thresh, 4) PR matrix for one image in one native
    call. All array args must already be contiguous float64/int64."""
    lib = _load()
    det_size, gt_size = overlaps.shape
    dc = dt_dc_overlap if dt_dc_overlap is not None \
        else np.zeros((det_size, 0), np.float64)
    lib.kitti_eval_image_pr(
        overlaps, det_size, gt_size, dt_scores, dt_alphas, gt_alphas,
        ignored_gt, ignored_det, dc, dc.shape[1], int(metric),
        float(min_overlap), thresholds, len(thresholds), int(compute_aos),
        pr)


def kitti_compute_statistics(overlaps, dt_scores, dt_alphas, gt_alphas,
                             ignored_gt, ignored_det, dt_dc_overlap, metric,
                             min_overlap, thresh, compute_fp, compute_aos):
    """Native fast path of the KITTI eval matching loop. Returns
    (tp, fp, fn, similarity, thresholds). None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    det_size, gt_size = overlaps.shape
    out = np.zeros(4, np.float64)
    thresholds = np.zeros(max(gt_size, 1), np.float64)
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    dc = np.ascontiguousarray(dt_dc_overlap, np.float64) \
        if dt_dc_overlap is not None and dt_dc_overlap.size \
        else np.zeros((det_size, 0), np.float64)
    n = lib.kitti_compute_statistics(
        overlaps, det_size, gt_size,
        np.ascontiguousarray(dt_scores, np.float64),
        np.ascontiguousarray(dt_alphas, np.float64),
        np.ascontiguousarray(gt_alphas, np.float64),
        np.ascontiguousarray(ignored_gt, np.int64),
        np.ascontiguousarray(ignored_det, np.int64),
        np.ascontiguousarray(dc), dc.shape[1], int(metric),
        float(min_overlap), float(thresh), int(compute_fp),
        int(compute_aos), out, thresholds)
    return (int(out[0]), int(out[1]), int(out[2]), float(out[3]),
            thresholds[:n])


if __name__ == '__main__':
    import sys
    if '--build' in sys.argv:
        ok = build(verbose=True)
        print('native ops built' if ok else 'build FAILED')
