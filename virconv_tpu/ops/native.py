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
    if not so.exists():
        try:
            if not build():
                return None
        except Exception:
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


if __name__ == '__main__':
    import sys
    if '--build' in sys.argv:
        ok = build(verbose=True)
        print('native ops built' if ok else 'build FAILED')
