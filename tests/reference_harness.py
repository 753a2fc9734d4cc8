"""Load reference host-pipeline code for golden-parity tests.

The reference's StVD discard, WBF, and KITTI AP metric are pure
numpy/numba host code (SURVEY.md §2 #2, #29, #41). This harness executes
that code in-process — numba stubbed to plain python, the numba.cuda
rotated-IoU kernel substituted with our exact C++/numpy rotated overlap
(itself unit-tested against a polygon oracle in test_boxes.py) — so tests
can assert the rebuild matches the reference implementation bit-for-bit
on the logic that differs: binning, clustering rules, PR/AP computation.

Reference files used (read-only):
  * pcdet/datasets/dataset.py:120-189          (partition / input_point_discard)
  * pcdet/models/model_utils/model_nms_utils.py:5-123  (limit / compute_WBF)
  * pcdet/datasets/kitti/kitti_object_eval_python/eval.py (full AP metric)
"""

from __future__ import annotations

import ast
import sys
import types
from pathlib import Path

import numpy as np

REF = Path('/root/reference')


# --------------------------------------------------------------- numba stub
def _identity_decorator(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def wrap(fn):
        return fn
    return wrap


def numba_stub():
    """A numba module whose jit decorators run the plain-python body."""
    mod = types.ModuleType('numba')
    mod.jit = _identity_decorator
    mod.njit = _identity_decorator
    mod.prange = range
    mod.errors = types.ModuleType('numba.errors')

    class _Warn(Warning):
        pass
    mod.errors.NumbaDeprecationWarning = _Warn
    mod.errors.NumbaWarning = _Warn
    cuda = types.ModuleType('numba.cuda')
    cuda.jit = _identity_decorator
    mod.cuda = cuda
    return mod


def install_numba_stub():
    if 'numba' not in sys.modules:
        stub = numba_stub()
        sys.modules['numba'] = stub
        sys.modules['numba.cuda'] = stub.cuda
        sys.modules['numba.errors'] = stub.errors


# ------------------------------------------------------------ AST extraction
def extract_functions(path, names, class_name=None, ns=None):
    """Compile selected top-level functions (or methods of ``class_name``)
    from a reference source file into ``ns`` without importing the module
    (its imports need CUDA extensions)."""
    tree = ast.parse(Path(path).read_text())
    ns = ns if ns is not None else {}
    ns.setdefault('np', np)

    def grab(body):
        for item in body:
            if isinstance(item, ast.FunctionDef) and item.name in names:
                mod = ast.Module(body=[item], type_ignores=[])
                exec(compile(mod, str(path), 'exec'), ns)

    grab(tree.body)
    if class_name is not None:
        for node in tree.body:
            if isinstance(node, ast.ClassDef) and node.name == class_name:
                grab(node.body)
    missing = [n for n in names if n not in ns]
    if missing:
        raise KeyError(f'{missing} not found in {path}')
    return ns


# ----------------------------------------------------------------- loaders
def load_reference_stvd():
    """Reference StVD: ``partition`` + ``input_point_discard`` bound to a
    dummy self (they use no instance state).

    Reference: pcdet/datasets/dataset.py:120-189."""
    ns = extract_functions(REF / 'pcdet/datasets/dataset.py',
                           ['partition', 'input_point_discard'],
                           class_name='DatasetTemplate')
    host = types.SimpleNamespace()
    host.partition = types.MethodType(ns['partition'], host)
    host.input_point_discard = types.MethodType(ns['input_point_discard'],
                                                host)
    return host


def _bev_iou_substitute(boxes_a, boxes_b):
    """Rotated BEV IoU on lidar-frame (x, y, dx, dy, heading) 7-boxes via
    our exact overlap backend (stands in for iou3d_nms_cuda's CPU IoU)."""
    from virconv_tpu.ops import native as native_ops
    return native_ops.boxes_iou_bev(np.asarray(boxes_a, np.float64),
                                    np.asarray(boxes_b, np.float64))


def load_reference_wbf():
    """Reference ``compute_WBF`` with our exact BEV IoU injected in place
    of ``iou3d_nms_utils.boxes_bev_iou_cpu``.

    Reference: pcdet/models/model_utils/model_nms_utils.py:5-123."""
    ns = {'iou3d_nms_utils':
          types.SimpleNamespace(boxes_bev_iou_cpu=_bev_iou_substitute)}
    extract_functions(REF / 'pcdet/models/model_utils/model_nms_utils.py',
                      ['limit', 'compute_WBF'], ns=ns)
    return ns['compute_WBF']


def _rotate_iou_gpu_eval_substitute(boxes, qboxes, criterion=-1):
    """Drop-in for the reference numba.cuda ``rotate_iou_gpu_eval``:
    camera-plane (x, z, l, w, ry) rotated overlap with the reference's
    criterion codes (-1 IoU, 0 /area_a, 1 /area_b, >=2 raw intersection).

    Reference: pcdet/.../rotate_iou.py:17-232 (devRotateIoUEval)."""
    from virconv_tpu.ops import native as native_ops
    boxes = np.asarray(boxes, np.float64)
    qboxes = np.asarray(qboxes, np.float64)

    def pack7(b5):
        b7 = np.zeros((len(b5), 7))
        b7[:, [0, 1]] = b5[:, [0, 1]]
        b7[:, [3, 4]] = b5[:, [2, 3]]
        b7[:, 5] = 1.0
        b7[:, 6] = -b5[:, 4]
        return b7

    inter = native_ops.boxes_overlap_bev(pack7(boxes), pack7(qboxes))
    area_a = (boxes[:, 2] * boxes[:, 3])[:, None]
    area_b = (qboxes[:, 2] * qboxes[:, 3])[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = area_a * np.ones_like(area_b)
    elif criterion == 1:
        denom = np.ones_like(area_a) * area_b
    else:
        return inter.astype(np.float32)
    return (inter / np.clip(denom, 1e-9, None)).astype(np.float32)


def load_reference_kitti_eval():
    """Execute the full reference KITTI eval module (plain-python numba)
    and return its namespace (``get_official_eval_result`` etc.).

    Reference: pcdet/datasets/kitti/kitti_object_eval_python/eval.py."""
    install_numba_stub()
    path = REF / 'pcdet/datasets/kitti/kitti_object_eval_python/eval.py'
    src = path.read_text()
    src = src.replace('from .rotate_iou import rotate_iou_gpu_eval', '')
    ns = {'rotate_iou_gpu_eval': _rotate_iou_gpu_eval_substitute,
          '__name__': 'reference_kitti_eval'}
    exec(compile(src, str(path), 'exec'), ns)
    return types.SimpleNamespace(**ns)
