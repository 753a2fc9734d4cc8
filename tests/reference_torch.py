"""Import reference *torch* modules on CPU for detector-trunk golden parity.

The PENet parity recipe (tests/test_penet_import.py) proved the method:
run the actual reference torch module on CPU, import its weights through
``virconv_tpu.utils.torch_import``, push identical inputs through both, and
assert numeric equality. This harness extends the recipe to the detector
trunk — the reference's BaseBEVBackbone, AnchorHeadSingle (forward + target
assign + loss), CrossAttention, ResidualCoder and the rcnn losses are pure
torch (``/root/reference/pcdet/models/backbones_2d/base_bev_backbone.py``,
``.../dense_heads/anchor_head_single.py`` + ``anchor_head_template.py``,
``.../roi_heads/ted_head.py:34-80``, ``.../utils/box_coder_utils.py:5-79``,
``loss_utils.py``, ``bbloss.py:30-48``); only their *imports* drag in CUDA
extensions, cv2 and numba — all stubbed here, the same way
``reference_harness`` stubs numba for the host-pipeline parity tests.

Nothing from the reference is vendored: modules are imported (or
AST-extracted) from the read-only checkout at test time.
"""

from __future__ import annotations

import ast
import sys
import types
from pathlib import Path

import numpy as np

REF = Path('/root/reference')

_installed = False


def _raising_ext(name: str) -> types.ModuleType:
    """A module stub whose attributes raise if actually *called* (letting
    `from . import x` succeed while catching real CUDA usage)."""
    mod = types.ModuleType(name)

    def __getattr__(attr):                             # noqa: N807
        def fail(*a, **k):
            raise RuntimeError(
                f'{name}.{attr} is a CUDA extension; the CPU parity tests '
                f'must not reach it')
        return fail
    mod.__getattr__ = __getattr__
    return mod


# packages registered WITHOUT running their __init__.py — the real ones
# import spconv / CUDA-extension modules transitively (e.g.
# pcdet/models/__init__.py -> detectors -> spconv_utils -> spconv).
# __path__ points at the real directory so `import pcdet.a.b.c` still
# loads c.py (and c's relative imports) from the read-only checkout.
_FAKE_PKGS = (
    'pcdet', 'pcdet.models', 'pcdet.models.backbones_2d',
    'pcdet.models.dense_heads', 'pcdet.models.dense_heads.target_assigner',
    'pcdet.models.roi_heads', 'pcdet.models.roi_heads.target_assigner',
    'pcdet.models.model_utils',
    'pcdet.utils', 'pcdet.ops', 'pcdet.ops.iou3d_nms',
    'pcdet.ops.roiaware_pool3d',
)


def install():
    """Make `import pcdet.<torch module>` work on CPU in this process."""
    global _installed
    if _installed:
        return
    import torch
    from reference_harness import install_numba_stub
    install_numba_stub()

    sys.modules.setdefault('cv2', types.ModuleType('cv2'))
    for name in _FAKE_PKGS:
        if name in sys.modules:
            continue
        pkg = types.ModuleType(name)
        pkg.__path__ = [str(REF / name.replace('.', '/'))]
        pkg.__package__ = name
        sys.modules[name] = pkg
    for ext in ('pcdet.ops.iou3d_nms.iou3d_nms_cuda',
                'pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda',
                'pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda'):
        sys.modules.setdefault(ext, _raising_ext(ext))

    # the reference hard-codes .cuda() in module __init__/forward
    # (anchor_head_template.py:38, anchor_head_single.py:111); neutralize
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    _installed = True


def import_ref(module: str):
    """Import a reference pcdet module (CPU-stubbed)."""
    install()
    import importlib
    return importlib.import_module(module)


# ------------------------------------------------------------ AST classes
def extract_classes(path, names, ns=None, extra_names=()):
    """Compile selected top-level classes (plus ``extra_names`` top-level
    functions) from a reference source file into ``ns`` without importing
    the module (whose imports need CUDA extensions)."""
    install()
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    tree = ast.parse(Path(path).read_text())
    ns = ns if ns is not None else {}
    ns.setdefault('np', np)
    ns.setdefault('math', __import__('math'))
    ns.setdefault('torch', torch)
    ns.setdefault('nn', nn)
    ns.setdefault('F', F)
    ns.setdefault('Function', torch.autograd.Function)
    ns.setdefault('Variable', torch.autograd.Variable)
    from scipy.spatial import ConvexHull
    ns.setdefault('ConvexHull', ConvexHull)
    wanted = set(names) | set(extra_names)
    for item in tree.body:
        if isinstance(item, (ast.ClassDef, ast.FunctionDef)) \
                and item.name in wanted:
            mod = ast.Module(body=[item], type_ignores=[])
            exec(compile(mod, str(path), 'exec'), ns)
    missing = [n for n in wanted if n not in ns]
    if missing:
        raise KeyError(f'{missing} not found in {path}')
    return ns


# --------------------------------------------------------------- helpers
def randomize_bn_stats(module, rng):
    """Give every BatchNorm nontrivial running stats + affine params so
    eval-mode parity actually exercises the folded-BN path."""
    import torch
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                c = m.num_features
                m.running_mean.copy_(torch.from_numpy(
                    rng.standard_normal(c).astype(np.float32) * 0.5))
                m.running_var.copy_(torch.from_numpy(
                    (0.5 + rng.uniform(0.2, 2.0, c)).astype(np.float32)))
                m.weight.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, c).astype(np.float32)))
                m.bias.copy_(torch.from_numpy(
                    rng.standard_normal(c).astype(np.float32) * 0.1))


def randomize_params(module, rng, scale=0.1):
    """Fill all conv/linear weights with nontrivial random values."""
    import torch
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.from_numpy(
                (rng.standard_normal(tuple(p.shape)) * scale)
                .astype(np.float32)))
