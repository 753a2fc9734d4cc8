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


def _looks_spatial(dims) -> bool:
    """Kernel spatial dims in this net are always 1 or 3."""
    return all(d in (1, 3) for d in dims)


def spconv_kernel_to_gathered(w: np.ndarray) -> np.ndarray:
    """spconv weight -> (K, C_in, C_out).

    spconv2.x stores (out, kz, ky, kx, in); spconv1.x stores
    (kz, ky, kx, in, out). Detected by which slot holds the spatial dims
    (all in {1, 3}); when both match (channel counts that also look
    spatial), prefer spconv1.x — the layout official VirConv checkpoints
    ship in (``/root/reference/pcdet/models/detectors/
    detector3d_template.py:350-433`` converts 1.x -> 2.x on load).
    """
    if w.ndim != 5:
        raise ValueError(f'unexpected spconv kernel shape {w.shape}')
    is_v1 = _looks_spatial(w.shape[0:3])
    is_v2 = _looks_spatial(w.shape[1:4])
    if is_v1:   # prefer 1.x on ambiguity
        return spconv1_kernel_to_gathered(w)
    if is_v2:
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


def bev_input_perm(in_c: int, bev_channels: int = 64) -> np.ndarray:
    """In-channel permutation for the first BEV conv after import.

    Reference HeightCompression flattens (N, C, D, H, W) -> channel index
    c*D + d (``height_compression.py:31``); our ``bev.height_compression``
    produces (B, H, W, D*C) with index d*C + c. Returns ``perm`` such that
    ``ours_kernel[..., i, :] = ref_kernel[..., perm[i], :]``.
    """
    d = in_c // bev_channels
    if d * bev_channels != in_c:
        raise ValueError(f'BEV input {in_c} not divisible by '
                         f'{bev_channels} channels')
    idx = np.arange(in_c)
    dd, cc = idx // bev_channels, idx % bev_channels
    return cc * d + dd


def _set(tree: Dict, path: Tuple[str, ...], value):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = np.asarray(value)


def import_state_dict(state_dict, report_unmapped=True, mha_heads=4,
                      bev_channels=64):
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
            kw = conv2d_to_flax(val)
            if flax_path == ('bev_backbone', 'block0_down', 'Conv_0'):
                # height-compression layout differs: permute in-channels
                kw = kw[:, :, bev_input_perm(kw.shape[2], bev_channels), :]
            _set(params, flax_path + ('kernel',), kw)
        elif kind == 'deconv2d':
            _set(params, flax_path + ('kernel',), deconv2d_to_flax(val))
        elif kind == 'linear':
            _set(params, flax_path + ('kernel',), linear_to_flax(val))
        elif kind == 'conv1x1_linear':
            # Conv1d (out, in, 1) / Conv2d (out, in, 1, 1) -> Dense (in, out)
            _set(params, flax_path + ('kernel',),
                 linear_to_flax(val.reshape(val.shape[0], val.shape[1])))
        elif kind == 'bias':
            _set(params, flax_path + ('bias',), val)
        elif kind == 'mha_in_proj_w':
            # torch nn.MultiheadAttention in_proj_weight (3E, E), rows
            # stacked [Wq; Wk; Wv]; torch computes x @ W.T, so the flax
            # DenseGeneral kernel is W.T reshaped (E, H, E/H).
            e = val.shape[1]
            hd = e // mha_heads
            for name, w in zip(('query', 'key', 'value'),
                               (val[:e], val[e:2 * e], val[2 * e:])):
                _set(params, flax_path + (name, 'kernel'),
                     np.ascontiguousarray(w.T.reshape(e, mha_heads, hd)))
        elif kind == 'mha_in_proj_b':
            e = val.shape[0] // 3
            hd = e // mha_heads
            for name, b in zip(('query', 'key', 'value'),
                               (val[:e], val[e:2 * e], val[2 * e:])):
                _set(params, flax_path + (name, 'bias'),
                     np.ascontiguousarray(b.reshape(mha_heads, hd)))
        elif kind == 'mha_out_w':
            # out_proj.weight (E, E): concat_heads @ W.T -> kernel
            # W.T reshaped (H, hd, E) for DenseGeneral(axis=(-2, -1)).
            e = val.shape[0]
            hd = val.shape[1] // mha_heads
            _set(params, flax_path + ('kernel',),
                 np.ascontiguousarray(val.T.reshape(mha_heads, hd, e)))
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
    # reference sequentials: blocks.{i} = [ZeroPad, Conv, BN, ReLU,
    # (Conv, BN, ReLU) x layer_nums]; deblocks.{i} = [(De)Conv, BN, ReLU]
    if parts[0] == 'backbone_2d':
        if parts[1] == 'blocks':
            i, j = int(parts[2]), int(parts[3])
            if j == 1:
                mod = (f'block{i}_down', 'Conv_0')
            elif j == 2:
                mod = (f'block{i}_down', 'BatchNorm_0')
            elif (j - 4) % 3 == 0:
                mod = (f'block{i}_conv{(j - 4) // 3}', 'Conv_0')
            elif (j - 5) % 3 == 0:
                mod = (f'block{i}_conv{(j - 5) // 3}', 'BatchNorm_0')
            else:
                return None
            base = ('bev_backbone',) + mod
            if mod[-1] == 'Conv_0' and leaf == 'weight':
                return ('conv2d', base)
            if mod[-1] == 'BatchNorm_0':
                k = bn_kind()
                return (k, base) if k else None
        if parts[1] == 'deblocks':
            i, j = int(parts[2]), int(parts[3])
            if j == 0 and leaf == 'weight':
                # ALL reference deblocks are ConvTranspose2d (even the
                # stride-1 one, a 1x1 deconv == 1x1 conv with (in, out)
                # layout) -> always convert from (in, out, kh, kw).
                return ('deconv2d', ('bev_backbone', f'deblock{i}'))
            if j == 1:
                k = bn_kind()
                return (k, ('bev_backbone', f'deblock{i}_bn')) if k else None
        return None

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

    # ---- roi head ----
    if parts[0] == 'roi_head':
        fam = parts[1]
        fc_heads = {'shared_fc_layers': 'shared_fc',
                    'shared_fc_layers_mm': 'shared_fc_mm',
                    'cls_layers': 'cls_head', 'reg_layers': 'reg_head',
                    'cls_layers_PI': 'cls_head_pi',
                    'reg_layers_PI': 'reg_head_pi',
                    'cls_layers_P': 'cls_head_p',
                    'reg_layers_P': 'reg_head_p'}
        if fam in fc_heads:
            j = int(parts[3])
            ours = ('roi_head', fc_heads[fam])
            # [Lin, BN, ReLU, Drop] x k then optional final Linear(bias)
            if j % 4 == 0 and j // 4 < 2 and leaf == 'weight' \
                    and parts[-2] == str(j):
                return ('linear', ours + (f'fc{j // 4}',))
            if j % 4 == 1:
                k = bn_kind()
                return (k, ours + (f'bn{j // 4}',)) if k else None
            if j >= 7:   # final projection
                if leaf == 'weight':
                    return ('linear', ours + ('out',))
                if leaf == 'bias':
                    return ('bias', ours + ('out',))
            return None
        if fam in ('cross_attention_layers', 'cross_attention_layers_mm'):
            ours = ('roi_head', 'cross_attn' if fam == 'cross_attention_layers'
                    else 'cross_attn_mm')
            m = {'Q_linear': 'q', 'K_linear': 'k', 'V_linear': 'v'}.get(
                parts[3])
            if m and leaf == 'weight':
                return ('linear', ours + (m,))
            if parts[3] == 'att':
                if key.endswith('att.in_proj_weight'):
                    return ('mha_in_proj_w', ours + ('mha',))
                if key.endswith('att.in_proj_bias'):
                    return ('mha_in_proj_b', ours + ('mha',))
                if key.endswith('att.out_proj.weight'):
                    return ('mha_out_w', ours + ('mha', 'out'))
                if key.endswith('att.out_proj.bias'):
                    return ('bias', ours + ('mha', 'out'))
            return None
        if fam == 'conv_part':
            j = int(parts[2])
            if j == 0 and leaf == 'weight':
                return ('conv2d', ('roi_head', 'part_conv1', 'Conv_0'))
            if j == 1:
                k = bn_kind()
                return (k, ('roi_head', 'part_conv1', 'BatchNorm_0')) \
                    if k else None
            if j == 3 and leaf == 'weight':
                return ('conv2d', ('roi_head', 'part_conv2'))
        if fam in ('roi_grid_pool_layers', 'roi_grid_pool_layers_mm'):
            prefix = 'pool' if fam == 'roi_grid_pool_layers' else 'pool_mm'
            src = ['x_conv3', 'x_conv4'][int(parts[2])]
            sub, g, j = parts[3], int(parts[4]), int(parts[5])
            ours = ('roi_head', f'{prefix}_{src}')
            name = {'mlps_in': (f'mlp_in{g}', f'mlp_in_bn{g}'),
                    'mlps_pos': (f'mlp_pos{g}', f'mlp_pos_bn{g}'),
                    'mlps_out': (f'mlp_out{g}', f'mlp_out_bn{g}')}.get(sub)
            if name is None:
                return None
            if j == 0 and leaf == 'weight':
                # Conv1d/Conv2d k=1 -> Dense
                return ('conv1x1_linear', ours + (name[0],))
            if j == 1:
                k = bn_kind()
                return (k, ours + (name[1],)) if k else None
        return None
    return None
