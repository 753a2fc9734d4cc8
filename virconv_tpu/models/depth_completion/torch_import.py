"""torch -> flax weight importer for reference PENet_C2 checkpoints.

Maps every learnable key of the reference depth-completion net
(``/root/reference/tools/PENet/model.py:382-524`` PENet_C2, ``:3-233`` ENet,
``basic.py`` convbn/convbnrelu/deconvbnrelu/BasicBlockGeo) onto the flax
parameter tree of :class:`virconv_tpu.models.depth_completion.penet.PENetC2`.

The reference's ``encoder3/5/7`` buffers (the one-hot ``kernel_trans``
convolutions) are intentionally dropped: their spatial-shift semantics are
folded into :func:`penet.cspn_step` directly, so they carry no weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ...utils.torch_import import (conv2d_to_flax, deconv2d_to_flax, _set)

# ENet submodule name map: reference attr -> our flax module name.
_ENET = {'rgb_conv_init': ('rgb_init', 'conv'),
         'depth_conv_init': ('d_init', 'conv'),
         'rgb_decoder_output': ('rgb_out', 'deconv'),
         'decoder_layer6': ('dec6', 'conv')}
for _i in range(1, 11):
    _ENET[f'rgb_encoder_layer{_i}'] = (f'rgb_enc{_i}', 'basic')
    _ENET[f'depth_layer{_i}'] = (f'd_enc{_i}', 'basic')
for _i in (8, 6, 4, 2, 0):
    _ENET[f'rgb_decoder_layer{_i}'] = (f'rgb_dec{_i}', 'deconv')
for _i in range(1, 6):
    _ENET[f'decoder_layer{_i}'] = (f'dec{_i}', 'deconv')

# PENet_C2 head convbn layers (Conv + BN sequentials) and CSPN guides.
_HEAD = {'mask_layer': 'mask', 'kernel_conf_layer': 'kconf',
         'mask_layer_s2': 'mask_s2', 'kernel_conf_layer_s2': 'kconf_s2'}
for _k in (3, 5, 7):
    _HEAD[f'iter_guide_layer{_k}'] = f'guide{_k}'
    _HEAD[f'iter_guide_layer{_k}_s2'] = f'guide{_k}_s2'

_BN_LEAF = {'weight': ('params', 'scale'), 'bias': ('params', 'bias'),
            'running_mean': ('stats', 'mean'),
            'running_var': ('stats', 'var')}

# Within BasicBlockGeo: reference attr -> (our name, kind).
_BASIC = {'conv1': ('conv1', 'conv2d'), 'conv2': ('conv2', 'conv2d'),
          'downsample.0': ('down_conv', 'conv2d'),
          'bn1': ('bn1', 'bn'), 'bn2': ('bn2', 'bn'),
          'downsample.1': ('down_bn', 'bn')}


def translate_penet_key(key: str):
    """Map one PENet_C2 state_dict key to (kind, tree, flax_path) or None.

    kind in {conv2d, deconv2d}; for BN leaves kind is the target leaf name
    and ``tree`` selects 'params' or 'stats'.
    """
    parts = key.split('.')
    if parts[0] == 'module':       # DataParallel wrapper
        parts = parts[1:]
    leaf = parts[-1]

    def seq_path(base: Tuple[str, ...], idx: str, is_deconv: bool):
        # nn.Sequential(Conv/Deconv, BN[, ReLU])
        if idx == '0' and leaf == 'weight':
            kind = 'deconv2d' if is_deconv else 'conv2d'
            name = 'ConvTranspose_0' if is_deconv else 'Conv_0'
            return (kind, 'params', base + (name, 'kernel'))
        if idx == '1' and leaf in _BN_LEAF:
            tree, out_leaf = _BN_LEAF[leaf]
            return (out_leaf, tree, base + ('BatchNorm_0', out_leaf))
        return None

    if parts[0] == 'backbone' and parts[1] in _ENET:
        ours, kind = _ENET[parts[1]]
        base = ('backbone', ours)
        if kind in ('conv', 'deconv'):
            return seq_path(base, parts[2], kind == 'deconv')
        sub = '.'.join(parts[2:-1])
        if sub in _BASIC:
            name, k = _BASIC[sub]
            if k == 'conv2d' and leaf == 'weight':
                return ('conv2d', 'params', base + (name, 'kernel'))
            if k == 'bn' and leaf in _BN_LEAF:
                tree, out_leaf = _BN_LEAF[leaf]
                return (out_leaf, tree, base + (name, out_leaf))
        return None

    if parts[0] in _HEAD:
        ours = _HEAD[parts[0]]
        if parts[0].startswith('iter_guide'):
            # CSPNGenerateAccelerate.generate = convbn sequential
            if parts[1] != 'generate':
                return None
            return seq_path((ours, 'generate'), parts[2], False)
        return seq_path((ours,), parts[1], False)

    if parts[0] in ('encoder3', 'encoder5', 'encoder7'):
        return ('skip', None, None)     # folded into cspn_step
    return None


def import_penet_state_dict(state_dict):
    """Convert a PENet_C2 torch state_dict into flax variables (numpy
    leaves). Returns ({'params':..., 'batch_stats':...}, unmapped_keys)."""
    params: Dict = {}
    stats: Dict = {}
    unmapped = []
    for key in state_dict:
        val = np.asarray(state_dict[key])
        t = translate_penet_key(key)
        if t is None:
            unmapped.append(key)
            continue
        kind, tree, path = t
        if kind == 'skip':
            continue
        if kind == 'conv2d':
            _set(params, path, conv2d_to_flax(val))
        elif kind == 'deconv2d':
            _set(params, path, deconv2d_to_flax(val))
        else:
            _set(params if tree == 'params' else stats, path, val)
    real = [k for k in unmapped if not k.endswith('num_batches_tracked')]
    if real:
        print(f'[penet torch_import] {len(real)} unmapped keys, '
              f'e.g. {real[:5]}')
    return {'params': params, 'batch_stats': stats}, unmapped


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def load_torch_penet(ckpt_path: str, variables):
    """Load a reference PENet_C2 ``.pth``/``.pth.tar`` checkpoint into the
    flax variable tree ``variables`` (as produced by ``PENetC2.init``).

    The reference trainer saves {'model': state_dict, ...}
    (``tools/PENet/main.py:296-394``); a bare state_dict also works.
    Every imported leaf must exist in ``variables`` with a matching shape —
    mismatches raise so silent partial imports can't happen.
    """
    import torch
    ckpt = torch.load(ckpt_path, map_location='cpu', weights_only=False)
    state_dict = ckpt.get('model', ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(state_dict, 'state_dict'):
        state_dict = state_dict.state_dict()
    state_dict = {k: v.detach().cpu().numpy() if hasattr(v, 'detach') else v
                  for k, v in state_dict.items()}
    imported, _ = import_penet_state_dict(state_dict)

    out = {'params': dict(), 'batch_stats': dict()}
    for col in ('params', 'batch_stats'):
        have = dict(_tree_paths(variables.get(col, {})))
        got = dict(_tree_paths(imported[col]))
        missing = sorted(set(have) - set(got))
        extra = sorted(set(got) - set(have))
        if missing or extra:
            raise ValueError(
                f'PENet import mismatch in {col}: missing={missing[:8]} '
                f'({len(missing)}), extra={extra[:8]} ({len(extra)})')
        for path, ref in have.items():
            v = got[path]
            if tuple(np.shape(v)) != tuple(np.shape(ref)):
                raise ValueError(f'shape mismatch at {path}: '
                                 f'{np.shape(v)} vs {np.shape(ref)}')
            _set(out[col], path, v)
    return out
