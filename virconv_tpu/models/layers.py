"""Shared flax modules: masked sparse-row BatchNorm and sparse conv blocks.

The reference normalizes sparse voxel features with ``nn.BatchNorm1d(eps=1e-3,
momentum=0.01)`` over the (dynamic) row dimension (``/root/reference/pcdet/
models/backbones_3d/spconv_backbone.py:160``). On TPU the row dimension is a
fixed capacity with padding, so batch statistics must be computed over valid
rows only (masked moments); running stats follow torch semantics (momentum is
the update fraction, running_var uses the unbiased estimate).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import sparse as sp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of (N, C) features.

    ``fold=True`` (eval only) skips applying the normalization and instead
    returns the folded affine ``(mult, bias')`` with
    ``y = x * mult + bias'`` — callers fuse it into the preceding conv
    kernel's epilogue (band_conv scale/bias args) so the (N, C) tensor
    never round-trips HBM for a separate BN pass. Parameter/variable
    creation order is identical in both modes, so checkpoints interchange.
    """

    features: int
    eps: float = 1e-3
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x, mask, train: bool, fold: bool = False):
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))

        if fold:
            assert not train, 'fold only defined for running-stat eval mode'
            mult = scale / jnp.sqrt(ra_var.value + self.eps)
            return mult, bias - ra_mean.value * mult

        if train:
            w = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(w.sum(), 1.0)
            mean = (x * w).sum(0) / cnt
            var = (jnp.square(x - mean) * w).sum(0) / cnt
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) / jnp.sqrt(var + self.eps)
        y = y * scale + bias
        return jnp.where(mask[:, None], y, 0.0)


class SubMConvBlock(nn.Module):
    """Submanifold sparse conv + masked BN + ReLU (reference post_act_block,
    ``spconv_backbone.py:86-107``). The conv context (neighbor map or
    band-window plan, ``ops.sparse.subm_conv_ctx``) is supplied by the
    caller so layers sharing an indice_key reuse one."""

    out_channels: int
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, st: sp.SparseTensor, ctx, train: bool):
        k = ctx.n_taps if isinstance(ctx, sp.ConvCtx) else ctx.shape[1]
        c_in = st.num_channels
        w = self.param('kernel',
                       nn.initializers.variance_scaling(
                           1.0, 'fan_in', 'normal'),
                       (k, c_in, self.out_channels))
        if isinstance(ctx, sp.ConvCtx):
            if self.use_bn and not train:
                # eval: fold the running-stat BN into a (scale, bias)
                # epilogue fused into the conv (band kernel: in-register;
                # nmap: XLA-fused tail) — no separate BN pass over (N, C)
                mult, bias = MaskedBatchNorm(self.out_channels)(
                    st.feats, st.mask, train, fold=True)
                feats = ctx.conv(st.feats, w, scale=mult, bias=bias,
                                 relu=self.use_relu)
                return st.replace(feats=feats)
            feats = ctx.conv(st.feats, w)
        else:
            feats = sp.gathered_conv(st.feats, ctx, w, st.mask)
        if self.use_bn:
            feats = MaskedBatchNorm(self.out_channels)(feats, st.mask, train)
        if self.use_relu:
            feats = nn.relu(feats)
        return st.replace(feats=feats)


class SparseDownBlock(nn.Module):
    """Strided sparse conv + masked BN + ReLU (reference 'spconv' blocks).
    ``use_band`` selects the band-window kernel path (eval)."""

    out_channels: int
    kernel_size: Tuple[int, ...] = (3, 3, 3)
    stride: Tuple[int, ...] = (2, 2, 2)
    padding: Tuple[int, ...] = (1, 1, 1)
    out_capacity: int | None = None

    @nn.compact
    def __call__(self, st: sp.SparseTensor, train: bool,
                 use_band: bool = False):
        cap = self.out_capacity or st.capacity
        st_out = sp.downsample_coords(st, self.stride, self.padding,
                                      self.kernel_size, cap)
        ctx = sp.strided_conv_ctx(st, st_out, self.stride, self.padding,
                                  self.kernel_size, use_band=use_band)
        w = self.param('kernel',
                       nn.initializers.variance_scaling(
                           1.0, 'fan_in', 'normal'),
                       (ctx.n_taps, st.num_channels, self.out_channels))
        if not train:
            mult, bias = MaskedBatchNorm(self.out_channels)(
                st.feats, st_out.mask, train, fold=True)
            feats = ctx.conv(st.feats, w, scale=mult, bias=bias, relu=True)
            return st_out.replace(feats=feats)
        feats = ctx.conv(st.feats, w)
        feats = MaskedBatchNorm(self.out_channels)(feats, st_out.mask, train)
        feats = nn.relu(feats)
        return st_out.replace(feats=feats)


class Dense2DSubMBlock(nn.Module):
    """Submanifold 2D conv as a dense MXU conv over the (small) image-plane
    grid: conv + folded-BN affine + occupancy re-mask + ReLU.

    Param tree matches SubMConvBlock ('kernel' in gathered (K, C, C')
    layout + MaskedBatchNorm_0), so checkpoints interchange with the
    sparse 2D path. Grid layout is NCHW — channels ride the sublane axis;
    channels-minor would pad C=8..32 to 128 lanes (16x HBM). Equivalent to
    the sparse conv because off-mask cells hold zero features (zero
    contribution == missing neighbor) and outputs are re-masked.
    Eval only (the train path stays on the row-space nmap conv: its BN
    moments count duplicate-pixel rows per row, not per cell).

    Reference: NRConv 2D branch ``/root/reference/pcdet/models/
    backbones_3d/spconv_backbone.py:207-229``.
    """

    out_channels: int

    @nn.compact
    def __call__(self, grid, occ, train: bool):
        """grid (B, C, U, V); occ (B, 1, U, V) float occupancy."""
        assert not train, 'dense 2D path is eval-only'
        b, c_in, u_dim, v_dim = grid.shape
        w = self.param('kernel',
                       nn.initializers.variance_scaling(
                           1.0, 'fan_in', 'normal'),
                       (9, c_in, self.out_channels))
        mult, bias = MaskedBatchNorm(self.out_channels)(
            jnp.zeros((1, self.out_channels)), jnp.zeros((1,), bool),
            train, fold=True)
        # gathered tap order (du-major, dv-minor, offsets -1..1) == HWIO
        # spatial order of a centered 3x3 kernel
        kernel = w.reshape(3, 3, c_in, self.out_channels)
        out = jax.lax.conv_general_dilated(
            grid, kernel, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=('NCHW', 'HWIO', 'NCHW'),
            preferred_element_type=jnp.float32)
        out = out * mult[None, :, None, None] + bias[None, :, None, None]
        out = jnp.maximum(out, 0.0) * occ
        return out


class DenseConvBlock(nn.Module):
    """3x3 dense conv + BN + ReLU on NHWC maps (BEV backbone building block,
    torch BN semantics eps=1e-3 momentum=0.01).

    Padding is the explicit symmetric (k//2, k//2) of the reference's
    ``ZeroPad2d(1) + Conv2d(padding=0)`` (base_bev_backbone.py:32-37) —
    NOT flax 'SAME', which at stride 2 pads (0, 1) and shifts the sampling
    grid one pixel relative to torch (caught by
    tests/test_trunk_parity.py::test_bev_backbone_parity)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pads = tuple((k // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pads, use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        return nn.relu(x)


class DenseSubM3DBlock(nn.Module):
    """Submanifold conv on a DenseGrid: dense MXU conv + output mask + masked
    BN + ReLU. Exactly equivalent to SubMConvBlock (inputs are zero off the
    active set; outputs are masked back to it) but runs at dense-conv rates
    at the coarse scales. Kernel stored in gathered layout (K, in, out) so
    checkpoints interchange with the sparse blocks."""

    out_channels: int
    kernel_size: Tuple[int, ...] = (3, 3, 3)
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, grid, train: bool):
        from ..ops import dense3d as d3
        k = 1
        for s in self.kernel_size:
            k *= s
        w = self.param('kernel',
                       nn.initializers.variance_scaling(
                           1.0, 'fan_in', 'normal'),
                       (k, grid.num_channels, self.out_channels))
        x = d3.dense_conv3d(grid.feats, w, self.kernel_size)
        b, dd, hh, ww, c = x.shape
        flat_mask = grid.mask.reshape(-1)
        feats = x.reshape(-1, c)
        if self.use_bn:
            feats = MaskedBatchNorm(self.out_channels)(
                feats, flat_mask, train)
        else:
            feats = jnp.where(flat_mask[:, None], feats, 0.0)
        if self.use_relu:
            feats = nn.relu(feats)
        return grid.replace(feats=feats.reshape(b, dd, hh, ww, c))


class DenseDown3DBlock(nn.Module):
    """Strided sparse conv on a DenseGrid: dense strided conv; output sites
    = max-pool of the input mask (spconv SparseConv3d's active-output
    rule); masked BN + ReLU."""

    out_channels: int
    kernel_size: Tuple[int, ...] = (3, 3, 3)
    stride: Tuple[int, ...] = (2, 2, 2)
    padding: Tuple[int, ...] = (1, 1, 1)

    @nn.compact
    def __call__(self, grid, train: bool):
        from ..ops import dense3d as d3
        k = 1
        for s in self.kernel_size:
            k *= s
        w = self.param('kernel',
                       nn.initializers.variance_scaling(
                           1.0, 'fan_in', 'normal'),
                       (k, grid.num_channels, self.out_channels))
        pads = [(p, p) for p in self.padding]
        x = d3.dense_conv3d(grid.feats, w, self.kernel_size,
                            stride=self.stride, padding=pads)
        mask = d3.down_mask(grid.mask, self.kernel_size, self.stride,
                            self.padding)
        b, dd, hh, ww, c = x.shape
        feats = MaskedBatchNorm(self.out_channels)(
            x.reshape(-1, c), mask.reshape(-1), train)
        feats = nn.relu(feats)
        return d3.DenseGrid(feats=feats.reshape(b, dd, hh, ww, c),
                            mask=mask)
