"""VirConv 3D backbones: NRConv blocks and the VirConv8x / VirConvL8x stacks.

Parity targets (re-designed, not translated):
  * NRConvBlock — ``/root/reference/pcdet/models/backbones_3d/
    spconv_backbone.py:150-229``: 3D submanifold convs, then the *same*
    sparse voxels projected into the image plane (inverse world transform +
    calibration) and convolved with 2D submanifold convs; 3D || 2D features
    concatenated. Here the per-sample python projection loop becomes one
    batched einsum over dense per-entry calib matrices, and the 2D neighbor
    map is a second sorted-key lookup.
  * VirConv8x — ``spconv_backbone.py:232-535``: dual stream (LiDAR spconv
    stack + multimodal NRConv stack). The reference's test-time trick of
    concatenating ROT_NUM transform replicas along the z spatial index
    (``:408-471``) is replaced by treating replicas as extra batch entries
    (b' = b*rot_num + i) — mathematically identical for submanifold convs
    and collision-free in key space, in training and eval alike.
  * VirConvL8x — ``spconv_backbone.py:538-699``: NRConv-only stream over the
    fused real+virtual voxels, RGB features zeroed.

Stochastic layer-level voxel discard (StVD, ``:134-147``) drops a fraction of
valid rows during training via the 'stvd' rng stream.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import dense3d as d3d
from ...ops import sparse as sp
from ...utils import transforms as tr
from ...utils.calibration import project_lidar_to_img_jax
from ..layers import (Dense2DSubMBlock, DenseDown3DBlock, DenseSubM3DBlock,
                      MaskedBatchNorm, SparseDownBlock, SubMConvBlock)

IMG_GRID = (1600, 600)   # 2D sparse grid of the image plane (u, v)


def layer_voxel_discard(st: sp.SparseTensor, rate: float, rng) -> sp.SparseTensor:
    """Randomly drop ``rate`` of the valid voxels (train-time StVD)."""
    if rate <= 0:
        return st
    u = jax.random.uniform(rng, (st.capacity,))
    keep = st.mask & (u >= rate)
    return st.replace(mask=keep,
                      coords=jnp.where(keep[:, None], st.coords, -1),
                      feats=jnp.where(keep[:, None], st.feats, 0.0))


def voxel_centers(coords: jnp.ndarray, stride: int, voxel_size, pcr):
    """Voxel-center xyz of [b, z, y, x] coords at a feature stride
    (reference ``index2points``: center = pcr + (idx + 0.5) * vs * stride)."""
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    mins = jnp.asarray(pcr[:3], jnp.float32)
    idx_xyz = coords[:, [3, 2, 1]].astype(jnp.float32)
    return (idx_xyz + 0.5) * vs + mins


class NRConvBlock(nn.Module):
    """Noise-resistant conv: 3D submanifold convs + image-plane 2D convs."""

    out_channels: int
    stride: int = 1
    padding: Tuple[int, int, int] = (1, 1, 1)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    out_capacity: int | None = None   # strided blocks: downsampled row cap

    @nn.compact
    def __call__(self, st: sp.SparseTensor, v2r, p2t, trans_params,
                 feat_stride: int, train: bool):
        """
        Args:
            st: input sparse tensor (batch entries may be batch x replica).
            v2r, p2t: (B_e, 4, 3) per-entry calibration matrices.
            trans_params: (B_e, 3) [rot, flip, scale] world transform applied
                to the points of each entry (inverted before projection), or
                None.
            feat_stride: voxel stride of the *output* of this block.
        """
        band = (not train) and sp.band_enabled()
        band3d = band or (train and sp.band_enabled()
                          and sp.band_train_enabled())
        if self.stride > 1:
            st = SparseDownBlock(self.out_channels, (3, 3, 3),
                                 (self.stride,) * 3, self.padding,
                                 out_capacity=self.out_capacity,
                                 name='down')(st, train, use_band=band)
        half = self.out_channels // 2
        ctx3d = sp.subm_conv_ctx(st, 3, use_band=band3d, train=train)
        d3 = SubMConvBlock(half, name='d3_conv1')(st, ctx3d, train)
        d3 = SubMConvBlock(half, name='d3_conv2')(d3, ctx3d, train)

        # ---- project the same sparse voxels into the image plane ----------
        xyz = voxel_centers(d3.coords, feat_stride, self.voxel_size,
                            self.point_cloud_range)
        b = jnp.clip(d3.coords[:, 0], 0)
        if trans_params is not None:
            # per-row inverse world transform (batched scalar params)
            p = trans_params[b]
            rot, flip, scale = p[:, 0], p[:, 1], p[:, 2]
            sign = jnp.where(flip == 1, -1.0, 1.0)
            x = xyz[:, 0] / scale
            y = xyz[:, 1] / scale * sign
            z = xyz[:, 2] / scale
            cosa, sina = jnp.cos(-rot), jnp.sin(-rot)
            xyz = jnp.stack([x * cosa - y * sina, x * sina + y * cosa, z], -1)
        uv, _ = project_lidar_to_img_jax(xyz, v2r[b], p2t[b])
        u = jnp.clip(uv[:, 0].astype(jnp.int32), 0, 1400 - 1) // feat_stride
        v = jnp.clip(uv[:, 1].astype(jnp.int32), 0, 600 - 1) // feat_stride
        coords2d = jnp.stack([d3.coords[:, 0], u, v], axis=-1)
        coords2d = jnp.where(d3.mask[:, None], coords2d, -1)

        if (not train) and sp.dense2d_enabled():
            # Dense MXU path: the image grid is small (<=1400x600 at
            # stride 1), so scatter -> two dense NCHW convs -> gather back
            # replaces sorts, per-tap gathers and plan builds outright.
            # Duplicate pixels (several voxels on one pixel) keep
            # first-wins semantics via a deterministic scatter-min
            # representative, matching the band path's in-kernel gather.
            u_dim = -(-1400 // feat_stride)
            v_dim = -(-600 // feat_stride)
            uv = u_dim * v_dim
            cells = st.batch_size * uv
            n = d3.capacity
            bidx = jnp.clip(d3.coords[:, 0], 0)
            flat_e = u * v_dim + v                         # per-entry cell
            flat_e = jnp.where(d3.mask, flat_e, uv)        # overflow slot
            flat = bidx * uv + jnp.minimum(flat_e, uv - 1)
            rid = jnp.arange(n, dtype=jnp.int32)
            rep = jnp.full((cells + 1,), n, jnp.int32).at[
                jnp.where(d3.mask, flat, cells)].min(rid)
            is_rep = rep[flat] == rid
            src = jnp.where((d3.mask & is_rep)[:, None],
                            d3.feats.astype(jnp.float32), 0.0)
            # scatter straight into the NCHW conv layout (channels on the
            # sublane axis — a (cells, C) row buffer would lane-pad
            # C=8..32 to 128, 16x HBM)
            grid = jnp.zeros((st.batch_size, half, uv + 1), jnp.float32)
            grid = grid.at[bidx, :, flat_e].add(src)
            grid = grid[:, :, :uv].reshape(st.batch_size, half, u_dim, v_dim)
            occ = (rep[:cells] < n).astype(jnp.float32).reshape(
                st.batch_size, 1, u_dim, v_dim)
            g1 = Dense2DSubMBlock(half, name='d2_conv1')(grid, occ, train)
            g2 = Dense2DSubMBlock(half, name='d2_conv2')(g1, occ, train)
            flat_feats = g2.reshape(st.batch_size, half, uv)
            d2_feats = flat_feats[bidx, :, jnp.minimum(flat_e, uv - 1)]
            d2_feats = jnp.where(d3.mask[:, None], d2_feats,
                                 0.0).astype(d3.feats.dtype)
            return d3.replace(
                feats=jnp.concatenate([d3.feats, d2_feats], -1))

        st2d = sp.SparseTensor(feats=d3.feats, coords=coords2d, mask=d3.mask,
                               spatial_shape=IMG_GRID,
                               batch_size=st.batch_size)
        band2d = band and sp.band2d_enabled()
        if not band2d:
            # 2D grid key space is small -> dense-table lookup works on
            # unsorted rows, so the image-plane tensor keeps d3's row order
            # (no sort / un-sort round trip).
            ctx2d = sp.subm_conv_ctx(st2d, 3, use_band=False)
            d2 = SubMConvBlock(half, name='d2_conv1')(st2d, ctx2d, train)
            d2 = SubMConvBlock(half, name='d2_conv2')(d2, ctx2d, train)
            d2_feats = d2.feats
        else:
            # band kernel needs physically key-sorted rows: sort once, run
            # both convs, un-sort once. Duplicate pixel keys (several voxels
            # projecting onto one pixel) are handled first-wins.
            st2s, perm = sp.sort_by_key_with_perm(st2d)
            ctx2d = sp.subm_conv_ctx(st2s, 3, use_band=True,
                                     first_wins_sources=True)
            d2 = SubMConvBlock(half, name='d2_conv1')(st2s, ctx2d, train)
            d2 = SubMConvBlock(half, name='d2_conv2')(d2, ctx2d, train)
            # inverse permutation via a second sort, not a scatter: TPU
            # scatter throughput is far below sort/gather (DESIGN.md §8),
            # and this sat on the mm stream's measured 17 ms scatter budget
            inv = jnp.argsort(perm)
            d2_feats = d2.feats[inv]

        return d3.replace(feats=jnp.concatenate([d3.feats, d2_feats], -1))


def _cap(n: int, ratio: float) -> int:
    """Scale a row capacity, keeping a multiple of 512."""
    return max(512, int(n * ratio) // 512 * 512)


class LidarStack(nn.Module):
    """The 4-stage LiDAR spconv stack + conv_out of VirConv8x.

    Row capacities shrink with the voxel stride (downsampling merges
    voxels; KITTI scenes occupy well under 60%/35% of the input count at
    strides 4/8), cutting gather/matmul rows at the coarse scales.
    """

    num_filters: Tuple[int, ...] = (16, 32, 64, 64)
    out_features: int = 64
    cap_ratios: Tuple[float, ...] = (1.0, 0.6, 0.35)   # conv2/3/4
    # strides >= 4 as dense MXU convs: measured SLOWER at eval row counts
    # (grid materialization + f32 conv + BN reshapes ~0.2s vs ~0.06s of
    # gathers at 43-72k rows) — the coarse lidar scales are gather-cheap.
    # Kept for large-batch training where the dense cost amortizes.
    dense_tail: bool = False

    @nn.compact
    def __call__(self, st: sp.SparseTensor, train: bool):
        nf = self.num_filters
        n0 = st.capacity
        band = (not train) and sp.band_enabled()
        band3d = band or (train and sp.band_enabled()
                          and sp.band_train_enabled())
        ctx1 = sp.subm_conv_ctx(st, 3, use_band=band3d, train=train)
        x = SubMConvBlock(nf[0], name='conv_input')(st, ctx1, train)
        x1 = SubMConvBlock(nf[0], name='conv1')(x, ctx1, train)

        x2 = SparseDownBlock(nf[1], out_capacity=_cap(n0, self.cap_ratios[0]),
                             name='conv2_down')(x1, train, use_band=band)
        ctx2 = sp.subm_conv_ctx(x2, 3, use_band=band3d, train=train)
        x2 = SubMConvBlock(nf[1], name='conv2_a')(x2, ctx2, train)
        x2 = SubMConvBlock(nf[1], name='conv2_b')(x2, ctx2, train)

        if self.dense_tail:
            # Coarse scales (stride >= 4) fit HBM densely; submanifold ==
            # dense conv + mask, so the gather-convs become MXU convs
            # (docs/DESIGN.md S3). Param paths match the sparse blocks, so
            # checkpoints interchange. conv3_down stays sparse: its stride-2
            # dense input would be a 22.5M-cell (multi-GB) grid.
            x3_sp = SparseDownBlock(
                nf[2], out_capacity=_cap(n0, self.cap_ratios[1]),
                name='conv3_down')(x2, train)
            g3 = d3d.grid_from_sparse(x3_sp)
            g3 = DenseSubM3DBlock(nf[2], name='conv3_a')(g3, train)
            g3 = DenseSubM3DBlock(nf[2], name='conv3_b')(g3, train)
            g4 = DenseDown3DBlock(nf[3], padding=(0, 1, 1),
                                  name='conv4_down')(g3, train)
            g4 = DenseSubM3DBlock(nf[3], name='conv4_a')(g4, train)
            g4 = DenseSubM3DBlock(nf[3], name='conv4_b')(g4, train)
            gout = DenseDown3DBlock(self.out_features, kernel_size=(3, 1, 1),
                                    stride=(2, 1, 1), padding=(0, 0, 0),
                                    name='conv_out')(g4, train)
            x3 = d3d.grid_to_sparse(g3, _cap(n0, self.cap_ratios[1]))
            x4 = d3d.grid_to_sparse(g4, _cap(n0, self.cap_ratios[2]))
            out = d3d.grid_to_sparse(gout, _cap(n0, self.cap_ratios[2]))
            return {'x_conv1': x1, 'x_conv2': x2, 'x_conv3': x3,
                    'x_conv4': x4, 'out': out}

        x3 = SparseDownBlock(nf[2], out_capacity=_cap(n0, self.cap_ratios[1]),
                             name='conv3_down')(x2, train, use_band=band)
        ctx3 = sp.subm_conv_ctx(x3, 3, use_band=band3d, train=train)
        x3 = SubMConvBlock(nf[2], name='conv3_a')(x3, ctx3, train)
        x3 = SubMConvBlock(nf[2], name='conv3_b')(x3, ctx3, train)

        x4 = SparseDownBlock(nf[3], padding=(0, 1, 1),
                             out_capacity=_cap(n0, self.cap_ratios[2]),
                             name='conv4_down')(x3, train, use_band=band)
        ctx4 = sp.subm_conv_ctx(x4, 3, use_band=band3d, train=train)
        x4 = SubMConvBlock(nf[3], name='conv4_a')(x4, ctx4, train)
        x4 = SubMConvBlock(nf[3], name='conv4_b')(x4, ctx4, train)

        out = SparseDownBlock(self.out_features, kernel_size=(3, 1, 1),
                              stride=(2, 1, 1), padding=(0, 0, 0),
                              out_capacity=_cap(n0, self.cap_ratios[2]),
                              name='conv_out')(x4, train, use_band=band)
        return {'x_conv1': x1, 'x_conv2': x2, 'x_conv3': x3, 'x_conv4': x4,
                'out': out}


class NRConvStack(nn.Module):
    """Four NRConv blocks with train-time layer voxel discard."""

    num_filters: Tuple[int, ...] = (16, 32, 64, 64)
    layer_discard_rate: float = 0.15
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    discard_input: bool = True

    @nn.compact
    def __call__(self, st, v2r, p2t, trans_params, train: bool):
        nf = self.num_filters
        kw = dict(voxel_size=self.voxel_size,
                  point_cloud_range=self.point_cloud_range)

        def discard(t):
            if train and self.layer_discard_rate > 0:
                return layer_voxel_discard(t, self.layer_discard_rate,
                                           self.make_rng('stvd'))
            return t

        if self.discard_input:
            st = discard(st)
        n0 = st.capacity
        x1 = NRConvBlock(nf[0], stride=1, name='vir_conv1', **kw)(
            st, v2r, p2t, trans_params, 1, train)
        x1d = discard(x1)
        x2 = NRConvBlock(nf[1], stride=2, out_capacity=_cap(n0, 1.0),
                         name='vir_conv2', **kw)(
            x1d, v2r, p2t, trans_params, 2, train)
        x2d = discard(x2)
        x3 = NRConvBlock(nf[2], stride=2, out_capacity=_cap(n0, 0.6),
                         name='vir_conv3', **kw)(
            x2d, v2r, p2t, trans_params, 4, train)
        x3d = discard(x3)
        x4 = NRConvBlock(nf[3], stride=2, padding=(0, 1, 1),
                         out_capacity=_cap(n0, 0.35),
                         name='vir_conv4', **kw)(
            x3d, v2r, p2t, trans_params, 8, train)
        return {'x_conv1': x1, 'x_conv2': x2, 'x_conv3': x3, 'x_conv4': x4}


class VirConv8x(nn.Module):
    """Dual-stream backbone (VirConv-T): LiDAR spconv stack + MM NRConv."""

    num_filters: Tuple[int, ...] = (16, 32, 64, 64)
    out_features: int = 64
    layer_discard_rate: float = 0.15
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, st_lidar, st_mm, v2r, p2t, trans_params, train: bool):
        lidar = LidarStack(self.num_filters, self.out_features,
                           name='lidar')(st_lidar, train)
        mm = NRConvStack(self.num_filters, self.layer_discard_rate,
                         self.voxel_size, self.point_cloud_range,
                         name='mm')(st_mm, v2r, p2t, trans_params, train)
        return {'multi_scale_3d_features': {k: lidar[k] for k in
                                            ('x_conv1', 'x_conv2', 'x_conv3',
                                             'x_conv4')},
                'multi_scale_3d_features_mm': mm,
                'encoded_spconv_tensor': lidar['out'],
                'multi_scale_3d_strides': {'x_conv1': 1, 'x_conv2': 2,
                                           'x_conv3': 4, 'x_conv4': 8}}


class VirConvL8x(nn.Module):
    """Single fused-stream backbone (VirConv-L): NRConv over real+virtual
    voxels; RGB feature channels zeroed (``spconv_backbone.py:636``)."""

    num_filters: Tuple[int, ...] = (16, 32, 64, 64)
    out_features: int = 64
    layer_discard_rate: float = 0.1
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.05)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, st, v2r, p2t, trans_params, train: bool):
        feats = st.feats.at[:, 4:7].set(0.0)
        st = st.replace(feats=feats)
        mm = NRConvStack(self.num_filters, self.layer_discard_rate,
                         self.voxel_size, self.point_cloud_range,
                         discard_input=False,
                         name='mm')(st, v2r, p2t, trans_params, train)
        out = SparseDownBlock(self.out_features, kernel_size=(3, 1, 1),
                              stride=(2, 1, 1), padding=(0, 0, 0),
                              name='conv_out')(
            mm['x_conv4'], train,
            use_band=(not train) and sp.band_enabled())
        return {'multi_scale_3d_features': mm,
                'encoded_spconv_tensor': out,
                'multi_scale_3d_strides': {'x_conv1': 1, 'x_conv2': 2,
                                           'x_conv3': 4, 'x_conv4': 8}}
