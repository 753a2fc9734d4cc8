"""Voxel-query ROI grid pooling — TPU replacement for the pointnet2_stack
CUDA ops (``/root/reference/pcdet/ops/pointnet2/pointnet2_stack/
voxel_query_gpu.cu`` + ``voxel_pool_modules.py:8-130``).

The reference builds a dense (B, Z, Y, X) voxel->row lookup per call
(``spconv_utils.generate_voxel2pinds``) and probes a dilated window around
each ROI grid point with a CUDA kernel. Here the same dense table is built by
one scatter, the window is a static offset enumeration, candidate lookups are
plain gathers, the first ``nsample`` in-radius hits are selected with top_k,
and the grouped features go through the (in/pos/out) MLP stack with a masked
max-pool — all static shapes, batched over every ROI grid point at once.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ..layers import MaskedBatchNorm


def build_row_table(st: sp.SparseTensor) -> jnp.ndarray:
    """Dense (B*D*H*W,) int32 table: voxel key -> row index (-1 empty)."""
    d, h, w = st.spatial_shape
    size = st.batch_size * d * h * w
    flat = ((st.coords[:, 0] * d + st.coords[:, 1]) * h
            + st.coords[:, 2]) * w + st.coords[:, 3]
    flat = jnp.where(st.mask, flat, size)
    table = jnp.full((size + 1,), -1, jnp.int32)
    rows = jnp.arange(st.capacity, dtype=jnp.int32)
    return table.at[flat].set(jnp.where(st.mask, rows, -1))[:size]


def _window_offsets(ranges: Sequence[int], radius=None, voxel_size=None,
                    stride=1) -> np.ndarray:
    """Offsets of the query window, pruned to cells that can contain a point
    within ``radius`` of any point in the center cell (cuts ~30% of the
    9x9x9 windows used by the coarse group)."""
    rz, ry, rx = ranges
    zz, yy, xx = np.meshgrid(np.arange(-rz, rz + 1), np.arange(-ry, ry + 1),
                             np.arange(-rx, rx + 1), indexing='ij')
    offs = np.stack([zz, yy, xx], -1).reshape(-1, 3).astype(np.int32)
    if radius is not None and voxel_size is not None:
        vs = np.asarray(voxel_size, np.float64)[::-1] * stride   # z, y, x
        # min distance between any point of the center cell and any point of
        # the offset cell: (|o| - 1) * vs per axis, clamped at 0
        gap = np.clip(np.abs(offs) - 1, 0, None) * vs[None]
        min_dist = np.linalg.norm(gap, axis=1)
        offs = offs[min_dist < radius]
    return offs


def voxel_query(st: sp.SparseTensor, table, query_xyz, query_coords,
                query_mask, ranges, radius, nsample, voxel_size, stride,
                point_cloud_range, chunks: int = 8):
    """Find up to ``nsample`` voxel rows within ``radius`` of each query.

    Args:
        st: sparse feature tensor at this scale (coords [b, z, y, x]).
        table: dense lookup from build_row_table(st).
        query_xyz: (M, 3) grid point coordinates (world frame).
        query_coords: (M, 4) int32 [b, z, y, x] voxel coords of the queries.
        query_mask: (M,) validity.
    Returns:
        idx: (M, nsample) int32 rows into st (0 where invalid),
        valid: (M, nsample) bool.
    """
    offs = jnp.asarray(_window_offsets(ranges, radius=radius,
                                       voxel_size=voxel_size,
                                       stride=stride))       # (K, 3)
    k = offs.shape[0]
    d, h, w = st.spatial_shape
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    mins = jnp.asarray(point_cloud_range[:3], jnp.float32)
    m = query_xyz.shape[0]
    # Only chunk when the candidate buffer would be large; sequential
    # lax.map chunks underutilize the chip for the typical eval sizes.
    if m * k <= 16_000_000:
        chunks = 1
    csize = -(-m // chunks)
    pad = csize * chunks - m
    qx = jnp.pad(query_xyz, ((0, pad), (0, 0))).reshape(chunks, csize, 3)
    qc = jnp.pad(query_coords, ((0, pad), (0, 0))).reshape(chunks, csize, 4)
    qm = jnp.pad(query_mask, (0, pad)).reshape(chunks, csize)

    def one_chunk(args):
        cxyz, ccoords, cmask = args
        neigh = ccoords[:, None, 1:] + offs[None]            # (m, K, 3)
        ok = cmask[:, None]
        ok = ok & (neigh[:, :, 0] >= 0) & (neigh[:, :, 0] < d)
        ok = ok & (neigh[:, :, 1] >= 0) & (neigh[:, :, 1] < h)
        ok = ok & (neigh[:, :, 2] >= 0) & (neigh[:, :, 2] < w)
        flat = ((ccoords[:, None, 0] * d + neigh[:, :, 0]) * h
                + neigh[:, :, 1]) * w + neigh[:, :, 2]
        flat = jnp.where(ok, flat, 0)
        rows = table[flat]                                    # (m, K)
        ok = ok & (rows >= 0)
        safe = jnp.maximum(rows, 0)
        # candidate voxel centers come from the probed CELL itself — no
        # coords gather needed (an occupied cell's stored coords equal the
        # probed coords by construction)
        centers = (neigh[..., ::-1].astype(jnp.float32) + 0.5) * vs + mins
        dist2 = jnp.sum((centers - cxyz[:, None, :]) ** 2, -1)
        ok = ok & (dist2 < radius * radius)
        # first nsample in window-scan order: rank valid hits by cumsum and
        # scatter into their slot (cheaper than top_k over the K window)
        mm_ = ok.shape[0]
        rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)
        slot = jnp.where(ok & (rank <= nsample), rank - 1, nsample)
        rows_sel = jnp.zeros((mm_, nsample + 1), jnp.int32)
        rows_sel = rows_sel.at[jnp.arange(mm_)[:, None], slot].set(safe)
        hit = jnp.zeros((mm_, nsample + 1), jnp.bool_)
        hit = hit.at[jnp.arange(mm_)[:, None], slot].set(ok)
        # selected candidate centers (for the position MLP), same slots
        csel = jnp.zeros((mm_, nsample + 1, 3), jnp.float32)
        csel = csel.at[jnp.arange(mm_)[:, None], slot].set(centers)
        return rows_sel[:, :nsample], hit[:, :nsample], csel[:, :nsample]

    idx, valid, centers = jax.lax.map(one_chunk, (qx, qc, qm))
    idx = idx.reshape(-1, nsample)[:m]
    valid = valid.reshape(-1, nsample)[:m]
    centers = centers.reshape(-1, nsample, 3)[:m]
    return idx, valid, centers


class NeighborVoxelSAModule(nn.Module):
    """Multi-scale-group voxel SA module (NeighborVoxelSAModuleMSG)."""

    query_ranges: Tuple[Tuple[int, int, int], ...]
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, int], ...]     # (mid, out) per group
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]

    @nn.compact
    def __call__(self, st: sp.SparseTensor, stride, query_xyz, query_coords,
                 query_mask, train: bool):
        table = build_row_table(st)
        outs = []
        for g in range(len(self.query_ranges)):
            mid, out_c = self.mlps[g]
            feats = nn.Dense(mid, use_bias=False,
                             name=f'mlp_in{g}')(st.feats)
            feats = MaskedBatchNorm(mid, name=f'mlp_in_bn{g}')(
                feats, st.mask, train)
            idx, valid, centers = voxel_query(
                st, table, query_xyz, query_coords, query_mask,
                self.query_ranges[g], self.radii[g], self.nsamples[g],
                self.voxel_size, stride, self.point_cloud_range)
            grouped = feats[idx] * valid[..., None]          # (M, S, mid)
            rel = (centers - query_xyz[:, None, :]) * valid[..., None]
            pos = nn.Dense(mid, use_bias=False, name=f'mlp_pos{g}')(rel)
            pos = MaskedBatchNorm(mid, name=f'mlp_pos_bn{g}')(
                pos.reshape(-1, mid),
                jnp.broadcast_to(query_mask[:, None],
                                 valid.shape).reshape(-1),
                train).reshape(pos.shape)
            x = nn.relu(grouped + pos)
            x = jnp.where(valid[..., None], x, 0.0)
            x = x.max(axis=1)                                 # (M, mid)
            x = nn.Dense(out_c, use_bias=False, name=f'mlp_out{g}')(x)
            x = MaskedBatchNorm(out_c, name=f'mlp_out_bn{g}')(
                x, query_mask, train)
            outs.append(nn.relu(x))
        return jnp.concatenate(outs, axis=-1)
