"""Dense 3D voxel grids for the coarse backbone scales.

At strides >= 4 the KITTI grid is small enough to hold densely
(20x400x352 ~ 2.8M cells), and a dense ``lax.conv`` on the MXU costs ~4 ms
where the sparse gather formulation pays ~100M-rows/s gather rates
(docs/DESIGN.md S3). Submanifold sparse convolution is exactly a dense
convolution whose inputs are zero off the active set and whose outputs are
masked back to it; the strided sparse conv's output-site rule (active iff
any active input in the receptive window — spconv SparseConv3d,
``/root/reference/pcdet/models/backbones_3d/spconv_backbone.py``) is a
max-pool of the mask. So the coarse scales run dense on the MXU with a
(B, D, H, W) occupancy mask, and convert back to row form only where row
semantics are needed.

Kernels are stored in gathered-conv layout (K, C_in, C_out) with K
enumerated z-major (``ops.sparse._kernel_offsets``) so checkpoints and the
torch importer are layout-compatible with the sparse blocks; they are
reshaped to (kz, ky, kx, C_in, C_out) at trace time.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from . import sparse as sp


class DenseGrid(struct.PyTreeNode):
    """Dense voxel grid: feats (B, D, H, W, C) zeroed outside the mask,
    mask (B, D, H, W) bool."""

    feats: jnp.ndarray
    mask: jnp.ndarray

    @property
    def spatial_shape(self) -> Tuple[int, int, int]:
        return tuple(self.feats.shape[1:4])

    @property
    def batch_size(self) -> int:
        return self.feats.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]


def grid_from_sparse(st: sp.SparseTensor) -> DenseGrid:
    """Scatter a SparseTensor's rows into a DenseGrid."""
    d, h, w = st.spatial_shape
    b = st.batch_size
    flat = ((st.coords[:, 0] * d + st.coords[:, 1]) * h
            + st.coords[:, 2]) * w + st.coords[:, 3]
    size = b * d * h * w
    flat = jnp.where(st.mask, flat, size)
    feats = jnp.zeros((size + 1, st.num_channels), st.feats.dtype)
    feats = feats.at[flat].set(
        jnp.where(st.mask[:, None], st.feats, 0.0))
    mask = jnp.zeros((size + 1,), jnp.bool_).at[flat].set(st.mask)
    return DenseGrid(feats=feats[:size].reshape(b, d, h, w, -1),
                     mask=mask[:size].reshape(b, d, h, w))


def grid_to_sparse(grid: DenseGrid, capacity: int) -> sp.SparseTensor:
    """Compact a DenseGrid's active cells into a SparseTensor (rows emerge
    in linearized-key order, i.e. already sorted). Cells beyond
    ``capacity`` are dropped in scan order."""
    b, d, h, w = grid.mask.shape
    m = grid.mask.reshape(-1)
    c = grid.num_channels
    rank = jnp.cumsum(m.astype(jnp.int32)) - 1
    slot = jnp.where(m & (rank < capacity), rank, capacity)
    src = jnp.arange(m.shape[0], dtype=jnp.int32)
    sel = jnp.full((capacity + 1,), -1, jnp.int32).at[slot].set(src)[:capacity]
    valid = sel >= 0
    safe = jnp.maximum(sel, 0)
    feats = grid.feats.reshape(-1, c)[safe]
    feats = jnp.where(valid[:, None], feats, 0.0)
    bi = safe // (d * h * w)
    rem = safe % (d * h * w)
    zi = rem // (h * w)
    yi = (rem % (h * w)) // w
    xi = rem % w
    coords = jnp.stack([bi, zi, yi, xi], -1)
    coords = jnp.where(valid[:, None], coords, -1)
    return sp.SparseTensor(feats=feats, coords=coords, mask=valid,
                           spatial_shape=(d, h, w), batch_size=b)


def _dense_kernel(w_gathered, kernel_size):
    """(K, C_in, C_out) z-major -> (kz, ky, kx, C_in, C_out)."""
    kz, ky, kx = kernel_size
    k, cin, cout = w_gathered.shape
    assert k == kz * ky * kx
    return w_gathered.reshape(kz, ky, kx, cin, cout)


def dense_conv3d(x, w_gathered, kernel_size, stride=(1, 1, 1),
                 padding='SAME'):
    """NDHWC conv with a gathered-layout kernel."""
    w = _dense_kernel(w_gathered, kernel_size)
    if padding == 'SAME':
        pads = [((k - 1) // 2, k // 2) for k in kernel_size]
    elif padding == 'VALID':
        pads = [(0, 0)] * 3
    else:
        pads = [tuple(p) for p in padding]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=pads,
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))


def down_mask(mask, kernel_size, stride, padding):
    """Strided sparse-conv output-site rule: active iff any active input in
    the receptive window (max-pool of the mask)."""
    pads = [(0, 0)] + [tuple(p) if not isinstance(p, int) else (p, p)
                       for p in padding]
    return jax.lax.reduce_window(
        mask, False, jax.lax.bitwise_or,
        window_dimensions=(1,) + tuple(kernel_size),
        window_strides=(1,) + tuple(stride),
        padding=pads)


def masked(grid: DenseGrid) -> DenseGrid:
    return grid.replace(
        feats=jnp.where(grid.mask[..., None], grid.feats, 0.0))
