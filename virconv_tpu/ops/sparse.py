"""Sparse voxel tensor substrate for TPU.

The reference builds on spconv's dynamic ``SparseConvTensor`` (CUDA hash
tables + gather/scatter GEMMs, see ``/root/reference/pcdet/utils/
spconv_utils.py:33-36``). On TPU everything under ``jit`` must have static
shapes, so a sparse tensor here is a *fixed-capacity* array triple:

    feats  : (N, C)  float   -- padded rows are zero
    coords : (N, D+1) int32  -- [b, z, y, x] (3D) or [b, y, x] (2D); padded
                                rows are -1
    mask   : (N,)    bool    -- row validity

The central invariant used by every conv/query op: **rows are sorted by the
linearized voxel key** (batch-major, then z, y, x) with invalid rows keyed to
INT32_MAX so they sort last. Neighbor lookup is then a vectorized binary
search (`jnp.searchsorted`) instead of a GPU hash probe, and the gathered
per-offset feature blocks feed dense MXU matmuls.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

INVALID_KEY = jnp.iinfo(jnp.int32).max


@struct.dataclass
class SparseTensor:
    """Fixed-capacity sparse voxel tensor (rows sorted by voxel key)."""

    feats: jnp.ndarray                 # (N, C)
    coords: jnp.ndarray                # (N, ndim+1) int32, [b, *spatial]
    mask: jnp.ndarray                  # (N,) bool
    spatial_shape: Tuple[int, ...] = struct.field(pytree_node=False)
    batch_size: int = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.feats.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def ndim(self) -> int:
        return len(self.spatial_shape)

    def keys(self) -> jnp.ndarray:
        return coords_to_keys(self.coords, self.spatial_shape,
                              self.batch_size, self.mask)

    def replace_feats(self, feats: jnp.ndarray) -> "SparseTensor":
        return self.replace(feats=feats)


def key_order(ndim: int) -> Tuple[int, ...]:
    """Spatial-axis linearization order of the canonical sort key.

    3D coords are [b, z, y, x] but the key is linearized (b, y, x, z) — z
    fastest — so ALL 27 neighbors of a site live within a ±(gx*gz + gz + 1)
    key band (3 adjacent y-slabs): the locality the band-window Pallas conv
    kernel (ops/pallas/band_conv.py) exploits. 2D image-plane coords
    [b, u, v] keep (u, v) order (v fastest), giving the same 3-u-column
    locality for the 2D convs.
    """
    return (1, 2, 0) if ndim == 3 else tuple(range(ndim))


def key_strides(spatial_shape: Sequence[int]):
    """Per-spatial-axis multiplier in the linearized key, and the total
    cell count per batch entry."""
    order = key_order(len(spatial_shape))
    strides = [0] * len(spatial_shape)
    m = 1
    for ax in reversed(order):
        strides[ax] = m
        m *= int(spatial_shape[ax])
    return tuple(strides), m


def coords_to_keys(coords: jnp.ndarray, spatial_shape: Sequence[int],
                   batch_size: int, mask: jnp.ndarray) -> jnp.ndarray:
    """Linearize [b, *spatial] int coords into sortable int32 keys (in
    ``key_order`` axis order).

    Invalid rows map to INVALID_KEY (sorts last). The caller must guarantee
    batch_size * prod(spatial_shape) < 2**31.
    """
    strides, m = key_strides(spatial_shape)
    total = batch_size * m
    assert total < 2**31, f'key space {total} overflows int32'
    key = coords[:, 0] * m
    for i, s in enumerate(strides):
        key = key + coords[:, i + 1] * s
    return jnp.where(mask, key.astype(jnp.int32), INVALID_KEY)


def sort_by_key(st: SparseTensor) -> SparseTensor:
    """Sort rows ascending by voxel key; invalid rows move to the end."""
    return sort_by_key_with_perm(st)[0]


def sort_by_key_with_perm(st: SparseTensor):
    """Sort rows by key; also return the permutation applied (new <- old)."""
    keys = st.keys()
    order = jnp.argsort(keys)
    st = st.replace(feats=st.feats[order], coords=st.coords[order],
                    mask=st.mask[order])
    return st, order


def dedup_sorted(st: SparseTensor) -> SparseTensor:
    """Drop duplicate-key rows of an already-sorted tensor (keep first)."""
    keys = st.keys()
    is_first = jnp.concatenate(
        [jnp.array([True]), keys[1:] != keys[:-1]])
    new_mask = st.mask & is_first
    return st.replace(mask=new_mask,
                      coords=jnp.where(new_mask[:, None], st.coords, -1),
                      feats=jnp.where(new_mask[:, None], st.feats, 0.0))


def compact_sorted(st: SparseTensor, capacity: int) -> SparseTensor:
    """Re-sort (pushing invalid rows last) and truncate/pad to ``capacity``.

    Works on any tensor; output is sorted by key with valid rows first.
    """
    st = sort_by_key(st)
    n = st.capacity
    if capacity == n:
        return st
    if capacity < n:
        return st.replace(feats=st.feats[:capacity],
                          coords=st.coords[:capacity],
                          mask=st.mask[:capacity])
    pad = capacity - n
    return st.replace(
        feats=jnp.pad(st.feats, ((0, pad), (0, 0))),
        coords=jnp.pad(st.coords, ((0, pad), (0, 0)), constant_values=-1),
        mask=jnp.pad(st.mask, (0, pad)))


def lookup(sorted_keys: jnp.ndarray, query_keys: jnp.ndarray) -> jnp.ndarray:
    """Find row indices of query keys in a sorted key array.

    Returns int32 indices; -1 where a query key is absent (or invalid).
    This is the TPU analog of spconv's hash-table probe. method='sort'
    (merge-based) measures ~4.5x faster than the default binary-search scan
    on TPU for the multi-million-query workloads of neighbor-map builds.
    """
    pos = jnp.searchsorted(sorted_keys, query_keys,
                           method='sort').astype(jnp.int32)
    n = sorted_keys.shape[0]
    pos_c = jnp.minimum(pos, n - 1)
    hit = (sorted_keys[pos_c] == query_keys) & (query_keys != INVALID_KEY)
    return jnp.where(hit, pos_c, -1)


# Key spaces up to this many cells use a dense scatter table for neighbor
# lookup (O(1) gathers) instead of sorted binary search. 128M int32 = 512 MB
# transient — cheap next to conv activations, ~10x faster than searchsorted.
# Sized to keep the stride-2 scale (11.8M cells/entry, 13.0M with halo) in
# dense mode up to the 9-entry ceiling of batch*ROT_NUM on int32 keys: a
# 96M budget silently dropped stride-2 to searchsorted exactly when
# bench.py batched 3 frames.
DENSE_LOOKUP_MAX = 128_000_000


def make_lookup(st: "SparseTensor"):
    """Build a key->row lookup function for one coordinate set.

    Dense-table mode when the linearized key space fits the budget (all
    strided scales and the 2D image grid); sorted binary search otherwise
    (the full-resolution 3D grid). The returned function maps int32 key
    arrays (INVALID_KEY allowed) to row indices with -1 for misses.
    """
    total = st.batch_size
    for s in st.spatial_shape:
        total *= int(s)
    keys = st.keys()
    if total <= DENSE_LOOKUP_MAX:
        slot = jnp.where(st.mask, keys, total)
        table = jnp.full((total + 1,), -1, jnp.int32)
        table = table.at[slot].set(
            jnp.where(st.mask, jnp.arange(st.capacity, dtype=jnp.int32), -1))

        def dense_fn(qk):
            qc = jnp.where((qk >= 0) & (qk < total), qk, total)
            return table[qc]
        return dense_fn
    return lambda qk: lookup(keys, qk)


def _kernel_offsets(kernel_size: Sequence[int]) -> jnp.ndarray:
    """All integer offsets of a centered kernel, shape (K, ndim)."""
    import numpy as np
    ranges = [np.arange(k) - k // 2 for k in kernel_size]
    grid = np.stack(np.meshgrid(*ranges, indexing='ij'), axis=-1)
    return jnp.asarray(grid.reshape(-1, len(kernel_size)), dtype=jnp.int32)


def build_subm_neighbor_map(st: SparseTensor,
                            kernel_size) -> jnp.ndarray:
    """Neighbor map for submanifold conv: (N, K) row indices, -1 = missing.

    For each valid output site (== input site), entry k points at the input
    row whose coords equal ``site + offset_k``. Equivalent to the spconv
    "rulebook" built once per ``indice_key`` and reused by every layer that
    shares it (``/root/reference/pcdet/models/backbones_3d/
    spconv_backbone.py:86-107``).
    Requires ``st`` sorted by key.
    """
    ndim = st.ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim
    offsets = _kernel_offsets(kernel_size)              # (K, ndim)
    strides, m = key_strides(st.spatial_shape)
    coords = st.coords                                  # (N, ndim+1)
    neigh = coords[:, None, 1:] + offsets[None, :, :]   # (N, K, ndim)
    ok = st.mask[:, None]
    for i, s in enumerate(st.spatial_shape):
        ok = ok & (neigh[:, :, i] >= 0) & (neigh[:, :, i] < s)
    nkey = coords[:, None, 0].astype(jnp.int32) * m
    for i, s in enumerate(strides):
        nkey = nkey + neigh[:, :, i] * s
    nkey = jnp.where(ok, nkey, INVALID_KEY)
    return make_lookup(st)(nkey.reshape(-1)).reshape(nkey.shape)  # (N, K)


@jax.checkpoint
def gathered_conv(feats: jnp.ndarray, neighbor_map: jnp.ndarray,
                  weights: jnp.ndarray,
                  out_mask: jnp.ndarray) -> jnp.ndarray:
    """Apply a sparse conv given a neighbor map: gather + per-offset matmul.

    Args:
        feats: (N_in, C_in) input features.
        neighbor_map: (N_out, K) indices into feats, -1 = no contribution.
        weights: (K, C_in, C_out).
        out_mask: (N_out,) validity of output rows.
    Returns:
        (N_out, C_out) float32 features (padded rows zero).

    Each kernel offset contributes one (N_out, C_in) @ (C_in, C_out) matmul —
    dense, static-shape work for the MXU; missing neighbors are zeroed rows.

    ``jax.checkpoint``: without it the K per-offset gathered (N, C_in)
    blocks are saved for backward — (N, 27, C) per conv layer, tens of GB
    across the backbone at train batch sizes. Remat re-gathers in the
    backward pass instead (a no-op under eval, where nothing is saved).
    """
    k = neighbor_map.shape[1]
    out = None
    for j in range(k):
        idx = neighbor_map[:, j]
        safe = jnp.maximum(idx, 0)
        g = feats[safe] * (idx >= 0)[:, None].astype(feats.dtype)
        contrib = jnp.dot(g, weights[j], preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return out * out_mask[:, None].astype(out.dtype)


def _gathered_conv_raw(feats, neighbor_map, weights):
    """K gathers + K accumulating matmuls, no output masking."""
    k = neighbor_map.shape[1]
    out = None
    for j in range(k):
        idx = neighbor_map[:, j]
        safe = jnp.maximum(idx, 0)
        g = feats[safe] * (idx >= 0)[:, None].astype(feats.dtype)
        contrib = jnp.dot(g, weights[j], preferred_element_type=jnp.float32)
        out = contrib if out is None else out + contrib
    return out


@jax.custom_vjp
def gathered_conv_train(feats, neighbor_map, transpose_map, weights,
                        out_mask, in_mask):
    """gathered_conv with a gather-only custom VJP.

    The autodiff backward of a row-gather is a scatter-add — the slowest
    primitive class on TPU (docs/DESIGN.md S8). But the transpose of a
    sparse conv is itself a sparse conv over the *same* key sets: input row
    p receives gradient from exactly the output rows whose tap k reads p,
    i.e. ``dfeats[p] = sum_k g[transpose_map[p, k]] @ W[k]^T``. With the
    transpose map precomputed (submanifold: the tap-reversed neighbor map;
    strided: :func:`build_strided_transpose_map`), the whole backward is
    gathers + matmuls — no scatter ever.  dW re-gathers the forward blocks
    (cheap remat) so nothing big is saved for backward either.

    Reference behavior target: spconv's gather-GEMM backward
    (``/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:86-131``
    relies on spconv's fused scatter kernels; TPU gets the algebraic
    transpose instead).

    Args:
        feats: (N_in, C) input rows.
        neighbor_map: (N_out, K) input row per (output, tap), -1 missing.
        transpose_map: (N_in, K) output row whose tap k reads each input
            row, -1 missing.
        weights: (K, C, C').
        out_mask: (N_out,) bool; in_mask: (N_in,) bool.
    """
    return _gathered_conv_raw(feats, neighbor_map, weights) \
        * out_mask[:, None].astype(jnp.float32)


def _gct_fwd(feats, neighbor_map, transpose_map, weights, out_mask, in_mask):
    out = gathered_conv_train(feats, neighbor_map, transpose_map, weights,
                              out_mask, in_mask)
    return out, (feats, neighbor_map, transpose_map, weights, out_mask,
                 in_mask)


def _gct_bwd(res, g):
    feats, nmap, tmap, w, out_mask, in_mask = res
    g = g * out_mask[:, None].astype(g.dtype)
    k = w.shape[0]
    # dfeats: transpose conv — gathers of g via the transpose map, with
    # W[k]^T as the tap weights (see derivation in the docstring)
    wt = jnp.swapaxes(w, 1, 2)                          # (K, C', C)
    dfeats = _gathered_conv_raw(g, tmap, wt) \
        * in_mask[:, None].astype(jnp.float32)
    dfeats = dfeats.astype(feats.dtype)
    # dW[k] = (forward gather block k)^T @ g — re-gathered, not saved
    dw = []
    for j in range(k):
        idx = nmap[:, j]
        safe = jnp.maximum(idx, 0)
        blk = feats[safe] * (idx >= 0)[:, None].astype(feats.dtype)
        dw.append(jnp.dot(blk.T, g, preferred_element_type=jnp.float32))
    dw = jnp.stack(dw).astype(w.dtype)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dfeats, f0(nmap), f0(tmap), dw, f0(out_mask), f0(in_mask)


gathered_conv_train.defvjp(_gct_fwd, _gct_bwd)


def build_strided_transpose_map(st_in: SparseTensor, st_out: SparseTensor,
                                stride, padding, kernel_size) -> jnp.ndarray:
    """(N_in, K) map for the strided-conv transpose: entry (p, k) is the
    OUTPUT row whose tap k reads input row p — the output site at
    ``(coords_in[p] + pad - offset_k) / stride`` when that division is
    exact and in bounds, else -1. Built with the same sorted-key lookup as
    the forward maps."""
    ndim = st_in.ndim
    if isinstance(stride, int):
        stride = (stride,) * ndim
    if isinstance(padding, int):
        padding = (padding,) * ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim

    import numpy as np_
    ranges = [np_.arange(kk) for kk in kernel_size]
    offsets = jnp.asarray(
        np_.stack(np_.meshgrid(*ranges, indexing='ij'), axis=-1)
        .reshape(-1, ndim), dtype=jnp.int32)                # (K, ndim)

    num = st_in.coords[:, None, 1:] + jnp.asarray(
        [padding], jnp.int32)[:, None, :] - offsets[None]   # (N_in, K, ndim)
    sv = jnp.asarray(stride, jnp.int32)
    q = num // sv
    ok = st_in.mask[:, None] & (num % sv == 0).all(-1) & (q >= 0).all(-1)
    for i, s in enumerate(st_out.spatial_shape):
        ok = ok & (q[:, :, i] < s)
    strides_out, m = key_strides(st_out.spatial_shape)
    qkey = st_in.coords[:, None, 0].astype(jnp.int32) * m
    for i, s in enumerate(strides_out):
        qkey = qkey + q[:, :, i] * s
    qkey = jnp.where(ok, qkey, INVALID_KEY)
    return make_lookup(st_out)(qkey.reshape(-1)).reshape(qkey.shape)


def downsample_coords(st: SparseTensor, stride, padding,
                      kernel_size, out_capacity: int) -> SparseTensor:
    """Output sites of a strided sparse conv (the spconv SparseConv3d set).

    An output site o exists iff some input site p satisfies
    ``o*stride - pad + k == p`` for a kernel tap k. Each input contributes at
    most 2 candidate outputs per dim for the (k=3, s=2, p=1) blocks used by
    the backbone; candidates are enumerated, deduplicated by sorted unique,
    and compacted to ``out_capacity``. Output features are zero placeholders
    (fill via ``gathered_conv`` with a strided neighbor map).
    """
    ndim = st.ndim
    if isinstance(stride, int):
        stride = (stride,) * ndim
    if isinstance(padding, int):
        padding = (padding,) * ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim

    out_shape = tuple(
        (st.spatial_shape[i] + 2 * padding[i] - kernel_size[i]) // stride[i] + 1
        for i in range(ndim))

    # Per-dim candidate output coordinates for each input site.
    # o in [ceil((p + pad - k + 1)/s), floor((p + pad)/s)] for k in [0, K).
    # Everything runs on bare int32 keys: two single-operand sorts replace
    # the earlier sort/dedup/compact over a full candidate SparseTensor
    # (2 argsorts + coord/feat/mask gathers), which measured 38 ms at the
    # fine scale (983k candidate rows) — the keys-only form is ~3x cheaper.
    key_mul, m_total = key_strides(out_shape)
    assert st.batch_size * m_total < 2**31, 'out key space overflows int32'
    cand_per_dim = []        # per-dim key contribution (N, max_c) or -1
    n_cand_per_dim = []
    for i in range(ndim):
        p = st.coords[:, i + 1] + padding[i]
        lo = -(-(p - kernel_size[i] + 1) // stride[i])
        hi = p // stride[i]
        max_c = (kernel_size[i] + stride[i] - 1) // stride[i]
        offs = jnp.arange(max_c, dtype=jnp.int32)
        c = lo[:, None] + offs[None, :]                       # (N, max_c)
        valid = (c <= hi[:, None]) & (c >= 0) & (c < out_shape[i])
        cand_per_dim.append(jnp.where(valid, c * key_mul[i], -1))
        n_cand_per_dim.append(max_c)

    # Cartesian product of per-dim key contributions -> (N, prod(max_c))
    total = 1
    for m in n_cand_per_dim:
        total *= m
    n = st.capacity
    key = jnp.zeros((n, total), dtype=jnp.int32)
    ok = jnp.broadcast_to(st.mask[:, None], (n, total))
    rep = total
    for i in range(ndim):
        rep //= n_cand_per_dim[i]
        tile = total // (rep * n_cand_per_dim[i])
        col = jnp.tile(jnp.repeat(cand_per_dim[i], rep, axis=1), (1, tile))
        ok = ok & (col >= 0)
        key = key + jnp.maximum(col, 0)
    key = key + st.coords[:, :1].astype(jnp.int32) * m_total
    keys = jnp.where(ok, key, INVALID_KEY).reshape(-1)

    srt = jnp.sort(keys)
    is_first = jnp.concatenate([jnp.array([True]), srt[1:] != srt[:-1]])
    uniq = jnp.where(is_first, srt, INVALID_KEY)
    out_keys = jnp.sort(uniq)
    if out_capacity <= out_keys.shape[0]:
        out_keys = out_keys[:out_capacity]
    else:
        out_keys = jnp.pad(out_keys, (0, out_capacity - out_keys.shape[0]),
                           constant_values=INVALID_KEY)

    out_mask = out_keys != INVALID_KEY
    safe = jnp.where(out_mask, out_keys, 0)
    cols = [(safe // m_total).astype(jnp.int32)]
    for i in range(ndim):
        cols.append(((safe // key_mul[i]) % out_shape[i]).astype(jnp.int32))
    out_coords = jnp.where(out_mask[:, None], jnp.stack(cols, axis=1), -1)
    return SparseTensor(
        feats=jnp.zeros((out_capacity, 1), dtype=st.feats.dtype),
        coords=out_coords, mask=out_mask,
        spatial_shape=out_shape, batch_size=st.batch_size)


def build_strided_neighbor_map(st_in: SparseTensor, st_out: SparseTensor,
                               stride, padding, kernel_size) -> jnp.ndarray:
    """Neighbor map (N_out, K) for a strided sparse conv.

    Entry (o, k) is the input row at ``coords_out[o]*stride - pad + offset_k``
    or -1. Both tensors must be sorted by key.
    """
    ndim = st_in.ndim
    if isinstance(stride, int):
        stride = (stride,) * ndim
    if isinstance(padding, int):
        padding = (padding,) * ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim

    import numpy as np
    ranges = [np.arange(k) for k in kernel_size]
    offsets = jnp.asarray(
        np.stack(np.meshgrid(*ranges, indexing='ij'), axis=-1)
        .reshape(-1, ndim), dtype=jnp.int32)               # (K, ndim)

    base = jnp.stack(
        [st_out.coords[:, i + 1] * stride[i] - padding[i]
         for i in range(ndim)], axis=-1)                   # (N_out, ndim)
    neigh = base[:, None, :] + offsets[None, :, :]         # (N_out, K, ndim)
    ok = st_out.mask[:, None]
    for i, s in enumerate(st_in.spatial_shape):
        ok = ok & (neigh[:, :, i] >= 0) & (neigh[:, :, i] < s)
    strides_in, m = key_strides(st_in.spatial_shape)
    nkey = st_out.coords[:, None, 0].astype(jnp.int32) * m
    for i, s in enumerate(strides_in):
        nkey = nkey + neigh[:, :, i] * s
    nkey = jnp.where(ok, nkey, INVALID_KEY)
    return make_lookup(st_in)(nkey.reshape(-1)).reshape(nkey.shape)


# --------------------------------------------------------------------------
# Band-window conv plans (ops/pallas/band_conv.py): per-scale precomputation
# shared by every layer on one key set — replaces the neighbor maps (and
# their 27N lookup-gathers) on the eval path.
# --------------------------------------------------------------------------

def _band_geometry(spatial_shape, offsets_np):
    """Static (deltas, group_of) for taps given in coordinate offsets."""
    import numpy as np
    strides, _ = key_strides(spatial_shape)
    deltas = tuple(int((offsets_np * np.asarray(strides)).sum(1)[t])
                   for t in range(len(offsets_np)))
    major = key_order(len(spatial_shape))[0]
    vals = sorted(set(int(v) for v in offsets_np[:, major]))
    group_of = tuple(vals.index(int(v)) for v in offsets_np[:, major])
    return deltas, group_of


def _pack_valid_bits(ok: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    """(N, K) tap-validity bools + (N,) row mask -> packed int32 bits."""
    from .pallas.band_conv import ROW_VALID_BIT
    k = ok.shape[1]
    assert k < ROW_VALID_BIT
    weights = (1 << jnp.arange(k, dtype=jnp.int32))
    bits = (ok.astype(jnp.int32) * weights[None, :]).sum(axis=1)
    return bits | (row_mask.astype(jnp.int32) << ROW_VALID_BIT)


def halo_keys(coords: jnp.ndarray, spatial_shape, batch_size: int,
              mask: jnp.ndarray) -> jnp.ndarray:
    """Linearize coords in a +1-halo key space (spatial_shape + 2 per axis,
    coords shifted by +1).  Any conv-window neighbor of an in-bounds cell
    (per-axis offset within [-1, +1] of the valid coord range) then has a
    UNIQUE in-range halo key, so out-of-bounds taps can never alias a real
    voxel: a key miss IS the bounds test, and band plans need no per-tap
    validity bits.  Same (b, y, x, z) lexicographic order as the canonical
    key, so rows sorted by one are sorted by the other."""
    ss_h = tuple(int(s) + 2 for s in spatial_shape)
    strides, m = key_strides(ss_h)
    total = batch_size * m
    assert total < 2**31, f'halo key space {total} overflows int32'
    key = coords[:, 0] * m
    for i, s in enumerate(strides):
        key = key + (coords[:, i + 1] + 1) * s
    return jnp.where(mask, key.astype(jnp.int32), INVALID_KEY)


def subm_band_plan(st: SparseTensor, kernel_size, tile: int = 128,
                   block: int = 256):
    """Band-conv plan for a submanifold conv on ``st`` (sorted by key).

    Built in the halo key space: out-of-bounds taps miss by construction,
    so the (N, K) per-tap bounds test and bit-pack of the original
    formulation disappear (measured 3-4 ms of each layer's plan)."""
    import numpy as np
    from .pallas.band_conv import ROW_VALID_BIT, band_plan
    ndim = st.ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim
    # the +1-halo key space only de-aliases per-axis offsets within
    # [-1, +1]; a 5^3 kernel would silently alias halo keys into
    # neighboring rows (mirrors the padding <= 1 assert in
    # strided_band_plan)
    assert all(k <= 3 for k in kernel_size), kernel_size
    offsets_np = np.stack(np.meshgrid(
        *[np.arange(kk) - kk // 2 for kk in kernel_size],
        indexing='ij'), -1).reshape(-1, ndim)
    ss_h = tuple(int(s) + 2 for s in st.spatial_shape)
    deltas, group_of = _band_geometry(ss_h, offsets_np)
    keys = halo_keys(st.coords, st.spatial_shape, st.batch_size, st.mask)
    base = jnp.where(st.mask, keys, 0)
    k = offsets_np.shape[0]
    mask_i = st.mask.astype(jnp.int32)
    bits = mask_i * ((1 << k) - 1) | (mask_i << ROW_VALID_BIT)
    return band_plan(keys, base, bits, deltas, group_of, tile, block), keys


def strided_band_plan(st_in: SparseTensor, st_out: SparseTensor, stride,
                      padding, kernel_size, tile: int = 128,
                      block: int = 512):
    """Band-conv plan for a strided conv st_in -> st_out (both sorted)."""
    import numpy as np
    ndim = st_in.ndim
    if isinstance(stride, int):
        stride = (stride,) * ndim
    if isinstance(padding, int):
        padding = (padding,) * ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim
    offsets_np = np.stack(np.meshgrid(
        *[np.arange(kk) for kk in kernel_size],
        indexing='ij'), -1).reshape(-1, ndim)
    # halo key space (see halo_keys): the query origin coord*stride - pad
    # is >= -1 per axis for pad <= 1, and every window tap of a valid
    # output lands inside [-1, s_in], so all tap keys are unique in-halo —
    # out-of-bounds taps miss instead of aliasing, no validity bits needed
    assert all(p <= 1 for p in padding), padding
    from .pallas.band_conv import ROW_VALID_BIT, band_plan
    ss_h = tuple(int(s) + 2 for s in st_in.spatial_shape)
    deltas, group_of = _band_geometry(ss_h, offsets_np)
    base_c = jnp.stack([st_out.coords[:, i + 1] * stride[i] - padding[i]
                        for i in range(ndim)], -1)          # (N_out, ndim)
    strides_h, m = key_strides(ss_h)
    base = st_out.coords[:, 0] * m
    for i, s in enumerate(strides_h):
        base = base + (base_c[:, i] + 1) * s
    base = jnp.where(st_out.mask, base.astype(jnp.int32), 0)
    keys_in = halo_keys(st_in.coords, st_in.spatial_shape,
                        st_in.batch_size, st_in.mask)
    k = offsets_np.shape[0]
    mask_i = st_out.mask.astype(jnp.int32)
    bits = mask_i * ((1 << k) - 1) | (mask_i << ROW_VALID_BIT)
    return (band_plan(keys_in, base, bits, deltas, group_of, tile, block),
            keys_in)


def band_enabled() -> bool:
    """Whether eval-path convs use the band-window Pallas kernel.

    Defaults to TPU-only (the CPU fallback is interpret mode — fine for
    unit tests, far too slow for whole-model runs). Override with
    VIRCONV_BAND=0/1. NOTE: read at trace time — toggling the env var
    after a jitted function is compiled has no effect until a fresh
    trace (new process or cache-missing jit); A/B measurements need one
    process per setting.
    """
    import os
    env = os.environ.get('VIRCONV_BAND')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() == 'tpu'


def band_train_enabled() -> bool:
    """Whether TRAINING 3D submanifold convs run the differentiable band
    kernel (custom VJP, _band_train) instead of the neighbor-map gather
    path. Replaces both the per-step 27-lookup map builds and the gather
    convs with band kernels in forward AND backward.

    ON by default (VIRCONV_BAND_TRAIN=0 reverts): its stated gate is met —
    the 450-epoch mini-KITTI campaign converged with it enabled
    (docs/DESIGN.md §14) and it measures 2.67 vs 2.95 s/iter
    (tools/bench_train.py). Gradients default to f32 matmuls on this path
    (see :func:`band_train_bf16_enabled`) so precision matches the nmap
    path it replaces. TPU only: the CPU fallback is interpret mode.
    Trace-time capture, same caveat as :func:`band_enabled`."""
    import os
    env = os.environ.get('VIRCONV_BAND_TRAIN')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() == 'tpu'


def band_train_bf16_enabled() -> bool:
    """Whether the TRAIN band path computes in bf16 (f32 accumulation).

    Default off: the train ctx inherits bf16 only when explicitly asked
    (VIRCONV_BAND_TRAIN_BF16=1), keeping gradient precision at parity
    with the f32 nmap train path (ADVICE r4: bf16 dW/dfeats silently
    lowered precision while parity tests exercised bf16=False)."""
    import os
    return os.environ.get('VIRCONV_BAND_TRAIN_BF16', '0') not in (
        '0', 'false', 'False')


def feats_bf16_enabled() -> bool:
    """Whether band-mode eval convs emit bf16 inter-layer features.

    The band kernel computes in bf16 internally either way (matmuls) with
    f32 accumulation; this flag additionally *stores* the (N, C) tensors
    between layers as bf16, halving the HBM read/write traffic of every
    conv, BN-fold epilogue and window DMA on the eval path. Off by
    default until measured (VIRCONV_BF16_FEATS=1 to enable); trace-time
    capture, same caveat as :func:`band_enabled`."""
    import os
    return os.environ.get('VIRCONV_BF16_FEATS', '0') not in ('0', 'false',
                                                             'False')


def dense2d_enabled() -> bool:
    """Whether the NRConv image-plane 2D convs run as DENSE MXU convs.

    The 2D grid is tiny (<=1400x600 cells at stride 1, shrinking 4x per
    block), so scatter -> two dense convs -> gather beats every sparse
    formulation: no sort/un-sort round trip, no per-tap gathers, no plan
    build — the 3x3 convs run as dense convs in NCHW layout (channels
    on the sublane axis; a channels-minor layout would pad C=8..32 rows to
    128 lanes). Takes precedence over band2d when enabled.

    Default OFF: measured 2.986 fps e2e vs 3.122 for the band 2D path
    (v5e, FRAMES=1, round 5) — XLA's conv lowering at C=8..32 NCHW plus
    the dense scatter cost more than the sort/band round trip they
    replace. Kept as a tested experiment (tests/test_dense2d.py);
    VIRCONV_DENSE2D=1 enables. Trace-time capture, same caveat as
    :func:`band_enabled`."""
    import os
    return os.environ.get('VIRCONV_DENSE2D', '0') not in ('0', 'false',
                                                          'False')


def band2d_enabled() -> bool:
    """Whether the NRConv image-plane 2D convs use the band kernel too.

    VIRCONV_BAND2D=0 keeps the eval 2D branch on the dense-table nmap
    path (no sort/un-sort round trip; the 0.96M-cell image grid makes the
    9-tap map build one cheap table gather per tap) — the A/B switch for
    measuring the band path's sort cost on hardware. Trace-time capture,
    same caveat as :func:`band_enabled`."""
    import os
    return os.environ.get('VIRCONV_BAND2D', '1') not in ('0', 'false',
                                                         'False')


class ConvCtx:
    """Per-(key set, geometry) conv context shared by sibling layers.

    Two modes:
      * 'nmap' — XLA gather path (training: differentiable; also the
        correctness oracle).
      * 'band' — band-window Pallas kernel plus a fixed-capacity gather
        patch: rows of tiles whose window exceeds the two-block span
        (a handful of slab-straddling tiles per scale, measured <=0.5%
        of rows) are recomputed exactly via a small neighbor map. If the
        patch capacity overflows (never observed at KITTI occupancy), a
        jit-time ``lax.cond`` falls back to the full nmap path, so the
        result is exact for any input.
    """

    def __init__(self, kind, n_taps, apply_fn):
        self.kind = kind
        self.n_taps = n_taps
        self._apply = apply_fn

    def conv(self, feats, weights, scale=None, bias=None, relu=False):
        """feats (N_in, C) -> (N_out, C') for weights (K, C, C').

        ``scale``/``bias``/``relu`` fuse an eval-mode-BN affine + ReLU
        epilogue into the conv (band mode: inside the Pallas kernel;
        nmap mode: XLA-fused elementwise tail). Output rows of invalid
        sites are zero either way.
        """
        return self._apply(feats, weights, scale, bias, relu)


def _epilogue(out, mask, scale, bias, relu):
    """Affine + ReLU + re-mask tail of the XLA conv paths (the band kernel
    applies the same epilogue in-register)."""
    if scale is not None:
        out = out * scale + bias
    if relu:
        out = jnp.maximum(out, 0.0)
    if scale is not None:      # bias may un-zero invalid rows
        out = jnp.where(mask[:, None], out, 0.0)
    return out


BAND_PATCH_CAP = 2048
# Bad rows (slab-straddling + entry-boundary tiles) scale with batch
# entries: measured ~0.4-0.5% of rows at KITTI occupancy. A fixed cap that
# fits 3 entries overflows at 9 (batch=3 x ROT_NUM=3), tripping the full
# nmap fallback for EVERY conv layer — the 2.6x per-frame blowup first seen
# when bench.py went to FRAMES=3. Scale the cap with rows instead.
BAND_PATCH_FRACTION = 64   # cap >= n_out / 64 = 1.6% of rows
# Strided plans keep more headroom: a strided output tile spans ~2x the
# input key range of a submanifold tile, so coarse scales straddle more
# often (round-4 device trace: at block=256 the stride-4/8 down convs hit
# bad = 8-26% of rows, overflowed the cap, and silently took the ~40 ms
# slow-nmap branch EVERY frame — 4 layers, ~25% of the e2e frame).
BAND_PATCH_FRACTION_STRIDED = 16


def _band_patch(plan, lookup_fn, first_index=None, patch_cap=None,
                fraction=None):
    """Gather-patch plan for rows of non-fitting band tiles.

    Returns (idx, valid, pnmap, cnt, cap): up to ``cap`` row indices whose
    band output must be replaced, their validity, a (cap, K) neighbor map
    (built with the same lookup as the nmap oracle), the true bad-row
    count (cnt > cap -> caller must fall back), and the static cap.
    ``first_index``: optional duplicate-key representative remap so the
    patch matches the in-kernel first-wins gather semantics (2D tensors).
    """
    from .pallas.band_conv import INVALID_KEY, ROW_VALID_BIT
    n_out = plan.n_out
    if patch_cap is None:
        # read at call time (testable); grows with rows so multi-entry
        # batches keep the same headroom ratio as single frames
        patch_cap = max(BAND_PATCH_CAP,
                        n_out // (fraction or BAND_PATCH_FRACTION))
    k = len(plan.deltas)
    flat_base = plan.base_keys.reshape(-1)[:n_out]
    flat_bits = plan.valid_bits.reshape(-1)[:n_out]
    row_ok = ((flat_bits >> ROW_VALID_BIT) & 1) == 1
    bad = jnp.repeat(~plan.fits, plan.tile)[:n_out] & row_ok
    cnt = bad.sum()
    cap = min(patch_cap, n_out)
    # first `cap` bad rows in index order (good rows fill unused slots)
    sel = bad.astype(jnp.int32) * (n_out + 1) - jnp.arange(
        n_out, dtype=jnp.int32)
    _, idx = jax.lax.top_k(sel, cap)
    valid = bad[idx]
    deltas = jnp.asarray(plan.deltas, jnp.int32)
    tap_ok = ((flat_bits[idx][:, None] >> jnp.arange(k)) & 1) == 1
    nkey = jnp.where(tap_ok & valid[:, None],
                     flat_base[idx][:, None] + deltas[None, :], INVALID_KEY)
    pnmap = lookup_fn(nkey.reshape(-1)).reshape(cap, k)
    if first_index is not None:
        pnmap = jnp.where(pnmap >= 0, first_index[jnp.maximum(pnmap, 0)],
                          pnmap)
    return idx, valid, pnmap, cnt, cap


# ---------------------------------------------------------------------------
# Differentiable band conv (training). The transpose of a centered
# submanifold conv is the SAME band geometry with tap-reversed, transposed
# weights (offset_{K-1-k} == -offset_k, so relabeling taps k' = K-1-k gives
# a conv with deltas[k'], group_of[k'] unchanged and W_T[k'] = W[K-1-k']^T;
# per-tile window fits are symmetric, so plan AND gather patch are reused
# verbatim). Only dW needs new kernel work: band_conv_dw accumulates
# gather_k(feats)^T @ g across tiles, with rows of non-fitting tiles
# zeroed in-kernel and added back exactly through the patch neighbor map.
# Reference behavior target: spconv's cached-rulebook train path
# (/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:86-131) —
# equally fast forward and backward on one precomputed structure.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _band_train(statics, feats, weights, keys, blk, base_keys, valid_bits,
                bits_dw, pidx, pvalid, pnmap):
    """Exact submanifold band conv (band kernel + gather patch), f32 out.

    ``statics``: _BandStatics (hashable config, nondiff arg 0). Residual
    int/bool args get float0 cotangents like gathered_conv_train.
    """
    out = _band_apply(feats, weights, keys, blk, base_keys, valid_bits,
                      pidx, pvalid, pnmap, statics)
    return out


class _BandStatics:
    """Hashable static config for _band_train (kept out of the pytree)."""

    def __init__(self, deltas, group_of, n_out, tile, block, bf16):
        self.deltas = deltas
        self.group_of = group_of
        self.n_out = n_out
        self.tile = tile
        self.block = block
        self.bf16 = bf16
        self._key = (deltas, group_of, n_out, tile, block, bf16)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _BandStatics) and self._key == other._key


def _plan_of(statics: "_BandStatics", keys, blk, base_keys, valid_bits):
    from .pallas.band_conv import BandPlan
    true_ = jnp.asarray(True)
    return BandPlan(base_keys, valid_bits, blk, true_,
                    jnp.ones((base_keys.shape[0],), bool), true_,
                    statics.deltas, statics.group_of, statics.n_out,
                    statics.tile, statics.block)


def _band_apply(feats, weights, keys, blk, base_keys, valid_bits,
                pidx, pvalid, pnmap, statics):
    from .pallas.band_conv import band_conv
    plan = _plan_of(statics, keys, blk, base_keys, valid_bits)
    interp = jax.default_backend() != 'tpu'
    out = band_conv(feats, keys, plan, weights, bf16=statics.bf16,
                    interpret=interp)
    patch = gathered_conv(feats, pnmap, weights, pvalid)
    return out.at[pidx].set(jnp.where(pvalid[:, None], patch, out[pidx]))


def _band_train_fwd(statics, feats, weights, keys, blk, base_keys,
                    valid_bits, bits_dw, pidx, pvalid, pnmap):
    out = _band_train(statics, feats, weights, keys, blk, base_keys,
                      valid_bits, bits_dw, pidx, pvalid, pnmap)
    return out, (feats, weights, keys, blk, base_keys, valid_bits, bits_dw,
                 pidx, pvalid, pnmap)


def _band_train_bwd(statics, res, g):
    (feats, weights, keys, blk, base_keys, valid_bits, bits_dw, pidx,
     pvalid, pnmap) = res
    from .pallas.band_conv import ROW_VALID_BIT, band_conv_dw
    k = weights.shape[0]
    # dfeats: the transpose conv == same geometry, tap-reversed transposed
    # weights — the full forward apply (band kernel + patch) runs verbatim
    wt = jnp.swapaxes(weights[::-1], 1, 2)
    dfeats = _band_apply(g, wt, keys, blk, base_keys, valid_bits,
                         pidx, pvalid, pnmap, statics)
    dfeats = dfeats.astype(feats.dtype)
    # dW: in-kernel accumulation over fitting tiles (+ exact patch rows)
    plan = _plan_of(statics, keys, blk, base_keys, valid_bits)
    interp = jax.default_backend() != 'tpu'
    dw = band_conv_dw(feats, keys, plan, g, valid_bits=bits_dw,
                      bf16=statics.bf16, interpret=interp)
    g_patch = g[pidx] * pvalid[:, None].astype(g.dtype)      # (cap, C')
    dw_p = []
    for j in range(k):
        idx = pnmap[:, j]
        safe = jnp.maximum(idx, 0)
        rows = feats[safe] * ((idx >= 0) & pvalid)[:, None].astype(
            feats.dtype)
        dw_p.append(jnp.dot(rows.T, g_patch,
                            preferred_element_type=jnp.float32))
    dw = (dw + jnp.stack(dw_p)).astype(weights.dtype)
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dfeats, dw, f0(keys), f0(blk), f0(base_keys), f0(valid_bits),
            f0(bits_dw), f0(pidx), f0(pvalid), f0(pnmap))


_band_train.defvjp(_band_train_fwd, _band_train_bwd)


def subm_conv_ctx(st: SparseTensor, kernel_size, use_band: bool,
                  tile: int = 128, block: int = 256,
                  first_wins_sources: bool = False,
                  bf16: bool = True, train: bool = False) -> ConvCtx:
    """Conv context for a submanifold conv on ``st`` (sorted by key).

    ``first_wins_sources``: for key sets with duplicates (the NRConv 2D
    image-plane tensor — several voxels on one pixel), zero all but the
    first row of each key as *sources* so the in-kernel key-equality gather
    returns one representative twin (the reference's spconv hash likewise
    keeps an arbitrary one).
    """
    ndim = st.ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim
    k = 1
    for s in kernel_size:
        k *= int(s)
    if not use_band:
        nmap = build_subm_neighbor_map(st, kernel_size)
        # transpose map of a centered submanifold kernel is the tap-reversed
        # neighbor map (offset_{K-1-k} == -offset_k) — backward is pure
        # gathers via gathered_conv_train, never a scatter
        tmap = nmap[:, ::-1]
        return ConvCtx('nmap', k,
                       lambda f, w, s=None, b=None, r=False: _epilogue(
                           gathered_conv_train(f, nmap, tmap, w, st.mask,
                                               st.mask),
                           st.mask, s, b, r))

    if train:
        # differentiable band path: custom VJP over the band kernel + patch
        # (see _band_train). 2D duplicate-key tensors stay on nmap — the
        # patch's first-wins representative remap has no transpose analog.
        assert not first_wins_sources, \
            'band train path does not support duplicate-key sources'
        plan, keys = subm_band_plan(st, kernel_size, tile, block)
        pidx, pvalid, pnmap, bad_cnt, pcap = _band_patch(
            plan, lambda qk: lookup(keys, qk))
        statics = _BandStatics(plan.deltas, plan.group_of, plan.n_out,
                               tile, block,
                               bf16 and band_train_bf16_enabled())
        # dW kernel: zero the rows of non-fitting tiles (their exact
        # contribution comes from the patch term in _band_train_bwd)
        bits_dw = jnp.where(plan.fits[:, None], plan.valid_bits, 0)

        def apply_train(feats, weights, scale=None, bias=None, relu=False):
            def fast(f):
                out = _band_train(statics, f, weights, keys, plan.blk,
                                  plan.base_keys, plan.valid_bits, bits_dw,
                                  pidx, pvalid, pnmap)
                return _epilogue(out, st.mask, scale, bias, relu)

            def slow(f):
                nmap = build_subm_neighbor_map(st, kernel_size)
                return _epilogue(
                    gathered_conv_train(f, nmap, nmap[:, ::-1], weights,
                                        st.mask, st.mask),
                    st.mask, scale, bias, relu)

            return jax.lax.cond(plan.keys_sorted & (bad_cnt <= pcap),
                                fast, slow, feats)
        return ConvCtx('band_train', k, apply_train)

    plan, keys = subm_band_plan(st, kernel_size, tile, block)
    first_index = None
    if first_wins_sources:
        is_first = jnp.concatenate(
            [jnp.array([True]), keys[1:] != keys[:-1]])
        src_sel = (st.mask & is_first)[:, None]
        # representative (first) row per duplicate key run, so the gather
        # patch matches the in-kernel first-wins sum over zeroed twins
        first_index = jax.lax.cummax(
            jnp.where(is_first, jnp.arange(keys.shape[0], dtype=jnp.int32),
                      0))
    else:
        src_sel = None
    # the patch probes plan keys, which live in the halo key space — use a
    # sorted-search lookup over the plan's own halo keys (few-thousand
    # queries; the dense make_lookup table would cost a scatter for nothing)
    pidx, pvalid, pnmap, bad_cnt, pcap = _band_patch(
        plan, lambda qk: lookup(keys, qk), first_index)

    out_dtype = jnp.bfloat16 if feats_bf16_enabled() else jnp.float32

    def apply_fn(feats, weights, scale=None, bias=None, relu=False):
        from .pallas.band_conv import band_conv
        interp = jax.default_backend() != 'tpu'
        src = feats if src_sel is None else jnp.where(src_sel, feats, 0.0)

        def fast(f):
            out = band_conv(f, keys, plan, weights, scale=scale, bias=bias,
                            relu=relu, bf16=bf16, interpret=interp,
                            out_dtype=out_dtype)
            patch = _epilogue(gathered_conv(f, pnmap, weights, pvalid),
                              pvalid, scale, bias, relu)
            return out.at[pidx].set(
                jnp.where(pvalid[:, None], patch.astype(out_dtype),
                          out[pidx]))

        def slow(f):
            nmap = build_subm_neighbor_map(st, kernel_size)
            return _epilogue(gathered_conv(f, nmap, weights, st.mask),
                             st.mask, scale, bias, relu).astype(out_dtype)

        # keys_sorted gates the cond directly: with unsorted keys BOTH the
        # kernel and the gather patch (searchsorted lookups) are garbage,
        # and a small tensor could otherwise still satisfy bad_cnt <= pcap.
        return jax.lax.cond(plan.keys_sorted & (bad_cnt <= pcap),
                            fast, slow, src)
    return ConvCtx('band', k, apply_fn)


def strided_conv_ctx(st_in: SparseTensor, st_out: SparseTensor, stride,
                     padding, kernel_size, use_band: bool,
                     tile: int = 128, block: int = 512,
                     bf16: bool = True) -> ConvCtx:
    """Conv context for a strided conv st_in -> st_out (both sorted).

    block defaults to 512 (vs 256 for submanifold): an output tile's taps
    span roughly stride x the input key range, and the measured bad-row
    counts at KITTI eval shapes drop 5632 -> 256 (stride 4) and
    11008 -> 640 (stride 8) going 256 -> 512 — the difference between the
    band fast path and a ~40 ms/layer slow-nmap fallback."""
    ndim = st_in.ndim
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * ndim
    k = 1
    for s in kernel_size:
        k *= int(s)
    if not use_band:
        nmap = build_strided_neighbor_map(st_in, st_out, stride, padding,
                                          kernel_size)
        tmap = build_strided_transpose_map(st_in, st_out, stride, padding,
                                           kernel_size)
        return ConvCtx('nmap', k,
                       lambda f, w, s=None, b=None, r=False: _epilogue(
                           gathered_conv_train(f, nmap, tmap, w,
                                               st_out.mask, st_in.mask),
                           st_out.mask, s, b, r))

    plan, keys = strided_band_plan(st_in, st_out, stride, padding,
                                   kernel_size, tile, block)
    pidx, pvalid, pnmap, bad_cnt, pcap = _band_patch(
        plan, lambda qk: lookup(keys, qk),
        fraction=BAND_PATCH_FRACTION_STRIDED)

    out_dtype = jnp.bfloat16 if feats_bf16_enabled() else jnp.float32

    def apply_fn(feats, weights, scale=None, bias=None, relu=False):
        from .pallas.band_conv import band_conv
        interp = jax.default_backend() != 'tpu'

        def fast(f):
            out = band_conv(f, keys, plan, weights, scale=scale, bias=bias,
                            relu=relu, bf16=bf16, interpret=interp,
                            out_dtype=out_dtype)
            patch = _epilogue(gathered_conv(f, pnmap, weights, pvalid),
                              pvalid, scale, bias, relu)
            return out.at[pidx].set(
                jnp.where(pvalid[:, None], patch.astype(out_dtype),
                          out[pidx]))

        def slow(f):
            nmap = build_strided_neighbor_map(st_in, st_out, stride,
                                              padding, kernel_size)
            return _epilogue(gathered_conv(f, nmap, weights, st_out.mask),
                             st_out.mask, scale, bias, relu).astype(out_dtype)

        # see subm_conv_ctx: unsorted keys invalidate the patch lookups too
        return jax.lax.cond(plan.keys_sorted & (bad_cnt <= pcap),
                            fast, slow, feats)
    return ConvCtx('band', k, apply_fn)


def to_dense(st: SparseTensor) -> jnp.ndarray:
    """Scatter a 3D sparse tensor into dense (B, D, H, W, C) (NDHWC)."""
    d, h, w = st.spatial_shape
    c = st.num_channels
    out = jnp.zeros((st.batch_size * d * h * w, c), dtype=st.feats.dtype)
    flat = ((st.coords[:, 0] * d + st.coords[:, 1]) * h
            + st.coords[:, 2]) * w + st.coords[:, 3]
    flat = jnp.where(st.mask, flat, st.batch_size * d * h * w - 1)
    contrib = jnp.where(st.mask[:, None], st.feats, 0.0)
    # Padded rows all hit the last cell with zero contribution.
    out = out.at[flat].add(contrib)
    return out.reshape(st.batch_size, d, h, w, c)


def voxelize(points: jnp.ndarray, points_mask: jnp.ndarray,
             point_cloud_range: Sequence[float],
             voxel_size: Sequence[float],
             max_voxels: int, max_points_per_voxel: int,
             batch_size: int = 1,
             batch_idx: jnp.ndarray | None = None,
             indicator_max: bool = False) -> SparseTensor:
    """Fused voxelization + mean-VFE, entirely on device.

    Replaces the reference's host-side spconv ``Point2VoxelCPU3d``
    (``/root/reference/pcdet/datasets/processor/data_processor.py:14-59``)
    followed by ``MeanVFE`` (``.../vfe/mean_vfe.py:15-60``): points are keyed
    by voxel, sorted, and segment-reduced in one jitted pipeline (sort +
    cumulative ops + scatter — XLA fuses these well on TPU).

    Semantics match the reference: only the first ``max_points_per_voxel``
    points (in input order) of each voxel contribute; the mean is over that
    capped set; with ``indicator_max`` the last feature channel takes the max
    over the capped set instead (MeanVFE ``MODEL: 'max'``). Voxels beyond
    ``max_voxels`` (in key order) are dropped.

    Args:
        points: (P, 3 + F) [x, y, z, feats...].
        points_mask: (P,) validity.
        batch_idx: optional (P,) int32 batch index per point (default all 0).
    Returns:
        SparseTensor with coords [b, z, y, x], feats = per-voxel reduced
        point features (C = 3 + F), sorted by key.
    """
    pcr = jnp.asarray(point_cloud_range, dtype=jnp.float32)
    vs = jnp.asarray(voxel_size, dtype=jnp.float32)
    grid = [int(round(float((point_cloud_range[i + 3] - point_cloud_range[i])
                            / voxel_size[i]))) for i in range(3)]
    gx, gy, gz = grid
    spatial_shape = (gz, gy, gx)

    xyz = points[:, :3]
    vox = jnp.floor((xyz - pcr[:3]) / vs).astype(jnp.int32)   # (P, 3) x,y,z
    in_range = ((vox >= 0).all(axis=1)
                & (vox[:, 0] < gx) & (vox[:, 1] < gy) & (vox[:, 2] < gz))
    valid = points_mask & in_range
    if batch_idx is None:
        batch_idx = jnp.zeros((points.shape[0],), dtype=jnp.int32)

    # canonical (b, y, x, z) linearization — must match coords_to_keys
    strides, m = key_strides(spatial_shape)       # spatial = (gz, gy, gx)
    key = (batch_idx * m + vox[:, 2] * strides[0]
           + vox[:, 1] * strides[1] + vox[:, 0] * strides[2])
    key = jnp.where(valid, key.astype(jnp.int32), INVALID_KEY)

    order = jnp.argsort(key, stable=True)   # stable: keeps point order in voxel
    key_s = key[order]
    pts_s = points[order]
    valid_s = valid[order]

    is_first = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]])
    is_first = is_first & valid_s
    voxel_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1     # (P,)
    voxel_id = jnp.where(valid_s, voxel_id, max_voxels)       # overflow slot

    p = points.shape[0]
    pos = jnp.arange(p, dtype=jnp.int32)
    seg_start = jax.lax.cummax(jnp.where(is_first, pos, -1))
    rank = pos - seg_start
    keep = valid_s & (rank < max_points_per_voxel) & (voxel_id < max_voxels)

    c = points.shape[1]
    w = keep.astype(pts_s.dtype)[:, None]
    sums = jnp.zeros((max_voxels + 1, c), dtype=pts_s.dtype)
    sums = sums.at[voxel_id].add(pts_s * w)
    cnts = jnp.zeros((max_voxels + 1,), dtype=jnp.float32)
    cnts = cnts.at[voxel_id].add(keep.astype(jnp.float32))
    mean = sums[:max_voxels] / jnp.maximum(cnts[:max_voxels, None], 1.0)

    if indicator_max:
        last = jnp.where(keep, pts_s[:, -1], -jnp.inf)
        mx = jnp.full((max_voxels + 1,), -jnp.inf, dtype=pts_s.dtype)
        mx = mx.at[voxel_id].max(last)
        mean = mean.at[:, -1].set(
            jnp.where(jnp.isfinite(mx[:max_voxels]), mx[:max_voxels], 0.0))

    vcoords = jnp.full((max_voxels + 1, 4), -1, dtype=jnp.int32)
    crow = jnp.stack([batch_idx[order], vox[order][:, 2], vox[order][:, 1],
                      vox[order][:, 0]], axis=-1)
    upd = jnp.where((is_first & (voxel_id < max_voxels))[:, None], crow, 0)
    tgt = jnp.where(is_first & (voxel_id < max_voxels), voxel_id, max_voxels)
    vcoords = vcoords.at[tgt].set(
        jnp.where((tgt < max_voxels)[:, None], upd, -1))
    vmask = cnts[:max_voxels] > 0

    return SparseTensor(
        feats=jnp.where(vmask[:, None], mean, 0.0),
        coords=jnp.where(vmask[:, None], vcoords[:max_voxels], -1),
        mask=vmask, spatial_shape=spatial_shape, batch_size=batch_size)
