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

import functools
from functools import partial
from typing import Any, NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ..layers import MaskedBatchNorm

# max elements of the (m, K) candidate buffers before query chunking kicks
# in. The train budget is a 16 GB-HBM guard (remat keeps conv activations
# live next to these buffers); eval has no such pressure, and chunking
# costs real time — each chunk is a serialized lax.map iteration whose
# dynamic_update_slice copies defeat fusion. 64M covers the 9-entry
# (batch 3 x ROT_NUM 3) eval pools (m*k = 60M) unchunked. The unchunked
# (m, K, 3) f32 candidate-center temps reach ~720 MB at those pools —
# safe ONLY because the int32 key space caps batch*ROT_NUM at 9 entries
# (ops/sparse.coords_to_keys assert); widening the key type must revisit
# this budget.
CHUNK_BUDGET = 16_000_000
CHUNK_BUDGET_EVAL = 64_000_000
# max elements of a resident (Mc, S, mid) pooled-feature temp in the SA
# group body at train time (see _group_body). 8M: with ~6 such temps live
# across the interleaved fwd/transpose pool computations, 16M left the
# full-scale batch=1 train step 44 MB over the 15.75 G HBM ceiling
# (round-4 bench_train OOM report); halving the chunk size costs one more
# lax.map iteration per pool, not gather volume.
TRAIN_GATHER_BUDGET = 8_000_000


@jax.custom_vjp
def gather_rows(feats, idx, valid):
    """feats[(M, S) idx] with invalid slots zeroed — and a sorted-segment
    backward instead of autodiff's unsorted scatter-add.

    The pooling gathers are the last big backward scatter after the conv
    VJP rework (ops/sparse.gathered_conv_train): autodiff of feats[idx]
    scatter-adds (M*S, C) rows at random offsets. Here the backward sorts
    the flattened indices once and segment-sums the gradient rows, handing
    XLA a scatter with sorted unique-run indices (docs/DESIGN.md S8: TPU
    scatter throughput is far below gather; sorted monotone scatters
    vectorize).
    """
    return feats[idx] * valid[..., None].astype(feats.dtype)


def _gr_fwd(feats, idx, valid):
    # feats[:0] is a zero-row dtype/width token (backward never reads
    # feats values; residual leaves must be jax types, so no raw dtypes)
    return gather_rows(feats, idx, valid), (feats[:0], feats.shape[0], idx,
                                            valid)


def _gr_bwd(res, g):
    ftok, n, idx, valid = res
    flat_idx = jnp.where(valid, idx, n).reshape(-1)
    g2 = g.reshape(-1, g.shape[-1])
    order = jnp.argsort(flat_idx)
    fs = flat_idx[order]
    gs = g2[order]
    dfeats = jax.ops.segment_sum(gs, fs, num_segments=n + 1,
                                 indices_are_sorted=True)[:n]
    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return dfeats.astype(ftok.dtype), f0(idx), f0(valid)


gather_rows.defvjp(_gr_fwd, _gr_bwd)


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


class PoolTables(NamedTuple):
    """Lookup structures for the packed-occupancy window probe.

    ``occ`` stores the dense occupancy bitmap as uint32 words at a
    16-bit stride (2x redundant): word ``k`` covers cell bits
    [16k, 16k+32).  Any x-window of <= 17 cells starting at bit ``s`` is
    then fully contained in the single word ``s >> 4`` (start-bit offset
    ``s & 15`` <= 15, and 15 + 17 = 32) — one gather per (query, z, y)
    lane instead of one per window cell.  ``rows`` is the plain cell->row
    table, gathered only for the <= nsample selected hits.
    """

    rows: jnp.ndarray   # (size,) int32: cell -> row, -1 if empty
    occ: jnp.ndarray    # (ceil(size/16)+pad,) uint32 16-bit-stride words


def build_pool_tables(st: sp.SparseTensor) -> PoolTables:
    d, h, w = st.spatial_shape
    size = st.batch_size * d * h * w
    rows = build_row_table(st)
    npad = -size % 16 + 32
    occ_bool = jnp.zeros((size + npad,), jnp.uint32)
    flat = ((st.coords[:, 0] * d + st.coords[:, 1]) * h
            + st.coords[:, 2]) * w + st.coords[:, 3]
    flat = jnp.where(st.mask, flat, size)        # parked in the pad region
    occ_bool = occ_bool.at[flat].set(st.mask.astype(jnp.uint32))
    occ_bool = occ_bool.at[size:].set(0)
    half = occ_bool.reshape(-1, 16)              # (n16, 16)
    weights = (jnp.uint32(1) << jnp.arange(16, dtype=jnp.uint32))
    half = jnp.sum(half * weights[None], axis=1, dtype=jnp.uint32)  # (n16,)
    hi = jnp.concatenate([half[1:], jnp.zeros((1,), jnp.uint32)])
    return PoolTables(rows=rows, occ=half | (hi << jnp.uint32(16)))


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
        # the runtime test is query-point -> candidate-CENTER distance; the
        # query lies somewhere in the center cell, so the minimum possible
        # distance to an offset cell's center is (|o| - 0.5) * vs per axis
        gap = np.clip(np.abs(offs) - 0.5, 0, None) * vs[None]
        min_dist = np.linalg.norm(gap, axis=1)
        offs = offs[min_dist < radius]
    return offs


def _select_first_idx(ok, nsample):
    """Window-scan indices of the first ``nsample`` valid candidates.

    Rank-equality formulation: rank = inclusive cumsum of ok along the
    window; the slot-s selection is the unique scan index with
    ``ok & rank == s+1``, extracted by a compare-select reduction that XLA
    fuses without materializing (m, ns, K). Replaces the earlier
    ``lax.top_k`` keying (sorts all K keys per query; measured 30 ms/frame
    across the eval pools at K ~ 500 — the round-4 trace's second-largest
    ROI cost) and the original (m, K) scatters (~1 s/stage, DESIGN.md S8).
    Returns (topidx (m, ns) int32, hit (m, ns) bool)."""
    k = ok.shape[1]
    j = jnp.arange(k, dtype=jnp.int32)
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)           # (m, K)
    slots = jnp.arange(1, nsample + 1, dtype=jnp.int32)
    eq = ok[:, None, :] & (rank[:, None, :] == slots[None, :, None])
    topidx = jnp.sum(jnp.where(eq, j[None, None, :], 0), axis=2,
                     dtype=jnp.int32)                         # (m, ns)
    hit = slots[None, :] <= rank[:, -1:]
    return topidx, hit


def _select_first(ok, safe_rows, centers, nsample):
    """First ``nsample`` valid candidates in window-scan order."""
    topidx, hit = _select_first_idx(ok, nsample)
    rows_sel = jnp.take_along_axis(safe_rows, topidx, axis=1)
    rows_sel = jnp.where(hit, rows_sel, 0)
    csel = jnp.take_along_axis(centers, topidx[..., None], axis=1)
    csel = jnp.where(hit[..., None], csel, 0.0)
    return rows_sel, hit, csel


def _expanded_window(ranges, radius, voxel_size, stride):
    """(z, y) lane offsets + the full (lane x x-offset) enumeration for the
    packed-occupancy probe.  Lanes are pruned by the 2-D reachability bound
    (same geometry as _window_offsets); the x run is kept whole — cells the
    3-D bound would prune can never pass the runtime distance test, and
    subsetting a z-major enumeration preserves scan order, so the expanded
    set selects identically."""
    rz, ry, rx = ranges
    nine = 2 * rx + 1
    # 15 (max start-bit offset) + 17 window bits = 32: wider x windows
    # would shift occupied cells out of the single probed uint32 word
    assert nine <= 17, 'x window must fit one 16-bit-stride word'
    vs = np.asarray(voxel_size, np.float64)[::-1] * stride   # z, y, x
    zz, yy = np.meshgrid(np.arange(-rz, rz + 1), np.arange(-ry, ry + 1),
                         indexing='ij')
    lanes = np.stack([zz, yy], -1).reshape(-1, 2).astype(np.int32)
    gap = np.clip(np.abs(lanes) - 0.5, 0, None) * vs[:2][None]
    lanes = lanes[np.linalg.norm(gap, axis=1) < radius]
    dx = np.arange(-rx, rx + 1, dtype=np.int32)
    offs = np.concatenate(
        [np.repeat(lanes, nine, 0),
         np.tile(dx, len(lanes))[:, None]], 1)               # (L*nine, 3)
    return lanes, offs


def _bit_probe(occ, lanes, nine, n_cells, qcoords, qmask, d, h, w):
    """Occupancy of every window candidate from one uint32 gather per
    (query, lane): the 16-bit-stride word holding the x run, shifted so bit
    j == cell (qx - rx + j).  Edge realignment by the clamp delta doubles as
    the x bounds test (shifted-in bits are zero).  Returns (m, L*nine)
    bool in z-major scan order."""
    rx = (nine - 1) // 2
    qb, qz, qy, qx = (qcoords[:, 0], qcoords[:, 1], qcoords[:, 2],
                      qcoords[:, 3])
    x0 = qx - rx
    x0c = jnp.clip(x0, 0, w - nine)
    dpos = x0c - x0                                           # |dpos| <= rx
    z = qz[:, None] + lanes[None, :, 0]                       # (m, L)
    y = qy[:, None] + lanes[None, :, 1]
    lane_ok = qmask[:, None] & (z >= 0) & (z < d) & (y >= 0) & (y < h)
    s = ((qb[:, None] * d + z) * h + y) * w + x0c[:, None]    # start bit
    s = jnp.clip(s, 0, n_cells - 1)
    word = occ[s >> 4]                                        # (m, L) u32
    win = (word >> (s & 15).astype(jnp.uint32)) \
        & jnp.uint32((1 << nine) - 1)                         # bit j: x0c+j
    # realign to x0: result bit j == cell x0+j == x0c + (j - dpos)
    up = win << jnp.clip(dpos, 0, 31).astype(jnp.uint32)[:, None]
    down = win >> jnp.clip(-dpos, 0, 31).astype(jnp.uint32)[:, None]
    win = jnp.where((dpos >= 0)[:, None], up, down) \
        & jnp.uint32((1 << nine) - 1)
    win = jnp.where(lane_ok, win, jnp.uint32(0))
    bits = (win[:, :, None]
            >> jnp.arange(nine, dtype=jnp.uint32)[None, None]) & 1
    return (bits > 0).reshape(qcoords.shape[0], -1)


def voxel_query_groups(st: sp.SparseTensor, table, query_xyz, query_coords,
                       query_mask, group_specs, voxel_size, stride,
                       point_cloud_range, chunk_budget=None):
    """Multi-group voxel query sharing ONE window probe.

    The groups' windows nest (each box contains the previous), so the union
    window is the last group's; candidate rows/centers/distances are probed
    once and each group selects its first ``nsample`` in-radius hits from
    the shared candidates. Subsetting a z-major enumeration preserves
    z-major order, so per-group scan order matches probing each window
    separately (the reference kernel's semantics).

    Args:
        group_specs: tuple of (ranges, radius, nsample).
    Returns list of (idx (M, ns) int32, valid (M, ns) bool,
    centers (M, ns, 3)) per group.
    """
    union_ranges, union_radius = group_specs[-1][0], group_specs[-1][1]
    for rg, rad, _ in group_specs:
        assert all(a <= b for a, b in zip(rg, union_ranges)), \
            'group windows must nest'
        assert rad <= union_radius, 'group radii must nest'
    use_bits = isinstance(table, PoolTables)
    if use_bits:
        lanes_np, offs_np = _expanded_window(
            union_ranges, union_radius, voxel_size, stride)
        lanes = jnp.asarray(lanes_np)
        nine = 2 * union_ranges[2] + 1
    else:
        offs_np = _window_offsets(union_ranges, radius=union_radius,
                                  voxel_size=voxel_size, stride=stride)
    offs = jnp.asarray(offs_np)                               # (K, 3)
    # static membership of each union offset in each group's own window
    members = []
    for rg, rad, _ in group_specs:
        box = (abs(offs_np[:, 0]) <= rg[0]) & \
              (abs(offs_np[:, 1]) <= rg[1]) & (abs(offs_np[:, 2]) <= rg[2])
        members.append(jnp.asarray(box))
    d, h, w = st.spatial_shape
    n_cells = st.batch_size * d * h * w
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    mins = jnp.asarray(point_cloud_range[:3], jnp.float32)
    k = offs.shape[0]
    m = query_xyz.shape[0]

    def probe_bits(qxyz, qcoords, qmask):
        occupied = _bit_probe(table.occ, lanes, nine, n_cells, qcoords,
                              qmask, d, h, w)                 # (m, K)
        # candidate centers/distances from the static offset enumeration —
        # no per-candidate gather; rows are gathered only for the selected
        # <= nsample hits per group
        cand = (qcoords[:, None, 3:0:-1] + offs[None, :, ::-1]).astype(
            jnp.float32)                                      # (m, K) x,y,z
        centers = (cand + 0.5) * vs + mins
        dist2 = jnp.sum((centers - qxyz[:, None, :]) ** 2, -1)
        out = []
        for (rg, rad, nsample), member in zip(group_specs, members):
            ok_g = occupied & member[None] & (dist2 < rad * rad)
            topidx, hit = _select_first_idx(ok_g, nsample)
            soff = jnp.take(offs, topidx, axis=0)             # (m, ns, 3)
            neigh = qcoords[:, None, 1:] + soff
            flat = ((qcoords[:, None, 0] * d + neigh[..., 0]) * h
                    + neigh[..., 1]) * w + neigh[..., 2]
            rows = table.rows[jnp.clip(flat, 0, n_cells - 1)]
            rows = jnp.where(hit, jnp.maximum(rows, 0), 0)
            csel = (neigh[..., ::-1].astype(jnp.float32) + 0.5) * vs + mins
            csel = jnp.where(hit[..., None], csel, 0.0)
            out.append((rows, hit, csel))
        return tuple(out)

    def probe_dense(qxyz, qcoords, qmask):
        neigh = qcoords[:, None, 1:] + offs[None]             # (m, K, 3)
        ok = qmask[:, None]
        ok = ok & (neigh[:, :, 0] >= 0) & (neigh[:, :, 0] < d)
        ok = ok & (neigh[:, :, 1] >= 0) & (neigh[:, :, 1] < h)
        ok = ok & (neigh[:, :, 2] >= 0) & (neigh[:, :, 2] < w)
        flat = ((qcoords[:, None, 0] * d + neigh[:, :, 0]) * h
                + neigh[:, :, 1]) * w + neigh[:, :, 2]
        flat = jnp.where(ok, flat, 0)
        rows = table[flat]                                    # (m, K)
        ok = ok & (rows >= 0)
        safe = jnp.maximum(rows, 0)
        # candidate voxel centers come from the probed CELL itself — no
        # coords gather needed (an occupied cell's stored coords equal the
        # probed coords by construction)
        centers = (neigh[..., ::-1].astype(jnp.float32) + 0.5) * vs + mins
        dist2 = jnp.sum((centers - qxyz[:, None, :]) ** 2, -1)
        out = []
        for (rg, rad, nsample), member in zip(group_specs, members):
            ok_g = ok & member[None] & (dist2 < rad * rad)
            out.append(_select_first(ok_g, safe, centers, nsample))
        return tuple(out)

    probe = probe_bits if use_bits else probe_dense

    # chunk large query sets so the (m, K) candidate buffers stay bounded
    # (training at reference batch sizes reaches m*K in the tens of M)
    budget = CHUNK_BUDGET if chunk_budget is None else chunk_budget
    if m * k <= budget:
        return list(probe(query_xyz, query_coords, query_mask))
    chunks = -(-(m * k) // budget)
    csize = -(-m // chunks)
    pad = csize * chunks - m
    qx = jnp.pad(query_xyz, ((0, pad), (0, 0))).reshape(chunks, csize, 3)
    qc = jnp.pad(query_coords, ((0, pad), (0, 0))).reshape(chunks, csize, 4)
    qm = jnp.pad(query_mask, (0, pad)).reshape(chunks, csize)
    stacked = jax.lax.map(lambda a: probe(*a), (qx, qc, qm))
    results = []
    for gi, (_, _, nsample) in enumerate(group_specs):
        idx, valid, centers = stacked[gi]
        results.append((idx.reshape(-1, nsample)[:m],
                        valid.reshape(-1, nsample)[:m],
                        centers.reshape(-1, nsample, 3)[:m]))
    return results


def voxel_query(st: sp.SparseTensor, table, query_xyz, query_coords,
                query_mask, ranges, radius, nsample, voxel_size, stride,
                point_cloud_range, chunks: int = 8):
    """Single-group voxel query (see voxel_query_groups).

    Returns (idx (M, nsample) int32 rows into st (0 where invalid),
    valid (M, nsample) bool, centers (M, nsample, 3))."""
    return voxel_query_groups(
        st, table, query_xyz, query_coords, query_mask,
        ((tuple(ranges), radius, nsample),), voxel_size, stride,
        point_cloud_range)[0]


def pool_kernel_enabled() -> bool:
    """Whether eval grid pooling runs the ROI-local Pallas kernel
    (ops/pallas/roi_pool.py) instead of the per-query probe path.
    Defaults to TPU-only; VIRCONV_POOL_KERNEL=0/1 overrides. Trace-time
    capture (same caveat as sparse.band_enabled)."""
    import os
    env = os.environ.get('VIRCONV_POOL_KERNEL')
    if env is not None:
        return env not in ('0', 'false', 'False')
    return jax.default_backend() == 'tpu'


def pool_bf16_enabled() -> bool:
    """bf16 feature matmuls inside the ROI pooling kernel (default on, like
    the band convs; VIRCONV_POOL_BF16=0 forces f32)."""
    import os
    return os.environ.get('VIRCONV_POOL_BF16', '1') not in ('0', 'false',
                                                            'False')


def pool_tile_enabled(stride) -> bool:
    """Sub-ROI (quadrant) tiling of the pooling kernel's query grid.

    At stride 4 (x_conv3) a full ROI's candidate bands are 5-8 CBLK
    blocks (the plan's z-columns cover the whole (y, x) AABB and counts
    scale ~1/stride^2), which overflows the measured-best block budget —
    the round-5 trace showed the kernel silently falling back to the
    probe path there every frame (docs/DESIGN.md §15). Splitting each
    ROI's grid into four (x, y) quadrant tiles shrinks each tile's AABB
    bands ~4x so the per-segment count returns to kernel-friendly
    territory, at 1/4 the per-block rank/gather cost (Q=54+pad vs 216).
    A z split would cut nothing: at stride 4 the grid is ~11 z-cells
    deep vs a dilated window of ~16, so the full column is already
    inside every window. MEASURED SLOWER e2e (2.966 vs 3.220 fps,
    FRAMES=2, v5e): the per-segment one-block floor (4 blocks/ROI even
    for empty ROIs), the 6x larger unconditional plan build, and the
    kernel grid running every budgeted program outweigh quartering the
    per-block cost — docs/DESIGN.md §16. Default OFF;
    VIRCONV_POOL_TILE=1 keeps it runnable below stride 8 for A/Bs."""
    import os
    env = os.environ.get('VIRCONV_POOL_TILE')
    if env is not None:
        return env not in ('0', 'false', 'False') and stride < 8
    return False


@functools.lru_cache(maxsize=None)
def _tile_layout(g: int):
    """Static (x, y)-quadrant split of the g^3 ROI query grid.

    dense_grid_points orders a ROI's queries r = a*g^2 + b*g + c with
    (a, b, c) = local (x, y, z) grid index. Returns
      gather (4*qp,) i32: tiled-layout row -> original row (pads -> 0),
      tval   (4*qp,) bool: real-query mask (False on per-tile pads),
      inv    (g^3,)  i32: original row -> tiled-layout row,
      qp     int: per-tile query count, padded to a sublane multiple.
    """
    idx = np.arange(g ** 3)
    a = idx // (g * g)
    b = (idx // g) % g
    half = (g + 1) // 2
    t = (a >= half).astype(np.int64) * 2 + (b >= half)
    qp = -(-(half * half * g) // 8) * 8
    gather = np.zeros((4, qp), np.int32)
    tval = np.zeros((4, qp), bool)
    inv = np.zeros((g ** 3,), np.int32)
    for ti in range(4):
        rows = idx[t == ti]
        gather[ti, :len(rows)] = rows
        tval[ti, :len(rows)] = True
        inv[rows] = ti * qp + np.arange(len(rows))
    return (jnp.asarray(gather.reshape(-1)), jnp.asarray(tval.reshape(-1)),
            jnp.asarray(inv), qp)


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
                 query_mask, train: bool, table=None, q_per_roi=None):
        specs = tuple((tuple(self.query_ranges[g]), self.radii[g],
                       self.nsamples[g])
                      for g in range(len(self.query_ranges)))
        n_g = len(specs)
        use_kernel = ((not train) and q_per_roi is not None
                      and pool_kernel_enabled()
                      and len({m[0] for m in self.mlps}) == 1)
        if not use_kernel:
            if table is None:
                table = build_pool_tables(st)
            queries = voxel_query_groups(
                st, table, query_xyz, query_coords, query_mask, specs,
                self.voxel_size, stride, self.point_cloud_range,
                chunk_budget=None if train else CHUNK_BUDGET_EVAL)
            outs = []
            for g in range(n_g):
                mid, out_c = self.mlps[g]
                feats = nn.Dense(mid, use_bias=False,
                                 name=f'mlp_in{g}')(st.feats)
                feats = MaskedBatchNorm(mid, name=f'mlp_in_bn{g}')(
                    feats, st.mask, train)
                idx, valid, centers = queries[g]
                x = self._group_body(feats, idx, valid, centers, query_xyz,
                                     query_mask, g, mid, train)
                x = nn.Dense(out_c, use_bias=False, name=f'mlp_out{g}')(x)
                x = MaskedBatchNorm(out_c, name=f'mlp_out_bn{g}')(
                    x, query_mask, train)
                outs.append(nn.relu(x))
            return jnp.concatenate(outs, axis=-1)

        # ---- eval fast path: ROI-local Pallas pooling -------------------
        # (ops/pallas/roi_pool.py; exact — lax.cond falls back to the
        # probe path when the plan's capacity caps overflow)
        from ...ops.pallas.roi_pool import roi_pool_plan, roi_pool_apply
        mid = self.mlps[0][0]
        feats_g, w_pos_g, affines = [], [], []
        for g in range(n_g):
            feats = nn.Dense(mid, use_bias=False,
                             name=f'mlp_in{g}')(st.feats)
            feats_g.append(MaskedBatchNorm(mid, name=f'mlp_in_bn{g}')(
                feats, st.mask, train))
            w_pos_g.append(_PosKernel(mid, name=f'mlp_pos{g}')())
            # eval _MomentBN ignores the moment args (running stats)
            affines.append(_MomentBN(mid, name=f'mlp_pos_bn{g}')(
                jnp.zeros((mid,)), jnp.ones((mid,)), 1.0, False))
        # quadrant tiling (see pool_tile_enabled): both cond branches run
        # on the tiled query layout so their output shapes agree; the
        # per-query math is identical, so un-tiling afterwards restores
        # the exact untiled result.
        g_grid = round(q_per_roi ** (1.0 / 3.0))
        tiled = (g_grid ** 3 == q_per_roi and g_grid >= 2
                 and pool_tile_enabled(stride))
        if tiled:
            t_gather, t_val, t_inv, qp_t = _tile_layout(g_grid)
            r0 = query_xyz.shape[0] // q_per_roi
            q_xyz_p = query_xyz.reshape(r0, q_per_roi, 3)[
                :, t_gather].reshape(-1, 3)
            q_crd_p = query_coords.reshape(r0, q_per_roi, 4)[
                :, t_gather].reshape(-1, 4)
            q_msk_p = (query_mask.reshape(r0, q_per_roi)[:, t_gather]
                       & t_val[None]).reshape(-1)
            qpr = qp_t
            # budget 3 CBLK blocks per tile segment (+ slack): the
            # expected stride-4 quadrant count (docs/DESIGN.md §15)
            nblk_cap = 3 * (r0 * 4) + 32
        else:
            q_xyz_p, q_crd_p, q_msk_p = query_xyz, query_coords, query_mask
            qpr, nblk_cap = q_per_roi, None
        plan = roi_pool_plan(st, q_xyz_p, q_crd_p, q_msk_p,
                             qpr, tuple(self.query_ranges[-1]),
                             self.voxel_size, stride,
                             self.point_cloud_range, nblk_cap=nblk_cap)
        interp = jax.default_backend() != 'tpu'
        bf16 = pool_bf16_enabled() and not interp

        def fast(fg):
            w_eff = [w_pos_g[g] * affines[g][0][None, :]
                     for g in range(n_g)]
            b_eff = [affines[g][1] for g in range(n_g)]
            return roi_pool_apply(plan, fg, w_eff, b_eff, specs,
                                  self.voxel_size, stride,
                                  self.point_cloud_range, bf16=bf16,
                                  interpret=interp)

        def slow(fg):
            tbl = table if table is not None else build_pool_tables(st)
            queries = voxel_query_groups(
                st, tbl, q_xyz_p, q_crd_p, q_msk_p, specs,
                self.voxel_size, stride, self.point_cloud_range,
                chunk_budget=CHUNK_BUDGET_EVAL)
            outs = []
            for g in range(n_g):
                idx, valid, centers = queries[g]
                mult, bias = affines[g]
                grouped = fg[g][idx] * valid[..., None].astype(fg[g].dtype)
                qm_rows = q_msk_p[:, None] & jnp.ones_like(valid)
                rel = (centers - q_xyz_p[:, None, :]) * valid[..., None]
                pos = rel @ w_pos_g[g] * mult + bias
                pos = jnp.where(qm_rows[..., None], pos, 0.0)
                x = nn.relu(grouped + pos)
                x = jnp.where(valid[..., None], x, 0.0)
                outs.append(x.max(axis=1))
            return jnp.stack(outs)

        pooled = jax.lax.cond(plan.ok, fast, slow, feats_g)   # (G, M', mid)
        if tiled:
            pooled = pooled.reshape(n_g, r0, 4 * qp_t, mid)[:, :, t_inv]
            pooled = pooled.reshape(n_g, r0 * q_per_roi, mid)
        outs = []
        for g in range(n_g):
            out_c = self.mlps[g][1]
            x = nn.Dense(out_c, use_bias=False,
                         name=f'mlp_out{g}')(pooled[g])
            x = MaskedBatchNorm(out_c, name=f'mlp_out_bn{g}')(
                x, query_mask, train)
            outs.append(nn.relu(x))
        return jnp.concatenate(outs, axis=-1)

    @partial(nn.remat, static_argnums=(7, 8, 9))
    def _group_body(self, feats, idx, valid, centers, query_xyz, query_mask,
                    g, mid, train):
        """Gather + position-encode + max-reduce one query group.

        Memory discipline (the (M, S, mid) temps here dominated train-step
        HBM — M = B*rois*grid across 12 SA calls/step):
          * nn.remat: nothing is saved for backward; the body recomputes.
          * The pos-BN batch moments are computed ALGEBRAICALLY: pos =
            rel @ W is linear in the 3-dim rel, so mean = (Σrel/n) @ W and
            E[pos²] = diag(Wᵀ (Σ rel relᵀ / n) W) — two tiny reductions over
            (M, S, 3) instead of materializing the (M*S, mid) pos tensor
            for a masked-moment pass. Identical math to MaskedBatchNorm
            (same masking: rows of valid queries, rel zeroed off-sample);
            the gather → add → relu → max chain then fuses into the max
            reduction without a resident (M, S, mid) buffer.
        After the max over S everything is (M, mid)."""
        w_pos = _PosKernel(mid, name=f'mlp_pos{g}')()    # (3, mid)
        rel = (centers - query_xyz[:, None, :]) * valid[..., None]
        qmask_rows = query_mask[:, None] & jnp.ones_like(valid)
        relm = rel * qmask_rows[..., None]
        cnt = jnp.maximum(qmask_rows.sum().astype(jnp.float32), 1.0)
        sum_rel = relm.reshape(-1, 3).sum(0)                       # (3,)
        mean_rel = sum_rel / cnt
        mean = mean_rel @ w_pos                                    # (mid,)
        # two-pass variance: center rel BEFORE the outer-product sum so the
        # E[x^2] - mean^2 cancellation never forms (matches MaskedBatchNorm
        # accuracy without materializing the (M*S, mid) pos tensor)
        rc = (rel - mean_rel) * qmask_rows[..., None]
        s2 = rc.reshape(-1, 3).T @ rc.reshape(-1, 3)               # (3, 3)
        var = jnp.maximum(
            jnp.einsum('ic,ic->c', w_pos, (s2 / cnt) @ w_pos), 0.0)
        scale, bias = _MomentBN(mid, name=f'mlp_pos_bn{g}')(
            mean, var, cnt, train)

        # normalized pos (folded into one affine map of rel) + gather +
        # relu + max. The gather's (M, S, mid) output does NOT fuse into
        # the max on TPU (XLA inserts a layout copy between the gather
        # fusion and the reduce), so at train scale it materializes — for
        # the x_conv4 pool that is f32[3.3M, 32] padded 4x to 1.58 GB, the
        # single largest train-step allocation. Chunk the body over
        # queries at train time so the resident temp stays bounded; eval
        # query counts are ~20x smaller and stay on the direct path.
        def tail(idx_, valid_, rel_, qm_):
            grouped = gather_rows(feats, idx_, valid_)   # (Mc, S, mid)
            pos = rel_ @ w_pos
            pos = pos * scale + bias
            pos = jnp.where(qm_[..., None], pos, 0.0)
            x = nn.relu(grouped + pos)
            x = jnp.where(valid_[..., None], x, 0.0)
            return x.max(axis=1)                         # (Mc, mid)

        m, s = idx.shape
        if not train or m * s * mid <= TRAIN_GATHER_BUDGET:
            return tail(idx, valid, rel, qmask_rows)
        csize = max(512, TRAIN_GATHER_BUDGET // (s * mid))
        nchunk = -(-m // csize)
        pad = nchunk * csize - m
        idx_p = jnp.pad(idx, ((0, pad), (0, 0)))
        val_p = jnp.pad(valid, ((0, pad), (0, 0)))
        rel_p = jnp.pad(rel, ((0, pad), (0, 0), (0, 0)))
        qm_p = jnp.pad(qmask_rows, ((0, pad), (0, 0)))
        # checkpoint the chunk body: without it the scan stacks each
        # iteration's (Mc, S, mid) gather + masks as backward residuals —
        # re-materializing the very (M, S, mid) buffers the chunking
        # exists to avoid (seen as f32[7,31250,16,32] HLO temps). With it
        # each iteration saves only its small int/bool/3-dim inputs and
        # recomputes the gather in the backward pass.
        #
        # Chunk inputs ride lax.map as stacked HBM residents; keep the tiny
        # S / 3 dims OFF the minor (lane) axis — (csize, S) s32 stores
        # T(8,128)-padded 8x (S=16 lanes -> 128) and was the largest
        # train-step temp class (2x ~300 MB per pool scale in the batch-2
        # OOM report). Transposed (S, csize) / (3, S, csize) layouts pad
        # ~1x; the per-chunk transposes back inside the body are a few MB
        # of VMEM traffic.
        tail_ck = jax.checkpoint(
            lambda i_, v_, r_, q_: tail(i_.T, v_.T, r_.transpose(2, 1, 0),
                                        q_.T))
        out = jax.lax.map(
            lambda a: tail_ck(*a),
            (idx_p.reshape(nchunk, csize, s).transpose(0, 2, 1),
             val_p.reshape(nchunk, csize, s).transpose(0, 2, 1),
             rel_p.reshape(nchunk, csize, s, 3).transpose(0, 3, 2, 1),
             qm_p.reshape(nchunk, csize, s).transpose(0, 2, 1)))
        return out.reshape(-1, mid)[:m]                  # (M, mid)


class _PosKernel(nn.Module):
    """Bare (3, mid) kernel under the param path of the former
    ``nn.Dense(name='mlp_pos{g}')`` (checkpoint-compatible)."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (3, self.features))


class _MomentBN(nn.Module):
    """BatchNorm bookkeeping for externally computed batch moments.

    Same param/variable names and running-stat semantics as MaskedBatchNorm
    (torch momentum = update fraction, unbiased running var). Returns the
    (scale', bias') of the folded affine y = x*scale' + bias'."""

    features: int
    eps: float = 1e-3
    momentum: float = 0.01

    @nn.compact
    def __call__(self, mean, var, cnt, train: bool):
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        if train:
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        mult = scale / jnp.sqrt(var + self.eps)
        return mult, bias - mean * mult
