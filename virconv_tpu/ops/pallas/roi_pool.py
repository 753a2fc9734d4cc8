"""ROI-local voxel-query grid pooling — Pallas kernel (eval fast path).

Replaces the per-query formulation of ``models/roi_heads/voxel_pool.py``
(occupancy-word probes + top-16 selection + global row gathers) for the
TED head's grid pooling. The round-4 trace put that path at ~71 ms/frame
(probes ~30, feat/row gathers ~41) because every one of the ~45k grid
points probed its own 9^3 window and gathered its own 16 feature rows —
while the grid points of one ROI share almost all of their candidates.

TPU-first design (one kernel program per ROI candidate block):

  * **Flat candidate bands.** Rows are sorted by the (b, y, x, z) voxel
    key, so the candidate set of an ROI (its grid-point AABB dilated by
    the union window) is <= NSLAB contiguous row runs — two
    ``searchsorted`` calls per (ROI, y-slab) in XLA, no occupancy tables,
    no scatters. Runs are compacted into a CBLK-aligned flat array; each
    kernel program handles one (ROI, block).
  * **Scan-order ranking on the MXU.** The reference kernel
    (``/root/reference/pcdet/ops/pointnet2/pointnet2_stack/src/
    voxel_query_gpu.cu``) takes the FIRST nsample in-radius hits in
    (dz, dy, dx) window-scan order. Within one dz bucket, row order ==
    (dy, dx) scan order, so the global scan rank is a per-dz-bucket
    running count: an inclusive cumsum along candidates, computed as a
    (Q, C) @ (C, C) upper-triangular ones matmul (integer-exact in bf16
    for C <= 256), plus a per-(query, dz) carry in VMEM scratch across a
    ROI's blocks. Selection = rank <= nsample — exact truncation
    semantics, order-free because max-pooling is order-invariant.
  * **Gather = one-hot matmul.** The slot-s one-hot (rank == s) against
    the block's (C, mid) features IS the gather; selected centers ride
    the same one-hot against a (C, 4) [center_xyz, 1] meta matrix, whose
    last column doubles as the slot-hit flag. The position encoding
    (rel @ W_pos, with eval-BN folded) and relu+max-pool epilogue run on
    the (S*Q, mid) gathered block in registers.

Exactness: bit-for-bit the same selected sets as
``voxel_pool.voxel_query_groups`` (same f32 center/distance arithmetic,
same scan order); with ``bf16=False`` the pooled features match the XLA
oracle to f32 matmul tolerance (tests/test_roi_pool.py). Capacity
overflows (NSLAB / block budget) flip ``plan.ok`` and callers fall back
to the oracle path via ``lax.cond``, so the result is exact for any
input.

Reference behavior target: ``voxel_pool_modules.py:70-130`` +
``voxel_query_gpu.cu`` (NeighborVoxelSAModuleMSG grid pooling).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIGNEG = -1048576.0          # invalid-candidate sentinel (cell coords f32)


class RoiPoolPlan(NamedTuple):
    """Per-call geometry shared by every group of one SA module call."""
    tabs: jnp.ndarray          # (2*NBLK,) i32: [roi_of | first] prefetch
    cand_pack: jnp.ndarray     # (NBLK, 3, CBLK) f32 cell (z, y, x), BIGNEG pad
    meta: jnp.ndarray          # (NBLK*CBLK, 4) f32 [ctr_xyz, valid]
    cand_rows: jnp.ndarray     # (NBLK*CBLK,) i32 source row (0 where invalid)
    cand_valid: jnp.ndarray    # (NBLK*CBLK,) bool
    q_pack: jnp.ndarray        # (R, Q, 8) f32 [cell_zyx, valid, xyz, 0]
    ok: jnp.ndarray            # () bool: caps held — else caller falls back
    n_roi: int
    q_per_roi: int
    cblk: int
    nblk: int


def roi_pool_plan(st, query_xyz, query_coords, query_mask, q_per_roi: int,
                  union_ranges, voxel_size, stride, point_cloud_range,
                  nslab: int = 64, cblk: int = 256,
                  nblk_cap: int | None = None) -> RoiPoolPlan:
    """Build the flat candidate bands for one SA call (XLA, no scatters).

    Args:
        st: source SparseTensor (sorted by key).
        query_xyz: (M, 3) grid-point positions, M = R * q_per_roi with each
            ROI's points consecutive.
        query_coords: (M, 4) [entry, cz, cy, cx] grid-point cells.
        query_mask: (M,) validity.
        union_ranges: (rz, ry, rx) of the LAST (largest) group — windows
            nest, so this window's dilation covers every group.
    """
    from ..sparse import key_strides
    m_all = query_xyz.shape[0]
    q = q_per_roi
    r = m_all // q
    assert r * q == m_all, (r, q, m_all)
    if nblk_cap is None:
        # Candidate bands cover a ROI's full (y, x) AABB *z-columns*, so
        # the per-ROI count scales ~1/stride^2: at stride 8 (x_conv4) two
        # CBLK blocks/ROI hold KITTI occupancy, at stride 4 (x_conv3) the
        # round-5 trace showed 5-8 blocks/ROI — plan.ok is False every
        # frame there and the kernel falls back to the probe path (found
        # by device trace; round 4's silent-exact-fallback mode again).
        # A 10-blocks/ROI budget for stride < 8 was built and MEASURED
        # SLOWER e2e (2.993 vs 3.119 fps): at this block geometry the
        # kernel's per-block (Q x CBLK) rank/gather work grows ~5x while
        # the probe path's cost is unchanged, and the 5x plan build is
        # paid unconditionally. Kept at 2/ROI (stride-8 wins only).
        # z-restricting the bands does NOT help at stride 4: the grid is
        # only ~11 z-cells deep while a dilated car ROI's z-window is ~16
        # — the column is already inside the window. The viable lever is
        # sub-ROI (octant) tiling: reshape (R, 216) queries to (R*8, 27)
        # so each octant's AABB bands shrink ~4-8x — docs/DESIGN.md §15.
        nblk_cap = 2 * r + 32
    d, h, w = st.spatial_shape
    strides, m_entry = key_strides(st.spatial_shape)   # z:1, x:D, y:W*D
    keys = st.keys()

    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    mins = jnp.asarray(point_cloud_range[:3], jnp.float32)
    rz, ry, rx = union_ranges

    qx = query_xyz.reshape(r, q, 3)
    qc = query_coords.reshape(r, q, 4)
    qm = query_mask.reshape(r, q)

    # --- per-ROI region: AABB of the (valid) grid-point CELLS + window ---
    big = jnp.float32(1e9)
    qmf = qm[..., None]
    cy_min = jnp.where(qmf[..., 0], qc[..., 2].astype(jnp.float32),
                       big).min(1).astype(jnp.int32)
    cy_max = jnp.where(qmf[..., 0], qc[..., 2].astype(jnp.float32),
                       -big).max(1).astype(jnp.int32)
    cx_min = jnp.where(qmf[..., 0], qc[..., 3].astype(jnp.float32),
                       big).min(1).astype(jnp.int32)
    cx_max = jnp.where(qmf[..., 0], qc[..., 3].astype(jnp.float32),
                       -big).max(1).astype(jnp.int32)
    roi_valid = qm.any(1)
    y0 = jnp.clip(cy_min - ry, 0, h - 1)
    y1 = jnp.clip(cy_max + ry, 0, h - 1)
    x0 = jnp.clip(cx_min - rx, 0, w - 1)
    x1 = jnp.clip(cx_max + rx, 0, w - 1)
    yext = jnp.where(roi_valid, y1 - y0 + 1, 0)
    ok_slab = (yext <= nslab).all()

    # --- per-(ROI, slab) runs via searchsorted on the sorted keys --------
    entry = qc[:, 0, 0].astype(jnp.int32)               # (R,)
    ys = y0[:, None] + jnp.arange(nslab, dtype=jnp.int32)[None]  # (R, NSLAB)
    slab_ok = roi_valid[:, None] & (ys <= y1[:, None])
    base_key = entry[:, None] * m_entry + ys * strides[1]
    k_lo = base_key + x0[:, None] * strides[2]
    k_hi = base_key + (x1[:, None] + 1) * strides[2]
    k_lo = jnp.where(slab_ok, k_lo, 0)
    k_hi = jnp.where(slab_ok, k_hi, 0)
    lo = jnp.searchsorted(keys, k_lo.reshape(-1),
                          method='sort').astype(jnp.int32).reshape(r, nslab)
    hi = jnp.searchsorted(keys, k_hi.reshape(-1),
                          method='sort').astype(jnp.int32).reshape(r, nslab)
    lens = jnp.where(slab_ok, hi - lo, 0)               # (R, NSLAB)
    counts = lens.sum(1)                                # (R,)

    # --- block layout: CBLK-aligned per-ROI segments ---------------------
    nblk_r = jnp.maximum(-(-counts // cblk), 1)         # (R,) >= 1
    base_blk = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nblk_r)[:-1]])
    total_blk = base_blk[-1] + nblk_r[-1]
    ok = ok_slab & (total_blk <= nblk_cap)

    pid = jnp.arange(nblk_cap, dtype=jnp.int32)
    # roi_of[p] = index of the segment containing block p (last for pads)
    roi_of = (pid[:, None] >= base_blk[None, :]).sum(1) - 1
    roi_of = jnp.clip(roi_of, 0, r - 1)
    first = (pid == base_blk[roi_of]).astype(jnp.int32)
    tabs = jnp.concatenate([roi_of, first])

    # --- flat candidate slots -> source rows -----------------------------
    flat = nblk_cap * cblk
    sid = jnp.arange(flat, dtype=jnp.int32)
    s_roi = roi_of[sid // cblk]                          # (FLAT,)
    j = sid - base_blk[s_roi] * cblk                     # within-ROI slot
    run_off = jnp.cumsum(lens, axis=1) - lens            # (R, NSLAB) excl
    run_off_r = run_off[s_roi]                           # (FLAT, NSLAB)
    run = (j[:, None] >= run_off_r).sum(1) - 1
    run = jnp.clip(run, 0, nslab - 1)
    row = lo[s_roi, run] + j - run_off_r[jnp.arange(flat), run]
    valid = (j < counts[s_roi]) & (j >= 0)
    # pads of segments beyond total_blk map j negative? j >= 0 by clip of
    # roi_of; blocks past the last segment get j >= counts -> invalid.
    row = jnp.where(valid, row, 0)

    ckey = keys[row]
    in_entry = ckey - (ckey // m_entry) * m_entry
    cy = in_entry // strides[1]
    cx = (in_entry - cy * strides[1]) // strides[2]
    cz = in_entry - cy * strides[1] - cx * strides[2]
    czf = jnp.where(valid, cz.astype(jnp.float32), BIGNEG)
    cyf = jnp.where(valid, cy.astype(jnp.float32), BIGNEG)
    cxf = jnp.where(valid, cx.astype(jnp.float32), BIGNEG)
    cand_pack = jnp.stack([czf, cyf, cxf], 1).reshape(
        nblk_cap, cblk, 3).transpose(0, 2, 1)            # (NBLK, 3, CBLK)

    ctr = (jnp.stack([cxf, cyf, czf], -1) + 0.5) * vs[None] + mins[None]
    meta = jnp.concatenate(
        [jnp.where(valid[:, None], ctr, 0.0),
         valid[:, None].astype(jnp.float32)], -1)        # (FLAT, 4)

    q_cellf = qc[..., 1:].astype(jnp.float32)            # (R, Q, 3) z,y,x
    q_pack = jnp.concatenate(
        [q_cellf, qm[..., None].astype(jnp.float32), qx,
         jnp.zeros((r, q, 1), jnp.float32)], -1)         # (R, Q, 8)

    return RoiPoolPlan(tabs=tabs, cand_pack=cand_pack, meta=meta,
                       cand_rows=row, cand_valid=valid, q_pack=q_pack,
                       ok=ok, n_roi=r, q_per_roi=q, cblk=cblk,
                       nblk=nblk_cap)


def _membership(cand_ref, q_ref, vs, mins):
    """Shared (QP, C) delta/center/distance prep of both kernel passes."""
    czr = cand_ref[0, 0:1, :]                  # (1, C)
    cyr = cand_ref[0, 1:2, :]
    cxr = cand_ref[0, 2:3, :]
    qzc = q_ref[0, :, 0:1]                     # (QP, 1) cell z
    qyc = q_ref[0, :, 1:2]
    qxc = q_ref[0, :, 2:3]
    qok = q_ref[0, :, 3:4]
    qfx = q_ref[0, :, 4:5]
    qfy = q_ref[0, :, 5:6]
    qfz = q_ref[0, :, 6:7]
    ddz = czr - qzc                            # (QP, C) f32 exact ints
    ddy = cyr - qyc
    ddx = cxr - qxc
    # centers in the SAME f32 arithmetic as the oracle probe
    ctx = (cxr + 0.5) * vs[2] + mins[0]
    cty = (cyr + 0.5) * vs[1] + mins[1]
    ctz = (czr + 0.5) * vs[0] + mins[2]
    dist2 = ((ctx - qfx) ** 2 + (cty - qfy) ** 2) + (ctz - qfz) ** 2
    base_ok = (czr > jnp.float32(BIGNEG + 1)) & (qok > 0)
    return ddz, ddy, ddx, dist2, base_ok, (qfx, qfy, qfz), qok


def _count_kernel(tabs_ref, cand_ref, q_ref, cnt_ref, *, specs, vs, mins,
                  qp, cblk, nblk):
    """Pass 1: global per-(query, group, dz-bucket) hit counts.

    The window-scan rank of a candidate = (count of hits in earlier dz
    buckets, over ALL of the ROI's blocks) + its within-bucket running
    count. The cross-bucket prefix needs bucket totals from future
    blocks, so it is accumulated here first (cnt output revisited
    across each ROI's blocks) and consumed by pass 2.
    """
    p = pl.program_id(0)
    first = tabs_ref[nblk + p]
    ddz, ddy, ddx, dist2, base_ok, _, _ = _membership(cand_ref, q_ref,
                                                      vs, mins)
    cols = []
    for g, ((rz, ry, rx), rad2, ns) in enumerate(specs):
        okg = (base_ok & (jnp.abs(ddz) <= rz) & (jnp.abs(ddy) <= ry)
               & (jnp.abs(ddx) <= rx) & (dist2 < rad2))
        for dzv in range(-rz, rz + 1):
            m_d = okg & (ddz == dzv)
            cols.append(m_d.astype(jnp.float32).sum(axis=1, keepdims=True))
        cols.extend([jnp.zeros((qp, 1), jnp.float32)] * (16 - (2 * rz + 1)))
    cnt = jnp.concatenate(cols, 1)             # (QP, 16*G)
    prev = cnt_ref[0]
    cnt_ref[0] = jnp.where(first > 0, cnt, prev + cnt)


def _kernel(tabs_ref, cand_ref, meta_ref, tri_ref, q_ref, wb_ref, cnt_ref,
            *refs, specs, vs, mins, qp, cblk, n_groups, mid, nblk, bf16):
    feat_refs = refs[:n_groups]
    out_ref = refs[n_groups]
    carry = refs[n_groups + 1]                 # (QP, 32) f32 scratch
    p = pl.program_id(0)
    first = tabs_ref[nblk + p]

    dt = jnp.bfloat16 if bf16 else jnp.float32
    ddz, ddy, ddx, dist2, base_ok, qf, qok = _membership(cand_ref, q_ref,
                                                         vs, mins)
    qfx, qfy, qfz = qf
    tri = tri_ref[:].astype(dt)                # (C, C) upper-tri ones

    for g, ((rz, ry, rx), rad2, ns) in enumerate(specs):
        okg = (base_ok & (jnp.abs(ddz) <= rz) & (jnp.abs(ddy) <= ry)
               & (jnp.abs(ddx) <= rx) & (dist2 < rad2))
        # global scan-order rank = cross-bucket prefix (pass-1 totals)
        # + within-bucket running count (MXU triangular cumsum + carry)
        rank = jnp.zeros((qp, cblk), jnp.float32)
        pref = jnp.zeros((qp, 1), jnp.float32)
        for di, dzv in enumerate(range(-rz, rz + 1)):
            col = g * 16 + di
            m_d = okg & (ddz == dzv)
            md_f = m_d.astype(dt)
            ps = jnp.dot(md_f, tri, preferred_element_type=jnp.float32)
            # first block of a ROI: discard the (uninitialized or
            # stale-ROI) carry via select — a multiply by 0 would turn
            # NaN-pattern scratch into NaN ranks
            cy0 = jnp.where(first > 0, 0.0, carry[:, col:col + 1])
            rank = rank + jnp.where(m_d, ps + cy0 + pref, 0.0)
            carry[:, col:col + 1] = cy0 + ps[:, cblk - 1:cblk]
            pref = pref + cnt_ref[0, :, col:col + 1]
        # slot one-hot, slot-major rows: rows [s*QP, (s+1)*QP)
        eq = jnp.concatenate(
            [okg & (rank == jnp.float32(s + 1)) for s in range(ns)], 0)
        gath = jnp.dot(eq.astype(dt), feat_refs[g][:].astype(dt),
                       preferred_element_type=jnp.float32)  # (ns*QP, mid)
        meta_g = jnp.dot(eq.astype(jnp.float32), meta_ref[:],
                         preferred_element_type=jnp.float32)  # (ns*QP, 4)
        hit = meta_g[:, 3:4]
        qf_t = jnp.concatenate([jnp.concatenate([qfx, qfy, qfz], 1)] * ns, 0)
        rel = (meta_g[:, 0:3] - qf_t) * hit                 # (ns*QP, 3)
        w_eff = wb_ref[4 * g:4 * g + 3, :]                  # (3, mid)
        b_eff = wb_ref[4 * g + 3:4 * g + 4, :]              # (1, mid)
        pos = jnp.dot(rel, w_eff, preferred_element_type=jnp.float32) \
            + b_eff
        qok_t = jnp.concatenate([qok] * ns, 0)
        x = jnp.where((hit > 0) & (qok_t > 0),
                      jnp.maximum(gath + pos, 0.0), 0.0)    # (ns*QP, mid)
        acc = x[0:qp, :]
        for s in range(1, ns):
            acc = jnp.maximum(acc, x[s * qp:(s + 1) * qp, :])
        prev = out_ref[0, :, g * mid:(g + 1) * mid]
        out_ref[0, :, g * mid:(g + 1) * mid] = jnp.where(
            first > 0, acc, jnp.maximum(prev, acc))


def roi_pool_apply(plan: RoiPoolPlan, feats_groups, w_eff, b_eff, specs,
                   voxel_size, stride, point_cloud_range,
                   bf16: bool = True, interpret: bool = False):
    """Run the kernel for all groups of one SA call.

    Args:
        plan: RoiPoolPlan (caller must gate on plan.ok).
        feats_groups: list of (N, mid) per-group source features (post
            mlp_in+BN). Gathered to the flat candidate slots here.
        w_eff / b_eff: lists of (3, mid) / (mid,) folded position-BN
            affines per group.
        specs: tuple of ((rz, ry, rx), radius, nsample) per group.
    Returns:
        (G, M, mid) pooled features (M = n_roi * q_per_roi).
    """
    g_n = len(feats_groups)
    mid = feats_groups[0].shape[1]
    qp = plan.q_per_roi
    cblk = plan.cblk
    nblk = plan.nblk
    dt = jnp.bfloat16 if bf16 else jnp.float32

    flat_feats = [
        (f[plan.cand_rows] * plan.cand_valid[:, None].astype(f.dtype)
         ).astype(dt)
        for f in feats_groups]
    wb = jnp.concatenate(
        [jnp.concatenate([w_eff[g].astype(jnp.float32),
                          b_eff[g].reshape(1, mid).astype(jnp.float32)], 0)
         for g in range(g_n)], 0)                        # (4G, mid)
    tri_np = np.triu(np.ones((cblk, cblk), np.float32))
    tri = jnp.asarray(tri_np, dt)

    vs = tuple(float(v) * stride for v in voxel_size)    # x, y, z
    mins = tuple(float(v) for v in point_cloud_range[:3])
    kspecs = tuple((tuple(int(v) for v in rg), float(rad) * float(rad),
                    int(ns)) for rg, rad, ns in specs)
    statics = dict(specs=kspecs, vs=(vs[2], vs[1], vs[0]), mins=mins,
                   qp=qp, cblk=cblk, nblk=nblk)

    # pass 1: global per-(query, dz-bucket) hit counts
    cnt_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 3, cblk), lambda p, tabs: (p, 0, 0)),
            pl.BlockSpec((1, qp, 8), lambda p, tabs: (tabs[p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qp, 16 * g_n),
                               lambda p, tabs: (tabs[p], 0, 0)),
    )
    counts = pl.pallas_call(
        functools.partial(_count_kernel, **statics),
        grid_spec=cnt_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_roi, qp, 16 * g_n),
                                       jnp.float32),
        interpret=interpret,
    )(plan.tabs, plan.cand_pack, plan.q_pack)

    kernel = functools.partial(_kernel, n_groups=g_n, mid=mid, bf16=bf16,
                               **statics)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 3, cblk), lambda p, tabs: (p, 0, 0)),
            pl.BlockSpec((cblk, 4), lambda p, tabs: (p, 0)),
            pl.BlockSpec((cblk, cblk), lambda p, tabs: (0, 0)),
            pl.BlockSpec((1, qp, 8), lambda p, tabs: (tabs[p], 0, 0)),
            pl.BlockSpec((4 * g_n, mid), lambda p, tabs: (0, 0)),
            pl.BlockSpec((1, qp, 16 * g_n),
                         lambda p, tabs: (tabs[p], 0, 0)),
            *[pl.BlockSpec((cblk, mid), lambda p, tabs: (p, 0))
              for _ in range(g_n)],
        ],
        out_specs=pl.BlockSpec((1, qp, g_n * mid),
                               lambda p, tabs: (tabs[p], 0, 0)),
        scratch_shapes=[pltpu.VMEM((qp, 32), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_roi, qp, g_n * mid),
                                       jnp.float32),
        interpret=interpret,
    )(plan.tabs, plan.cand_pack, plan.meta, tri, plan.q_pack, wb, counts,
      *flat_feats)
    out = out.reshape(plan.n_roi * qp, g_n, mid)
    return out.transpose(1, 0, 2)                        # (G, M, mid)
