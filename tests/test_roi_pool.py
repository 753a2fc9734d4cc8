"""ROI-local Pallas pooling kernel vs the per-query probe oracle.

The kernel (ops/pallas/roi_pool.py) must reproduce voxel_query_groups +
the SA group-body eval math EXACTLY: same first-nsample window-scan-order
truncation (the reference CUDA kernel's semantics), same f32
center/distance arithmetic — including multi-block ROIs (candidate count
> CBLK, exercising the cross-block rank carry) and dense clusters with
> nsample in-radius hits (exercising truncation).
"""
import functools
import os

import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.ops import sparse as sp
from virconv_tpu.models.roi_heads import voxel_pool as vp
from virconv_tpu.ops.pallas.roi_pool import roi_pool_plan, roi_pool_apply

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VOX = (0.1, 0.1, 0.1)
SPATIAL = (40, 160, 160)       # (D, H, W) at stride 1


def _make_st(rng, n_entries, n_valid, capacity, channels, cluster_at=None):
    """Random sparse tensor; optionally add a dense cluster of voxels
    around ``cluster_at`` (x, y, z) so queries there have > nsample hits."""
    coords = np.stack([
        rng.integers(0, n_entries, n_valid),
        rng.integers(0, SPATIAL[0], n_valid),
        rng.integers(0, SPATIAL[1], n_valid),
        rng.integers(0, SPATIAL[2], n_valid)], -1).astype(np.int32)
    if cluster_at is not None:
        cx, cy, cz = cluster_at
        cell = np.array([(cz - PCR[2]) / VOX[2], (cy - PCR[1]) / VOX[1],
                         (cx - PCR[0]) / VOX[0]]).astype(np.int32)
        k = 6
        zz, yy, xx = np.meshgrid(*[np.arange(-k // 2, k // 2 + 1)] * 3,
                                 indexing='ij')
        blk = np.stack([np.zeros_like(zz), zz + cell[0], yy + cell[1],
                      xx + cell[2]], -1).reshape(-1, 4).astype(np.int32)
        coords[:len(blk)] = blk
    # dedup
    key = ((coords[:, 0] * SPATIAL[0] + coords[:, 1]) * SPATIAL[1]
           + coords[:, 2]).astype(np.int64) * SPATIAL[2] + coords[:, 3]
    _, keep = np.unique(key, return_index=True)
    coords = coords[keep]
    n = len(coords)
    feats = rng.standard_normal((capacity, channels)).astype(np.float32)
    cpad = np.full((capacity, 4), -1, np.int32)
    cpad[:n] = coords
    mask = np.zeros((capacity,), bool)
    mask[:n] = True
    st = sp.SparseTensor(feats=jnp.asarray(feats) *
                         jnp.asarray(mask)[:, None],
                         coords=jnp.asarray(cpad), mask=jnp.asarray(mask),
                         spatial_shape=SPATIAL, batch_size=n_entries)
    return sp.sort_by_key(st)


def _make_queries(rng, n_roi, g, n_entries, centers=None):
    """ROI-grid queries: R rois x g^3 points each (like dense_grid_points)."""
    from virconv_tpu.models.roi_heads.ted_head import dense_grid_points
    rois = np.zeros((n_roi, 7), np.float32)
    rois[:, 0] = rng.uniform(2, 14, n_roi)
    rois[:, 1] = rng.uniform(-6, 6, n_roi)
    rois[:, 2] = rng.uniform(-2, 0, n_roi)
    rois[:, 3:6] = rng.uniform(1.5, 4.5, (n_roi, 3))
    rois[:, 6] = rng.uniform(-np.pi, np.pi, n_roi)
    if centers is not None:
        for i, c in enumerate(centers):
            rois[i, 0:3] = c
    qxyz = dense_grid_points(jnp.asarray(rois), g).reshape(-1, 3)
    entry = np.repeat(rng.integers(0, n_entries, n_roi), g ** 3)
    cells = jnp.floor((qxyz - jnp.asarray(PCR[:3])) /
                      jnp.asarray(VOX)).astype(jnp.int32)
    qc = jnp.concatenate([jnp.asarray(entry)[:, None],
                          cells[:, 2:3], cells[:, 1:2], cells[:, 0:1]], -1)
    qmask = np.ones((n_roi * g ** 3,), bool)
    qmask[-g ** 3:] = False        # one fully invalid ROI
    return qxyz, qc, jnp.asarray(qmask)


SPECS = (((2, 2, 2), 0.4, 8), ((4, 4, 4), 0.8, 8))


def _oracle(st, qxyz, qc, qmask, specs, feats_g, w_pos, mult, bias, stride):
    table = vp.build_pool_tables(st)
    queries = vp.voxel_query_groups(st, table, qxyz, qc, qmask, specs,
                                    VOX, stride, PCR)
    outs = []
    for g, (_, _, ns) in enumerate(specs):
        idx, valid, centers = queries[g]
        grouped = feats_g[g][idx] * valid[..., None]
        qm_rows = qmask[:, None] & jnp.ones_like(valid)
        rel = (centers - qxyz[:, None, :]) * valid[..., None]
        pos = rel @ w_pos[g] * mult[g] + bias[g]
        pos = jnp.where(qm_rows[..., None], pos, 0.0)
        x = jnp.maximum(grouped + pos, 0.0)
        x = jnp.where(valid[..., None], x, 0.0)
        outs.append(x.max(axis=1))
    return jnp.stack(outs)


def _run_kernel(st, qxyz, qc, qmask, specs, feats_g, w_pos, mult, bias,
                stride, g, **plan_kw):
    plan = roi_pool_plan(st, qxyz, qc, qmask, g ** 3, specs[-1][0],
                         VOX, stride, PCR, **plan_kw)
    w_eff = [w_pos[i] * mult[i][None, :] for i in range(len(specs))]
    b_eff = [bias[i] for i in range(len(specs))]
    out = roi_pool_apply(plan, feats_g, w_eff, b_eff, specs, VOX, stride,
                         PCR, bf16=False, interpret=True)
    return plan, out


def test_kernel_matches_oracle_with_truncation_and_multiblock():
    rng = np.random.default_rng(11)
    mid = 8
    # dense cluster at a known spot -> the ROI centered there has > ns
    # hits per query (truncation) AND > cblk total candidates (multi-block)
    st = _make_st(rng, n_entries=2, n_valid=2500, capacity=3072,
                  channels=mid, cluster_at=(8.0, 0.0, -1.0))
    g = 4
    qxyz, qc, qmask = _make_queries(rng, 6, g, 2,
                                    centers=[(8.0, 0.0, -1.0)])
    # entry of roi 0 must be 0 (cluster entry)
    qc = qc.at[:g ** 3, 0].set(0)
    feats_g = [jnp.asarray(rng.standard_normal(
        (st.capacity, mid)).astype(np.float32)) for _ in SPECS]
    w_pos = [jnp.asarray(rng.standard_normal((3, mid)).astype(np.float32))
             for _ in SPECS]
    mult = [jnp.asarray(rng.uniform(0.5, 2, mid).astype(np.float32))
            for _ in SPECS]
    bias = [jnp.asarray(rng.standard_normal(mid).astype(np.float32))
            for _ in SPECS]

    ref = _oracle(st, qxyz, qc, qmask, SPECS, feats_g, w_pos, mult, bias, 1)
    plan, got = _run_kernel(st, qxyz, qc, qmask, SPECS, feats_g, w_pos,
                            mult, bias, 1, g, cblk=64, nslab=64,
                            nblk_cap=64)
    assert bool(plan.ok), 'caps must hold for this test'
    # multi-block actually exercised?
    counts = np.asarray(plan.cand_valid).reshape(-1, 64).sum(1)
    assert counts.max() == 64, 'expected at least one full block'
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_plan_overflow_flips_ok():
    rng = np.random.default_rng(12)
    st = _make_st(rng, 1, 1500, 2048, 4)
    g = 3
    qxyz, qc, qmask = _make_queries(rng, 8, g, 1)
    plan = roi_pool_plan(st, qxyz, qc, qmask, g ** 3, (4, 4, 4), VOX, 1,
                         PCR, cblk=32, nblk_cap=4)
    assert not bool(plan.ok)
    plan2 = roi_pool_plan(st, qxyz, qc, qmask, g ** 3, (4, 4, 4), VOX, 1,
                          PCR, nslab=2)
    assert not bool(plan2.ok)


def test_tile_layout_roundtrip():
    """gather -> inv must be the identity on real queries, for even and
    odd grid sizes (odd g gives unequal quadrant sizes)."""
    for g in (3, 4, 6):
        gather, tval, inv, qp = vp._tile_layout(g)
        gather, tval, inv = (np.asarray(gather), np.asarray(tval),
                             np.asarray(inv))
        assert qp % 8 == 0 and tval.sum() == g ** 3
        # tiled row inv[r] holds original row r
        np.testing.assert_array_equal(gather[inv], np.arange(g ** 3))
        assert tval[inv].all()


def test_sa_module_tiled_kernel_matches_untiled(monkeypatch):
    """Quadrant tiling must be output-invariant: per-query math is
    identical, only the plan segmentation changes."""
    rng = np.random.default_rng(17)
    st = _make_st(rng, 2, 2000, 2560, 16, cluster_at=(6.0, 1.0, -1.0))
    g = 4
    qxyz, qc, qmask = _make_queries(rng, 8, g, 2,
                                    centers=[(6.0, 1.0, -1.0)])
    mod = vp.NeighborVoxelSAModule(
        query_ranges=((2, 2, 2), (4, 4, 4)), radii=(0.4, 0.8),
        nsamples=(8, 8), mlps=((8, 16), (8, 16)), voxel_size=VOX,
        point_cloud_range=PCR)
    variables = mod.init(jax.random.PRNGKey(0), st, 1, qxyz, qc, qmask,
                         True)
    monkeypatch.setenv('VIRCONV_POOL_KERNEL', '1')
    monkeypatch.setenv('VIRCONV_POOL_TILE', '0')
    ref = mod.apply(variables, st, 1, qxyz, qc, qmask, False,
                    q_per_roi=g ** 3)
    monkeypatch.setenv('VIRCONV_POOL_TILE', '1')
    got = mod.apply(variables, st, 1, qxyz, qc, qmask, False,
                    q_per_roi=g ** 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # and the tiled kernel path itself must match the probe oracle
    monkeypatch.setenv('VIRCONV_POOL_KERNEL', '0')
    oracle = mod.apply(variables, st, 1, qxyz, qc, qmask, False,
                       q_per_roi=g ** 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               atol=2e-5, rtol=1e-4)


def test_sa_module_kernel_path_matches_probe_path(monkeypatch):
    rng = np.random.default_rng(13)
    st = _make_st(rng, 2, 2000, 2560, 16, cluster_at=(6.0, 1.0, -1.0))
    g = 3
    qxyz, qc, qmask = _make_queries(rng, 10, g, 2)
    mod = vp.NeighborVoxelSAModule(
        query_ranges=((2, 2, 2), (4, 4, 4)), radii=(0.4, 0.8),
        nsamples=(8, 8), mlps=((8, 16), (8, 16)), voxel_size=VOX,
        point_cloud_range=PCR)
    variables = mod.init(jax.random.PRNGKey(0), st, 1, qxyz, qc, qmask,
                         True)
    monkeypatch.setenv('VIRCONV_POOL_KERNEL', '0')
    ref = mod.apply(variables, st, 1, qxyz, qc, qmask, False,
                    q_per_roi=g ** 3)
    monkeypatch.setenv('VIRCONV_POOL_KERNEL', '1')
    got = mod.apply(variables, st, 1, qxyz, qc, qmask, False,
                    q_per_roi=g ** 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
