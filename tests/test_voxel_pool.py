"""Voxel-query ROI pooling: selection semantics vs numpy brute force."""
import numpy as np
import jax
import jax.numpy as jnp

import pytest

from virconv_tpu.models.roi_heads.voxel_pool import (
    _window_offsets, build_pool_tables, build_row_table, voxel_query)
from virconv_tpu.ops import sparse as sp


def make_sparse(rng, spatial=(8, 20, 20), batch=2, n=120, cap=160):
    d, h, w = spatial
    seen, coords = set(), []
    while len(coords) < n:
        c = (rng.integers(batch), rng.integers(d), rng.integers(h),
             rng.integers(w))
        if c not in seen:
            seen.add(c)
            coords.append(c)
    coords = np.array(coords, np.int32)
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    coords = np.concatenate([coords, -np.ones((cap - n, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((cap - n, 8), np.float32)])
    mask = np.arange(cap) < n
    st = sp.SparseTensor(feats=jnp.asarray(feats), coords=jnp.asarray(coords),
                         mask=jnp.asarray(mask), spatial_shape=spatial,
                         batch_size=batch)
    return sp.sort_by_key(st)


@pytest.mark.parametrize('probe', ['dense', 'bits'])
def test_voxel_query_matches_bruteforce(probe):
    rng = np.random.default_rng(0)
    spatial = (8, 20, 20)
    vs = (0.2, 0.2, 0.2)
    pcr = (0, -2, -0.8, 4, 2, 0.8)
    stride = 1
    st = make_sparse(rng, spatial)
    table = build_row_table(st) if probe == 'dense' \
        else build_pool_tables(st)

    m = 40
    qxyz = rng.uniform([0.2, -1.8, -0.6], [3.8, 1.8, 0.6],
                       (m, 3)).astype(np.float32)
    qb = rng.integers(0, 2, m).astype(np.int32)
    cell = np.floor((qxyz - np.array(pcr[:3])) / np.array(vs)).astype(
        np.int32)
    qcoords = np.stack([qb, cell[:, 2], cell[:, 1], cell[:, 0]], -1)
    qmask = np.ones(m, bool)
    ranges, radius, nsample = (2, 2, 2), 0.45, 6

    idx, valid, centers = jax.jit(
        lambda s, t, x, c, mk: voxel_query(
            s, t, x, c, mk, ranges, radius, nsample, vs, stride, pcr)
    )(st, table, jnp.asarray(qxyz), jnp.asarray(qcoords),
      jnp.asarray(qmask))
    idx, valid, centers = map(np.asarray, (idx, valid, centers))

    # numpy brute force in the same scan order
    offs = _window_offsets(ranges, radius=radius, voxel_size=vs,
                           stride=stride)
    coords = np.asarray(st.coords)
    mask = np.asarray(st.mask)
    lut = {tuple(coords[i]): i for i in range(len(mask)) if mask[i]}
    d, h, w = spatial
    for q in range(m):
        hits = []
        for o in offs:
            cz, cy, cx = qcoords[q, 1] + o[0], qcoords[q, 2] + o[1], \
                qcoords[q, 3] + o[2]
            if not (0 <= cz < d and 0 <= cy < h and 0 <= cx < w):
                continue
            row = lut.get((qb[q], cz, cy, cx))
            if row is None:
                continue
            center = (np.array([cx, cy, cz]) + 0.5) * np.array(vs) \
                + np.array(pcr[:3])
            if np.sum((center - qxyz[q]) ** 2) < radius ** 2:
                hits.append((row, center))
            if len(hits) == nsample:
                break
        got_rows = idx[q][valid[q]]
        want_rows = [hh[0] for hh in hits]
        np.testing.assert_array_equal(got_rows, want_rows)
        if hits:
            np.testing.assert_allclose(
                centers[q][valid[q]], np.stack([hh[1] for hh in hits]),
                rtol=1e-5)


def test_voxel_query_chunked_matches_unchunked(monkeypatch):
    """Forcing the lax.map chunked path must not change results."""
    import virconv_tpu.models.roi_heads.voxel_pool as vp
    rng = np.random.default_rng(3)
    spatial = (8, 20, 20)
    vs = (0.2, 0.2, 0.2)
    pcr = (0, -2, -0.8, 4, 2, 0.8)
    st = make_sparse(rng, spatial)
    table = build_row_table(st)
    m = 50
    qxyz = rng.uniform([0.2, -1.8, -0.6], [3.8, 1.8, 0.6],
                       (m, 3)).astype(np.float32)
    qb = rng.integers(0, 2, m).astype(np.int32)
    cell = np.floor((qxyz - np.array(pcr[:3])) / np.array(vs)).astype(
        np.int32)
    qcoords = np.stack([qb, cell[:, 2], cell[:, 1], cell[:, 0]], -1)
    qmask = np.ones(m, bool)
    args = (st, table, jnp.asarray(qxyz), jnp.asarray(qcoords),
            jnp.asarray(qmask), (2, 2, 2), 0.45, 6, vs, 1, pcr)
    base = [np.asarray(x) for x in voxel_query(*args)]
    monkeypatch.setattr(vp, 'CHUNK_BUDGET', 64)   # force many chunks
    chunked = [np.asarray(x) for x in vp.voxel_query(*args)]
    np.testing.assert_array_equal(base[0], chunked[0])
    np.testing.assert_array_equal(base[1], chunked[1])
    # centers: chunked lowering fuses the float chain differently (~1e-6)
    np.testing.assert_allclose(base[2], chunked[2], rtol=1e-5, atol=1e-6)


def test_grouped_bits_probe_matches_dense():
    """Production two-group nested query: packed-occupancy probe == dense
    row-table probe (same selection order, rows, centers)."""
    from virconv_tpu.models.roi_heads.voxel_pool import voxel_query_groups
    rng = np.random.default_rng(7)
    spatial = (8, 24, 24)
    vs = (0.1, 0.1, 0.2)
    pcr = (0, -1.2, -0.8, 2.4, 1.2, 0.8)
    st = make_sparse(rng, spatial, n=200, cap=256)
    m = 64
    qxyz = rng.uniform([0.05, -1.1, -0.7], [2.35, 1.1, 0.7],
                       (m, 3)).astype(np.float32)
    qb = rng.integers(0, 2, m).astype(np.int32)
    cell = np.floor((qxyz - np.array(pcr[:3])) / np.array(vs)).astype(
        np.int32)
    qcoords = np.stack([qb, cell[:, 2], cell[:, 1], cell[:, 0]], -1)
    qmask = rng.random(m) < 0.9
    specs = (((2, 2, 2), 0.25, 8), ((4, 4, 4), 0.5, 8))
    args = (jnp.asarray(qxyz), jnp.asarray(qcoords), jnp.asarray(qmask),
            specs, vs, 1, pcr)
    dense = voxel_query_groups(st, build_row_table(st), *args)
    bits = voxel_query_groups(st, build_pool_tables(st), *args)
    for (di, dv, dc), (bi, bv, bc) in zip(dense, bits):
        np.testing.assert_array_equal(np.asarray(dv), np.asarray(bv))
        np.testing.assert_array_equal(np.asarray(di), np.asarray(bi))
        np.testing.assert_allclose(np.asarray(dc), np.asarray(bc),
                                   rtol=1e-5, atol=1e-6)


def test_sa_group_body_chunked_matches_direct(monkeypatch):
    """The train-time chunked SA group body (bounded (Mc, S, mid) temps)
    must match the direct path in outputs AND feature gradients."""
    import virconv_tpu.models.roi_heads.voxel_pool as vp
    from virconv_tpu.models.roi_heads.voxel_pool import NeighborVoxelSAModule
    rng = np.random.default_rng(11)
    spatial = (8, 20, 20)
    vs = (0.2, 0.2, 0.2)
    pcr = (0, -2, -0.8, 4, 2, 0.8)
    st = make_sparse(rng, spatial)
    m = 60
    qxyz = rng.uniform([0.2, -1.8, -0.6], [3.8, 1.8, 0.6],
                       (m, 3)).astype(np.float32)
    qb = rng.integers(0, 2, m).astype(np.int32)
    cell = np.floor((qxyz - np.array(pcr[:3])) / np.array(vs)).astype(
        np.int32)
    qcoords = jnp.asarray(np.stack([qb, cell[:, 2], cell[:, 1],
                                    cell[:, 0]], -1))
    qmask = jnp.asarray(np.ones(m, bool))
    qxyz = jnp.asarray(qxyz)
    mod = NeighborVoxelSAModule(
        query_ranges=((1, 1, 1), (2, 2, 2)), radii=(0.4, 0.45),
        nsamples=(4, 6), mlps=((8, 8), (8, 8)), voxel_size=vs,
        point_cloud_range=pcr)
    rngs = {'params': jax.random.PRNGKey(0)}
    v = mod.init(rngs, st, 1, qxyz, qcoords, qmask, True)

    def run(params):
        out, _ = mod.apply(
            {'params': params, 'batch_stats': v.get('batch_stats', {})},
            st, 1, qxyz, qcoords, qmask, True, mutable=['batch_stats'])
        return out

    def loss(params):
        return (run(params) ** 2).sum()

    base = np.asarray(run(v['params']))
    gbase = jax.grad(loss)(v['params'])
    monkeypatch.setattr(vp, 'TRAIN_GATHER_BUDGET', 64)   # force chunking
    chunk = np.asarray(run(v['params']))
    gchunk = jax.grad(loss)(v['params'])
    np.testing.assert_allclose(base, chunk, rtol=1e-5, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        gbase, gchunk)
