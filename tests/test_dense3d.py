"""Dense-grid backbone blocks must match the sparse gathered-conv blocks
bit-for-bit in semantics (same weights, same active sites)."""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.models.layers import (
    SubMConvBlock, SparseDownBlock, DenseSubM3DBlock, DenseDown3DBlock)
from virconv_tpu.ops import dense3d as d3
from virconv_tpu.ops import sparse as sp


def make_sparse(rng, spatial=(6, 12, 14), batch=2, n=150, cap=200, c=8):
    dd, hh, ww = spatial
    seen, coords = set(), []
    while len(coords) < n:
        cc = (rng.integers(batch), rng.integers(dd), rng.integers(hh),
              rng.integers(ww))
        if cc not in seen:
            seen.add(cc)
            coords.append(cc)
    coords = np.array(coords, np.int32)
    feats = rng.standard_normal((n, c)).astype(np.float32)
    coords = np.concatenate([coords, -np.ones((cap - n, 4), np.int32)])
    feats = np.concatenate([feats, np.zeros((cap - n, c), np.float32)])
    mask = np.arange(cap) < n
    st = sp.SparseTensor(feats=jnp.asarray(feats), coords=jnp.asarray(coords),
                         mask=jnp.asarray(mask), spatial_shape=spatial,
                         batch_size=batch)
    return sp.sort_by_key(st)


def rows_by_coord(st):
    coords = np.asarray(st.coords)
    feats = np.asarray(st.feats)
    mask = np.asarray(st.mask)
    return {tuple(coords[i]): feats[i] for i in range(len(mask)) if mask[i]}


def test_grid_sparse_roundtrip():
    rng = np.random.default_rng(0)
    st = make_sparse(rng)
    grid = jax.jit(d3.grid_from_sparse)(st)
    assert int(grid.mask.sum()) == int(st.mask.sum())
    back = jax.jit(lambda g: d3.grid_to_sparse(g, st.capacity))(grid)
    assert rows_by_coord(st).keys() == rows_by_coord(back).keys()
    for k, v in rows_by_coord(st).items():
        np.testing.assert_allclose(rows_by_coord(back)[k], v)


def test_dense_subm_matches_sparse():
    rng = np.random.default_rng(1)
    st = make_sparse(rng)
    nmap = sp.build_subm_neighbor_map(st, (3, 3, 3))
    blk_s = SubMConvBlock(out_channels=16)
    vs = blk_s.init(jax.random.PRNGKey(0), st, nmap, True)
    grid = d3.grid_from_sparse(st)
    blk_d = DenseSubM3DBlock(out_channels=16)
    vd = blk_d.init(jax.random.PRNGKey(0), grid, True)
    # share weights
    vd = jax.tree_util.tree_map(lambda a: a, vd)
    vd = {'params': {'kernel': vs['params']['kernel'],
                     'MaskedBatchNorm_0':
                         vs['params']['MaskedBatchNorm_0']},
          'batch_stats': vs['batch_stats']}

    out_s = blk_s.apply(vs, st, nmap, False)
    out_d = blk_d.apply(vd, grid, False)
    want = rows_by_coord(out_s)
    got_grid = np.asarray(out_d.feats)
    got_mask = np.asarray(out_d.mask)
    for (b, z, y, x), v in want.items():
        assert got_mask[b, z, y, x]
        np.testing.assert_allclose(got_grid[b, z, y, x], v, atol=1e-5)
    assert int(out_d.mask.sum()) == len(want)


def test_dense_down_matches_sparse():
    rng = np.random.default_rng(2)
    st = make_sparse(rng)
    # out_capacity must exceed the true downsampled site count: the sparse
    # path truncates at capacity, the dense path (correctly) keeps all
    blk_s = SparseDownBlock(out_channels=16, out_capacity=400)
    vs = blk_s.init(jax.random.PRNGKey(0), st, True)
    grid = d3.grid_from_sparse(st)
    blk_d = DenseDown3DBlock(out_channels=16)
    vd = {'params': {'kernel': vs['params']['kernel'],
                     'MaskedBatchNorm_0':
                         vs['params']['MaskedBatchNorm_0']},
          'batch_stats': vs['batch_stats']}

    out_s = blk_s.apply(vs, st, False)
    out_d = blk_d.apply(vd, grid, False)
    want = rows_by_coord(out_s)
    got_grid = np.asarray(out_d.feats)
    got_mask = np.asarray(out_d.mask)
    assert int(out_d.mask.sum()) == len(want)
    for (b, z, y, x), v in want.items():
        assert got_mask[b, z, y, x]
        np.testing.assert_allclose(got_grid[b, z, y, x], v, atol=1e-5)


def test_dense_down_irregular_dims():
    """Odd spatial dims + the conv_out shape (3,1,1)/(2,1,1)/pad 0."""
    rng = np.random.default_rng(3)
    st = make_sparse(rng, spatial=(7, 11, 13))
    blk_s = SparseDownBlock(out_channels=8, kernel_size=(3, 1, 1),
                            stride=(2, 1, 1), padding=(0, 0, 0),
                            out_capacity=400)
    vs = blk_s.init(jax.random.PRNGKey(1), st, True)
    grid = d3.grid_from_sparse(st)
    blk_d = DenseDown3DBlock(out_channels=8, kernel_size=(3, 1, 1),
                             stride=(2, 1, 1), padding=(0, 0, 0))
    vd = {'params': {'kernel': vs['params']['kernel'],
                     'MaskedBatchNorm_0':
                         vs['params']['MaskedBatchNorm_0']},
          'batch_stats': vs['batch_stats']}
    out_s = blk_s.apply(vs, st, False)
    out_d = blk_d.apply(vd, grid, False)
    want = rows_by_coord(out_s)
    got_grid = np.asarray(out_d.feats)
    assert int(out_d.mask.sum()) == len(want)
    for (b, z, y, x), v in want.items():
        np.testing.assert_allclose(got_grid[b, z, y, x], v, atol=1e-5)


def test_masked_bn_train_stats_match():
    """Training-mode BN statistics must agree between representations
    (same active rows -> same mean/var despite dense zero padding)."""
    rng = np.random.default_rng(4)
    st = make_sparse(rng)
    nmap = sp.build_subm_neighbor_map(st, (3, 3, 3))
    blk_s = SubMConvBlock(out_channels=16)
    vs = blk_s.init(jax.random.PRNGKey(0), st, nmap, True)
    grid = d3.grid_from_sparse(st)
    blk_d = DenseSubM3DBlock(out_channels=16)
    vd = {'params': {'kernel': vs['params']['kernel'],
                     'MaskedBatchNorm_0':
                         vs['params']['MaskedBatchNorm_0']},
          'batch_stats': vs['batch_stats']}
    out_s, mut_s = blk_s.apply(vs, st, nmap, True,
                               mutable=['batch_stats'])
    out_d, mut_d = blk_d.apply(vd, grid, True, mutable=['batch_stats'])
    np.testing.assert_allclose(
        np.asarray(mut_s['batch_stats']['MaskedBatchNorm_0']['mean']),
        np.asarray(mut_d['batch_stats']['MaskedBatchNorm_0']['mean']),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut_s['batch_stats']['MaskedBatchNorm_0']['var']),
        np.asarray(mut_d['batch_stats']['MaskedBatchNorm_0']['var']),
        atol=1e-6)
    want = rows_by_coord(out_s)
    got_grid = np.asarray(out_d.feats)
    for (b, z, y, x), v in want.items():
        np.testing.assert_allclose(got_grid[b, z, y, x], v, atol=1e-5)
