"""gathered_conv_train's gather-only custom VJP vs autodiff of the oracle.

The backward of gathered_conv's row-gathers is a scatter-add (TPU-slow);
gathered_conv_train replaces it with the algebraic transpose conv (pure
gathers). Gradients must match jax.grad of the plain gathered_conv exactly.
"""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.ops import sparse as sp
from test_sparse import make_random_sparse


def _grads(fn, feats, w):
    def loss(f, wt):
        out = fn(f, wt)
        return (out * (1.0 + 0.1 * jnp.arange(out.size).reshape(out.shape))
                ).sum()
    return jax.grad(loss, argnums=(0, 1))(feats, w)


def test_subm_vjp_matches_autodiff():
    rng = np.random.default_rng(0)
    st = make_random_sparse(rng, batch_size=2, spatial=(6, 14, 12),
                            n_valid=500, capacity=576, channels=6)
    w = jnp.asarray((rng.standard_normal((27, 6, 8)) * 0.3).astype(np.float32))
    nmap = sp.build_subm_neighbor_map(st, 3)
    tmap = nmap[:, ::-1]

    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st.mask),
                 st.feats, w)
    got = _grads(lambda f, wt: sp.gathered_conv_train(
        f, nmap, tmap, wt, st.mask, st.mask), st.feats, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_strided_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    st = make_random_sparse(rng, batch_size=2, spatial=(6, 14, 12),
                            n_valid=500, capacity=576, channels=6)
    stride, padding, ksz = (2, 2, 2), (1, 1, 1), (3, 3, 3)
    st_out = sp.downsample_coords(st, stride, padding, ksz, 384)
    nmap = sp.build_strided_neighbor_map(st, st_out, stride, padding, ksz)
    tmap = sp.build_strided_transpose_map(st, st_out, stride, padding, ksz)
    w = jnp.asarray((rng.standard_normal((27, 6, 8)) * 0.3).astype(np.float32))

    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st_out.mask),
                 st.feats, w)
    got = _grads(lambda f, wt: sp.gathered_conv_train(
        f, nmap, tmap, wt, st_out.mask, st.mask), st.feats, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_strided_z_compression_vjp():
    """conv_out geometry: kernel (3,1,1), stride (2,1,1), padding 0."""
    rng = np.random.default_rng(2)
    st = make_random_sparse(rng, batch_size=1, spatial=(7, 10, 8),
                            n_valid=250, capacity=320, channels=5)
    stride, padding, ksz = (2, 1, 1), (0, 0, 0), (3, 1, 1)
    st_out = sp.downsample_coords(st, stride, padding, ksz, 256)
    nmap = sp.build_strided_neighbor_map(st, st_out, stride, padding, ksz)
    tmap = sp.build_strided_transpose_map(st, st_out, stride, padding, ksz)
    w = jnp.asarray((rng.standard_normal((3, 5, 7)) * 0.3).astype(np.float32))

    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st_out.mask),
                 st.feats, w)
    got = _grads(lambda f, wt: sp.gathered_conv_train(
        f, nmap, tmap, wt, st_out.mask, st.mask), st.feats, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_2d_subm_vjp_matches_autodiff():
    """The NRConv image-plane 2D conv geometry (ndim=2, K=9)."""
    rng = np.random.default_rng(3)
    st3 = make_random_sparse(rng, batch_size=2, spatial=(6, 14, 12),
                             n_valid=300, capacity=320, channels=6)
    coords2d = jnp.stack([st3.coords[:, 0], st3.coords[:, 2],
                          st3.coords[:, 3]], -1)
    coords2d = jnp.where(st3.mask[:, None], coords2d, -1)
    st = sp.SparseTensor(feats=st3.feats, coords=coords2d, mask=st3.mask,
                         spatial_shape=(14, 12), batch_size=2)
    st = sp.compact_sorted(sp.dedup_sorted(sp.sort_by_key(st)), st.capacity)
    nmap = sp.build_subm_neighbor_map(st, 3)
    tmap = nmap[:, ::-1]
    w = jnp.asarray((rng.standard_normal((9, 6, 6)) * 0.3).astype(np.float32))

    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st.mask),
                 st.feats, w)
    got = _grads(lambda f, wt: sp.gathered_conv_train(
        f, nmap, tmap, wt, st.mask, st.mask), st.feats, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_gather_rows_vjp_matches_autodiff():
    """voxel_pool.gather_rows sorted-segment backward == autodiff of the
    plain gather."""
    from virconv_tpu.models.roi_heads.voxel_pool import gather_rows
    rng = np.random.default_rng(4)
    n, m, s, c = 200, 64, 16, 8
    feats = jnp.asarray(rng.standard_normal((n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (m, s)).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=(m, s)) < 0.7)

    def loss_ref(f):
        g = f[idx] * valid[..., None]
        return (g * (1.0 + 0.01 * jnp.arange(g.size).reshape(g.shape))).sum()

    def loss_got(f):
        g = gather_rows(f, idx, valid)
        return (g * (1.0 + 0.01 * jnp.arange(g.size).reshape(g.shape))).sum()

    np.testing.assert_allclose(np.asarray(jax.grad(loss_got)(feats)),
                               np.asarray(jax.grad(loss_ref)(feats)),
                               atol=1e-4, rtol=1e-4)


def test_band_train_vjp_matches_autodiff():
    """The differentiable band conv (_band_train via subm_conv_ctx
    train=True) must match value AND grads of the nmap oracle."""
    rng = np.random.default_rng(7)
    st = make_random_sparse(rng, batch_size=2, spatial=(6, 14, 12),
                            n_valid=500, capacity=576, channels=8)
    w = jnp.asarray((rng.standard_normal((27, 8, 8)) * 0.3)
                    .astype(np.float32))
    nmap = sp.build_subm_neighbor_map(st, 3)
    ref_out = sp.gathered_conv(st.feats, nmap, w, st.mask)
    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st.mask),
                 st.feats, w)

    ctx = sp.subm_conv_ctx(st, 3, use_band=True, train=True, tile=32,
                           block=64, bf16=False)
    assert ctx.kind == 'band_train'
    got_out = ctx.conv(st.feats, w)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-4, rtol=1e-4)
    got = _grads(lambda f, wt: ctx.conv(f, wt), st.feats, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-4, rtol=1e-4)
    # dW accumulates per tile (different f32 summation order than the
    # oracle's per-tap dots): allow f32 reduction noise at |dW| ~ 4e3
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-3, rtol=5e-3)


def test_band_train_vjp_with_patch_rows(monkeypatch):
    """Grad parity when some tiles overflow the band window (patch rows
    active): the bwd patch corrections (dfeats overwrite + dW add-back)
    must reproduce the oracle exactly."""
    rng = np.random.default_rng(8)
    # long thin x extent so slab-straddling tiles appear at tiny tile/block
    st = make_random_sparse(rng, batch_size=1, spatial=(5, 4, 40),
                            n_valid=400, capacity=448, channels=6)
    w = jnp.asarray((rng.standard_normal((27, 6, 6)) * 0.3)
                    .astype(np.float32))
    ctx = sp.subm_conv_ctx(st, 3, use_band=True, train=True, tile=16,
                           block=32, bf16=False)
    nmap = sp.build_subm_neighbor_map(st, 3)
    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st.mask),
                 st.feats, w)
    got = _grads(lambda f, wt: ctx.conv(f, wt), st.feats, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_band_train_vjp_bf16_tolerance(monkeypatch):
    """bf16 train band path (VIRCONV_BAND_TRAIN_BF16=1): grads must track
    the f32 nmap oracle within bf16 matmul tolerance (ADVICE r4: this
    configuration previously shipped untested)."""
    monkeypatch.setenv('VIRCONV_BAND_TRAIN_BF16', '1')
    rng = np.random.default_rng(9)
    st = make_random_sparse(rng, batch_size=1, spatial=(6, 14, 12),
                            n_valid=400, capacity=448, channels=8)
    w = jnp.asarray((rng.standard_normal((27, 8, 8)) * 0.3)
                    .astype(np.float32))
    nmap = sp.build_subm_neighbor_map(st, 3)
    ref = _grads(lambda f, wt: sp.gathered_conv(f, nmap, wt, st.mask),
                 st.feats, w)
    ctx = sp.subm_conv_ctx(st, 3, use_band=True, train=True, tile=32,
                           block=64, bf16=True)
    got = _grads(lambda f, wt: ctx.conv(f, wt), st.feats, w)
    # bf16 products have ~8 mantissa bits and the 27-tap sums cancel, so
    # per-element error reaches ~10% of the |grad|~1e2 scale — the measured
    # cost of this opt-in mode (and why the train default is f32)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=10.0, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=1e2, rtol=5e-2)
    # and it must still be a usable descent direction: high cosine vs f32
    for g, r in zip(got, ref):
        gv = np.asarray(g).ravel()
        rv = np.asarray(r).ravel()
        cos = gv @ rv / (np.linalg.norm(gv) * np.linalg.norm(rv))
        assert cos > 0.999, cos
