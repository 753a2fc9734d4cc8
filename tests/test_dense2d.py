"""Dense MXU path of the NRConv 2D image-plane branch vs the band path.

The dense path (``models.layers.Dense2DSubMBlock`` + the scatter/gather in
``NRConvBlock``) must reproduce the band path's semantics exactly —
including first-wins handling of several voxels projecting onto one pixel
(reference keeps an arbitrary spconv-hash winner,
``/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:207-229``;
this repo's convention is first row in key order).
"""
import functools

import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.ops import sparse as sp
from virconv_tpu.models.backbones_3d.virconv import NRConvBlock
from virconv_tpu.utils.calibration import identity_calib

PCR = (0, -8, -3, 16, 8, 1)
VOX = (0.1, 0.1, 0.1)


def _make_st(rng, n_entries=2, n_pts=4000):
    pts = rng.uniform([PCR[0], PCR[1], PCR[2], 0, 0, 0, 0, 1],
                      [PCR[3], PCR[4], PCR[5], 1, 1, 1, 1, 2],
                      (n_entries * n_pts, 8)).astype(np.float32)
    bidx = np.repeat(np.arange(n_entries, dtype=np.int32), n_pts)
    st = sp.voxelize(jnp.asarray(pts), jnp.ones((len(pts),), bool),
                     PCR, VOX, max_voxels=3072, max_points_per_voxel=5,
                     batch_size=n_entries, batch_idx=jnp.asarray(bidx))
    return sp.sort_by_key(st)


def test_dense2d_matches_band2d_first_wins(monkeypatch):
    rng = np.random.default_rng(3)
    st = _make_st(rng)
    calib = identity_calib(fu=200.0, fv=200.0, cu=700.0, cv=300.0)
    v2r, p2t = calib.device_matrices()
    v2r = jnp.asarray(np.tile(np.asarray(v2r), (st.batch_size, 1, 1)))
    p2t = jnp.asarray(np.tile(np.asarray(p2t), (st.batch_size, 1, 1)))
    params = jnp.asarray([[0.2, 0.0, 0.99], [0.1, 1.0, 1.02]], jnp.float32)

    block = NRConvBlock(16, stride=1, voxel_size=VOX,
                        point_cloud_range=PCR)
    variables = block.init(jax.random.PRNGKey(0), st, v2r, p2t, params,
                           1, False)

    # exact-precision band path (bf16 off) for a tight comparison
    monkeypatch.setattr(sp, 'subm_conv_ctx',
                        functools.partial(sp.subm_conv_ctx, bf16=False))
    monkeypatch.setattr(sp, 'strided_conv_ctx',
                        functools.partial(sp.strided_conv_ctx, bf16=False))
    monkeypatch.setenv('VIRCONV_BAND', '1')
    monkeypatch.setenv('VIRCONV_BAND2D', '1')
    monkeypatch.setenv('VIRCONV_DENSE2D', '0')
    ref = block.apply(variables, st, v2r, p2t, params, 1, False)

    monkeypatch.setenv('VIRCONV_DENSE2D', '1')
    got = block.apply(variables, st, v2r, p2t, params, 1, False)

    # many voxels share pixels at this density: first-wins must agree
    u = np.asarray(ref.coords)
    assert st.mask.sum() > 500
    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(ref.feats),
                               atol=2e-4, rtol=1e-3)


def test_dense2d_matches_nmap_on_strided_block(monkeypatch):
    """Strided NRConv block (stride 2): dense2d vs the all-XLA nmap path."""
    rng = np.random.default_rng(5)
    st = _make_st(rng, n_entries=1, n_pts=2500)
    calib = identity_calib(fu=200.0, fv=200.0, cu=700.0, cv=300.0)
    v2r, p2t = calib.device_matrices()
    v2r = jnp.asarray(np.asarray(v2r))[None]
    p2t = jnp.asarray(np.asarray(p2t))[None]

    block = NRConvBlock(16, stride=2, out_capacity=2048, voxel_size=VOX,
                        point_cloud_range=PCR)
    variables = block.init(jax.random.PRNGKey(1), st, v2r, p2t, None,
                           2, False)

    monkeypatch.setenv('VIRCONV_BAND', '1')
    monkeypatch.setenv('VIRCONV_BAND2D', '1')
    monkeypatch.setenv('VIRCONV_DENSE2D', '0')
    monkeypatch.setattr(sp, 'subm_conv_ctx',
                        functools.partial(sp.subm_conv_ctx, bf16=False))
    monkeypatch.setattr(sp, 'strided_conv_ctx',
                        functools.partial(sp.strided_conv_ctx, bf16=False))
    ref = block.apply(variables, st, v2r, p2t, None, 2, False)

    monkeypatch.setenv('VIRCONV_DENSE2D', '1')
    got = block.apply(variables, st, v2r, p2t, None, 2, False)

    np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(got.feats), np.asarray(ref.feats),
                               atol=2e-4, rtol=1e-3)
