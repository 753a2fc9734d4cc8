"""End-to-end equivalence of the band-window eval path vs the XLA nmap
path on the tiny detector (CPU interpret mode, f32)."""
import functools

import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.ops import sparse as sp

from test_model_forward import tiny_cfg, make_batch


import pytest


def _run_band_vs_nmap(monkeypatch, small):
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN

    model_cfg, data_cfg = tiny_cfg(mm=True)
    n_pts = 1500
    if small:
        from test_model_forward import shrink_cfg
        n_pts = shrink_cfg(model_cfg, data_cfg)
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    rng = np.random.default_rng(0)
    train_batch = make_batch(rng, n_entries=1, n_pts=n_pts, train=True)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
         'sampling': jax.random.PRNGKey(2), 'dropout': jax.random.PRNGKey(3)},
        train_batch)
    eval_vars = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}
    eval_batch = make_batch(rng, n_entries=2, n_pts=n_pts, train=False,
                            n_rep=2)

    # pin the 2D branch to its sparse formulations: this test is the
    # band-vs-nmap oracle (test_dense2d covers the dense 2D path)
    monkeypatch.setenv('VIRCONV_DENSE2D', '0')
    monkeypatch.setenv('VIRCONV_BAND', '0')
    ref = model.apply(eval_vars, eval_batch, train=False)

    # exact-precision band path (bf16 off) for a tight comparison
    monkeypatch.setattr(
        sp, 'subm_conv_ctx',
        functools.partial(sp.subm_conv_ctx, bf16=False))
    monkeypatch.setattr(
        sp, 'strided_conv_ctx',
        functools.partial(sp.strided_conv_ctx, bf16=False))
    monkeypatch.setenv('VIRCONV_BAND', '1')
    got = model.apply(eval_vars, eval_batch, train=False)

    np.testing.assert_allclose(np.asarray(got['batch_cls_preds']),
                               np.asarray(ref['batch_cls_preds']),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got['batch_box_preds']),
                               np.asarray(ref['batch_box_preds']),
                               atol=5e-3, rtol=1e-3)


def test_detector_band_path_matches_nmap_path_small(monkeypatch):
    """Always-on variant at the shared width-shrunk preset (~1/3 the
    compile+run time); the tiny-width version is slow-marked below."""
    _run_band_vs_nmap(monkeypatch, small=True)


@pytest.mark.slow
def test_detector_band_path_matches_nmap_path(monkeypatch):
    _run_band_vs_nmap(monkeypatch, small=False)
