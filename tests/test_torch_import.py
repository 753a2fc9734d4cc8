"""Weight-layout conversion checks for the torch->flax importer."""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np

from virconv_tpu.utils import torch_import as ti


def test_spconv2_kernel_layout_matches_offset_order():
    """A spconv2-style kernel converted to (K, in, out) must reproduce the
    dense conv result under our offset enumeration (z-major ascending)."""
    import jax.numpy as jnp
    from virconv_tpu.ops import sparse as sp

    rng = np.random.default_rng(0)
    out_c, in_c = 5, 4
    w_torch = rng.standard_normal((out_c, 3, 3, 3, in_c)).astype(np.float32)
    w_ours = ti.spconv_kernel_to_gathered(w_torch)
    assert w_ours.shape == (27, in_c, out_c)
    # tap (dz, dy, dx) index in our order:
    for kz in range(3):
        for ky in range(3):
            for kx in range(3):
                k = (kz * 3 + ky) * 3 + kx
                np.testing.assert_array_equal(
                    w_ours[k], w_torch[:, kz, ky, kx, :].T)


def test_conv2d_and_linear_layouts():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    f = ti.conv2d_to_flax(w)
    assert f.shape == (3, 3, 4, 8)
    np.testing.assert_array_equal(f[1, 2], w[:, :, 1, 2].T)

    lin = rng.standard_normal((16, 32)).astype(np.float32)
    assert ti.linear_to_flax(lin).shape == (32, 16)


def test_torch_conv_equals_flax_conv_after_conversion():
    """End-to-end: torch Conv2d == flax Conv with the converted kernel."""
    import torch
    import jax.numpy as jnp
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 8, 10, 4)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, padding=1, bias=True)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ty = ty.numpy().transpose(0, 2, 3, 1)

    fconv = nn.Conv(6, (3, 3), padding='SAME')
    variables = {'params': {
        'kernel': jnp.asarray(ti.conv2d_to_flax(
            tconv.weight.detach().numpy())),
        'bias': jnp.asarray(tconv.bias.detach().numpy())}}
    fy = np.asarray(fconv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(fy, ty, atol=1e-4)


def test_state_dict_import_maps_backbone():
    rng = np.random.default_rng(3)
    sd = {
        'backbone_3d.conv_input.0.weight':
            rng.standard_normal((16, 3, 3, 3, 8)).astype(np.float32),
        'backbone_3d.conv_input.1.weight': np.ones(16, np.float32),
        'backbone_3d.conv_input.1.bias': np.zeros(16, np.float32),
        'backbone_3d.conv_input.1.running_mean': np.zeros(16, np.float32),
        'backbone_3d.conv_input.1.running_var': np.ones(16, np.float32),
        'dense_head.conv_cls.weight':
            rng.standard_normal((2, 256, 1, 1)).astype(np.float32),
        'dense_head.conv_cls.bias': np.zeros(2, np.float32),
        'something.unknown.weight': np.zeros(3, np.float32),
    }
    variables, unmapped = ti.import_state_dict(sd, report_unmapped=False)
    p = variables['params']
    assert p['backbone']['lidar']['conv_input']['kernel'].shape == (27, 8, 16)
    assert p['backbone']['lidar']['conv_input'][
        'MaskedBatchNorm_0']['scale'].shape == (16,)
    assert variables['batch_stats']['backbone']['lidar']['conv_input'][
        'MaskedBatchNorm_0']['mean'].shape == (16,)
    assert p['dense_head']['conv_cls']['kernel'].shape == (1, 1, 256, 2)
    assert 'something.unknown.weight' in unmapped


def test_mha_import_matches_torch():
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    import torch
    import jax.numpy as jnp
    import flax.linen as nn

    torch.manual_seed(3)
    e, h, s, b = 32, 4, 5, 3
    att = torch.nn.MultiheadAttention(e, h)
    sd = {f'roi_head.cross_attention_layers.0.att.{k}': v.detach().numpy()
          for k, v in att.state_dict().items()}
    variables, unmapped = ti.import_state_dict(sd, report_unmapped=False,
                                               mha_heads=h)
    assert not unmapped
    mha_params = variables['params']['roi_head']['cross_attn']['mha']
    assert mha_params['query']['kernel'].shape == (e, h, e // h)
    assert mha_params['out']['kernel'].shape == (h, e // h, e)

    rng = np.random.default_rng(4)
    q = rng.standard_normal((s, b, e)).astype(np.float32)
    k = rng.standard_normal((s, b, e)).astype(np.float32)
    v = rng.standard_normal((s, b, e)).astype(np.float32)
    with torch.no_grad():
        want, _ = att(torch.from_numpy(q), torch.from_numpy(k),
                      torch.from_numpy(v))
    flax_mha = nn.MultiHeadDotProductAttention(
        num_heads=h, qkv_features=e, out_features=e)
    got = flax_mha.apply(
        {'params': mha_params},
        jnp.asarray(q.transpose(1, 0, 2)), jnp.asarray(k.transpose(1, 0, 2)),
        jnp.asarray(v.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(got.transpose(1, 0, 2)),
                               want.numpy(), atol=2e-5)


def test_spconv1_kernel_layout_detected():
    """spconv1.x (kz, ky, kx, in, out) kernels must be auto-detected, incl.
    the square in==out blocks where round-1 code silently transposed."""
    rng = np.random.default_rng(3)
    in_c = out_c = 16   # square: shape alone can't disambiguate channels
    w1 = rng.standard_normal((3, 3, 3, in_c, out_c)).astype(np.float32)
    got = ti.spconv_kernel_to_gathered(w1)
    np.testing.assert_array_equal(got, w1.reshape(27, in_c, out_c))
    # (3,1,1) z-compression kernel, spconv1.x layout
    w2 = rng.standard_normal((3, 1, 1, 8, 16)).astype(np.float32)
    np.testing.assert_array_equal(ti.spconv_kernel_to_gathered(w2),
                                  w2.reshape(3, 8, 16))
    # same kernel, spconv2.x layout
    w3 = np.ascontiguousarray(w2.transpose(4, 0, 1, 2, 3))
    np.testing.assert_array_equal(ti.spconv_kernel_to_gathered(w3),
                                  w2.reshape(3, 8, 16))


def test_bev_input_perm_matches_height_compression_layouts():
    """ref flatten (N,C,D,H,W)->C*D (c*D+d) vs ours (B,H,W,D*C) (d*C+c):
    a 1x1 conv imported with the perm must give identical outputs."""
    rng = np.random.default_rng(4)
    c, d, h, w = 64, 2, 4, 5
    dense = rng.standard_normal((1, c, d, h, w)).astype(np.float32)
    ref_in = dense.reshape(1, c * d, h, w)                 # channel = c*D+d
    ours_in = dense.transpose(0, 3, 4, 2, 1).reshape(1, h, w, d * c)
    kernel = rng.standard_normal((c * d, 7)).astype(np.float32)
    ref_out = np.einsum('nchw,cf->nhwf', ref_in, kernel)
    perm = ti.bev_input_perm(c * d, bev_channels=c)
    ours_out = ours_in @ kernel[perm]
    np.testing.assert_allclose(ours_out, ref_out, rtol=1e-5, atol=1e-5)


def test_stride1_deblock_imports_as_transpose_layout():
    """deblocks.0.0 is a stride-1 1x1 ConvTranspose2d (in,out,kh,kw) in the
    reference; importing via the conv2d path would swap in/out channels."""
    kind, path = ti.translate_path('backbone_2d.deblocks.0.0.weight')
    assert kind == 'deconv2d'
    w = np.arange(12, dtype=np.float32).reshape(3, 4, 1, 1)  # (in,out,1,1)
    f = ti.deconv2d_to_flax(w)
    assert f.shape == (1, 1, 3, 4)
    np.testing.assert_array_equal(f[0, 0], w[:, :, 0, 0])
