"""Golden parity: reference torch PENet_C2 vs our flax rebuild with
imported weights (VERDICT round-1 missing item #1 / #5).

The reference implementation (``/root/reference/tools/PENet/model.py``) is
pure torch and runs on CPU (its ``.cuda()`` buffer constructions are
monkeypatched to no-ops), so the full forward can be compared numerically on
a small input — both sides hardcode the 352x1216 crop constants into the
geometry features, so a small spatial size is valid.
"""
import pathlib
import sys

import numpy as np
import pytest

REF = pathlib.Path('/root/reference/tools/PENet')


def _make_reference_penet():
    import argparse
    import torch
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, str(REF))
    try:
        import importlib
        import basic as _basic
        importlib.reload(_basic)
        import model as _model
        importlib.reload(_model)
        args = argparse.Namespace(convolutional_layer_encoding='xyz',
                                  network_model='pe', dilation_rate=2)
        torch.manual_seed(0)
        net = _model.PENet_C2(args).eval()
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.pop(0)
    return net


@pytest.mark.skipif(not REF.exists(), reason='reference code not present')
def test_penet_c2_golden_parity_vs_reference(tmp_path):
    import torch
    import jax
    import jax.numpy as jnp
    import functools
    from virconv_tpu.models.depth_completion.penet import PENetC2
    from virconv_tpu.models.depth_completion.torch_import import (
        import_penet_state_dict, load_torch_penet)

    net = _make_reference_penet()
    state = {k: v.detach().cpu().numpy()
             for k, v in net.state_dict().items()}
    imported, unmapped = import_penet_state_dict(state)
    leftovers = [k for k in unmapped
                 if not k.endswith('num_batches_tracked')]
    assert leftovers == [], f'unmapped reference keys: {leftovers[:10]}'

    rng = np.random.default_rng(0)
    h, w = 64, 96
    rgb = rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32)
    d = rng.uniform(1, 80, (1, h, w, 1)).astype(np.float32)
    d = d * (rng.uniform(size=d.shape) < 0.06)      # sparse depth
    position = rng.uniform(-1, 1, (1, h, w, 2)).astype(np.float32)
    k_mat = np.array([[[721.5, 0., 609.6], [0., 721.5, 172.9],
                       [0., 0., 1.]]], np.float32)

    with torch.no_grad():
        ty = net({'rgb': torch.from_numpy(rgb.transpose(0, 3, 1, 2)),
                  'd': torch.from_numpy(d.transpose(0, 3, 1, 2)),
                  'position': torch.from_numpy(
                      position.transpose(0, 3, 1, 2)),
                  'K': torch.from_numpy(k_mat)})
    ty = ty.numpy().transpose(0, 2, 3, 1)

    model = PENetC2()
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(rgb), jnp.asarray(d),
        jnp.asarray(position), jnp.asarray(k_mat))
    # shape/coverage check through the strict loader path
    ckpt = tmp_path / 'penet.pth.tar'
    torch.save({'model': net.state_dict()}, str(ckpt))
    loaded = load_torch_penet(str(ckpt), variables)

    fy = np.asarray(model.apply(
        {'params': loaded['params'], 'batch_stats': loaded['batch_stats']},
        jnp.asarray(rgb), jnp.asarray(d), jnp.asarray(position),
        jnp.asarray(k_mat), train=False))
    assert fy.shape == ty.shape
    np.testing.assert_allclose(fy, ty, atol=2e-3, rtol=1e-3)
