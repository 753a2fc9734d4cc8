"""PENet depth completion: shape/finiteness smoke test + converter tests."""
import numpy as np
import jax
import jax.numpy as jnp

from virconv_tpu.models.depth_completion.depth2points import (
    depth_to_points_rgb, fuse_virtual_and_lidar, la_sampling2)
from virconv_tpu.utils.calibration import identity_calib


def test_penet_forward_small():
    import functools
    from virconv_tpu.models.depth_completion.penet import PENetC2
    model = PENetC2(iters=2)
    h, w = 64, 96   # multiple of 32 (5 downsamples)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)), jnp.float32)
    d = jnp.asarray((rng.uniform(0, 1, (1, h, w, 1)) > 0.9)
                    * rng.uniform(2, 50, (1, h, w, 1)), jnp.float32)
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    pos = np.stack([2 * us / (w - 1) - 1, 2 * vs / (h - 1) - 1],
                   -1).astype(np.float32)
    k = jnp.asarray(np.array([[[50., 0, w / 2], [0, 50., h / 2],
                               [0, 0, 1]]], np.float32))
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(0), rgb, d, jnp.asarray(pos[None]), k)
    out = jax.jit(functools.partial(model.apply, train=False))(
        variables, rgb, d, jnp.asarray(pos[None]), k)
    assert out.shape == (1, h, w, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_depth_to_points_round_trip():
    calib = identity_calib(fu=100.0, fv=100.0, cu=60.0, cv=30.0)
    depth = np.zeros((64, 120), np.float32)
    depth[30, 60] = 20.0
    rgb = np.full((64, 120, 3), 90.0, np.float32)
    pts = depth_to_points_rgb(depth, rgb, calib)
    assert pts.shape == (1, 8)
    # back-project: the point reprojects to the same pixel
    uv, d = calib.lidar_to_img(pts[:, :3])
    np.testing.assert_allclose(uv[0], [60, 30], atol=1e-3)
    np.testing.assert_allclose(d[0], 20.0, atol=1e-3)
    np.testing.assert_allclose(pts[0, 4:7], 30.0, atol=1e-5)
    assert pts[0, 7] == 1.0


def test_fuse_and_thin():
    rng = np.random.default_rng(1)
    n = 5000
    virt = np.zeros((n, 8), np.float32)
    virt[:, 0] = rng.uniform(5, 60, n)
    virt[:, 1] = rng.uniform(-20, 20, n)
    virt[:, 2] = rng.uniform(-2, 2, n)
    virt[:, 7] = 1
    lidar = rng.uniform(0, 1, (100, 4)).astype(np.float32)
    lidar[:, 0] += 10
    fused = fuse_virtual_and_lidar(virt, lidar)
    assert fused.dtype == np.float16
    ind = fused[:, 7].astype(np.float32)
    assert (ind[:100] == 2).all()
    assert (ind[100:] == 1).all()
    # z filter applied and thinning reduced the virtual count
    assert (fused[100:, 2].astype(np.float32) < 1.01).all()  # f16 rounding
    assert len(fused) - 100 < n
    # lidar intensity x10
    np.testing.assert_allclose(fused[:100, 3].astype(np.float32),
                               lidar[:, 3] * 10, rtol=1e-2)
