"""One-hot-matmul Pallas gather-conv vs the XLA gathered_conv oracle
(interpret mode on CPU; the TPU path shares the same pallas lowering)."""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp

from virconv_tpu.ops import sparse as sp
from virconv_tpu.ops.pallas.onehot_conv import onehot_gather_conv


def test_matches_gathered_conv():
    rng = np.random.default_rng(0)
    n, c, cout, k = 512, 16, 24, 27
    feats = rng.standard_normal((n, c)).astype(np.float32)
    # near-diagonal neighbor map with ~20% missing
    base = np.arange(n)[:, None] + rng.integers(-60, 60, (n, k))
    nmap = np.where(rng.random((n, k)) < 0.8,
                    np.clip(base, 0, n - 1), -1).astype(np.int32)
    w = (rng.standard_normal((k, c, cout)) * 0.1).astype(np.float32)
    mask = np.ones(n, bool)

    want = np.asarray(sp.gathered_conv(
        jnp.asarray(feats), jnp.asarray(nmap), jnp.asarray(w),
        jnp.asarray(mask)))
    got, misses = onehot_gather_conv(
        jnp.asarray(feats), jnp.asarray(nmap), jnp.asarray(w),
        tile=128, block=256, bf16=False, interpret=True)
    assert int(np.asarray(misses).sum()) == 0
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_miss_counting():
    rng = np.random.default_rng(1)
    n, c, cout, k = 512, 8, 8, 3
    feats = rng.standard_normal((n, c)).astype(np.float32)
    nmap = np.full((n, k), -1, np.int32)
    nmap[:, 0] = np.arange(n)
    # same tile, same offset column: rows 0 and 511 spread wider than the
    # two-block window (256) -> the far one must be dropped and counted
    nmap[0, 1] = 0
    nmap[1, 1] = n - 1
    w = rng.standard_normal((k, c, cout)).astype(np.float32)
    got, misses = onehot_gather_conv(
        jnp.asarray(feats), jnp.asarray(nmap), jnp.asarray(w),
        tile=128, block=128, bf16=False, interpret=True)
    assert int(np.asarray(misses)[0]) == 1
