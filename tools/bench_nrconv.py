"""Microbench: decompose the MM NRConv backbone cost at eval shapes.

Stage profiling attributes ~0.157 s of the 0.454 s eval frame to the MM
stream (4 NRConvBlocks).  Per scale this times: the subm-3D band plan, the
marginal band conv, the strided down plan+conv, the image projection +
key sort, and the 2-D plan + convs — so optimization lands where the time
is.  Run on the TPU: python tools/bench_nrconv.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def make_st(rng, sp, cap, c, spatial, batch=3, frac=0.95):
    import jax.numpy as jnp
    n = int(cap * frac)
    # cluster coords like a street scene: ground band + blobs
    d, h, w = spatial
    zs = np.clip((rng.standard_normal(cap) * d / 8 + d / 3), 0,
                 d - 1).astype(np.int32)
    ys = rng.integers(0, h, cap).astype(np.int32)
    xs = rng.integers(0, w, cap).astype(np.int32)
    bs = rng.integers(0, batch, cap).astype(np.int32)
    coords = np.stack([bs, zs, ys, xs], -1)
    mask = np.arange(cap) < n
    feats = rng.standard_normal((cap, c)).astype(np.float32)
    st = sp.SparseTensor(feats=jnp.asarray(feats),
                         coords=jnp.asarray(coords),
                         mask=jnp.asarray(mask), spatial_shape=spatial,
                         batch_size=batch)
    st = sp.sort_by_key(st)
    # compact: band plans require keys ascending with the invalid tail
    return sp.compact_sorted(sp.dedup_sorted(st), cap)


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    from virconv_tpu.ops import sparse as sp

    rng = np.random.default_rng(0)
    full = (41, 1600, 1408)
    # (label, stride-in, cap, channels) for the subm convs of each block
    cases = [
        ('blk1 s1', 1, 40960, 16),
        ('blk2 s2', 2, 40960, 32),
        ('blk3 s4', 4, 24576, 64),
        ('blk4 s8', 8, 14336, 64),
    ]
    for label, stride, cap, c in cases:
        ss = tuple(-(-s // stride) for s in full)
        st = make_st(rng, sp, cap, c, ss)
        w3 = jnp.asarray(rng.standard_normal((27, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((9, c, c)) * 0.05, jnp.float32)

        @jax.jit
        def plan_only(st):
            plan, keys = sp.subm_band_plan(st, (3, 3, 3))
            return keys.sum() + plan.blk.sum()

        @jax.jit
        def plan_conv1(st, w):
            ctx = sp.subm_conv_ctx(st, 3, use_band=True)
            return ctx.conv(st.feats, w).sum()

        @jax.jit
        def plan_conv2(st, w):
            ctx = sp.subm_conv_ctx(st, 3, use_band=True)
            f = ctx.conv(st.feats, w)
            return ctx.conv(f, w).sum()

        try:
            t_plan = timeit(plan_only, st)
        except AttributeError:
            t_plan = float('nan')
        t_c1 = timeit(plan_conv1, st, w3)
        t_c2 = timeit(plan_conv2, st, w3)

        # projection + 2D sort + 2D convs at this scale
        uv_u = rng.integers(0, 1400 // stride, cap).astype(np.int32)
        uv_v = rng.integers(0, 600 // stride, cap).astype(np.int32)
        coords2d = np.stack([np.asarray(st.coords[:, 0]), uv_u, uv_v], -1)
        coords2d = np.where(np.asarray(st.mask)[:, None], coords2d, -1)
        st2d = sp.SparseTensor(feats=st.feats,
                               coords=jnp.asarray(coords2d.astype(np.int32)),
                               mask=st.mask, spatial_shape=(1400, 600),
                               batch_size=3)

        @jax.jit
        def twod(st2d, w):
            sts, perm = sp.sort_by_key_with_perm(st2d)
            ctx = sp.subm_conv_ctx(sts, 3, use_band=True,
                                   first_wins_sources=True)
            f = ctx.conv(sts.feats, w)
            f = ctx.conv(f, w)
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(perm.shape[0], dtype=perm.dtype))
            return f[inv].sum()

        t_2d = timeit(twod, st2d, w2)

        print(f'{label:8s} cap={cap:6d} C={c:3d} | '
              f'plan {t_plan*1e3:6.2f}  plan+1conv {t_c1*1e3:6.2f}  '
              f'plan+2conv {t_c2*1e3:6.2f}  (marginal conv '
              f'{(t_c2-t_c1)*1e3:6.2f})  2d(sort+2conv) {t_2d*1e3:6.2f} ms',
              flush=True)


if __name__ == '__main__':
    main()
