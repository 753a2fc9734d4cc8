"""Prototype cost check for the packed-occupancy pooling probe.

Times the candidate primitives at lidar_x3 shapes (m=32400):
  a. current probe's raw (m, 281) table gather alone
  b. (m, 281) coordinate/dist math alone (no gather)
  c. (m, 37) word gather (the packed-occupancy replacement)
  d. popcount first-16 extraction from (m, 37) 9-bit lanes
  e. lax.top_k(16) over (m, 281) for comparison
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


def main():
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '.jax_cache')
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    rng = np.random.default_rng(0)
    m, k, lanes = 32400, 281, 37
    size = 3 * 11 * 400 * 352          # stride-4 dense cell count
    table = jnp.asarray(rng.integers(-1, 20000, size + 1), jnp.int32)
    words = jnp.asarray(
        rng.integers(0, 2**32, size // 16 + 4, dtype=np.uint32))
    flat = jnp.asarray(rng.integers(0, size, (m, k)), jnp.int32)
    widx = jnp.asarray(rng.integers(0, size // 16, (m, lanes)), jnp.int32)
    qxyz = jnp.asarray(rng.uniform(0, 70, (m, 3)), jnp.float32)
    offs = jnp.asarray(rng.integers(-4, 5, (k, 3)), jnp.int32)
    lane_words = jnp.asarray(
        rng.integers(0, 512, (m, lanes), dtype=np.int32))

    t_gather = timeit(jax.jit(lambda t, f: t[f].sum()), table, flat)

    @jax.jit
    def dist_math(qxyz, offs):
        centers = (offs[None].astype(jnp.float32) + 0.5) * 0.2
        d2 = jnp.sum((centers - qxyz[:, None, :]) ** 2, -1)
        return (d2 < 0.64).sum()

    t_math = timeit(dist_math, qxyz, offs)

    t_words = timeit(jax.jit(lambda wd, i: wd[i].sum()), words, widx)

    @jax.jit
    def extract16(lw):
        pc = jax.lax.population_count(lw)
        cum = jnp.cumsum(pc, axis=1) - pc              # exclusive
        total = cum[:, -1] + pc[:, -1]
        acc = jnp.zeros((), jnp.int32)
        for s in range(16):
            lane = jnp.sum((cum + pc <= s).astype(jnp.int32), 1)  # (m,)
            lane = jnp.minimum(lane, lanes - 1)
            w = jnp.take_along_axis(lw, lane[:, None], 1)[:, 0]
            tgt = s - jnp.take_along_axis(cum, lane[:, None], 1)[:, 0]
            bits = (w[:, None] >> jnp.arange(9)[None]) & 1
            bcum = jnp.cumsum(bits, 1) - bits
            j = jnp.argmax((bits == 1) & (bcum == tgt[:, None]), 1)
            acc = acc + jnp.sum(jnp.where(s < total, j, 0))
        return acc

    t_ext = timeit(extract16, lane_words)

    key = jnp.asarray(rng.integers(-300, 300, (m, k)), jnp.int32)
    t_topk = timeit(jax.jit(lambda kk: jax.lax.top_k(kk, 16)[0].sum()), key)

    print(f'(m={m}) cell-gather(m,281) {t_gather*1e3:7.2f} ms')
    print(f'(m={m}) dist-math(m,281)   {t_math*1e3:7.2f} ms')
    print(f'(m={m}) word-gather(m,37)  {t_words*1e3:7.2f} ms')
    print(f'(m={m}) extract16(m,37)    {t_ext*1e3:7.2f} ms')
    print(f'(m={m}) top_k16(m,281)     {t_topk*1e3:7.2f} ms')


if __name__ == '__main__':
    main()
