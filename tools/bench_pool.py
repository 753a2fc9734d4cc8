"""Microbench: decompose one NeighborVoxelSAModule call at eval shapes.

The stage profiler attributes ~0.52 s of the 0.685 s VirConv-T eval frame
to the ROI stack (3 cascade stages x 2 streams x 2 scales of voxel-query
grid pooling).  This bench times the pieces of ONE SA call — row-table
build, window probe (table gathers + distance test), first-nsample
selection (top_k), and the grouped feature body — so optimization effort
lands on the real hot part.

All shapes are static, so synthetic coords/feats time identically to the
real pipeline.  Run on the TPU: python tools/bench_pool.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(np.asarray(out).ravel()[0])   # sync
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

    from virconv_tpu.ops import sparse as sp
    from virconv_tpu.models.roi_heads import voxel_pool as vp

    rng = np.random.default_rng(0)
    vs = (0.05, 0.05, 0.1)
    pcr = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    full = (41, 1600, 1408)   # z, y, x at stride 1

    # (label, stride, capacity, n_queries) — eval: 3 entries x 50 rois,
    # grid 6^3 (lidar) / 4^3 (mm); capacities from the backbone cap ratios.
    cases = [
        ('lidar_x3', 4, 12288, 3 * 50 * 216),
        ('lidar_x4', 8, 7168, 3 * 50 * 216),
        ('mm_x3', 4, 24576, 3 * 50 * 64),
        ('mm_x4', 8, 14336, 3 * 50 * 64),
    ]
    specs = {4: (((2, 2, 2), 0.4, 16), ((4, 4, 4), 0.8, 16)),
             8: (((2, 2, 2), 0.8, 16), ((4, 4, 4), 1.6, 16))}

    for label, stride, cap, m in cases:
        ss = tuple(-(-s // stride) for s in full)
        n_valid = int(cap * 0.9)
        coords = np.stack([
            rng.integers(0, 3, cap),
            rng.integers(0, ss[0], cap),
            rng.integers(0, ss[1], cap),
            rng.integers(0, ss[2], cap)], -1).astype(np.int32)
        mask = np.arange(cap) < n_valid
        feats = rng.standard_normal((cap, 32), np.float32)
        st = sp.SparseTensor(feats=jnp.asarray(feats),
                             coords=jnp.asarray(coords),
                             mask=jnp.asarray(mask),
                             spatial_shape=ss, batch_size=3)
        st = sp.sort_by_key(st)

        # queries: roi grid points clustered like real rois
        centers = np.stack([rng.uniform(5, 65, m), rng.uniform(-30, 30, m),
                            rng.uniform(-2, 0.5, m)], -1)
        qxyz = (centers + rng.normal(0, 1.5, (m, 3))).astype(np.float32)
        qc = np.floor((qxyz - np.array(pcr[:3])) /
                      (np.array(vs) * stride)).astype(np.int32)[:, ::-1]
        qc = np.concatenate([rng.integers(0, 3, (m, 1)).astype(np.int32),
                             qc], -1)
        qmask = np.ones(m, bool)
        qxyz, qc, qmask = map(jnp.asarray, (qxyz, qc, qmask))
        gspecs = specs[stride]

        t_table = timeit(jax.jit(
            lambda s: vp.build_pool_tables(s).rows.sum()
            + vp.build_pool_tables(s).occ.astype(jnp.int32).sum()), st)

        table = jax.jit(vp.build_row_table)(st)
        table.block_until_ready()
        ptables = jax.jit(vp.build_pool_tables)(st)
        jax.block_until_ready(ptables)

        @jax.jit
        def full_query(table, qxyz, qc, qmask):
            res = vp.voxel_query_groups(st, table, qxyz, qc, qmask, gspecs,
                                        vs, stride, pcr)
            return sum(r[0].sum() for r in res)

        t_query = timeit(full_query, table, qxyz, qc, qmask)
        t_bits = timeit(full_query, ptables, qxyz, qc, qmask)

        # probe-only (no top_k): sum of ok counts
        offs_np = vp._window_offsets(gspecs[-1][0], radius=gspecs[-1][1],
                                     voxel_size=vs, stride=stride)
        offs = jnp.asarray(offs_np)
        d, h, w = ss

        @jax.jit
        def probe_only(table, qxyz, qc, qmask):
            neigh = qc[:, None, 1:] + offs[None]
            ok = qmask[:, None]
            ok = ok & (neigh[:, :, 0] >= 0) & (neigh[:, :, 0] < d)
            ok = ok & (neigh[:, :, 1] >= 0) & (neigh[:, :, 1] < h)
            ok = ok & (neigh[:, :, 2] >= 0) & (neigh[:, :, 2] < w)
            flat = ((qc[:, None, 0] * d + neigh[:, :, 0]) * h
                    + neigh[:, :, 1]) * w + neigh[:, :, 2]
            rows = table[jnp.where(ok, flat, 0)]
            ok = ok & (rows >= 0)
            mins = jnp.asarray(pcr[:3], jnp.float32)
            vss = jnp.asarray(vs, jnp.float32) * stride
            centers = (neigh[..., ::-1].astype(jnp.float32) + 0.5) * vss \
                + mins
            dist2 = jnp.sum((centers - qxyz[:, None, :]) ** 2, -1)
            ok = ok & (dist2 < gspecs[-1][1] ** 2)
            return ok.sum() + rows.sum()

        t_probe = timeit(probe_only, table, qxyz, qc, qmask)

        # group body: gather + pos + max at (m, 16, 32)
        idx = jnp.asarray(rng.integers(0, n_valid, (m, 16)), jnp.int32)
        valid = jnp.asarray(rng.random((m, 16)) < 0.5)
        cent = jnp.asarray(rng.standard_normal((m, 16, 3)), jnp.float32)
        w_pos = jnp.asarray(rng.standard_normal((3, 32)), jnp.float32)

        @jax.jit
        def body(feats, idx, valid, cent, qxyz):
            grouped = feats[idx] * valid[..., None]
            pos = (cent - qxyz[:, None, :]) @ w_pos
            x = jax.nn.relu(grouped + pos)
            x = jnp.where(valid[..., None], x, 0.0)
            return x.max(axis=1).sum()

        t_body = timeit(body, st.feats, idx, valid, cent, qxyz)

        k = offs_np.shape[0]
        print(f'{label:9s} cap={cap:6d} m={m:6d} K={k:4d} | '
              f'table {t_table*1e3:6.2f} ms  query {t_query*1e3:6.2f} ms '
              f'BITS {t_bits*1e3:6.2f} ms '
              f'(probe {t_probe*1e3:6.2f}, topk~{(t_query-t_probe)*1e3:6.2f})'
              f'  body(x2) {2*t_body*1e3:6.2f} ms', flush=True)


if __name__ == '__main__':
    main()
