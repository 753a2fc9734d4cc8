"""Pallas fused windowed gather-conv for submanifold sparse convolution.

The XLA formulation (27 HBM row-gathers + 27 skinny matmuls per layer)
measures ~31 ms at N=120k C=64 on v5e — gather row-rate-bound and matmul
bandwidth-bound (docs/DESIGN.md §3). This kernel exploits the sorted-key
invariant: every neighbor of a row tile lives within a bounded row window,
so each tile

  1. DMAs one contiguous (T*K, C) input window HBM -> VMEM,
  2. gathers all K neighbor rows per output row in ONE mosaic
     dynamic_gather (take_along_axis semantics require indices.shape ==
     window.shape, hence the window span is chosen == T*K; indices are
     pre-arranged k-major per tile on the host so no in-kernel reshapes),
  3. accumulates K static-sliced (T, C) x (C, COUT) matmuls on the MXU —
     all operands in VMEM, no HBM round trips.

Out-of-window neighbors (pathologically dense scenes) are treated as
missing; the second return value counts them per tile so callers can verify
~0.

STATUS: blocked by the current mosaic toolchain — `tpu.dynamic_gather`
reports "Not implemented: Multiple source vregs along gather dimension",
i.e. the VMEM gather source must fit one vreg (8 sublanes) along the
gathered axis, far below the T*K window this kernel needs. Superseded by
ops/pallas/onehot_conv.py, which expresses the VMEM gather as a one-hot
MXU matmul instead (compiles + exact, measured at parity with the XLA
path — docs/DESIGN.md §10); the production path remains
ops.sparse.gathered_conv. Kept for when the toolchain gains multi-vreg
gathers, which would beat both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(nmap_ref, feats_hbm, w_ref, out_ref, scratch, sem, *,
                 tile, window, n_rows, c_in, c_out, k):
    i = pl.program_id(0)
    span = tile * k                          # == tile + 2 * window
    base = jnp.clip(i * tile - window, 0, n_rows - span)
    dma = pltpu.make_async_copy(
        feats_hbm.at[pl.ds(base, span)], scratch, sem)
    dma.start()
    dma.wait()

    nmap = nmap_ref[0]                                  # (span, 1), k-major
    local = nmap - base
    in_window = (nmap >= 0) & (local >= 0) & (local < span)
    safe = jnp.clip(local, 0, span - 1)

    window_vals = scratch[:]                            # (span, C)
    idx2d = jnp.broadcast_to(safe, (span, c_in))
    gathered = jnp.take_along_axis(window_vals, idx2d, axis=0)
    gathered = gathered * in_window.astype(gathered.dtype)

    acc = jnp.zeros((tile, c_out), jnp.float32)
    for kk in range(k):
        g = gathered[kk * tile:(kk + 1) * tile]         # (T, C) static slice
        acc = acc + jnp.dot(g, w_ref[kk],
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=('tile',))
def fused_gather_conv(feats, nmap, weights, tile: int = 512):
    """feats (N, C) f32; nmap (N, K) int32 (-1 = missing, near-diagonal);
    weights (K, C, COUT). Returns ((N, COUT) f32, misses (tiles,) int32).

    The window half-width is tile*(K-1)/2 (the VMEM window span equals the
    T*K gather size mosaic requires); with tile=512 and K=27 neighbors up
    to ~6.6k rows away are covered.
    """
    n, c_in = feats.shape
    k = nmap.shape[1]
    c_out = weights.shape[2]
    assert n % tile == 0, 'pad N to a multiple of the tile size'
    assert (tile * (k - 1)) % 2 == 0
    window = tile * (k - 1) // 2
    n_tiles = n // tile
    grid = (n_tiles,)
    # k-major per-tile index layout: tile i, slot k*T + t -> nmap[i*T + t, k]
    nmap_km = nmap.reshape(n_tiles, tile, k).transpose(0, 2, 1) \
        .reshape(n_tiles, tile * k, 1)
    kernel = functools.partial(_conv_kernel, tile=tile, window=window,
                               n_rows=n, c_in=c_in, c_out=c_out, k=k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile * k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile * k, c_in), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(nmap_km, feats, weights)

    # out-of-window diagnostics (cheap XLA side computation)
    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    span = tile * k
    base = jnp.clip(tiles * tile - window, 0, n - span)
    nm = nmap.reshape(n_tiles, tile, k)
    local = nm - base[:, None, None]
    missed = (nm >= 0) & ((local < 0) | (local >= span))
    return out, missed.sum(axis=(1, 2)).astype(jnp.int32)
