"""Pallas fused gather-conv via one-hot MXU matmuls.

The XLA sparse-conv formulation (27 HBM row-gathers + 27 skinny matmuls)
is row-rate bound at ~100M rows/s (docs/DESIGN.md S3), and mosaic's
`dynamic_gather` cannot index beyond one vreg of sublanes, which blocked
the windowed VMEM-gather kernel (ops/pallas/gather_conv.py). This kernel
expresses the VMEM gather as a matmul instead — a trick the MXU makes
cheap and mosaic fully supports:

  for each kernel offset k:
    1. DMA a per-(tile, offset) row window (S, C) HBM -> VMEM; the window
       start comes from a precomputed (tiles, K) table (rows are sorted by
       voxel key, so each tile's offset-k neighbors cluster in a narrow,
       monotone row band — S of 1-2k covers real scenes; misses are
       counted and treated as missing neighbors).
    2. gather = onehot(local_idx) @ window   -- (T, S) x (S, C) on the MXU,
       built in VMEM, never touching HBM.
    3. acc += gather @ W_k                   -- (T, C) x (C, C').

Matmuls run in bf16 with f32 accumulation (the one-hot is exact in bf16;
the feature rounding is standard inference precision — a `precision`
knob selects f32 for exactness at ~4x MXU cost).

Reference behavior target: spconv SubMConv3d
(``/root/reference/pcdet/models/backbones_3d/spconv_backbone.py``) — same
neighbor semantics as ops.sparse.gathered_conv, whose oracle tests cover
this kernel through the common `nmap` contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(lo_ref, nmap_ref, feats_hbm, w_ref, out_ref, win, sem, *,
            tile, window, k, c_in, c_out, bf16):
    i = pl.program_id(0)
    acc = jnp.zeros((tile, c_out), jnp.float32)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    for kk in range(k):
        lo = lo_ref[i, kk]
        cp = pltpu.make_async_copy(feats_hbm.at[pl.ds(lo, window)], win, sem)
        cp.start()
        cp.wait()
        idx = nmap_ref[0, :, kk]                       # (T,)
        local = idx - lo
        valid = (idx >= 0) & (local >= 0) & (local < window)
        local = jnp.where(valid, local, 0)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
              == local[:, None]) & valid[:, None]
        g = jnp.dot(oh.astype(dt), win[:].astype(dt),
                    preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(g.astype(dt), w_ref[kk].astype(dt),
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit,
                   static_argnames=('tile', 'window', 'bf16', 'interpret'))
def onehot_gather_conv(feats, nmap, weights, tile: int = 256,
                       window: int = 2048, bf16: bool = True,
                       interpret: bool = False):
    """Fused submanifold conv: feats (N, C), nmap (N, K) int32 (-1 missing,
    row indices into feats), weights (K, C, C').

    Returns ((N, C') f32, misses (tiles,) int32) — misses counts neighbors
    outside their tile window (treated as missing; ~0 for real scenes with
    window >= 2048).
    """
    n0, c_in = feats.shape
    k = nmap.shape[1]
    c_out = weights.shape[2]
    pad = (-n0) % tile
    feats = jnp.pad(feats, ((0, pad), (0, 0)))
    nmap = jnp.pad(nmap, ((0, pad), (0, 0)), constant_values=-1)
    n = n0 + pad
    window = min(window, n)
    n_tiles = n // tile

    big = jnp.int32(2 ** 30)
    nm = nmap.reshape(n_tiles, tile, k)
    lo = jnp.where(nm >= 0, nm, big).min(axis=1)            # (tiles, K)
    lo = jnp.clip(jnp.where(lo == big, 0, lo), 0, n - window)

    kernel = functools.partial(_kernel, tile=tile, window=window, k=k,
                               c_in=c_in, c_out=c_out, bf16=bf16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,            # lo (tiles, K) lives whole in SMEM
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile, k), lambda i, lo_ref: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i, lo_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((window, c_in), feats.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c_out), jnp.float32),
        interpret=interpret,
    )(lo, nm, feats, weights)

    local = nm - lo[:, None, :]
    missed = (nm >= 0) & ((local < 0) | (local >= window))
    return out[:n0], missed.sum(axis=(1, 2)).astype(jnp.int32)
