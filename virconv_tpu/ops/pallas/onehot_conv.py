"""Pallas fused gather-conv via one-hot MXU matmuls.

The XLA sparse-conv formulation (27 HBM row-gathers + 27 skinny matmuls)
is row-rate bound at ~100M rows/s (docs/DESIGN.md S3). Two mosaic
constraints shape this kernel:

  * `dynamic_gather` cannot index past one vreg of sublanes -> the VMEM
    row-gather is expressed as `onehot(local_idx) @ window` on the MXU
    (the one-hot is built in VMEM and never touches HBM);
  * manual `make_async_copy` DMAs crash this environment's remote mosaic
    compile helper -> all loads are BlockSpec-driven. The per-(tile,
    offset) row window is TWO adjacent feats blocks selected by a
    scalar-prefetched block-index table (rows are sorted by voxel key, so
    a tile's offset-k neighbors cluster in a narrow monotone band —
    measured p100 spread 1301 rows on a surface-like 120k-voxel scene;
    two 1024-row blocks cover spreads up to 1024 with misses counted).

Grid is (tiles, K) with K innermost; the output block is revisited across
k and accumulated in place, and pallas double-buffers the block fetches
across steps. Matmuls run in bf16 with f32 accumulation by default (the
one-hot is exact in bf16; feature rounding is standard inference
precision — `bf16=False` selects f32 at ~4x MXU cost).

Reference behavior target: spconv SubMConv3d
(``/root/reference/pcdet/models/backbones_3d/spconv_backbone.py``) — same
neighbor contract as ops.sparse.gathered_conv, whose oracle tests cover
this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(blk_ref, nmap_ref, *refs, tile, block, k, c_out, bf16):
    # refs = fa_0, fb_0, fa_1, fb_1, ..., w_ref (k*C, C'), out_ref
    w_ref = refs[2 * k]
    out_ref = refs[2 * k + 1]
    i = pl.program_id(0)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, 2 * block), 1)
    gathers = []
    for kk in range(k):
        # one INDEPENDENT matmul per offset (a serial acc chain of 2K+K
        # dependent matmuls measured latency-bound at ~44 ms/layer)
        base = blk_ref[i, kk] * block
        idx = nmap_ref[0, kk, :]                             # (T,)
        local = idx - base
        valid = (idx >= 0) & (local >= 0) & (local < 2 * block)
        local = jnp.where(valid, local, 2 * block)
        win = jnp.concatenate([refs[2 * kk][:], refs[2 * kk + 1][:]],
                              axis=0).astype(dt)             # (2B, C)
        oh = (iota == local[:, None]).astype(dt)
        gathers.append(jnp.dot(oh, win,
                               preferred_element_type=jnp.float32))
    g = jnp.concatenate(gathers, axis=1)                     # (T, K*C)
    out_ref[:] = jnp.dot(g.astype(dt), w_ref[:].astype(dt),
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=('tile', 'block', 'bf16', 'interpret'))
def onehot_gather_conv(feats, nmap, weights, tile: int = 256,
                       block: int = 2048, bf16: bool = True,
                       interpret: bool = False):
    """Fused submanifold conv: feats (N, C), nmap (N, K) int32 (-1 missing,
    row indices into feats), weights (K, C, C').

    Returns ((N, C') f32, misses (tiles,) int32) — misses counts neighbors
    outside their tile's two-block window. Floor alignment guarantees
    coverage of per-(tile, offset) neighbor spreads up to block + 1 rows
    (measured p100 spread 1301 on surface-like scenes -> block 2048 gives
    zero misses).
    """
    assert block % tile == 0
    n0, c_in = feats.shape
    k = nmap.shape[1]
    c_out = weights.shape[2]
    # pad rows so both the tile grid and the block grid divide evenly, and
    # so block index +1 always exists
    pad = (-n0) % block + block
    feats = jnp.pad(feats, ((0, pad), (0, 0)))
    nmap = jnp.pad(nmap, ((0, pad), (0, 0)), constant_values=-1)
    n = n0 + pad
    n_tiles = n // tile
    n_blocks = n // block

    big = jnp.int32(2 ** 30)
    nm = nmap.reshape(n_tiles, tile, k)
    lo = jnp.where(nm >= 0, nm, big).min(axis=1)             # (tiles, K)
    # kernel-side layout (tiles, K, tile): the (K, tile) slab per tile is
    # 27 KB and satisfies the (second-minor == dim, minor % 128) tiling rule
    nm_t = nm.transpose(0, 2, 1)
    lo = jnp.where(lo == big, 0, lo)
    blk = jnp.clip(lo // block, 0, n_blocks - 2)             # (tiles, K)

    kernel = functools.partial(_kernel, tile=tile, block=block, k=k,
                               c_out=c_out, bf16=bf16)

    def fa_spec(kk):
        return pl.BlockSpec((block, c_in),
                            lambda i, blk_ref, kk=kk: (blk_ref[i, kk], 0))

    def fb_spec(kk):
        return pl.BlockSpec(
            (block, c_in), lambda i, blk_ref, kk=kk: (blk_ref[i, kk] + 1, 0))

    window_specs = []
    for kk in range(k):
        window_specs += [fa_spec(kk), fb_spec(kk)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                  # blk table lives in SMEM
        grid=(n_tiles,),                        # ONE step per tile: per-step
        in_specs=[                              # overheads dominated at
            pl.BlockSpec((1, k, tile),          # (tiles x K) granularity
                         lambda i, blk_ref: (i, 0, 0)),
            *window_specs,
            pl.BlockSpec((k * c_in, c_out), lambda i, blk_ref: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i, blk_ref: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c_out), jnp.float32),
        interpret=interpret,
    )(blk, nm_t, *([feats] * (2 * k)), weights.reshape(k * c_in, c_out))

    local = nm - (blk * block)[:, None, :]
    missed = (nm >= 0) & ((local < 0) | (local >= 2 * block))
    return out[:n0], missed.sum(axis=(1, 2)).astype(jnp.int32)
