"""Band-window sparse convolution: the production Pallas conv kernel.

Round-1 analysis (docs/DESIGN.md S3/S10) showed the sparse-conv floor is
XLA's random row-gather rate (~100M rows/s): 27 gathers/site for the conv
PLUS 27 lookup-gathers/site to build each neighbor map. This kernel removes
both by exploiting a locality-aware global sort order:

  * Rows are sorted by the (b, y, x, z) voxel key (z fastest). All 27
    neighbors of a key k then live at k + dy*(gx*gz) + dx*gz + dz — for each
    dy "group" a contiguous key band near k. A tile of T consecutive sorted
    rows therefore finds ALL its group-g neighbors inside one narrow window
    of consecutive rows (~tile size + a 3-y-slab density margin).
  * Each (tile, group) window is TWO adjacent feats/keys blocks picked by a
    scalar-prefetched block table (BlockSpec-driven loads only — manual DMA
    crashes this environment's mosaic compile helper, DESIGN.md S10).
  * The VMEM row-gather is a one-hot MXU matmul where the one-hot is built
    by *key equality* inside the kernel: eq[t, w] = (win_key[w] - qkey[t]
    == delta_k) & inbounds_bit_k. No neighbor map is ever materialized.
  * Per-offset gathered blocks concatenate into one fused (T, K*C) @
    (K*C, C') conv matmul; eval-mode BN (affine) + ReLU fuse in for free.

Window coverage is data-dependent; ``band_plan`` computes per-(tile, group)
window starts by searchsorted on the key array and a global ``span_ok``
flag. Callers wrap ``lax.cond(span_ok, band_conv, gathered_conv)`` so the
result is exact for any input (the fallback is the XLA oracle path).

Reference behavior target: spconv SubMConv3d / SparseConv3d gather-GEMM
(``/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:86-131``),
same contract as ``ops.sparse.gathered_conv``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID_KEY = jnp.iinfo(jnp.int32).max
ROW_VALID_BIT = 30           # bit of valid_bits marking "output row valid"


class BandPlan(NamedTuple):
    """Per-scale conv plan, reusable by every layer sharing a key set."""
    base_keys: jnp.ndarray     # (n_tiles, T) int32, INVALID on padding
    valid_bits: jnp.ndarray    # (n_tiles, T) int32 (bit k: tap k in bounds;
    #                            bit ROW_VALID_BIT: row valid)
    blk: jnp.ndarray           # (n_tiles, G) int32 window start block
    span_ok: jnp.ndarray       # () bool: every window fits 2 blocks
    fits: jnp.ndarray          # (n_tiles,) bool: this tile's windows fit —
    #                            rows of non-fitting tiles need the gather
    #                            patch (sparse.py band ctxs)
    keys_sorted: jnp.ndarray   # () bool: input keys ascending with the
    #                            INVALID padding as a tail. When False the
    #                            kernel AND the gather patch are both wrong
    #                            (lookup assumes sorted keys) — callers must
    #                            take the full nmap fallback.
    deltas: Tuple[int, ...]    # static per-tap key deltas
    group_of: Tuple[int, ...]  # static tap -> group id
    n_out: int                 # unpadded output row count
    tile: int
    block: int


def band_plan(keys: jnp.ndarray, base_keys: jnp.ndarray,
              valid_bits: jnp.ndarray, deltas: Sequence[int],
              group_of: Sequence[int], tile: int = 128,
              block: int = 256) -> BandPlan:
    """Build the window table for one (key set, kernel geometry) pair.

    Args:
        keys: (N_in,) int32 sorted ascending (INVALID_KEY padding rows).
        base_keys: (N_out,) int32 query-origin key per output row (own key
            for submanifold; key of ``coord*stride - pad`` for strided).
        valid_bits: (N_out,) int32 packed tap-validity + row-valid bit.
        deltas / group_of: static per-tap key offsets and group ids.
    """
    deltas = tuple(int(d) for d in deltas)
    group_of = tuple(int(g) for g in group_of)
    n_groups = max(group_of) + 1
    n_out = base_keys.shape[0]
    pad_out = (-n_out) % tile
    bq = jnp.pad(base_keys, (0, pad_out), constant_values=0)
    vb = jnp.pad(valid_bits, (0, pad_out))
    n_tiles = bq.shape[0] // tile
    bq_t = bq.reshape(n_tiles, tile)
    vb_t = vb.reshape(n_tiles, tile)

    row_ok = (vb_t >> ROW_VALID_BIT) & 1
    big = jnp.int32(2 ** 30)
    bmin = jnp.where(row_ok == 1, bq_t, big).min(axis=1)        # (n_tiles,)
    bmax = jnp.where(row_ok == 1, bq_t, -big).max(axis=1)
    any_valid = row_ok.any(axis=1)
    bmin = jnp.where(any_valid, bmin, 0)
    bmax = jnp.where(any_valid, bmax, 0)

    n_in = keys.shape[0]
    n_blocks = -(-n_in // block) + 1     # padded size in band_conv
    lo_list, hi_list = [], []
    for g in range(n_groups):
        dmin = min(d for d, gg in zip(deltas, group_of) if gg == g)
        dmax = max(d for d, gg in zip(deltas, group_of) if gg == g)
        lo_list.append(bmin + dmin)
        hi_list.append(bmax + dmax)
    lo_q = jnp.stack(lo_list, 1)                                # (n_tiles, G)
    hi_q = jnp.stack(hi_list, 1)
    # The window block only needs key positions at BLOCK granularity, so
    # search block-boundary samples instead of all keys:
    #   lo_pos >= j*block  <=>  keys[j*block - 1] < lo
    #   blk = lo_pos // block = sum_j [keys[j*block - 1] < lo]
    # (n_tiles*G, n_blocks) compares instead of (n_tiles*G, N_in) — the
    # full compare-count was 2 x ~40M bool ops per plan at 40k rows.
    jb = jnp.arange(1, n_blocks - 1, dtype=jnp.int32) * block - 1
    sb = keys[jnp.minimum(jb, n_in - 1)]     # INVALID_KEY padding -> false
    blk = (sb[None, :] < lo_q.reshape(-1, 1)).sum(
        axis=1, dtype=jnp.int32).reshape(n_tiles, n_groups)
    blk = jnp.clip(blk, 0, n_blocks - 2)
    # fits: hi_pos <= (blk+2)*block  <=>  the first key PAST the 2-block
    # window exceeds hi (keys sorted, unique): keys[(blk+2)*block] > hi,
    # or the window end runs past the key array.
    e = (blk + 2) * block
    fits_g = (e >= n_in) | (keys[jnp.minimum(e, n_in - 1)] > hi_q)
    fits = jnp.where(any_valid[:, None], fits_g, True).all(axis=1)
    # Both the sampled search above and the kernel's window indexing
    # require keys ascending with the INVALID padding as a tail (compact
    # tensors). If a caller hands interleaved-invalid keys (e.g. a raw
    # dedup_sorted output), fail every tile so the exact gather fallback
    # runs instead of silently missing neighbors.
    keys_sorted = (keys[1:] >= keys[:-1]).all()
    fits = fits & keys_sorted
    span_ok = fits.all()
    return BandPlan(bq_t, vb_t, blk, span_ok, fits, keys_sorted, deltas,
                    group_of, n_out, tile, block)


def _kernel(blk_ref, qk_ref, vb_ref, *refs, tile, block, deltas, group_of,
            n_groups, bf16, relu, affine):
    k = len(deltas)
    kref = refs[:2 * n_groups]                 # ka_g, kb_g per group
    fref = refs[2 * n_groups:4 * n_groups]     # fa_g, fb_g per group
    w_ref = refs[4 * n_groups]
    nxt = 4 * n_groups + 1
    if affine:
        scale_ref, bias_ref = refs[nxt], refs[nxt + 1]
        nxt += 2
    out_ref = refs[nxt]

    dt = jnp.bfloat16 if bf16 else jnp.float32
    # All operands stay >=2-D: mosaic supports neither 1-D concatenate nor
    # 1-D->2-D reshape, so per-tile keys/bits load as (T, 1) columns and
    # window keys as (1, B) rows; broadcasting builds the (T, B) one-hot.
    qk = qk_ref[0]                                           # (T, 1)
    vb = vb_ref[0]                                           # (T, 1)
    row_ok = (vb >> ROW_VALID_BIT) & 1                       # (T, 1)
    gathers = [None] * k
    for g in range(n_groups):
        # Two window halves handled separately; per-tap gather =
        # eq_a @ wf_a + eq_b @ wf_b (same FLOPs as one 2B-wide matmul).
        dds, wfs = [], []
        for h in (0, 1):
            wk = kref[2 * g + h][0]                          # (1, B)
            wfs.append(fref[2 * g + h][:].astype(dt))        # (B, C)
            dds.append(wk - qk)                              # (T, B)
        for t in range(k):
            if group_of[t] != g:
                continue
            bit = ((vb >> t) & 1) == 1                       # (T, 1)
            acc = None
            for h in (0, 1):
                eq = (dds[h] == deltas[t]) & bit
                part = jnp.dot(eq.astype(dt), wfs[h],
                               preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            gathers[t] = acc
    gcat = jnp.concatenate(gathers, axis=1)                  # (T, K*C)
    out = jnp.dot(gcat.astype(dt), w_ref[:].astype(dt),
                  preferred_element_type=jnp.float32)
    if affine:
        out = out * scale_ref[0][None, :] + bias_ref[0][None, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[:] = (out * row_ok.astype(out.dtype)).astype(out_ref.dtype)


def _dw_kernel(blk_ref, qk_ref, vb_ref, *refs, tile, block, deltas,
               group_of, n_groups, bf16):
    """Weight-gradient kernel: same per-tap one-hot gathers as _kernel,
    then one (K*C, T) @ (T, C') matmul per tile accumulated into the
    (K*C, C') output across the sequential grid."""
    k = len(deltas)
    kref = refs[:2 * n_groups]
    fref = refs[2 * n_groups:4 * n_groups]
    g_ref = refs[4 * n_groups]           # (T, C') cotangent rows of tile i
    out_ref = refs[4 * n_groups + 1]     # (K*C, C') accumulator

    i = pl.program_id(0)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    qk = qk_ref[0]                                           # (T, 1)
    vb = vb_ref[0]                                           # (T, 1)
    row_ok = (vb >> ROW_VALID_BIT) & 1
    gathers = [None] * k
    for g in range(n_groups):
        dds, wfs = [], []
        for h in (0, 1):
            wk = kref[2 * g + h][0]                          # (1, B)
            wfs.append(fref[2 * g + h][:].astype(dt))        # (B, C)
            dds.append(wk - qk)                              # (T, B)
        for t in range(k):
            if group_of[t] != g:
                continue
            bit = ((vb >> t) & 1) == 1
            acc = None
            for h in (0, 1):
                eq = (dds[h] == deltas[t]) & bit
                part = jnp.dot(eq.astype(dt), wfs[h],
                               preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            gathers[t] = acc
    gcat = jnp.concatenate(gathers, axis=1)                  # (T, K*C)
    grows = g_ref[:] * row_ok.astype(g_ref.dtype)            # (T, C')
    dw = jnp.dot(gcat.astype(dt).T, grows.astype(dt),
                 preferred_element_type=jnp.float32)         # (K*C, C')

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += dw


def band_conv_dw(feats: jnp.ndarray, keys: jnp.ndarray, plan: BandPlan,
                 g: jnp.ndarray, valid_bits=None, bf16: bool = True,
                 interpret: bool = False) -> jnp.ndarray:
    """Weight gradient of a band conv: dW[k] = gather_k(feats)^T @ g.

    Args:
        feats: (N_in, C) forward input rows (sorted by ``keys``).
        g: (N_out, C') output cotangent rows.
        valid_bits: optional (n_tiles, T) override of ``plan.valid_bits``
            (callers zero the rows of non-fitting tiles and add their
            exact patch contribution outside).
    Returns:
        (K, C, C') float32.
    """
    tile, block = plan.tile, plan.block
    n_in, c_in = feats.shape
    k = len(plan.deltas)
    c_out = g.shape[1]
    n_groups = max(plan.group_of) + 1
    pad = (-n_in) % block + block
    feats_p = jnp.pad(feats, ((0, pad), (0, 0)))
    keys_p = jnp.pad(keys, (0, pad), constant_values=INVALID_KEY)
    n_blocks = (n_in + pad) // block
    keys2d = keys_p.reshape(n_blocks, 1, block)
    n_tiles = plan.base_keys.shape[0]
    g_p = jnp.pad(g, ((0, n_tiles * tile - g.shape[0]), (0, 0)))
    vb = plan.valid_bits if valid_bits is None else valid_bits

    kernel = functools.partial(
        _dw_kernel, tile=tile, block=block, deltas=plan.deltas,
        group_of=plan.group_of, n_groups=n_groups, bf16=bf16)

    def key_spec(gi, off):
        return pl.BlockSpec(
            (1, 1, block),
            lambda i, blk, gi=gi, off=off: (blk[i * n_groups + gi] + off,
                                            0, 0))

    def feat_spec(gi, off):
        return pl.BlockSpec(
            (block, c_in),
            lambda i, blk, gi=gi, off=off: (blk[i * n_groups + gi] + off, 0))

    kspecs = [key_spec(gi, off) for gi in range(n_groups) for off in (0, 1)]
    fspecs = [feat_spec(gi, off) for gi in range(n_groups) for off in (0, 1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda i, blk: (i, 0, 0)),
            pl.BlockSpec((1, tile, 1), lambda i, blk: (i, 0, 0)),
            *kspecs, *fspecs,
            pl.BlockSpec((tile, c_out), lambda i, blk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((k * c_in, c_out), lambda i, blk: (0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k * c_in, c_out), jnp.float32),
        interpret=interpret,
    )(plan.blk.reshape(-1), plan.base_keys[:, :, None], vb[:, :, None],
      *([keys2d] * (2 * n_groups)),
      *([feats_p] * (2 * n_groups)),
      g_p)
    return out.reshape(k, c_in, c_out)


def band_conv(feats: jnp.ndarray, keys: jnp.ndarray, plan: BandPlan,
              weights: jnp.ndarray, scale=None, bias=None,
              relu: bool = False, bf16: bool = True,
              interpret: bool = False, out_dtype=jnp.float32) -> jnp.ndarray:
    """Apply one sparse conv through the band-window kernel.

    Args:
        feats: (N_in, C) rows sorted by ``keys``.
        keys: (N_in,) the sorted int32 keys the plan was built on.
        plan: BandPlan from :func:`band_plan`.
        weights: (K, C, C').
        scale/bias: optional (C',) fused affine (eval-mode BN).
        relu: fuse a ReLU after the affine.
        out_dtype: output store dtype (compute/epilogue stay f32 in
            register; bf16 halves the output write + downstream reads).
    Returns:
        (N_out, C') ``out_dtype`` (invalid rows zero). Exact iff
        plan.span_ok.
    """
    tile, block = plan.tile, plan.block
    n_in, c_in = feats.shape
    k = len(plan.deltas)
    c_out = weights.shape[2]
    n_groups = max(plan.group_of) + 1
    pad = (-n_in) % block + block
    feats = jnp.pad(feats, ((0, pad), (0, 0)))
    keys_p = jnp.pad(keys, (0, pad), constant_values=INVALID_KEY)
    n_blocks = (n_in + pad) // block
    # Singleton middle dim so each block's last-two dims are (1, 128k) —
    # equal to the array dims — satisfying the mosaic block-shape rule
    # (last two dims divisible by (8, 128) or equal to the array's).
    keys2d = keys_p.reshape(n_blocks, 1, block)
    n_tiles = plan.base_keys.shape[0]

    affine = scale is not None
    kernel = functools.partial(
        _kernel, tile=tile, block=block, deltas=plan.deltas,
        group_of=plan.group_of, n_groups=n_groups, bf16=bf16, relu=relu,
        affine=affine)

    # The scalar-prefetch table is flattened 1-D: XLA materializes the
    # prefetched operand in SMEM in its *device layout*, and a 2-D
    # (n_tiles, G) int32 gets the (8, 128)-tiled layout — G=3 pads to 128
    # lanes, a 42x blow-up that overflows the 1MB SMEM above ~2000 tiles
    # (~260k rows; seen as 'prefetched SMEM operand 0' alloc failures).
    # 1-D keeps the SMEM copy at n_tiles*G ints.
    def key_spec(g, off):
        return pl.BlockSpec(
            (1, 1, block),
            lambda i, blk, g=g, off=off: (blk[i * n_groups + g] + off, 0, 0))

    def feat_spec(g, off):
        return pl.BlockSpec(
            (block, c_in),
            lambda i, blk, g=g, off=off: (blk[i * n_groups + g] + off, 0))

    kspecs = [key_spec(g, off) for g in range(n_groups) for off in (0, 1)]
    fspecs = [feat_spec(g, off) for g in range(n_groups) for off in (0, 1)]
    extra_in = []
    extra_specs = []
    if affine:
        extra_in = [scale.reshape(1, c_out).astype(jnp.float32),
                    bias.reshape(1, c_out).astype(jnp.float32)]
        extra_specs = [pl.BlockSpec((1, c_out), lambda i, blk: (0, 0)),
                       pl.BlockSpec((1, c_out), lambda i, blk: (0, 0))]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile, 1), lambda i, blk: (i, 0, 0)),  # base keys
            pl.BlockSpec((1, tile, 1), lambda i, blk: (i, 0, 0)),  # valid bits
            *kspecs, *fspecs,
            pl.BlockSpec((k * c_in, c_out), lambda i, blk: (0, 0)),
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((tile, c_out), lambda i, blk: (i, 0)),
    )
    wdt = jnp.bfloat16 if bf16 else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * tile, c_out), out_dtype),
        interpret=interpret,
    )(plan.blk.reshape(-1), plan.base_keys[:, :, None],
      plan.valid_bits[:, :, None],
      *([keys2d] * (2 * n_groups)),
      *([feats] * (2 * n_groups)),
      weights.reshape(k * c_in, c_out).astype(wdt),
      *extra_in)
    return out[:plan.n_out]
