"""Pallas TPU rasterizer: one program per pair-chunk, MXU blends, custom VJP.

Production kernel for the chunk structure built by texgs.kernels.binning —
the TPU-native replacement for `diff_gauss`'s per-tile CUDA loops
(SURVEY.md §2.2).  Design:

* Grid = one program per pair-chunk, in (tile, depth) order.  Chunks of the
  same tile map (via scalar-prefetched chunk->tile indices) to the same
  output block, which Pallas keeps resident in VMEM across consecutive
  programs — the revisit-accumulate pattern.  Transmittance / stop-flag /
  prefix carries live in scratch that persists across the sequential grid.
  Tail padding chunks inherit the last live tile index (cummax) so no
  stale VMEM buffer is ever flushed over an unrelated tile.
* Per-pixel exponents are 6 broadcasted FMAs of the tile-local quadratic
  coefficients (pixel basis x², y², xy, x, y, 1); blending is a
  (F x K) @ (PIX x K) contraction on the MXU.
* Sequential-stop semantics (power>0 skip, alpha<1/255 skip, T<1e-4 stop)
  reproduced exactly via in-lane exclusive cumprod / cummax (Hillis-Steele
  doubling), matching texgs.kernels.tile_raster.chunk_blend — the scan path
  is this kernel's reference twin.
* Backward is a single forward-order replay (no back-to-front traversal):
  with the forward tile totals known, the suffix sums a gradient needs are
  ``total - running prefix``; per-pair gradients are written to an (A, P)
  buffer and chained to Gaussian parameters by jax autodiff through the
  gather-based build_pair_attrs — a deterministic segment-sum, no atomics.

Gradient semantics match jax autodiff of the scan path exactly (clamped /
skipped / stopped entries get zero gradient), so tests assert allclose on
outputs and on every input cotangent.  Runs in interpreter mode off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texgs.kernels.binning import PairList, grid_shape
from texgs.kernels.reference import ALPHA_CLAMP, MIN_ALPHA, T_STOP, TILE
from texgs.kernels.tile_raster import N_QUAD, PIX, ROW_F0, ROW_LOGOP

NEG_BIG = -1e20

# Cast the blend contractions' operands to bf16 (f32 accumulate) — halves
# the MXU/VMEM traffic of the attribute blend at ~0.4% relative channel
# error (NOTES.md round-2 item 4).  Off until the on-chip timing + PSNR
# sweep (scratch/r2_perf.py) justifies it; the exponent/weight math stays
# f32 either way.
BLEND_BF16 = False


def _mxu_dot(a, b, dims):
    if BLEND_BF16:
        # explicit DEFAULT precision: bf16 operands + the library-wide
        # 'highest' default would be rejected by Mosaic (fp32 contraction
        # on bf16 inputs)
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll_lanes(x, shift: int):
    """Circular shift along the last axis (compiled: pltpu.roll)."""
    if _interpret():
        return jnp.roll(x, shift, axis=-1)
    return pltpu.roll(x, shift=shift, axis=x.ndim - 1)


def _pixel_basis(dtype=jnp.float32):
    """Tile-local pixel coordinate columns: x, y as (PIX, 1)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    x = (idx % TILE).astype(dtype)
    y = (idx // TILE).astype(dtype)
    return x, y


def _power_from_quad(quad):
    """quad: (6, K) -> exponent (PIX, K) via broadcasted FMAs (VPU)."""
    x, y = _pixel_basis(quad.dtype)
    return (x * x * quad[0:1, :] + y * y * quad[1:2, :] + x * y * quad[2:3, :]
            + x * quad[3:4, :] + y * quad[4:5, :] + quad[5:6, :])


def _alpha_from_power(power, logop):
    alpha = jnp.minimum(jnp.exp(power), ALPHA_CLAMP)
    alpha = jnp.where(power - logop > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < MIN_ALPHA, 0.0, alpha)
    return alpha


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _cumprod_excl_lanes(x):
    """Exclusive cumprod along lanes (Hillis-Steele doubling)."""
    k = x.shape[-1]
    lanes = _lane_iota(x.shape)
    x = jnp.where(lanes >= 1, _roll_lanes(x, 1), 1.0)
    s = 1
    while s < k:
        x = x * jnp.where(lanes >= s, _roll_lanes(x, s), 1.0)
        s *= 2
    return x


def _cummax_incl_lanes(x):
    k = x.shape[-1]
    lanes = _lane_iota(x.shape)
    s = 1
    while s < k:
        x = jnp.maximum(x, jnp.where(lanes >= s, _roll_lanes(x, s), NEG_BIG))
        s *= 2
    return x


def _cumsum_incl_lanes(x):
    k = x.shape[-1]
    lanes = _lane_iota(x.shape)
    s = 1
    while s < k:
        x = x + jnp.where(lanes >= s, _roll_lanes(x, s), 0.0)
        s *= 2
    return x


def _chunk_core(attrs_blk, t_in, done_in):
    """Shared forward math for one chunk.

    attrs_blk: (A, K); t_in/done_in: (PIX, 1) f32.
    Returns (w, alpha, one_minus, contrib) each (PIX, K), plus t_out and
    done_out (PIX, 1)."""
    quad = attrs_blk[0:N_QUAD, :]
    logop = attrs_blk[ROW_LOGOP:ROW_LOGOP + 1, :]
    power = _power_from_quad(quad)
    alpha = _alpha_from_power(power, logop)
    one_minus = 1.0 - alpha

    t_excl = t_in * _cumprod_excl_lanes(one_minus)
    fail = (t_excl * one_minus < T_STOP).astype(jnp.float32)
    done = jnp.maximum(done_in, _cummax_incl_lanes(fail))
    contrib = 1.0 - done
    w = alpha * t_excl * contrib
    # Mosaic has no reduce_prod; one_minus >= 1 - ALPHA_CLAMP > 0, so the
    # product over contributing entries is safe in log space.
    t_out = t_in * jnp.exp(jnp.sum(
        jnp.where(done > 0, 0.0, jnp.log(one_minus)), axis=-1, keepdims=True))
    done_out = done[:, -1:]
    return w, alpha, one_minus, contrib, t_excl, t_out, done_out


# ------------------------------------------------------------- host side
#
# The kernel's per-tile output block packs the blended attribute rows and
# the running transmittance into one (PAD_F, PIX) tensor (row ROW_T = T),
# because TPU block shapes must tile to (8, 128) — a separate (1, PIX)
# t_final output would violate the sublane constraint.


def _pad_f(n_f: int) -> int:
    return -(-(n_f + 1) // 8) * 8


def _safe_tiles(chunk_tile):
    """Map tail padding chunks (-1) to the last live tile so output-block
    revisiting never flushes a stale buffer over an unrelated tile."""
    filled = jax.lax.cummax(chunk_tile)
    return jnp.maximum(filled, 0).astype(jnp.int32)


def _fwd_kernel(ct_ref, flags_ref, attrs_ref, out_ref, tbuf, dbuf):
    i = pl.program_id(0)
    flags = flags_ref[i]
    live = (flags & 1) != 0
    first = (flags & 2) != 0
    n_f = attrs_ref.shape[0] - ROW_F0
    pad_f = out_ref.shape[1]

    @pl.when(first)
    def _():
        tbuf[:, :] = jnp.ones_like(tbuf)
        dbuf[:, :] = jnp.zeros_like(dbuf)

    @pl.when(live)
    def _():
        w, _, _, _, _, t_out, done_out = _chunk_core(
            attrs_ref[:, :], tbuf[:, :], dbuf[:, :])
        f_attrs = attrs_ref[ROW_F0:, :]
        out = _mxu_dot(f_attrs, w, ((1,), (1,)))              # (F, PIX)

        prev = out_ref[0]                                     # (PAD_F, PIX)
        base = jnp.where(first, 0.0, prev[:n_f])
        t_row = t_out[:, 0][None, :]                          # (1, PIX)
        rows = [base + out, t_row]
        if pad_f - n_f - 1 > 0:  # static; zero-sized vectors are invalid
            rows.append(jnp.zeros((pad_f - n_f - 1, out.shape[1]), out.dtype))
        out_ref[0] = jnp.concatenate(rows, axis=0)

        tbuf[:, :] = t_out
        dbuf[:, :] = done_out


def _bwd_kernel(ct_ref, flags_ref, attrs_ref, fwd_blk_ref, g_blk_ref,
                d_attrs_ref, tbuf, dbuf, pbuf):
    i = pl.program_id(0)
    flags = flags_ref[i]
    live = (flags & 1) != 0
    first = (flags & 2) != 0
    n_f = attrs_ref.shape[0] - ROW_F0

    @pl.when(first)
    def _():
        tbuf[:, :] = jnp.ones_like(tbuf)
        dbuf[:, :] = jnp.zeros_like(dbuf)
        pbuf[:, :] = jnp.zeros_like(pbuf)

    @pl.when(live)
    def _():
        attrs_blk = attrs_ref[:, :]
        w, alpha, one_minus, contrib, t_excl, t_out, done_out = _chunk_core(
            attrs_blk, tbuf[:, :], dbuf[:, :])

        f_attrs = attrs_blk[ROW_F0:, :]                       # (F, K)
        fwd_blk = fwd_blk_ref[0]                              # (PAD_F, PIX)
        g_blk = g_blk_ref[0]
        fwd_out = fwd_blk[:n_f]
        t_fin = fwd_blk[n_f:n_f + 1]                          # (1, PIX)
        g_out = g_blk[:n_f]
        g_tfin = g_blk[n_f:n_f + 1]

        # d f_attrs[f, k] = sum_p g_out[f, p] * w[p, k]
        df = _mxu_dot(g_out, w, ((1,), (0,)))                 # (F, K)

        # fi_dot_g[p, k] = sum_f f_attrs[f, k] * g_out[f, p]
        fi_dot_g = _mxu_dot(g_out, f_attrs, ((0,), (0,)))     # (PIX, K)

        s = w * fi_dot_g
        prefix_dot = pbuf[:, :] + _cumsum_incl_lanes(s)       # (PIX, K)
        tot_dot = jnp.sum(fwd_out * g_out, axis=0)[:, None]   # (PIX, 1)
        suffix_dot = tot_dot - prefix_dot

        inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_CLAMP)
        bg_term = (t_fin * g_tfin).reshape(-1)[:, None]       # (PIX, 1)
        g_alpha = contrib * (t_excl * fi_dot_g
                             - (suffix_dot + bg_term) * inv_om)

        active = (alpha > 0.0) & (alpha < ALPHA_CLAMP)
        g_power = jnp.where(active, g_alpha * alpha, 0.0)     # (PIX, K)

        x, y = _pixel_basis(jnp.float32)
        dq = jnp.concatenate([
            jnp.sum(x * x * g_power, axis=0, keepdims=True),
            jnp.sum(y * y * g_power, axis=0, keepdims=True),
            jnp.sum(x * y * g_power, axis=0, keepdims=True),
            jnp.sum(x * g_power, axis=0, keepdims=True),
            jnp.sum(y * g_power, axis=0, keepdims=True),
            jnp.sum(g_power, axis=0, keepdims=True),
        ], axis=0)                                            # (6, K)

        zeros_logop = jnp.zeros_like(dq[0:1])
        d_attrs_ref[:, :] = jnp.concatenate([dq, zeros_logop, df], axis=0)

        tbuf[:, :] = t_out
        dbuf[:, :] = done_out
        pbuf[:, :] = prefix_dot[:, -1:]

    @pl.when(jnp.logical_not(live))
    def _():
        d_attrs_ref[:, :] = jnp.zeros_like(d_attrs_ref)


def _grid_dim(n_chunks: int, n_live):
    """Dynamic grid bound: the padded layout is dense (every live chunk
    precedes every dead one), so on TPU the sequential chunk grid stops at
    ``n_live`` instead of sweeping the static-cap dead tail (~40% of steps
    at a controller-fit pair cap).  Interpret mode (CPU tests) keeps the
    static grid — dead chunks are no-ops there and Pallas interpret does
    not model dynamic grids."""
    import os
    if n_live is None or _interpret() or os.environ.get("TEXGS_STATIC_GRID"):
        return n_chunks
    return jnp.minimum(jnp.asarray(n_live, jnp.int32), n_chunks)


def _live_slot_mask(total: int, chunk: int, n_live, like):
    """(1, total) f32 mask of slots covered by the (possibly truncated)
    grid: cotangent blocks past the truncation point are never written by
    the backward kernel, and their garbage must not reach the gather
    transpose (whose index clip would fold it into Gaussian 0)."""
    if n_live is None:
        return None
    idx = jnp.arange(total, dtype=jnp.int32)
    return (idx < jnp.asarray(n_live, jnp.int32) * chunk).astype(
        like.dtype)[None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def raster_pairs(attrs, chunk_tile_safe, chunk_flags, n_live, n_tiles: int,
                 chunk: int):
    """attrs (A, P) -> packed tile blocks (T, PAD_F, PIX).

    Rows [0:F) are the blended attribute channels, row F the final
    transmittance, remaining rows zero padding.  chunk_tile_safe: (n_chunks,)
    int32 output-block index per chunk; chunk_flags: (n_chunks,) int32 with
    bit0 = live, bit1 = first-chunk-of-tile.  (Kept as two flat 1D arrays:
    2D scalar-prefetch operands are lane-padded x128 in SMEM and overflow
    its 1 MiB at production chunk counts.)  n_live: () int32 dynamic grid
    bound (PairList.n_live_chunks) or None for the full static sweep.
    """
    return _raster_fwd_call(attrs, chunk_tile_safe, chunk_flags, n_live,
                            n_tiles, chunk)


def _raster_fwd_call(attrs, chunk_tile_safe, chunk_flags, n_live, n_tiles,
                     chunk):
    a_dim, total = attrs.shape
    n_chunks = total // chunk
    pad_f = _pad_f(a_dim - ROW_F0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_dim(n_chunks, n_live),),
        in_specs=[
            pl.BlockSpec((a_dim, chunk), lambda i, ct, lf: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pad_f, PIX), lambda i, ct, lf: (ct[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, pad_f, PIX), jnp.float32),
        interpret=_interpret(),
    )(chunk_tile_safe, chunk_flags, attrs)


def _raster_fwd(attrs, chunk_tile_safe, chunk_flags, n_live, n_tiles, chunk):
    blk = _raster_fwd_call(attrs, chunk_tile_safe, chunk_flags, n_live,
                           n_tiles, chunk)
    return blk, (attrs, chunk_tile_safe, chunk_flags, n_live, blk)


def _raster_bwd(n_tiles, chunk, res, g_blk):
    attrs, chunk_tile_safe, chunk_flags, n_live, fwd_blk = res
    a_dim, total = attrs.shape
    n_chunks = total // chunk
    pad_f = _pad_f(a_dim - ROW_F0)

    tile_spec = pl.BlockSpec((1, pad_f, PIX), lambda i, ct, lf: (ct[i], 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_dim(n_chunks, n_live),),
        in_specs=[
            pl.BlockSpec((a_dim, chunk), lambda i, ct, lf: (0, i),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec,
        ],
        out_specs=pl.BlockSpec((a_dim, chunk), lambda i, ct, lf: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    d_attrs = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a_dim, total), jnp.float32),
        interpret=_interpret(),
    )(chunk_tile_safe, chunk_flags, attrs, fwd_blk, g_blk)
    mask = _live_slot_mask(total, chunk, n_live, d_attrs)
    if mask is not None:
        d_attrs = d_attrs * mask
    return (d_attrs, None, None, None)


raster_pairs.defvjp(_raster_fwd, _raster_bwd)


def rasterize_pallas(attrs: jnp.ndarray, pairs: PairList, height: int,
                     width: int, chunk: int):
    """Drop-in replacement for tile_raster.rasterize_scan.

    Returns (tiles_out (T, PIX, F), t_final (T, PIX)); tiles that own no
    pairs are fixed up outside the kernel (their blocks are never visited).
    """
    gy, gx = grid_shape(height, width)
    n_tiles = gy * gx
    n_f = attrs.shape[0] - ROW_F0
    chunk_tile = jax.lax.stop_gradient(pairs.chunk_tile)
    live = (chunk_tile >= 0).astype(jnp.int32)
    first = jax.lax.stop_gradient(pairs.chunk_first).astype(jnp.int32)
    chunk_flags = live | (first << 1)
    chunk_tile_safe = _safe_tiles(chunk_tile)

    blk = raster_pairs(attrs, chunk_tile_safe, chunk_flags,
                       pairs.n_live_chunks, n_tiles, chunk)

    visited = pairs.tile_counts > 0
    out = jnp.where(visited[:, None, None], blk[:, :n_f, :], 0.0)
    tfin = jnp.where(visited[:, None], blk[:, n_f, :], 1.0)
    # (T, F, PIX) -> (T, PIX, F) to match the scan path's convention
    return jnp.swapaxes(out, 1, 2), tfin
