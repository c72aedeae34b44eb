"""Fused Pallas kernel: blend channels + UV M-lists in one chunk pass.

`pallas_raster.raster_pairs` (blended rgb/depth/norm channels) and
`pallas_uvtex.mlist_pairs` (per-pixel first-M contributor slots) replay the
*same* per-chunk blending weights — running them separately doubles the
chunk DMA traffic and the weight math (NOTES.md round-2 item 2).  This
kernel computes the weights once per chunk and writes both outputs:

  * blend block (T, PAD_F, PIX): rows [0:F) blended channels, row F the
    final transmittance (pallas_raster's packing);
  * M-list block (T, 4m padded, PIX): rows 4k..4k+3 = [w, u, v, s] per
    slot (pallas_uvtex's packing, Taylor UV computed in-kernel).

The fused backward replays forward-order once as well: both outputs'
cotangents flow through the same alpha chain, so their per-entry
``s = w * g`` terms simply *add* before the shared
``suffix = total - running prefix`` trick; the UV/table cotangents are the
M-list kernel's unchanged.  Gradient semantics therefore match running the
two separate custom VJPs (tests assert equality against the scan twins).

Scalar metadata per chunk reuses the uvtex layout:
    live | first<<1 | tile_x<<2 | tile_y<<12
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texgs.kernels.binning import PairList, grid_shape
from texgs.kernels.pallas_raster import (_chunk_core, _cumsum_incl_lanes,
                                         _grid_dim, _interpret,
                                         _live_slot_mask, _mxu_dot, _pad_f,
                                         _pixel_basis, _safe_tiles)
from texgs.kernels.pallas_uvtex import (U_ROWS, _intersect, _m_pad, _rays)
from texgs.kernels.reference import ALPHA_CLAMP, TILE
from texgs.kernels.tile_raster import PIX, ROW_F0
from texgs.kernels.uvtex_raster import T_STAR_MAX, ray_constants


def _fused_fwd_kernel(ct_ref, flags_ref, cam_ref, attrs_ref, uv_ref,
                      blend_ref, ml_ref, tbuf, dbuf, cbuf, *, m):
    i = pl.program_id(0)
    flags = flags_ref[i]
    live = (flags & 1) != 0
    first = (flags & 2) != 0
    px0 = (((flags >> 2) & 1023) * TILE).astype(jnp.float32)
    py0 = (((flags >> 12) & 1023) * TILE).astype(jnp.float32)
    n_f = attrs_ref.shape[0] - ROW_F0
    pad_f = blend_ref.shape[1]

    @pl.when(first)
    def _():
        tbuf[:, :] = jnp.ones_like(tbuf)
        dbuf[:, :] = jnp.zeros_like(dbuf)
        cbuf[:, :] = jnp.zeros_like(cbuf)
        ml_ref[0] = jnp.zeros_like(ml_ref[0])

    @pl.when(live)
    def _():
        attrs_blk = attrs_ref[:, :]
        w, _, _, _, _, t_out, done_out = _chunk_core(
            attrs_blk, tbuf[:, :], dbuf[:, :])

        # ---- blend output (pallas_raster._fwd_kernel body)
        f_attrs = attrs_blk[ROW_F0:, :]
        out = _mxu_dot(f_attrs, w, ((1,), (1,)))              # (F, PIX)
        prev = blend_ref[0]
        base = jnp.where(first, 0.0, prev[:n_f])
        t_row = t_out[:, 0][None, :]
        rows = [base + out, t_row]
        if pad_f - n_f - 1 > 0:
            rows.append(jnp.zeros((pad_f - n_f - 1, out.shape[1]), out.dtype))
        blend_ref[0] = jnp.concatenate(rows, axis=0)

        # ---- M-list output (pallas_uvtex._fwd_kernel body)
        count_in = cbuf[:, :]
        accept = (w > 0.0).astype(jnp.float32)
        rank = count_in + _cumsum_incl_lanes(accept) - accept

        @pl.when(jnp.min(count_in) < float(m))
        def _():
            d = _rays(cam_ref, px0, py0)
            uvn, *_ = _intersect(uv_ref[:, :], d)
            vals = [w, uvn[0], uvn[1], uvn[2]]
            # ranks touched by THIS chunk lie in [min(count_in),
            # max(count_out)): one chunk typically advances each pixel's
            # list by only a few entries, so all slot groups outside the
            # window are provably all-zero — predicating them away turns
            # the m x 4 masked reductions into ~window-size work.  Groups
            # of 2 slots = 8 rows keep the read-modify-write sublane-
            # aligned for f32.
            count_out = count_in + jnp.sum(accept, axis=-1, keepdims=True)
            lo = jnp.min(count_in)
            hi = jnp.max(count_out)
            for mi0 in range(0, m, 2):
                @pl.when((lo < float(mi0 + 2)) & (float(mi0) < hi))
                def _(mi0=mi0):
                    rows = []
                    for mi in (mi0, mi0 + 1):
                        sel = (rank == float(mi)) * accept
                        for c in range(4):
                            rows.append(jnp.sum(sel * vals[c], axis=-1))
                    blk = jnp.stack(rows, axis=0)          # (8, PIX)
                    cur = ml_ref[0, 4 * mi0:4 * mi0 + 8]
                    ml_ref[0, 4 * mi0:4 * mi0 + 8] = cur + blk

        tbuf[:, :] = t_out
        dbuf[:, :] = done_out
        cbuf[:, :] = count_in + jnp.sum(accept, axis=-1, keepdims=True)


def _fused_bwd_kernel(ct_ref, flags_ref, cam_ref, attrs_ref, uv_ref,
                      fwd_blend_ref, g_blend_ref, fwd_ml_ref, g_ml_ref,
                      d_attrs_ref, d_uv_ref, tbuf, dbuf, cbuf, pbuf,
                      gwbuf, gu0buf, gu1buf, gu2buf, *, m):
    i = pl.program_id(0)
    flags = flags_ref[i]
    live = (flags & 1) != 0
    first = (flags & 2) != 0
    px0 = (((flags >> 2) & 1023) * TILE).astype(jnp.float32)
    py0 = (((flags >> 12) & 1023) * TILE).astype(jnp.float32)
    n_f = attrs_ref.shape[0] - ROW_F0

    @pl.when(first)
    def _():
        tbuf[:, :] = jnp.ones_like(tbuf)
        dbuf[:, :] = jnp.zeros_like(dbuf)
        cbuf[:, :] = jnp.zeros_like(cbuf)
        pbuf[:, :] = jnp.zeros_like(pbuf)

    @pl.when(jnp.logical_not(live))
    def _():
        d_attrs_ref[:, :] = jnp.zeros_like(d_attrs_ref)
        d_uv_ref[:, :] = jnp.zeros_like(d_uv_ref)

    @pl.when(live)
    def _():
        attrs_blk = attrs_ref[:, :]
        w, alpha, one_minus, contrib, t_excl, t_out, done_out = _chunk_core(
            attrs_blk, tbuf[:, :], dbuf[:, :])
        count_in = cbuf[:, :]
        accept = (w > 0.0).astype(jnp.float32)
        rank = count_in + _cumsum_incl_lanes(accept) - accept
        in_list = accept * (rank < float(m)).astype(jnp.float32)

        # ---- blend cotangent pieces (pallas_raster._bwd_kernel)
        f_attrs = attrs_blk[ROW_F0:, :]
        fwd_blend = fwd_blend_ref[0]
        g_blend = g_blend_ref[0]
        fwd_out = fwd_blend[:n_f]
        t_fin = fwd_blend[n_f:n_f + 1]
        g_out = g_blend[:n_f]
        g_tfin = g_blend[n_f:n_f + 1]

        df = _mxu_dot(g_out, w, ((1,), (0,)))                 # (F, K)
        fi_dot_g = _mxu_dot(g_out, f_attrs, ((0,), (0,)))     # (PIX, K)

        # ---- M-list cotangent pieces (pallas_uvtex._bwd_kernel)
        d = _rays(cam_ref, px0, py0)
        u = uv_ref[:, :]
        uvn, inv_norm, t_raw, den_safe, jd = _intersect(u, d)

        g_ml = g_ml_ref[0]
        fwd_ml = fwd_ml_ref[0]
        # tot_ml sums over ALL slots (it is the whole-list suffix total,
        # not this chunk's contribution) — m cheap (PIX,) FMAs, kept
        tot_ml = jnp.zeros((PIX, 1), jnp.float32)
        for mi in range(m):
            tot_ml = tot_ml + (fwd_ml[4 * mi] * g_ml[4 * mi])[:, None]

        # per-element slot cotangents: only slots in this chunk's rank
        # window [min(count_in), max(count_out)) can select anything, so
        # the m x 4 masked gathers predicate down to ~window-size work
        # (same trick as the forward).  pl.when regions cannot carry
        # accumulators across iterations -> accumulate in VMEM scratch.
        gwbuf[:, :] = jnp.zeros_like(gwbuf)
        gu0buf[:, :] = jnp.zeros_like(gu0buf)
        gu1buf[:, :] = jnp.zeros_like(gu1buf)
        gu2buf[:, :] = jnp.zeros_like(gu2buf)
        count_out = count_in + jnp.sum(accept, axis=-1, keepdims=True)
        lo = jnp.min(count_in)
        hi = jnp.minimum(jnp.max(count_out), float(m))
        for mi0 in range(0, m, 2):
            @pl.when((lo < float(mi0 + 2)) & (float(mi0) < hi))
            def _(mi0=mi0):
                aw = jnp.zeros_like(w)
                a0 = jnp.zeros_like(w)
                a1 = jnp.zeros_like(w)
                a2 = jnp.zeros_like(w)
                for mi in (mi0, mi0 + 1):
                    sel = (rank == float(mi)) * in_list
                    aw = aw + sel * g_ml[4 * mi][:, None]
                    a0 = a0 + sel * g_ml[4 * mi + 1][:, None]
                    a1 = a1 + sel * g_ml[4 * mi + 2][:, None]
                    a2 = a2 + sel * g_ml[4 * mi + 3][:, None]
                gwbuf[:, :] = gwbuf[:, :] + aw
                gu0buf[:, :] = gu0buf[:, :] + a0
                gu1buf[:, :] = gu1buf[:, :] + a1
                gu2buf[:, :] = gu2buf[:, :] + a2
        g_w = gwbuf[:, :]
        g_uv = [gu0buf[:, :], gu1buf[:, :], gu2buf[:, :]]

        dot = uvn[0] * g_uv[0] + uvn[1] * g_uv[1] + uvn[2] * g_uv[2]
        du = [inv_norm * (g_uv[c] - uvn[c] * dot) for c in range(3)]
        g_tstar = du[0] * jd[0] + du[1] * jd[1] + du[2] * jd[2]
        t_active = ((t_raw > 0.0) & (t_raw < T_STAR_MAX)).astype(jnp.float32)
        g_tstar = g_tstar * t_active * in_list
        g_num = g_tstar / den_safe
        g_den = -g_tstar * t_raw / den_safe

        dx, dy, dz = d
        rows_uv = [
            g_num * dx, g_num * dy, g_num * dz,
            g_den * dx * dx, g_den * 2.0 * dx * dy,
            g_den * 2.0 * dx * dz, g_den * dy * dy,
            g_den * 2.0 * dy * dz, g_den * dz * dz,
            du[0] * in_list, du[1] * in_list, du[2] * in_list,
        ]
        d_uv_rows = [jnp.sum(r, axis=0, keepdims=True) for r in rows_uv]
        pad = jnp.zeros((U_ROWS - 12, d_uv_rows[0].shape[1]), jnp.float32)
        d_uv_ref[:, :] = jnp.concatenate(d_uv_rows + [pad], axis=0)

        # ---- shared alpha chain: both outputs' w-cotangents add before
        # the suffix trick (d out/d alpha_j sums over both paths)
        g_w_all = fi_dot_g + g_w * in_list
        s = w * g_w_all
        prefix = pbuf[:, :] + _cumsum_incl_lanes(s)
        tot = jnp.sum(fwd_out * g_out, axis=0)[:, None] + tot_ml
        suffix = tot - prefix

        inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_CLAMP)
        bg_term = (t_fin * g_tfin).reshape(-1)[:, None]
        g_alpha = contrib * (t_excl * g_w_all - (suffix + bg_term) * inv_om)
        active = (alpha > 0.0) & (alpha < ALPHA_CLAMP)
        g_power = jnp.where(active, g_alpha * alpha, 0.0)

        x, y = _pixel_basis(jnp.float32)
        dq = jnp.concatenate([
            jnp.sum(x * x * g_power, axis=0, keepdims=True),
            jnp.sum(y * y * g_power, axis=0, keepdims=True),
            jnp.sum(x * y * g_power, axis=0, keepdims=True),
            jnp.sum(x * g_power, axis=0, keepdims=True),
            jnp.sum(y * g_power, axis=0, keepdims=True),
            jnp.sum(g_power, axis=0, keepdims=True),
        ], axis=0)
        zeros_logop = jnp.zeros_like(dq[0:1])
        d_attrs_ref[:, :] = jnp.concatenate([dq, zeros_logop, df], axis=0)

        tbuf[:, :] = t_out
        dbuf[:, :] = done_out
        cbuf[:, :] = count_in + jnp.sum(accept, axis=-1, keepdims=True)
        pbuf[:, :] = prefix[:, -1:]


# ------------------------------------------------------------- host side

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_pairs(attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
                n_live, n_tiles: int, chunk: int, m: int):
    """-> (blend blocks (T, PAD_F, PIX), M-list blocks (T, 4m padded, PIX)).

    n_live: () int32 dynamic grid bound (PairList.n_live_chunks) or None
    for the full static chunk sweep (see pallas_raster._grid_dim)."""
    return _fused_fwd_call(attrs, uv_rows, chunk_tile_safe, chunk_flags,
                           cam_consts, n_live, n_tiles, chunk, m)


def _fused_fwd_call(attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
                    n_live, n_tiles, chunk, m):
    a_dim, total = attrs.shape
    n_chunks = total // chunk
    pad_f = _pad_f(a_dim - ROW_F0)
    mp = _m_pad(m)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_dim(n_chunks, n_live),),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, ct, fl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_dim, chunk), lambda i, ct, fl: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U_ROWS, chunk), lambda i, ct, fl: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, pad_f, PIX), lambda i, ct, fl: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, PIX), lambda i, ct, fl: (ct[i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, m=m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, pad_f, PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, mp, PIX), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(chunk_tile_safe, chunk_flags, cam_consts, attrs, uv_rows)


def _fused_fwd(attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
               n_live, n_tiles, chunk, m):
    blend, ml = _fused_fwd_call(attrs, uv_rows, chunk_tile_safe, chunk_flags,
                                cam_consts, n_live, n_tiles, chunk, m)
    return (blend, ml), (attrs, uv_rows, chunk_tile_safe, chunk_flags,
                         cam_consts, n_live, blend, ml)


def _fused_bwd(n_tiles, chunk, m, res, g):
    (attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts, n_live,
     fwd_blend, fwd_ml) = res
    g_blend, g_ml = g
    a_dim, total = attrs.shape
    n_chunks = total // chunk
    pad_f = _pad_f(a_dim - ROW_F0)
    mp = _m_pad(m)

    blend_spec = pl.BlockSpec((1, pad_f, PIX), lambda i, ct, fl: (ct[i], 0, 0),
                              memory_space=pltpu.VMEM)
    ml_spec = pl.BlockSpec((1, mp, PIX), lambda i, ct, fl: (ct[i], 0, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(_grid_dim(n_chunks, n_live),),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i, ct, fl: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a_dim, chunk), lambda i, ct, fl: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U_ROWS, chunk), lambda i, ct, fl: (0, i),
                         memory_space=pltpu.VMEM),
            blend_spec, blend_spec, ml_spec, ml_spec,
        ],
        out_specs=[
            pl.BlockSpec((a_dim, chunk), lambda i, ct, fl: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((U_ROWS, chunk), lambda i, ct, fl: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, chunk), jnp.float32),
            pltpu.VMEM((PIX, chunk), jnp.float32),
            pltpu.VMEM((PIX, chunk), jnp.float32),
            pltpu.VMEM((PIX, chunk), jnp.float32),
        ],
    )
    d_attrs, d_uv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, m=m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((a_dim, total), jnp.float32),
            jax.ShapeDtypeStruct((U_ROWS, total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(chunk_tile_safe, chunk_flags, cam_consts, attrs, uv_rows, fwd_blend,
      g_blend, fwd_ml, g_ml)
    mask = _live_slot_mask(total, chunk, n_live, d_attrs)
    if mask is not None:
        d_attrs = d_attrs * mask
        d_uv = d_uv * mask
    return (d_attrs, d_uv, None, None, None, None)


fused_pairs.defvjp(_fused_fwd, _fused_bwd)


def fused_pallas(attrs, uv_rows_t, pairs: PairList, camera, chunk: int,
                 m: int, height: int = None, row_offset=None):
    """One-pass replacement for rasterize_pallas + mlist_pallas.

    Returns (tiles_out (T, PIX, F), t_final (T, PIX), mlist (T, PIX, M, 4)).
    """
    # M-list slot groups are 2 wide (8 f32 rows): pad odd m up one slot and
    # slice the list back down — the first m contributors are unchanged
    m_req = m
    m = m + (m % 2)
    gy, gx = grid_shape(camera.height if height is None else height,
                        camera.width)
    n_tiles = gy * gx
    n_f = attrs.shape[0] - ROW_F0

    chunk_tile = jax.lax.stop_gradient(pairs.chunk_tile)
    live = (chunk_tile >= 0).astype(jnp.int32)
    first = jax.lax.stop_gradient(pairs.chunk_first).astype(jnp.int32)
    tile_clip = jnp.clip(chunk_tile, 0, n_tiles - 1)
    txi = tile_clip % gx
    tyi = tile_clip // gx
    flags = live | (first << 1) | (txi << 2) | (tyi << 12)
    safe = _safe_tiles(chunk_tile)

    ax, by, c0 = ray_constants(camera, row_offset)
    cam_consts = jnp.zeros((8, 128), jnp.float32)
    cam_consts = cam_consts.at[0, 0:3].set(ax)
    cam_consts = cam_consts.at[0, 3:6].set(by)
    cam_consts = cam_consts.at[0, 6:9].set(c0)

    blend, ml = fused_pairs(attrs, uv_rows_t, safe, flags, cam_consts,
                            pairs.n_live_chunks, n_tiles, chunk, m)

    visited = pairs.tile_counts > 0
    out = jnp.where(visited[:, None, None], blend[:, :n_f, :], 0.0)
    tfin = jnp.where(visited[:, None], blend[:, n_f, :], 1.0)
    ml = jnp.where(visited[:, None, None], ml, 0.0)
    lists = ml[:, :4 * m, :].reshape(n_tiles, m, 4, PIX)
    lists = lists[:, :m_req]
    return (jnp.swapaxes(out, 1, 2), tfin, lists.transpose(0, 3, 1, 2))
