"""Pallas TPU kernel for UV-texture M-lists (forward + custom VJP).

Companion to texgs.kernels.pallas_raster for the stage-3 path: per chunk it
replays the blending weights, computes the ray-Gaussian max-response point
and Taylor UV in-kernel (the quadratic forms in the ray direction are 6
broadcasted FMAs each on the VPU), and compacts the first-M contributors
per pixel into slot lists via masked reductions — skipped entirely once
every pixel's list is full, mirroring the CUDA early-out.

The backward kernel is a forward-order replay: slot cotangents are pulled
back through normalize / t* / the quadratic forms into the per-pair uv
tables, and the weight cotangents through the alpha chain with the same
``total - running prefix`` suffix trick as the blend kernel (the total of
w*g_w per pixel comes from the forward slot outputs dotted with the
cotangent slots).

Scalar metadata per chunk is one int32:
    live | first<<1 | tile_x<<2 | tile_y<<12   (tile indices, 10 bits each)
Camera ray constants (ax, by, c0 vectors) arrive as one (8, 128) f32 block.
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
                                         _live_slot_mask, _pixel_basis,
                                         _safe_tiles)
from texgs.kernels.reference import ALPHA_CLAMP, TILE
from texgs.kernels.tile_raster import PIX
from texgs.kernels.uvtex_raster import T_STAR_MAX

# uv_rows layout (U = 24 rows): sv(3), siginv(6: xx,xy,xz,yy,yz,zz),
# base_uv(3), J row-major(9), padding(3)
U_ROWS = 24


def _pixel_xy(px0, py0):
    idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    x = (idx % TILE).astype(jnp.float32) + px0
    y = (idx // TILE).astype(jnp.float32) + py0
    return x, y


def _rays(cam_ref, px0, py0):
    """d = c0 + px*ax + py*by; returns [dx, dy, dz], each (PIX, 1)."""
    x, y = _pixel_xy(px0, py0)
    return [cam_ref[0, 6 + i] + x * cam_ref[0, i] + y * cam_ref[0, 3 + i]
            for i in range(3)]


def _intersect(u, d):
    """u: (U_ROWS, K); d: 3-list of (PIX, 1).  Returns the forward
    intersection quantities (all (PIX, K))."""
    dx, dy, dz = d
    num = dx * u[0:1] + dy * u[1:2] + dz * u[2:3]
    den = (dx * dx * u[3:4] + dy * dy * u[6:7] + dz * dz * u[8:9]
           + 2.0 * dx * dy * u[4:5] + 2.0 * dx * dz * u[5:6]
           + 2.0 * dy * dz * u[7:8])
    den_safe = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    t_raw = num / den_safe
    t_star = jnp.clip(t_raw, 0.0, T_STAR_MAX)

    jd = [dx * u[12 + 3 * i: 13 + 3 * i] + dy * u[13 + 3 * i: 14 + 3 * i]
          + dz * u[14 + 3 * i: 15 + 3 * i] for i in range(3)]
    uv = [u[9 + i: 10 + i] + t_star * jd[i] for i in range(3)]
    norm2 = uv[0] * uv[0] + uv[1] * uv[1] + uv[2] * uv[2]
    inv_norm = jax.lax.rsqrt(jnp.maximum(norm2, 1e-24))
    uvn = [c * inv_norm for c in uv]
    return uvn, inv_norm, t_raw, den_safe, jd


def _weights_and_ranks(attrs_blk, tbuf, dbuf, cbuf):
    """Shared replay: weights + exclusive contribution ranks; updates the
    carries."""
    w, alpha, one_minus, contrib, t_excl, t_out, done_out = _chunk_core(
        attrs_blk, tbuf[:, :], dbuf[:, :])
    count_in = cbuf[:, :]
    accept = (w > 0.0).astype(jnp.float32)
    rank = count_in + _cumsum_incl_lanes(accept) - accept
    tbuf[:, :] = t_out
    dbuf[:, :] = done_out
    cbuf[:, :] = count_in + jnp.sum(accept, axis=-1, keepdims=True)
    return w, alpha, one_minus, contrib, t_excl, accept, rank, count_in


def _fwd_kernel(ct_ref, flags_ref, cam_ref, attrs_ref, uv_ref, out_ref,
                tbuf, dbuf, cbuf, *, m):
    i = pl.program_id(0)
    flags = flags_ref[i]
    live = (flags & 1) != 0
    first = (flags & 2) != 0
    px0 = (((flags >> 2) & 1023) * TILE).astype(jnp.float32)
    py0 = (((flags >> 12) & 1023) * TILE).astype(jnp.float32)

    @pl.when(first)
    def _():
        tbuf[:, :] = jnp.ones_like(tbuf)
        dbuf[:, :] = jnp.zeros_like(dbuf)
        cbuf[:, :] = jnp.zeros_like(cbuf)
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(live)
    def _():
        w, _, _, _, _, accept, rank, count_in = _weights_and_ranks(
            attrs_ref[:, :], tbuf, dbuf, cbuf)

        @pl.when(jnp.min(count_in) < float(m))
        def _():
            d = _rays(cam_ref, px0, py0)
            uvn, *_ = _intersect(uv_ref[:, :], d)

            prev = out_ref[0]                      # (4*m padded, PIX)
            vals = [w, uvn[0], uvn[1], uvn[2]]
            rows = []
            for mi in range(m):
                sel = (rank == float(mi)) * accept  # (PIX, K)
                for c in range(4):
                    rows.append(prev[4 * mi + c]
                                + jnp.sum(sel * vals[c], axis=-1))
            block = jnp.stack(rows, axis=0)
            pad = out_ref.shape[1] - 4 * m
            if pad > 0:
                block = jnp.concatenate(
                    [block, jnp.zeros((pad, block.shape[1]), block.dtype)],
                    axis=0)
            out_ref[0] = block


def _bwd_kernel(ct_ref, flags_ref, cam_ref, attrs_ref, uv_ref, fwd_ref,
                g_ref, d_attrs_ref, d_uv_ref, tbuf, dbuf, cbuf, pbuf, *, m):
    i = pl.program_id(0)
    flags = flags_ref[i]
    live = (flags & 1) != 0
    first = (flags & 2) != 0
    px0 = (((flags >> 2) & 1023) * TILE).astype(jnp.float32)
    py0 = (((flags >> 12) & 1023) * TILE).astype(jnp.float32)

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
        (w, alpha, one_minus, contrib, t_excl, accept, rank,
         count_in) = _weights_and_ranks(attrs_ref[:, :], tbuf, dbuf, cbuf)
        in_list = accept * (rank < float(m)).astype(jnp.float32)

        d = _rays(cam_ref, px0, py0)
        u = uv_ref[:, :]
        uvn, inv_norm, t_raw, den_safe, jd = _intersect(u, d)

        # per-entry cotangents from the slot layout
        g_blk = g_ref[0]
        fwd_blk = fwd_ref[0]
        g_w = jnp.zeros_like(w)
        g_uv = [jnp.zeros_like(w) for _ in range(3)]
        tot = jnp.zeros((PIX, 1), jnp.float32)
        for mi in range(m):
            sel = (rank == float(mi)) * in_list
            g_w = g_w + sel * g_blk[4 * mi][:, None]
            for c in range(3):
                g_uv[c] = g_uv[c] + sel * g_blk[4 * mi + 1 + c][:, None]
            tot = tot + (fwd_blk[4 * mi] * g_blk[4 * mi])[:, None]

        # normalize backward: du = inv_norm * (g - uvn * (uvn . g))
        dot = uvn[0] * g_uv[0] + uvn[1] * g_uv[1] + uvn[2] * g_uv[2]
        du = [inv_norm * (g_uv[c] - uvn[c] * dot) for c in range(3)]

        # uv = base_uv + t* jd  (jd constant: J detached, d pixel-const)
        g_tstar = du[0] * jd[0] + du[1] * jd[1] + du[2] * jd[2]
        t_active = ((t_raw > 0.0) & (t_raw < T_STAR_MAX)).astype(jnp.float32)
        g_tstar = g_tstar * t_active * in_list
        g_num = g_tstar / den_safe
        g_den = -g_tstar * t_raw / den_safe

        dx, dy, dz = d
        rows_uv = [
            g_num * dx, g_num * dy, g_num * dz,            # sv
            g_den * dx * dx, g_den * 2.0 * dx * dy,        # siginv xx, xy
            g_den * 2.0 * dx * dz, g_den * dy * dy,        # xz, yy
            g_den * 2.0 * dy * dz, g_den * dz * dz,        # yz, zz
            du[0] * in_list, du[1] * in_list, du[2] * in_list,  # base_uv
        ]
        d_uv_rows = [jnp.sum(r, axis=0, keepdims=True) for r in rows_uv]
        pad = jnp.zeros((U_ROWS - 12, d_uv_rows[0].shape[1]), jnp.float32)
        d_uv_ref[:, :] = jnp.concatenate(d_uv_rows + [pad], axis=0)

        # weight cotangents -> alpha chain (suffix = total - prefix)
        s = w * g_w * in_list
        prefix = pbuf[:, :] + _cumsum_incl_lanes(s)
        suffix = tot - prefix

        inv_om = 1.0 / jnp.maximum(one_minus, 1.0 - ALPHA_CLAMP)
        g_alpha = contrib * (t_excl * g_w * in_list - suffix * inv_om)
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
        n_rest = attrs_ref.shape[0] - 6
        d_attrs_ref[:, :] = jnp.concatenate(
            [dq, jnp.zeros((n_rest, dq.shape[1]), dq.dtype)], axis=0)

        pbuf[:, :] = prefix[:, -1:]


# ------------------------------------------------------------- host side

def _m_pad(m: int) -> int:
    return -(-(4 * m) // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def mlist_pairs(attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
                n_live, n_tiles: int, chunk: int, m: int):
    """-> (T, 4m padded, PIX) slot blocks: rows 4k..4k+3 = [w, u, v, s].

    n_live: () int32 dynamic grid bound (PairList.n_live_chunks) or None
    for the full static chunk sweep (see pallas_raster._grid_dim)."""
    return _mlist_fwd_call(attrs, uv_rows, chunk_tile_safe, chunk_flags,
                           cam_consts, n_live, n_tiles, chunk, m)


def _mlist_fwd_call(attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
                    n_live, n_tiles, chunk, m):
    a_dim, total = attrs.shape
    n_chunks = total // chunk
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
        out_specs=pl.BlockSpec((1, mp, PIX), lambda i, ct, fl: (ct[i], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, m=m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, mp, PIX), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(chunk_tile_safe, chunk_flags, cam_consts, attrs, uv_rows)


def _mlist_fwd(attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
               n_live, n_tiles, chunk, m):
    blk = _mlist_fwd_call(attrs, uv_rows, chunk_tile_safe, chunk_flags,
                          cam_consts, n_live, n_tiles, chunk, m)
    return blk, (attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts,
                 n_live, blk)


def _mlist_bwd(n_tiles, chunk, m, res, g_blk):
    (attrs, uv_rows, chunk_tile_safe, chunk_flags, cam_consts, n_live,
     fwd_blk) = res
    a_dim, total = attrs.shape
    n_chunks = total // chunk
    mp = _m_pad(m)

    tile_spec = pl.BlockSpec((1, mp, PIX), lambda i, ct, fl: (ct[i], 0, 0),
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
            tile_spec, tile_spec,
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
        ],
    )
    d_attrs, d_uv = pl.pallas_call(
        functools.partial(_bwd_kernel, m=m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((a_dim, total), jnp.float32),
            jax.ShapeDtypeStruct((U_ROWS, total), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(chunk_tile_safe, chunk_flags, cam_consts, attrs, uv_rows, fwd_blk,
      g_blk)
    mask = _live_slot_mask(total, chunk, n_live, d_attrs)
    if mask is not None:
        d_attrs = d_attrs * mask
        d_uv = d_uv * mask
    return (d_attrs, d_uv, None, None, None, None)


mlist_pairs.defvjp(_mlist_fwd, _mlist_bwd)


def mlist_pallas(attrs, uv_rows_t, pairs: PairList, camera, chunk: int,
                 m: int, height: int = None, row_offset=None):
    """Drop-in replacement for uvtex_raster.mlist_scan.

    uv_rows_t: (U_ROWS, cap) transposed uv table.  Returns (T, PIX, M, 4).
    """
    from texgs.kernels.uvtex_raster import ray_constants

    gy, gx = grid_shape(camera.height if height is None else height,
                        camera.width)
    n_tiles = gy * gx

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

    blk = mlist_pairs(attrs, uv_rows_t, safe, flags, cam_consts,
                      pairs.n_live_chunks, n_tiles, chunk, m)
    mp = _m_pad(m)
    visited = pairs.tile_counts > 0
    blk = jnp.where(visited[:, None, None], blk, 0.0)
    # (T, 4m, PIX) -> (T, PIX, M, 4)
    lists = blk[:, :4 * m, :].reshape(n_tiles, m, 4, PIX)
    return lists.transpose(0, 3, 1, 2)
