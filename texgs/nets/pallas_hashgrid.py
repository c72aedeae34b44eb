"""Pallas hash-table gather for the multiresolution hash-grid encoding.

The XLA path (texgs.nets.hashgrid.apply_hashgrid) resolves L levels x 8
trilinear corners as per-element HBM gathers — latency-bound on TPU
(~6-11 ns per gathered row, NOTES.md), i.e. ~4 ms for 8k queries at the
uv_map config.  The tables are tiny (L x 2^12 x F = 512 KB), so this
kernel keeps ALL levels resident in VMEM and resolves every corner with
lane-local ops: per (8, 128) request block it loops the 32 table segments,
broadcasts each 128-lane segment row, lane-gathers (take_along_axis, a
single-vreg op — the validated pallas_textile pattern) and masks by
segment ownership.  No HBM round-trips per request.

Scope: the kernel is a pure *gather* — corner indices and trilinear
weights stay in XLA (cheap elementwise, and autodiff w.r.t. the query
positions then works unchanged).  The custom VJP scatters cotangents back
to the table with one deterministic XLA scatter-add per corner (the same
cost autodiff of the XLA twin pays).  tiny-cuda-nn parity note: tcnn's
HashGrid kernel fuses hash+interp+accumulate in CUDA
(/root/reference/models/modules/utils.py:5-41); here the hot part on TPU
is exclusively the gather, so that is what the kernel owns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from texgs.kernels.pallas_raster import _interpret

SEG = 128           # lanes per table segment
BLOCK_Q = 1024      # queries per program: an (8, 128) request block


def _gather_kernel(table_ref, idx_ref, out_ref, *, n_lc, n_feat, n_seg):
    """table_ref: (n_lc/8 levels * F * n_seg, SEG); idx_ref: (n_lc, 8, 128);
    out_ref: (n_lc * F, 8, 128)."""
    levels = table_ref.shape[0] // (n_feat * n_seg)
    corners_per_level = n_lc // levels
    for lc in range(n_lc):
        level = lc // corners_per_level
        q = idx_ref[lc]                       # (8, 128) int32 in [0, 4096)
        seg_of = q >> 7
        lane = q & (SEG - 1)
        accs = [jnp.zeros((8, SEG), jnp.float32) for _ in range(n_feat)]
        for s in range(n_seg):
            hit = (seg_of == s).astype(jnp.float32)
            for f in range(n_feat):
                row = jnp.broadcast_to(
                    table_ref[(level * n_feat + f) * n_seg + s:
                              (level * n_feat + f) * n_seg + s + 1, :],
                    (8, SEG))
                g = jnp.take_along_axis(row, lane, axis=1)
                accs[f] = accs[f] + hit * g
        for f in range(n_feat):
            out_ref[lc * n_feat + f] = accs[f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_gather(table: jnp.ndarray, idx: jnp.ndarray, n_levels: int,
                n_corners: int):
    """table: (L, T, F) with T = n_seg * 128; idx: (L * n_corners, N) int32.
    Returns gathered features (L * n_corners, F, N) f32."""
    return _gather_call(table, idx, n_levels, n_corners)


def _gather_call(table, idx, n_levels, n_corners):
    l, t_size, n_feat = table.shape
    assert l == n_levels and t_size % SEG == 0
    n_seg = t_size // SEG
    n_lc, n = idx.shape
    assert n_lc == n_levels * n_corners and n % BLOCK_Q == 0
    nb = n // SEG
    # (L, T, F) -> (L * F * n_seg, SEG): row (l, f, s) = table[l, s*128:(s+1)*128, f]
    packed = table.transpose(0, 2, 1).reshape(l * n_feat * n_seg, SEG)
    idx3 = idx.reshape(n_lc, nb, SEG)

    out = pl.pallas_call(
        functools.partial(_gather_kernel, n_lc=n_lc, n_feat=n_feat,
                          n_seg=n_seg),
        grid=(nb // 8,),
        in_specs=[
            pl.BlockSpec((l * n_feat * n_seg, SEG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_lc, 8, SEG), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_lc * n_feat, 8, SEG), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_lc * n_feat, nb, SEG), jnp.float32),
        interpret=_interpret(),
    )(packed, idx3)
    return out.reshape(n_lc, n_feat, n)


def _gather_fwd(table, idx, n_levels, n_corners):
    return _gather_call(table, idx, n_levels, n_corners), (idx, table.shape)


def _gather_bwd(n_levels, n_corners, res, g):
    idx, tshape = res
    l, t_size, n_feat = tshape
    corners = n_corners
    # deterministic scatter-add per level (XLA; same cost as the twin's VJP)
    g = g.reshape(l, corners, n_feat, -1)            # (L, C, F, N)
    idx = idx.reshape(l, corners, -1)                # (L, C, N)
    d_table = jnp.zeros(tshape, g.dtype)
    d_table = d_table.at[
        jnp.arange(l)[:, None, None], idx, :].add(
            jnp.moveaxis(g, 2, 3))                   # (L, C, N, F) adds
    return (d_table, None)


hash_gather.defvjp(_gather_fwd, _gather_bwd)
