"""Tile binning: Gaussian -> (tile, depth)-sorted pair lists, chunk-aligned.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys + radix
sort + tile-range stage (the `diff_gauss` internals summarized in SURVEY.md
§2.2).  Instead of per-tile GPU linked work queues we build, entirely with
jnp sorts/gathers under static shapes:

  1. pair expansion  — every visible Gaussian emits one pair per covered
     16x16 tile (tile_rect, identical rule to the oracle), into a static
     ``pair_cap`` buffer;
  2. (tile, depth) order — two stable argsorts (by depth, then by tile)
     give the same ordering as the CUDA 64-bit key radix sort;
  3. chunk alignment — each tile's pair run is padded to a multiple of
     ``chunk`` so the rasterizer can run a flat grid over fixed-size chunks
     (one Pallas program per chunk, tiles never straddle mid-chunk);
  4. per-chunk metadata — chunk -> tile id and first-chunk-of-tile flags,
     consumed as scalar-prefetch arrays by the Pallas kernel.

Everything here is integer bookkeeping on stop-gradient inputs; gradients
flow through the separately-gathered pair *attributes*, not the indices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from texgs.kernels.reference import TILE, tile_rect


class PairList(NamedTuple):
    pair_gauss: jnp.ndarray   # (padded_cap,) int32 gaussian index per slot (-1 pad)
    pair_tile: jnp.ndarray    # (padded_cap,) int32 tile id per slot (n_tiles pad)
    pair_valid: jnp.ndarray   # (padded_cap,) bool
    chunk_tile: jnp.ndarray   # (n_chunks,) int32 tile id of each chunk (-1 pad)
    chunk_first: jnp.ndarray  # (n_chunks,) bool: first chunk of its tile
    tile_counts: jnp.ndarray  # (n_tiles,) int32 true pair count per tile
    n_pairs: jnp.ndarray      # () int32 true (unpadded, uncapped) pair count
    overflowed: jnp.ndarray   # () bool: pair_cap exceeded (pairs dropped)

    @property
    def n_chunks(self) -> int:
        return self.chunk_tile.shape[0]


def grid_shape(height: int, width: int) -> tuple[int, int]:
    return (-(-height // TILE), -(-width // TILE))


def padded_cap(pair_cap: int, height: int, width: int, chunk: int) -> int:
    gy, gx = grid_shape(height, width)
    cap = pair_cap + gy * gx * chunk
    return -(-cap // chunk) * chunk


def build_pairs(means2d: jnp.ndarray, depths: jnp.ndarray, radii: jnp.ndarray,
                height: int, width: int, pair_cap: int, chunk: int) -> PairList:
    """Build the sorted, chunk-aligned pair list.

    means2d/depths/radii: per-Gaussian projection results (capacity-sized;
    dead entries have radius 0).  ``pair_cap`` bounds true pairs (overflow
    drops the deepest-expansion pairs and sets ``overflowed``).
    """
    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)

    gy, gx = grid_shape(height, width)
    n_tiles = gy * gx

    xmin, xmax, ymin, ymax = tile_rect(means2d, radii, width, height)
    visible = radii > 0
    rect_w = (xmax - xmin)
    ntiles_per_g = jnp.where(visible, rect_w * (ymax - ymin), 0)

    offs = jnp.cumsum(ntiles_per_g) - ntiles_per_g  # exclusive prefix sum
    total = offs[-1] + ntiles_per_g[-1]

    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    g = jnp.searchsorted(offs, slots, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, means2d.shape[0] - 1)
    local = slots - offs[g]
    valid = slots < total
    w_g = jnp.maximum(rect_w[g], 1)
    ty = ymin[g] + local // w_g
    tx = xmin[g] + local % w_g
    tile = jnp.where(valid, ty * gx + tx, n_tiles).astype(jnp.int32)

    # (tile, depth) ordering via two stable sorts — equivalent to the CUDA
    # (tileID << 32 | depth) radix sort.
    depth_key = jnp.where(valid, depths[g], jnp.inf)
    order_d = jnp.argsort(depth_key, stable=True)
    order = order_d[jnp.argsort(tile[order_d], stable=True)]

    sorted_tile = tile[order]
    sorted_g = jnp.where(valid[order], g[order], -1)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    # Chunk-aligned layout: tile t occupies padded_starts[t] ... + pc[t].
    pc = -(-counts // chunk) * chunk
    padded_starts = jnp.cumsum(pc) - pc
    cap = padded_cap(pair_cap, height, width, chunk)

    pslots = jnp.arange(cap, dtype=jnp.int32)
    pt = jnp.searchsorted(padded_starts, pslots, side="right").astype(jnp.int32) - 1
    pt = jnp.clip(pt, 0, n_tiles - 1)
    in_tile = pslots - padded_starts[pt]
    pvalid = (in_tile < counts[pt]) & (pslots < padded_starts[-1] + pc[-1])
    src = jnp.clip(starts[pt] + in_tile, 0, sorted_g.shape[0] - 1)
    pair_gauss = jnp.where(pvalid, sorted_g[src], -1)
    pair_tile = jnp.where(pvalid, pt, n_tiles)

    # Per-chunk metadata.
    n_chunks = cap // chunk
    cstart = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    ct = jnp.searchsorted(padded_starts, cstart, side="right").astype(jnp.int32) - 1
    ct = jnp.clip(ct, 0, n_tiles - 1)
    chunk_live = cstart < padded_starts[ct] + pc[ct]
    chunk_tile = jnp.where(chunk_live, ct, -1)
    chunk_first = chunk_live & (cstart == padded_starts[ct])

    return PairList(
        pair_gauss=pair_gauss,
        pair_tile=pair_tile,
        pair_valid=pvalid,
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        tile_counts=counts,
        n_pairs=total,
        overflowed=total > pair_cap,
    )
