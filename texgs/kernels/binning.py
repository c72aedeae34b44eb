"""Tile binning: Gaussian -> (tile, depth)-sorted pair lists, chunk-aligned.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys + radix
sort + tile-range stage (the `diff_gauss` internals summarized in SURVEY.md
§2.2).  Instead of per-tile GPU work queues we build, entirely with jnp
sorts/gathers under static shapes:

  1. pair expansion  — every visible Gaussian emits one pair per covered
     16x16 tile (tile_rect, identical rule to the oracle), into a static
     ``pair_cap`` buffer;
  2. (tile, depth) order — Gaussians are depth-ranked once (small sort);
     pairs then sort by a single int32 key ``tile * N + depth_rank`` when it
     fits (exactly equivalent to the CUDA 64-bit radix key), falling back to
     two stable argsorts otherwise;
  3. chunk alignment — each tile's pair run is padded to a multiple of
     ``chunk`` so the rasterizer can run a flat grid over fixed-size chunks
     (one Pallas program per chunk, tiles never straddle mid-chunk);
  4. per-chunk metadata — chunk -> tile id and first-chunk-of-tile flags,
     consumed as scalar-prefetch arrays by the Pallas kernel.

Performance notes (TPU v5e measurements): XLA sorts are cheap (~4ms/400k)
but per-element *gathers* and many-query searchsorted are not — so all
per-pair lookups are packed into row-gathers of small tables, slot->interval
mapping is a scatter+cumsum instead of binary search, and the padded-layout
indirection is a single gather of a per-tile shift table.

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
    n_live_chunks: jnp.ndarray  # () int32: chunks [0, n_live) are live, the
    #                             rest are the static-cap dead tail (the
    #                             padded layout is dense: every live chunk
    #                             precedes every dead one).  Pallas kernels
    #                             use this as a dynamic grid bound on TPU.

    @property
    def n_chunks(self) -> int:
        return self.chunk_tile.shape[0]


def grid_shape(height: int, width: int) -> tuple[int, int]:
    return (-(-height // TILE), -(-width // TILE))


def padded_cap(pair_cap: int, height: int, width: int, chunk: int) -> int:
    gy, gx = grid_shape(height, width)
    cap = pair_cap + gy * gx * chunk
    return -(-cap // chunk) * chunk


def _interval_index(starts: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """For consecutive integer slots 0..n_slots-1 and a sorted array of
    interval start offsets, return per-slot the index of the last interval
    with start <= slot (== searchsorted(starts, slot, 'right') - 1, but via
    scatter + cumsum, which is far cheaper than per-query binary search)."""
    marks = jnp.zeros((n_slots,), jnp.int32).at[
        jnp.clip(starts, 0, n_slots - 1)].add(
            jnp.where(starts < n_slots, 1, 0).astype(jnp.int32))
    return jnp.cumsum(marks) - 1


# Stage-5 layout strategy used when build_pairs is called without an
# explicit choice (i.e. by every production call site).  Flip after the
# on-chip timing (scratch/r2_perf.py) picks a winner.
SCATTER_LAYOUT_DEFAULT = False


def build_pairs(means2d: jnp.ndarray, depths: jnp.ndarray, radii: jnp.ndarray,
                height: int, width: int, pair_cap: int, chunk: int,
                scatter_layout: bool | None = None) -> PairList:
    """Build the sorted, chunk-aligned pair list.

    means2d/depths/radii: per-Gaussian projection results (capacity-sized;
    dead entries have radius 0).  ``pair_cap`` bounds true pairs (overflow
    drops the deepest-expansion pairs and sets ``overflowed``).

    scatter_layout (None = SCATTER_LAYOUT_DEFAULT): build stage 5 (the
    padded chunk-aligned layout) by scattering the pair_cap sorted pairs
    to their padded slots instead of gathering each padded slot's source —
    fewer per-element ops when the tile-padding overhead is large
    (NOTES.md round-2 item 3); results are identical (tests assert
    equality).
    """
    if scatter_layout is None:
        scatter_layout = SCATTER_LAYOUT_DEFAULT
    means2d = jax.lax.stop_gradient(means2d)
    depths = jax.lax.stop_gradient(depths)

    n = means2d.shape[0]
    gy, gx = grid_shape(height, width)
    n_tiles = gy * gx

    xmin, xmax, ymin, ymax = tile_rect(means2d, radii, width, height)
    visible = radii > 0
    rect_w = xmax - xmin
    ntiles_per_g = jnp.where(visible, rect_w * (ymax - ymin), 0)

    offs = jnp.cumsum(ntiles_per_g) - ntiles_per_g  # exclusive prefix sum
    total = offs[-1] + ntiles_per_g[-1]

    # Depth rank per gaussian (dead ones rank last).  One small sort.
    depth_key = jnp.where(visible, depths, jnp.inf)
    order_g = jnp.argsort(depth_key)
    rank = jnp.zeros((n,), jnp.int32).at[order_g].set(
        jnp.arange(n, dtype=jnp.int32))

    # Packed per-gaussian lookup table for the expansion row-gather.
    g_table = jnp.stack([offs, xmin, ymin, jnp.maximum(rect_w, 1), rank],
                        axis=1)  # (N, 5) int32

    # slot -> gaussian: last g with offs[g] <= slot (scatter + cumsum).
    slots = jnp.arange(pair_cap, dtype=jnp.int32)
    g = jnp.clip(_interval_index(offs, pair_cap), 0, n - 1)
    rows = g_table[g]  # (pair_cap, 5) single row-gather
    local = slots - rows[:, 0]
    valid = slots < total
    w_g = rows[:, 3]
    ty = rows[:, 2] + local // w_g
    tx = rows[:, 1] + local % w_g
    tile = jnp.where(valid, ty * gx + tx, n_tiles).astype(jnp.int32)

    # (tile, depth) ordering.  Within a tile, depth order with ties broken by
    # gaussian index == depth-rank order, so a single int32 key sort is exact
    # when tile * n fits; otherwise two stable sorts (same result).
    if (n_tiles + 1) * n < 2 ** 31:
        key = jnp.where(valid, tile * n + rows[:, 4], jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(key)
    else:
        dk = jnp.where(valid, depths[g], jnp.inf)
        order_d = jnp.argsort(dk, stable=True)
        order = order_d[jnp.argsort(tile[order_d], stable=True)]

    pair_tg = jnp.stack([tile, jnp.where(valid, g, -1)], axis=1)
    sorted_tg = pair_tg[order]  # (pair_cap, 2) row-gather
    sorted_tile = sorted_tg[:, 0]
    sorted_g = sorted_tg[:, 1]

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    # Chunk-aligned layout: tile t occupies padded_starts[t] ... + pc[t].
    pc = -(-counts // chunk) * chunk
    padded_starts = jnp.cumsum(pc) - pc
    cap = padded_cap(pair_cap, height, width, chunk)
    n_chunks = cap // chunk

    # Chunks never straddle tiles, so every per-slot map is constant within
    # a chunk: resolve tile / shift / count at CHUNK granularity (a few
    # thousand entries) and broadcast — the only slot-level op left is the
    # one unavoidable source gather.
    cstart = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    ct = jnp.searchsorted(padded_starts, cstart, side="right").astype(jnp.int32) - 1
    ct = jnp.clip(ct, 0, n_tiles - 1)
    chunk_live = cstart < padded_starts[ct] + pc[ct]
    chunk_tile = jnp.where(chunk_live, ct, -1)
    chunk_first = chunk_live & (cstart == padded_starts[ct])

    t_table = jnp.stack([starts - padded_starts, counts + padded_starts],
                        axis=1)  # (n_tiles, 2): [src shift, valid end]
    trows_c = t_table[ct]  # (n_chunks, 2) tiny row-gather

    def bcast(col):
        # broadcast+reshape, NOT jnp.repeat (which lowers to a gather)
        return jnp.broadcast_to(col[:, None], (n_chunks, chunk)).reshape(cap)

    pslots = jnp.arange(cap, dtype=jnp.int32)
    pvalid = (pslots < bcast(trows_c[:, 1])) & bcast(chunk_live)
    if scatter_layout:
        # forward route: sorted pair j of tile t lands at
        # padded_starts[t] + (j - starts[t]); invalid pairs park at cap
        j = jnp.arange(pair_cap, dtype=jnp.int32)
        live_pair = sorted_g >= 0
        t_j = jnp.clip(sorted_tile, 0, n_tiles - 1)
        dst = padded_starts[t_j] + (j - starts[t_j])
        dst = jnp.where(live_pair, dst, cap)
        pair_gauss = jnp.full((cap + 1,), -1, jnp.int32).at[dst].set(
            sorted_g, mode="drop")[:cap]
    else:
        src = jnp.clip(pslots + bcast(trows_c[:, 0]), 0, pair_cap - 1)
        pair_gauss = jnp.where(pvalid, sorted_g[src], -1)
    pair_tile = jnp.where(pvalid, bcast(ct), n_tiles)

    return PairList(
        pair_gauss=pair_gauss,
        pair_tile=pair_tile,
        pair_valid=pvalid,
        chunk_tile=chunk_tile,
        chunk_first=chunk_first,
        tile_counts=counts,
        n_pairs=total,
        overflowed=total > pair_cap,
        n_live_chunks=jnp.minimum(
            (padded_starts[-1] + pc[-1]) // chunk, n_chunks
        ).astype(jnp.int32),
    )
