"""Multiresolution hash-grid encoding (the tiny-cuda-nn HashGrid replacement).

Same scheme/hyperparameters as the reference's tcnn encoding
(/root/reference/models/modules/utils.py:6-18; configs/uv_map.yaml:35-38):
L levels x F features, 2^log2_hashmap-entry table per level, base resolution
16, per-level scale 1.447, spatial-hash with the standard primes, trilinear
interpolation.  Pure jnp: 8 corner gathers per level, differentiable into
the table for free.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PRIMES = (1, 2654435761, 805459861)
BASE_RESOLUTION = 16
PER_LEVEL_SCALE = 1.447


def init_hashgrid(key, n_levels: int, n_features_per_level: int,
                  log2_hashmap_size: int) -> dict:
    table = jax.random.uniform(
        key, (n_levels, 2 ** log2_hashmap_size, n_features_per_level),
        minval=-1e-4, maxval=1e-4)
    return {"table": table}


def _hash(ix, iy, iz, table_size: int):
    # uint32 wraparound arithmetic, as in tcnn's spatial hash
    h = ((ix.astype(jnp.uint32) * jnp.uint32(PRIMES[0]))
         ^ (iy.astype(jnp.uint32) * jnp.uint32(PRIMES[1]))
         ^ (iz.astype(jnp.uint32) * jnp.uint32(PRIMES[2])))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _indices_and_weights(x: jnp.ndarray, n_levels: int, table_size: int):
    """Corner hash indices (L*8, N) + trilinear weights (L*8, N).

    Weights are differentiable in x; indices are integer (stop-grad by
    construction)."""
    idxs, ws = [], []
    for level in range(n_levels):
        res = int(math.floor(BASE_RESOLUTION * PER_LEVEL_SCALE ** level))
        pos = x * res
        ipos = jnp.floor(pos).astype(jnp.int32)
        frac = pos - ipos
        for corner in range(8):
            dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            idxs.append(_hash(ipos[:, 0] + dx, ipos[:, 1] + dy,
                              ipos[:, 2] + dz, table_size))
            ws.append(jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                      * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                      * jnp.where(dz, frac[:, 2], 1 - frac[:, 2]))
    return jnp.stack(idxs), jnp.stack(ws)


def apply_hashgrid(params: dict, x: jnp.ndarray,
                   backend: str = "auto") -> jnp.ndarray:
    """x: (N, 3) in [0, 1] -> (N, L * F) encoded features.

    backend: 'xla' (per-corner HBM gathers), 'pallas' (VMEM-resident
    tables, lane-local gathers — texgs.nets.pallas_hashgrid), or 'auto'
    (pallas on TPU when the table shape qualifies)."""
    table = params["table"]
    n_levels, table_size, n_feat = table.shape

    if backend == "auto":
        # pallas only for real batches (tiny/vmapped-single queries would
        # pad each call to BLOCK_Q) and VMEM-sized tables (the kernel
        # unrolls table_size/128 segments and holds every level resident;
        # past 2^13 entries the unroll and the block both blow up)
        backend = ("pallas" if jax.default_backend() == "tpu"
                   and table_size % 128 == 0 and table_size <= 8192
                   and x.shape[0] >= 1024
                   else "xla")

    n = x.shape[0]
    idx, w = _indices_and_weights(x, n_levels, table_size)

    if backend == "pallas" and table_size % 128 == 0:
        from texgs.nets.pallas_hashgrid import BLOCK_Q, hash_gather
        pad = (-n) % BLOCK_Q
        idx_p = jnp.pad(idx, ((0, 0), (0, pad))) if pad else idx
        gathered = hash_gather(table, idx_p, n_levels, 8)  # (L*8, F, Np)
        gathered = gathered[..., :n]
    else:
        gathered = jnp.moveaxis(
            table[jnp.arange(n_levels).repeat(8)[:, None], idx], -1, 1)

    feats = ((gathered * w[:, None, :])
             .reshape(n_levels, 8, n_feat, n).sum(axis=1))      # (L, F, N)
    return feats.transpose(2, 0, 1).reshape(n, n_levels * n_feat)
