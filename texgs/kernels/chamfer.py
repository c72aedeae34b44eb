"""Chamfer distance + farthest-point sampling (the pytorch3d replacement).

Used by stage 2 (chamfer/patch-chamfer losses,
/root/reference/models/uv_map_gaussian3d.py:205,216) and extract_pcd's FPS
downsampling (/root/reference/extract_pcd.py:17-20).  Blocked pairwise
distances keep peak memory bounded and run as MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _min_dists_sq(a: jnp.ndarray, b: jnp.ndarray,
                  block: int = 4096) -> jnp.ndarray:
    """Per-point-in-a squared distance to its nearest neighbour in b."""
    b_sq = (b * b).sum(-1)
    n = a.shape[0]
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))

    def one(i):
        q = jax.lax.dynamic_slice_in_dim(a_pad, i * block, block)
        d2 = ((q * q).sum(-1)[:, None] - 2.0 * q @ b.T + b_sq[None, :])
        return d2.min(axis=1)

    d = jax.lax.map(one, jnp.arange(n_blocks)).reshape(-1)[:n]
    return jnp.maximum(d, 0.0)


def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray,
                     single_directional: bool = False) -> jnp.ndarray:
    """Mean squared nearest-neighbour distance, pytorch3d semantics:
    bidirectional returns mean_x + mean_y (chamfer_distance returns the sum
    of the two directional means); single_directional only x->y."""
    d_xy = _min_dists_sq(x, y).mean()
    if single_directional:
        return d_xy
    d_yx = _min_dists_sq(y, x).mean()
    return d_xy + d_yx


def farthest_point_sampling(points: jnp.ndarray, k: int,
                            key=None) -> jnp.ndarray:
    """Indices of k farthest-point samples (pytorch3d sample_farthest_points
    equivalent; deterministic start at index 0 unless a key is given)."""
    n = points.shape[0]
    start = (0 if key is None
             else int(jax.random.randint(key, (), 0, n)))

    def body(carry, _):
        min_d2, last_idx = carry
        last = points[last_idx]
        d2 = ((points - last[None, :]) ** 2).sum(-1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        return (min_d2, nxt), last_idx

    init = (jnp.full((n,), jnp.inf), jnp.asarray(start, jnp.int32))
    (_, _), idx = jax.lax.scan(body, init, None, length=k)
    return idx
