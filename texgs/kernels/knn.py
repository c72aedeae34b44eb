"""Brute-force KNN utilities (init-time only).

Replaces `simple-knn`'s distCUDA2 (used at
/root/reference/models/gaussian3d.py:63 for the initial log-scales): mean
squared distance from each point to its 3 nearest neighbours.  Blocked
pairwise distances keep peak memory at block_size x N; the distance matrix
is one big matmul so it rides the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_sq_dist_3nn(points: jnp.ndarray, block_size: int = 1024) -> jnp.ndarray:
    """points: (N, 3) -> (N,) mean of squared distances to the 3 NN."""
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    if n <= 4:
        # Degenerate tiny clouds: pairwise with self-exclusion.
        d2 = _pairwise_sq_dist(points, points)
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        k = min(3, n - 1)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return (-neg_top).mean(axis=-1)

    n_blocks = -(-n // block_size)
    padded = jnp.pad(points, ((0, n_blocks * block_size - n), (0, 0)),
                     constant_values=jnp.inf)
    sq_norms = (points * points).sum(-1)

    def one_block(i):
        q = jax.lax.dynamic_slice_in_dim(padded, i * block_size, block_size)
        d2 = ((q * q).sum(-1)[:, None] - 2.0 * q @ points.T + sq_norms[None, :])
        # Exclude self-distance (the zero diagonal entry) by taking 4 NN.
        neg_top, _ = jax.lax.top_k(-d2, 4)
        return (-neg_top[:, 1:4])

    d2_blocks = jax.lax.map(one_block, jnp.arange(n_blocks))
    d2 = d2_blocks.reshape(-1, 3)[:n]
    return jnp.maximum(d2, 0.0).mean(axis=-1)


def _pairwise_sq_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a * a).sum(-1)[:, None] - 2.0 * a @ b.T + (b * b).sum(-1)[None, :])
