"""Adaptive density control, functional and capacity-padded.

Reimplements the reference's densify/clone/split/prune + reset machinery
(/root/reference/models/gaussian3d.py:180-350) without optimizer surgery:
every op is a pure function (GaussianState, AdamState, DensifyStats) ->
new pytrees at *fixed capacity*, so the training step stays jit-compiled.
Candidate rows (originals, clones, two split children) are concatenated,
validity-masked, and compacted with one stable argsort; new rows enter with
zeroed Adam moments — exactly the semantics of cat_tensors_to_optimizer /
_prune_optimizer (gaussian3d.py:185-254), expressed as gathers.

Capacity growth is the host's job: `required_capacity` predicts the
post-densify row count so the trainer can re-pad (one retrace) before
calling `densify_and_prune`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from texgs.core.state import PAD_OPACITY, GaussianState
from texgs.train.optim import AdamState
from texgs.utils.transforms import build_rotation, inverse_sigmoid

SPLIT_N = 2                  # children per split (reference N=2)
SPLIT_SCALE_SHRINK = 0.8     # child scale divisor is 0.8 * N


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyStats:
    xyz_gradient_accum: Any  # (C, 1) accumulated screen-space grad norms
    denom: Any               # (C, 1) visibility counts
    max_radii2d: Any         # (C,) max screen radius seen


def init_stats(capacity: int) -> DensifyStats:
    return DensifyStats(
        xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
        denom=jnp.zeros((capacity, 1), jnp.float32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
    )


def add_stats(stats: DensifyStats, vs_grad: jnp.ndarray, radii: jnp.ndarray,
              ) -> DensifyStats:
    """Accumulate screen-space positional gradients for visible Gaussians.

    vs_grad: (C, 2) cotangent of the NDC offset (the retain_grad analogue);
    parity with add_densification_stats (gaussian3d.py:334-336)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(vs_grad[:, :2], axis=-1, keepdims=True)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum
        + jnp.where(visible[:, None], gnorm, 0.0),
        denom=stats.denom + visible[:, None].astype(jnp.float32),
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(visible, radii.astype(jnp.float32), 0.0)),
    )


def avg_grads(stats: DensifyStats) -> jnp.ndarray:
    """(C,) mean accumulated gradient (0 where never visible)."""
    d = stats.denom[:, 0]
    return jnp.where(d > 0, stats.xyz_gradient_accum[:, 0] / jnp.maximum(d, 1), 0.0)


def reset_opacity(state: GaussianState, adam: AdamState):
    """Clamp opacities to <= 0.01 and zero the opacity Adam moments
    (gaussian3d.py:180-183)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(state.opacity), 0.01))
    alive = state.alive_mask()[:, None]
    state = state.replace(opacity=jnp.where(alive, new_op, state.opacity))
    from texgs.train import optim
    return state, optim.zero_moments(adam, "opacity")


def reset_min_scale(state: GaussianState, adam: AdamState, value: float = -20.0):
    """Force the smallest log-scale to `value` — flattens Gaussians to
    surfels (gaussian3d.py:343-350)."""
    idx = jnp.argmin(state.scaling, axis=1)
    onehot = jax.nn.one_hot(idx, 3, dtype=bool)
    alive = state.alive_mask()[:, None]
    new_scaling = jnp.where(onehot & alive, value, state.scaling)
    state = state.replace(scaling=new_scaling)
    from texgs.train import optim
    return state, optim.zero_moments(adam, "scaling")


def _rows(state: GaussianState) -> dict:
    return state.params_dict()


def _compact(groups: list[dict], adam_groups: list, valids: list[jnp.ndarray],
             capacity: int):
    """Concatenate candidate groups and keep the first `capacity` valid rows."""
    cat = {k: jnp.concatenate([g[k] for g in groups], axis=0)
           for k in groups[0]}
    valid = jnp.concatenate(valids, axis=0)
    order = jnp.argsort(~valid, stable=True)[:capacity]
    rows = {k: v[order] for k, v in cat.items()}
    n_alive = valid.sum().astype(jnp.int32)

    mu = {k: jnp.concatenate([g[0][k] for g in adam_groups], axis=0)[order]
          for k in adam_groups[0][0]}
    nu = {k: jnp.concatenate([g[1][k] for g in adam_groups], axis=0)[order]
          for k in adam_groups[0][1]}
    return rows, mu, nu, n_alive


def _state_from_rows(rows: dict, n_alive, capacity: int) -> GaussianState:
    idx = jnp.arange(capacity)
    dead = idx >= n_alive
    return GaussianState(
        xyz=rows["xyz"],
        features_dc=rows["f_dc"],
        features_rest=rows["f_rest"],
        scaling=rows["scaling"],
        rotation=jnp.where(dead[:, None], jnp.array([1.0, 0, 0, 0]),
                           rows["rotation"]),
        opacity=jnp.where(dead[:, None], PAD_OPACITY, rows["opacity"]),
        n_alive=n_alive,
    )


def _prune_mask(opacity_logit, scaling_log, radii2d, min_opacity: float,
                extent: float, max_screen_size):
    """Prune rule of densify_and_prune (gaussian3d.py:318-332).
    max_screen_size is a static Python value (None or a number)."""
    mask = jax.nn.sigmoid(opacity_logit[:, 0]) < min_opacity
    if max_screen_size:
        big_vs = radii2d > max_screen_size
        big_ws = jnp.exp(scaling_log).max(axis=1) > 0.1 * extent
        mask = mask | big_vs | big_ws
    return mask


def required_capacity(state: GaussianState, stats: DensifyStats,
                      max_grad: float, extent: float, percent_dense: float):
    """Upper bound on rows after densify (host reads this to pre-grow)."""
    alive = state.alive_mask()
    grads = avg_grads(stats)
    maxscale = jnp.exp(state.scaling).max(axis=1)
    hot = alive & (grads >= max_grad)
    n_clone = (hot & (maxscale <= percent_dense * extent)).sum()
    n_split = (hot & (maxscale > percent_dense * extent)).sum()
    return state.n_alive + n_clone + SPLIT_N * n_split


def densify_and_prune(state: GaussianState, adam: AdamState,
                      stats: DensifyStats, key: jax.Array, *,
                      max_grad: float, min_opacity: float, extent: float,
                      max_screen_size, percent_dense: float):
    """Clone + split + prune in one fused, fixed-capacity op.

    Returns (state, adam, stats, overflowed) — ``overflowed`` signals the
    host that capacity was insufficient and rows were dropped.
    """
    capacity = state.capacity
    alive = state.alive_mask()
    grads = avg_grads(stats)
    scaling_act = jnp.exp(state.scaling)
    maxscale = scaling_act.max(axis=1)

    hot = alive & (grads >= max_grad)
    clone_sel = hot & (maxscale <= percent_dense * extent)
    split_sel = hot & (maxscale > percent_dense * extent)

    orig = _rows(state)
    zeros_adam = ({k: jnp.zeros_like(v) for k, v in adam.mu.items()},
                  {k: jnp.zeros_like(v) for k, v in adam.nu.items()})

    # Split children: xyz sampled from the Gaussian, scales shrunk.
    R = build_rotation(state.rotation)
    child_scaling = jnp.log(scaling_act / (SPLIT_SCALE_SHRINK * SPLIT_N))

    def make_child(k):
        sample = jax.random.normal(k, state.xyz.shape) * scaling_act
        xyz = (R @ sample[..., None])[..., 0] + state.xyz
        child = dict(orig)
        child["xyz"] = xyz
        child["scaling"] = child_scaling
        return child

    k1, k2 = jax.random.split(key)
    child1, child2 = make_child(k1), make_child(k2)

    # Prune rule evaluated per candidate group (children have radii2d = 0).
    zero_r = jnp.zeros_like(stats.max_radii2d)
    prune_orig = _prune_mask(orig["opacity"], orig["scaling"],
                             stats.max_radii2d, min_opacity, extent,
                             max_screen_size)
    prune_clone = _prune_mask(orig["opacity"], orig["scaling"], zero_r,
                              min_opacity, extent, max_screen_size)

    def prune_child(ch):
        return _prune_mask(ch["opacity"], ch["scaling"], zero_r, min_opacity,
                           extent, max_screen_size)

    valids = [
        alive & ~split_sel & ~prune_orig,
        clone_sel & ~prune_clone,
        split_sel & ~prune_child(child1),
        split_sel & ~prune_child(child2),
    ]
    groups = [orig, orig, child1, child2]
    adam_groups = [(adam.mu, adam.nu), zeros_adam, zeros_adam, zeros_adam]

    total_valid = sum(v.sum() for v in valids)
    rows, mu, nu, n_alive = _compact(groups, adam_groups, valids, capacity)

    new_state = _state_from_rows(rows, n_alive, capacity)
    new_adam = AdamState(mu=mu, nu=nu, count=adam.count)
    new_stats = init_stats(capacity)
    overflowed = total_valid > capacity
    return new_state, new_adam, new_stats, overflowed


def opacity_prune(state: GaussianState, adam: AdamState, stats: DensifyStats,
                  min_opacity: float):
    """Standalone opacity prune (gaussian3d.py:338-341); keeps stats rows."""
    capacity = state.capacity
    alive = state.alive_mask()
    keep = alive & (jax.nn.sigmoid(state.opacity[:, 0]) >= min_opacity)
    order = jnp.argsort(~keep, stable=True)
    rows = {k: v[order] for k, v in _rows(state).items()}
    n_alive = keep.sum().astype(jnp.int32)
    new_state = _state_from_rows(rows, n_alive, capacity)
    new_adam = AdamState(
        mu={k: v[order] for k, v in adam.mu.items()},
        nu={k: v[order] for k, v in adam.nu.items()},
        count=adam.count)
    new_stats = DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum[order],
        denom=stats.denom[order],
        max_radii2d=stats.max_radii2d[order])
    return new_state, new_adam, new_stats


def grow_capacity(state: GaussianState, adam: AdamState, stats: DensifyStats,
                  new_capacity: int):
    """Host-side re-pad to a larger capacity (numpy-safe, forces a retrace)."""
    import numpy as np
    pad_n = new_capacity - state.capacity
    assert pad_n >= 0

    def pad(x, fill=0.0):
        widths = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    new_state = GaussianState(
        xyz=pad(state.xyz),
        features_dc=pad(state.features_dc),
        features_rest=pad(state.features_rest),
        scaling=pad(state.scaling, PAD_OPACITY),
        rotation=pad(state.rotation).at[state.capacity:, 0].set(1.0),
        opacity=pad(state.opacity, PAD_OPACITY),
        n_alive=state.n_alive,
    )
    new_adam = AdamState(mu={k: pad(v) for k, v in adam.mu.items()},
                         nu={k: pad(v) for k, v in adam.nu.items()},
                         count=adam.count)
    new_stats = DensifyStats(
        xyz_gradient_accum=pad(stats.xyz_gradient_accum),
        denom=pad(stats.denom),
        max_radii2d=pad(stats.max_radii2d))
    return new_state, new_adam, new_stats
