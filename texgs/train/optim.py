"""Functional Adam with per-leaf learning rates and surgery support.

Numerics match torch.optim.Adam(lr per group, eps=1e-15, betas=(0.9, 0.999))
— the exact optimizer the reference builds for all three stages
(/root/reference/models/gaussian3d.py:94, uv_map_gaussian3d.py:75,
texture_gaussian3d.py:112,131,141).  We keep one moment pytree mirroring the
param pytree plus a per-leaf step count, so the densifier can permute /
zero / append moment rows functionally — the TPU equivalent of the
reference's optimizer-state surgery (gaussian3d.py:185-254).

Learning rates are passed *dynamically* at each update (a pytree of scalars)
so host-side schedules never retrigger compilation.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Any     # first-moment pytree (same structure as params)
    nu: Any     # second-moment pytree
    count: Any  # per-leaf int32 step counts (same structure)


def init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    counts = jax.tree.map(lambda _: jnp.zeros((), jnp.int32), params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=counts)


def update(params, grads, state: AdamState, lrs):
    """One Adam step.  ``lrs`` is a pytree of scalar learning rates matching
    the param structure (or a single scalar)."""
    if not isinstance(lrs, (dict, list, tuple)) and not hasattr(lrs, "keys"):
        lrs = jax.tree.map(lambda _: lrs, params)

    def leaf_update(p, g, m, v, c, lr):
        c1 = c + 1
        m1 = BETA1 * m + (1 - BETA1) * g
        v1 = BETA2 * v + (1 - BETA2) * (g * g)
        t = c1.astype(p.dtype)
        m_hat = m1 / (1 - BETA1 ** t)
        v_hat = v1 / (1 - BETA2 ** t)
        p1 = p - lr * m_hat / (jnp.sqrt(v_hat) + EPS)
        return p1, m1, v1, c1

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    flat_c = treedef.flatten_up_to(state.count)
    flat_lr = treedef.flatten_up_to(lrs)

    outs = [leaf_update(p, g, m, v, c, lr) for p, g, m, v, c, lr in
            zip(flat_p, flat_g, flat_m, flat_v, flat_c, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in outs])
    new_m = treedef.unflatten([o[1] for o in outs])
    new_v = treedef.unflatten([o[2] for o in outs])
    new_c = treedef.unflatten([o[3] for o in outs])
    return new_p, AdamState(mu=new_m, nu=new_v, count=new_c)


def zero_moments(state: AdamState, key: str) -> AdamState:
    """Zero the moments of one named leaf (dict params only) — the
    replace_tensor_to_optimizer semantics used by opacity/min-scale resets."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[key] = jnp.zeros_like(mu[key])
    nu[key] = jnp.zeros_like(nu[key])
    return AdamState(mu=mu, nu=nu, count=state.count)
