"""Plain functional MLPs (the tiny-cuda-nn FullyFusedMLP replacement).

The reference builds 128-wide ReLU MLPs with tcnn
(/root/reference/models/modules/utils.py:5-41); on TPU these few-layer
128-wide matmuls fuse perfectly under XLA, so a pure-jnp implementation is
already MXU-bound — no kernel needed (SURVEY.md §2.2).  Compute dtype is
configurable (bf16 internals mirror tcnn's fp16, outputs cast to f32 at the
call sites like the reference's .float() casts, uv_net.py:32-35).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init_mlp(key, in_dim: int, out_dim: int, n_hidden_layers: int,
             n_neurons: int) -> dict:
    """He-init MLP params: n_hidden_layers hidden ReLU layers of width
    n_neurons, linear output (matches build_nn_network,
    /root/reference/models/modules/utils.py:43-54)."""
    dims = [in_dim] + [n_neurons] * n_hidden_layers + [out_dim]
    params = {"w": [], "b": []}
    keys = jax.random.split(key, len(dims) - 1)
    for k, (d_in, d_out) in zip(keys, zip(dims[:-1], dims[1:])):
        scale = jnp.sqrt(2.0 / d_in)
        params["w"].append(jax.random.normal(k, (d_in, d_out)) * scale)
        params["b"].append(jnp.zeros((d_out,)))
    return params


def apply_mlp(params: dict, x: jnp.ndarray,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """x: (..., in_dim) -> (..., out_dim), f32 output."""
    h = x.astype(compute_dtype)
    n = len(params["w"])
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        h = h @ w.astype(compute_dtype) + b.astype(compute_dtype)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)
