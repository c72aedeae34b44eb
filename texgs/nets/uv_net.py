"""UVNet / InvUVNet: the S² UV-mapping networks, functional JAX.

Architecture parity with /root/reference/models/modules/uv_net.py:
  UVNet:    pre_mlp(3 -> emb) -> relu(x + geo_emb) -> mlp(emb -> 3)
            -> L2-normalize  (output on the unit sphere)
  InvUVNet: [hashgrid(uv/2+0.5) ->] pre_mlp -> relu(x + geo_emb)
            -> mlp(emb -> 3), optional xyz offset/scale denormalization
plus the uniform-sphere `sample` and directional-cap `patch_sample`
helpers (uv_net.py:49-68).

Params are plain pytrees; `init_*` consume the same config dicts as the
reference YAML (emb_dim, pre_mlp_cfg, mlp_cfg incl. hash_grid_cfg).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from texgs.config import Cfg
from texgs.nets.hashgrid import apply_hashgrid, init_hashgrid
from texgs.nets.mlp import apply_mlp, init_mlp


def _maybe(cfg, key, default=None):
    v = cfg[key] if key in cfg else None
    return v if v else default


def init_uv_net(key, cfg: Cfg) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    emb = int(cfg.emb_dim)
    params = {}
    if cfg.pre_mlp_cfg.hash_grid_cfg:
        hg = cfg.pre_mlp_cfg.hash_grid_cfg
        params["hashgrid"] = init_hashgrid(
            k3, int(hg.n_levels), int(hg.n_features_per_level),
            int(hg.max_hashmap))
        pre_in = int(hg.n_levels) * int(hg.n_features_per_level)
    else:
        pre_in = 3
    params["pre_mlp"] = init_mlp(k1, pre_in, emb,
                                 int(cfg.pre_mlp_cfg.n_hidden_layers),
                                 int(cfg.pre_mlp_cfg.n_neurons))
    params["mlp"] = init_mlp(k2, emb, 3, int(cfg.mlp_cfg.n_hidden_layers),
                             int(cfg.mlp_cfg.n_neurons))
    return params


def apply_uv_net(params: dict, cfg: Cfg, xyz: jnp.ndarray,
                 geo_emb: jnp.ndarray) -> jnp.ndarray:
    """xyz: (N, 3) world -> (N, 3) unit-sphere UV."""
    x = xyz
    if cfg.xyz_offset and cfg.xyz_scale:
        x = (x - jnp.asarray(cfg.xyz_offset)) / jnp.asarray(cfg.xyz_scale)
    if cfg.pre_mlp_cfg.hash_grid_cfg:
        aabb_min = jnp.asarray(cfg.aabb_min)
        aabb_max = jnp.asarray(cfg.aabb_max)
        x = (x - aabb_min) / (aabb_max - aabb_min)
        h = apply_hashgrid(params["hashgrid"], x)
        h = apply_mlp(params["pre_mlp"], h)
    else:
        h = apply_mlp(params["pre_mlp"], x)
    h = jax.nn.relu(h + geo_emb[None, :])
    out = apply_mlp(params["mlp"], h)
    return out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)


def init_inv_uv_net(key, cfg: Cfg) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    emb = int(cfg.emb_dim)
    params = {}
    if cfg.pre_mlp_cfg.hash_grid_cfg:
        hg = cfg.pre_mlp_cfg.hash_grid_cfg
        params["hashgrid"] = init_hashgrid(
            k3, int(hg.n_levels), int(hg.n_features_per_level),
            int(hg.max_hashmap))
        pre_in = int(hg.n_levels) * int(hg.n_features_per_level)
    else:
        pre_in = 3
    params["pre_mlp"] = init_mlp(k1, pre_in, emb,
                                 int(cfg.pre_mlp_cfg.n_hidden_layers),
                                 int(cfg.pre_mlp_cfg.n_neurons))
    params["mlp"] = init_mlp(k2, emb, 3, int(cfg.mlp_cfg.n_hidden_layers),
                             int(cfg.mlp_cfg.n_neurons))
    return params


def apply_inv_uv_net(params: dict, cfg: Cfg, uv: jnp.ndarray,
                     geo_emb: jnp.ndarray) -> jnp.ndarray:
    """uv: (N, 3) unit sphere -> (N, 3) world xyz."""
    if cfg.pre_mlp_cfg.hash_grid_cfg:
        h = apply_hashgrid(params["hashgrid"], uv / 2.0 + 0.5)
        h = apply_mlp(params["pre_mlp"], h)
    else:
        h = apply_mlp(params["pre_mlp"], uv)
    h = jax.nn.relu(h + geo_emb[None, :])
    out = apply_mlp(params["mlp"], h)
    if cfg.xyz_offset and cfg.xyz_scale:
        out = out * jnp.asarray(cfg.xyz_scale) + jnp.asarray(cfg.xyz_offset)
    return out


def sample_sphere(key, n: int) -> jnp.ndarray:
    """Uniform unit-sphere samples (uv_net.py:49-55)."""
    p = jax.random.normal(key, (n, 3))
    return p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-12)


def patch_sample_sphere(key, n: int, patch_scale: int) -> jnp.ndarray:
    """Directional-cap samples: draw n*patch_scale points, keep the n most
    aligned with a random direction (uv_net.py:57-68)."""
    k1, k2 = jax.random.split(key)
    direction = jax.random.normal(k1, (3,))
    direction = direction / (jnp.linalg.norm(direction) + 1e-12)
    points = sample_sphere(k2, n * patch_scale)
    sim = points @ direction
    _, idx = jax.lax.top_k(sim, n)
    return points[idx]
