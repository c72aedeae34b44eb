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


def apply_uv_net_with_jac(params: dict, cfg: Cfg, xyz: jnp.ndarray,
                          geo_emb: jnp.ndarray):
    """One pass -> (uvs (N, 3), duv/dxyz (N, 3, 3)).

    Hand-rolled forward-mode through the MLP chain, replacing
    ``jax.linearize`` + 3 basis pushes: the linearize JVP graph SIGILLs
    the TPU compiler's fusion cost model at production scale
    (TpuPriorityFusionQueue::NormalizedComputationCost, NOTES.md round 3),
    and the explicit tangent matmuls below are the same math with plain
    dots.  Semantics match ``_uvs_and_jac``'s linearize exactly:

      * ``uvs`` comes from the shared primal pass and stays differentiable
        in ``params``/``geo_emb``;
      * the jacobian path sees stop-gradient weights and masks, so no
        cotangent flows through it (callers stop-grad the result anyway);
      * ReLU tangent mask is ``h > 0`` (JAX's relu JVP convention).

    MLP-only (the reference's UVNet config has no hash grid,
    /root/reference/configs/texture_gaussian3d.yaml uv_net_cfg)."""
    assert not cfg.pre_mlp_cfg.hash_grid_cfg, \
        "hand-rolled UV jacobian supports the MLP-only UVNet"
    sg = jax.lax.stop_gradient
    n_pts = xyz.shape[0]
    x = xyz
    T = jnp.broadcast_to(jnp.eye(3, dtype=xyz.dtype)[:, None, :],
                         (3, n_pts, 3))             # (tangent j, N, in)
    if cfg.xyz_offset and cfg.xyz_scale:
        scale = jnp.asarray(cfg.xyz_scale)
        x = (x - jnp.asarray(cfg.xyz_offset)) / scale
        T = T / scale

    def mlp_fwd(p, h, Th):
        n = len(p["w"])
        for i, (w, b) in enumerate(zip(p["w"], p["b"])):
            h = h @ w + b
            Th = Th @ sg(w)
            if i < n - 1:
                m = sg(h > 0).astype(h.dtype)
                h = jax.nn.relu(h)
                Th = Th * m[None]
        return h, Th

    h, T = mlp_fwd(params["pre_mlp"], x, T)
    pre = h + geo_emb[None, :]
    m = sg(pre > 0).astype(h.dtype)
    h = jax.nn.relu(pre)
    T = T * m[None]
    o, To = mlp_fwd(params["mlp"], h, T)

    norm = jnp.linalg.norm(o, axis=-1, keepdims=True)
    denom = norm + 1e-12
    uvs = o / denom
    o_sg = sg(o)
    n_sg = sg(norm)
    d_sg = n_sg + 1e-12
    # d(o / (|o| + eps)) t = t/denom - o (o.t) / (|o| denom^2)
    ot = jnp.sum(o_sg[None] * To, axis=-1, keepdims=True)
    Tuv = (To / d_sg[None]
           - o_sg[None] * ot / (jnp.maximum(n_sg, 1e-12) * d_sg * d_sg)[None])
    jac = jnp.moveaxis(Tuv, 0, -1)                  # (N, out 3, in 3)
    return uvs, sg(jac)


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
