#!/usr/bin/env python
"""Compiled-kernel verification on the real TPU chip.

The pytest suite exercises every Pallas kernel against its jnp twin in
interpreter mode on CPU; this script closes the remaining hole (VERDICT r1
weak #7) by running the same fwd + VJP allclose checks Mosaic-COMPILED on
the actual chip at production-representative shapes, and writing a JSON
verdict (default VERIFY_KERNELS.json at the repo root).

Checks:
  1. tile rasterizer: pallas vs scan — full render dict + input VJPs
  2. uvtex M-list:    pallas vs scan — slot lists + texture-term VJPs
  3. textile:         windowed mip kernel vs exact XLA taps — fwd + VJPs

Usage: python scripts/verify_kernels.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def _scene(n=20000, size=128, sh=2, seed=0):
    from texgs.core.state import init_from_pcd
    from texgs.data.synthetic import blob_point_cloud, orbit_cameras

    pcd = blob_point_cloud(n, seed=seed)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=sh)
    cam = orbit_cameras(1, radius=3.5, width=size, height=size)[0]
    return state, cam


def _pct_close(a, b, atol):
    a, b = np.asarray(a), np.asarray(b)
    return float((np.abs(a - b) <= atol).mean())


def check_rasterizer():
    """pallas vs scan blend: image/alpha + VJPs w.r.t. xyz/opacity/f_dc."""
    from texgs.render.render import render

    state, cam = _scene()
    cot = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, cam.height, cam.width)), jnp.float32)

    def run(backend, xyz, op_raw, f_dc):
        out = render(cam, xyz=xyz, opacity=jax.nn.sigmoid(op_raw),
                     scaling=state.get_scaling(),
                     rotation=state.get_rotation(),
                     features=jnp.concatenate([f_dc, state.features_rest], 1),
                     active_sh_degree=2, bg_color=jnp.zeros(3),
                     backend=backend)
        return out["render"], out["alpha"]

    args = (state.xyz, state.opacity, state.features_dc)
    img_p, a_p = jax.jit(lambda *a: run("pallas", *a))(*args)
    img_s, a_s = jax.jit(lambda *a: run("scan", *a))(*args)

    def loss(backend):
        return jax.jit(jax.grad(
            lambda *a: jnp.sum(run(backend, *a)[0] * cot), argnums=(0, 1, 2)))
    g_p = loss("pallas")(*args)
    g_s = loss("scan")(*args)
    return {
        "fwd_image_pct_1e-4": _pct_close(img_p, img_s, 1e-4),
        "fwd_alpha_pct_1e-4": _pct_close(a_p, a_s, 1e-4),
        "vjp_xyz_pct_1e-4": _pct_close(g_p[0], g_s[0], 1e-4),
        "vjp_opacity_pct_1e-4": _pct_close(g_p[1], g_s[1], 1e-4),
        "vjp_fdc_pct_1e-4": _pct_close(g_p[2], g_s[2], 1e-4),
    }


def check_uvtex():
    """pallas vs scan M-list path through the full uvtex render + tex VJP."""
    from texgs.render.uv_tex_render import uv_tex_render

    state, cam = _scene(sh=1)
    n = state.xyz.shape[0]
    xyz = state.xyz
    uvs = xyz / (jnp.linalg.norm(xyz, axis=-1, keepdims=True) + 1e-9)

    def jac_norm(x):
        nn = jnp.linalg.norm(x)
        return (jnp.eye(3) / nn) - jnp.outer(x, x) / nn**3

    jac = jax.vmap(jac_norm)(xyz).reshape(-1, 9)
    rng = np.random.default_rng(2)
    tex = jnp.asarray(rng.uniform(size=(6, 256, 256, 3)), jnp.float32)
    shs = jnp.asarray(0.01 * rng.normal(size=(state.capacity, 3, 3)),
                      jnp.float32)
    cot = jnp.asarray(rng.normal(size=(3, cam.height, cam.width)),
                      jnp.float32)

    def run(backend, tx):
        # tex_backend pinned to the exact path: this check isolates the
        # M-list kernels (the textile path has its own check below)
        return uv_tex_render(
            cam, xyz=state.xyz, opacity=state.get_opacity(),
            scaling=state.get_scaling(), rotation=state.get_rotation(),
            uvs=uvs, grad_uvs=jac, texture=tx, shs=shs, active_sh_degree=1,
            bg_color=jnp.zeros(3), m=32, backend=backend,
            tex_backend="xla")["render"]

    img_p = jax.jit(lambda tx: run("pallas", tx))(tex)
    img_s = jax.jit(lambda tx: run("scan", tx))(tex)
    g_p = jax.jit(jax.grad(lambda tx: jnp.sum(run("pallas", tx) * cot)))(tex)
    g_s = jax.jit(jax.grad(lambda tx: jnp.sum(run("scan", tx) * cot)))(tex)
    return {
        "fwd_image_pct_1e-4": _pct_close(img_p, img_s, 1e-4),
        "vjp_texture_pct_1e-4": _pct_close(g_p, g_s, 1e-4),
    }


def check_textile():
    """windowed mip kernel vs exact XLA taps on a window-coherent scene."""
    from texgs.kernels.pallas_textile import tex_term_textile
    from texgs.kernels.uvtex_raster import mlist_tex_term

    H = W = 128
    T, PIX, M, RES = (H // 16) * (W // 16), 256, 32, 1024
    rng = np.random.default_rng(0)
    w = rng.uniform(0.01, 0.4, size=(T, PIX, M)).astype(np.float32)
    w = w * (rng.uniform(size=w.shape) < 0.6)
    c = rng.normal(size=(T, 1, 1, 3))
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    d = c + 0.003 * rng.normal(size=(T, PIX, M, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = np.where(w[..., None] > 0, d, 0.0)
    mlist = jnp.asarray(np.concatenate([w[..., None], d], -1), jnp.float32)
    tex = jnp.asarray(rng.uniform(size=(6, RES, RES, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)

    img_t, miss, _raw = jax.jit(
        lambda m, t: tex_term_textile(m, t, H, W))(mlist, tex)
    img_x = jax.jit(lambda m, t: mlist_tex_term(m, t, H, W))(mlist, tex)
    g_t = jax.jit(jax.grad(lambda m, t: jnp.sum(
        tex_term_textile(m, t, H, W)[0] * cot), argnums=(0, 1)))(mlist, tex)
    g_x = jax.jit(jax.grad(lambda m, t: jnp.sum(
        mlist_tex_term(m, t, H, W) * cot), argnums=(0, 1)))(mlist, tex)
    live = np.asarray(mlist[..., 0]) > 0
    return {
        "unserved": int(miss),
        "fwd_pct_2e-5": _pct_close(img_t, img_x, 2e-5),
        "vjp_texture_pct_3e-5": _pct_close(g_t[1], g_x[1], 3e-5),
        "vjp_mlist_live_pct_3e-5": float(
            (np.abs(np.asarray(g_t[0])[live]
                    - np.asarray(g_x[0])[live]) <= 3e-5).mean()),
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "VERIFY_KERNELS.json")
    results = {"backend": jax.default_backend()}
    for name, fn in [("rasterizer", check_rasterizer),
                     ("uvtex_mlist", check_uvtex),
                     ("textile", check_textile)]:
        try:
            results[name] = fn()
            print(name, results[name])
        except Exception as e:  # noqa: BLE001 — record, keep verifying
            results[name] = {"error": repr(e)}
            print(name, "ERROR", e)
    # verdict: every pct metric must be ~1 (tiled paths may flip isolated
    # pixels across the alpha/T-stop cutoffs — tolerate 0.5%)
    ok = all(v >= 0.995 for r in results.values() if isinstance(r, dict)
             for k, v in r.items() if k.startswith(("fwd", "vjp")))
    ok = ok and all("error" not in r for r in results.values()
                    if isinstance(r, dict))
    results["allclose_ok"] = bool(ok)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"verify_kernels": results["allclose_ok"],
                      "path": out_path}))


if __name__ == "__main__":
    main()
