#!/usr/bin/env python
"""m-truncation bound on the TRAINED production scene (VERDICT r4 item 2).

Loads the stage-3 checkpoint from output/prod_texture/latest, renders a
test-like view with the chunked backend at m in {8, 16, 32, 64} (with and
without the uvtex_m_tail correction) and compares to the m=128 render
(contributor counts above the trained scene's T-stop depth), reporting
PSNR of each against the reference.  Runs on the TPU chip (scan backend
is too slow at 100k G on CPU; use the fused kernel + xla texture for
exactness — textile windows are a separate approximation with their own
tests).

Usage: python scratch/r4_m_sweep_trained.py [ckpt_path]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texgs.config import Cfg, load_config
from texgs.data.synthetic import orbit_cameras
from texgs.io import checkpoint as ckpt
from texgs.nets.uv_net import apply_uv_net_with_jac
from texgs.render.uv_tex_render import uv_tex_render
from texgs.utils.metrics import psnr

CKPT = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/repo/output/prod_texture/latest/checkpoints/10000"


def main():
    sd, it = ckpt.load(CKPT)
    p = sd["params"]
    n_alive = int(p["n_alive"])
    uv_params = jax.tree.map(jnp.asarray, sd["net_state"])
    cfgd = load_config("/root/repo/configs/prod_texture.yaml")
    uv_cfg = cfgd.model_cfg.uv_net_cfg

    xyz = jnp.asarray(p["xyz"])
    alive = (jnp.arange(xyz.shape[0]) < n_alive)
    opacity = jax.nn.sigmoid(jnp.asarray(p["opacity"])) * alive[:, None]
    scaling = jnp.exp(jnp.asarray(p["scaling"]))
    rot = jnp.asarray(p["rotation"])
    rot = rot / (jnp.linalg.norm(rot, axis=-1, keepdims=True) + 1e-12)
    shs = jnp.asarray(p["shs"])
    tex = jnp.asarray(p["texture"])
    print(f"ckpt iter {it}: n_alive {n_alive}, tex {tex.shape}", flush=True)

    uvs, jacf = apply_uv_net_with_jac(uv_params["uv_net"], uv_cfg, xyz,
                                      uv_params["geo_emb"])
    jacf = jax.lax.stop_gradient(jacf.reshape(-1, 9))

    cam = orbit_cameras(7, radius=3.5, width=800, height=600, spiral=True)[3]

    def render(m, m_tail):
        out = uv_tex_render(
            cam, xyz=xyz, opacity=opacity, scaling=scaling, rotation=rot,
            uvs=uvs, grad_uvs=jacf, texture=tex, shs=shs,
            active_sh_degree=3, bg_color=jnp.zeros(3), m=m,
            backend="fused", tex_backend="xla", m_tail=m_tail)
        return jnp.clip(out["render"], 0, 1)

    f = jax.jit(render, static_argnums=(0, 1))
    ref = np.asarray(f(128, False))
    print("reference m=128 rendered", flush=True)
    for m in (8, 16, 32, 64):
        img = np.asarray(f(m, False))
        img_t = np.asarray(f(m, True))
        print(f"m={m:3d}: plain {float(psnr(jnp.asarray(img), jnp.asarray(ref)).mean()):7.2f} dB"
              f"   +tail {float(psnr(jnp.asarray(img_t), jnp.asarray(ref)).mean()):7.2f} dB",
              flush=True)

    # textile (windows + catch-all) vs the exact xla texture path on the
    # TRAINED scene at the production m: bounds the round-5 catch-all
    # divergence where it matters
    def render_textile(m):
        out = uv_tex_render(
            cam, xyz=xyz, opacity=opacity, scaling=scaling, rotation=rot,
            uvs=uvs, grad_uvs=jacf, texture=tex, shs=shs,
            active_sh_degree=3, bg_color=jnp.zeros(3), m=m,
            backend="fused", tex_backend="textile")
        return jnp.clip(out["render"], 0, 1), out["tex_miss"], \
            out["tex_miss_total"]
    ft = jax.jit(render_textile, static_argnums=(0,))
    for m in (16, 32):
        img_x = np.asarray(f(m, False))
        img_w, miss, raw = ft(m)
        print(f"textile m={m}: vs xla "
              f"{float(psnr(jnp.clip(jnp.asarray(img_w), 0, 1), jnp.asarray(img_x)).mean()):7.2f} dB"
              f"  miss={int(miss)} raw={int(raw)}", flush=True)


if __name__ == "__main__":
    main()
