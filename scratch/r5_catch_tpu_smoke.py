#!/usr/bin/env python
"""Round-5 TPU smoke of the textile catch-all: miss count must be 0 on the
bench scene, kernels must compile, and the full stage-3 step should drop
from 4.1 s to the fused-render ballpark (~0.35 s)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texgs.core.state import init_from_pcd
from texgs.data.synthetic import orbit_cameras, textured_sphere_point_cloud
from texgs.render.uv_tex_render import uv_tex_render

N, W, H, TEX = 100_000, 800, 600, 1024


def main():
    pcd = textured_sphere_point_cloud(N, seed=0)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=3)
    cam = orbit_cameras(1, radius=3.5, width=W, height=H)[0]
    xyz = state.xyz
    nrm = jnp.linalg.norm(xyz, axis=-1, keepdims=True) + 1e-9
    uvs = xyz / nrm
    eye = jnp.eye(3)[None]
    jac = ((eye - uvs[:, :, None] * uvs[:, None, :]) / nrm[:, :, None])
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(size=(6, TEX, TEX, 3)), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(N, 15, 3)) * 0.01, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
    act = dict(opacity=state.get_opacity(), scaling=state.get_scaling(),
               rotation=state.get_rotation())

    @jax.jit
    def fwd(x, t):
        out = uv_tex_render(
            cam, xyz=x, opacity=act["opacity"], scaling=act["scaling"],
            rotation=act["rotation"], uvs=uvs, grad_uvs=jac.reshape(-1, 9),
            texture=t, shs=shs, active_sh_degree=3, bg_color=jnp.zeros(3),
            m=32, backend="fused", with_no_sh=True)
        return out["render"], out["tex_miss"], out["tex_miss_total"]

    img, miss, raw = fwd(xyz, tex)
    print(f"fwd: miss={int(miss)} raw={int(raw)} "
          f"img_mean={float(img.mean()):.6f}", flush=True)

    # exact reference value for the same frame via the xla twin
    @jax.jit
    def fwd_xla(x, t):
        out = uv_tex_render(
            cam, xyz=x, opacity=act["opacity"], scaling=act["scaling"],
            rotation=act["rotation"], uvs=uvs, grad_uvs=jac.reshape(-1, 9),
            texture=t, shs=shs, active_sh_degree=3, bg_color=jnp.zeros(3),
            m=32, backend="fused", tex_backend="xla", with_no_sh=True)
        return out["render"]

    img_x = fwd_xla(xyz, tex)
    d2 = float(jnp.mean((img - img_x) ** 2))
    r2 = float(jnp.mean(img_x ** 2))
    print(f"catch divergence vs exact: mse={d2:.3e} ref={r2:.3e} "
          f"({100 * d2 / r2:.3f}%)", flush=True)

    @jax.jit
    def fb(x, t):
        def loss(xx, tt):
            out = uv_tex_render(
                cam, xyz=xx, opacity=act["opacity"], scaling=act["scaling"],
                rotation=act["rotation"], uvs=uvs,
                grad_uvs=jac.reshape(-1, 9), texture=tt, shs=shs,
                active_sh_degree=3, bg_color=jnp.zeros(3), m=32,
                backend="fused", with_no_sh=True)
            return (out["render"] * cot).sum() + \
                (out["render_no_sh"] * cot).sum()
        g = jax.grad(loss, argnums=(0, 1))(x, t)
        return g[0].sum() + g[1].sum()

    v = fb(xyz, tex)
    float(v)
    ITERS = 8

    def run(k):
        x = xyz
        t0 = time.time()
        for _ in range(k):
            vv = fb(x, tex)
            x = x + 0.0 * vv
        float(vv)
        return time.time() - t0

    n_small = max(ITERS // 4, 1)
    ts, tb = run(n_small), run(ITERS)
    print(f"uvtex fused f+b m=32 (catch): "
          f"{(tb - ts) / (ITERS - n_small) * 1e3:.1f} ms", flush=True)

    from texgs.tools.bench_stage3 import measure
    dt, aux = measure()
    print(f"full stage-3 step: {dt * 1e3:.1f} ms {aux}", flush=True)


if __name__ == "__main__":
    main()
