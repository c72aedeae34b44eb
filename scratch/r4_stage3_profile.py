#!/usr/bin/env python
"""Round-4 stage-3 latency breakdown on the TPU chip.

Times, at the flagship shape (100k G / 800x600 / m=32 / 1024^2 / fused):
  1. stage-1 render fwd+bwd (same pairs, blend-only reference point)
  2. uvtex fused render FWD only
  3. uvtex fused render fwd+bwd (all cotangents)
  4. same but m=8 (slot-insertion share)
  5. same but tex_backend='xla' off / textile (texture-term share)
  6. full TextureGaussian3D step (bench_stage3)

Timing: dependency-chained value reads + two-point slope (NOTES.md —
block_until_ready lies on axon).
Usage: python scratch/r4_stage3_profile.py [--trace DIR]
"""
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
from texgs.render import render as s1_render
from texgs.render.uv_tex_render import uv_tex_render

N, W, H, TEX = 100_000, 800, 600, 1024
ITERS = 8


def scene():
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
    return state, cam, uvs, jac.reshape(-1, 9), tex, shs, cot


def slope_time(f, args, iters=ITERS, chain_idx=0):
    """f must return (scalar_chain, ...); we chain args[chain_idx] += 0*out"""
    out = f(*args)
    float(out)
    def run(k):
        a = list(args)
        t0 = time.time()
        for _ in range(k):
            v = f(*a)
            a[chain_idx] = a[chain_idx] + 0.0 * v
        float(v)
        return time.time() - t0
    n_small = max(iters // 4, 1)
    ts, tb = run(n_small), run(iters)
    return (tb - ts) / (iters - n_small)


def main():
    state, cam, uvs, jac, tex, shs, cot = scene()
    act = dict(xyz=state.xyz, opacity=state.get_opacity(),
               scaling=state.get_scaling(), rotation=state.get_rotation())
    feats = state.get_features()

    # 1. stage-1 render fwd+bwd
    @jax.jit
    def s1_fb(xyz, cotv):
        def loss(x):
            out = s1_render(cam, xyz=x, opacity=act["opacity"],
                            scaling=act["scaling"], rotation=act["rotation"],
                            features=feats, active_sh_degree=3,
                            bg_color=jnp.zeros(3), backend="pallas")
            return (out["render"] * cotv).sum()
        return jax.grad(loss)(xyz).sum()
    print("s1 render f+b:", slope_time(s1_fb, [act["xyz"], cot]) * 1e3, "ms",
          flush=True)

    def uv_fb(m, with_no_sh=True, grad=True, backend="fused"):
        @jax.jit
        def f(xyz, texture, cotv):
            def loss(x, t):
                out = uv_tex_render(
                    cam, xyz=x, opacity=act["opacity"],
                    scaling=act["scaling"], rotation=act["rotation"],
                    uvs=uvs, grad_uvs=jac, texture=t, shs=shs,
                    active_sh_degree=3, bg_color=jnp.zeros(3), m=m,
                    backend=backend, with_no_sh=with_no_sh)
                s = (out["render"] * cotv).sum()
                if with_no_sh:
                    s += (out["render_no_sh"] * cotv).sum()
                return s
            if grad:
                g = jax.grad(loss, argnums=(0, 1))(xyz, texture)
                return g[0].sum() + g[1].sum()
            return loss(xyz, texture)
        return f

    for label, f in [
        ("uvtex fused FWD m=32", uv_fb(32, grad=False)),
        ("uvtex fused f+b m=32", uv_fb(32)),
        ("uvtex fused f+b m=8", uv_fb(8)),
        ("uvtex fused f+b m=32 no_nosh", uv_fb(32, with_no_sh=False)),
        ("uvtex pallas2 f+b m=32", uv_fb(32, backend="pallas")),
    ]:
        try:
            dt = slope_time(f, [act["xyz"], tex, cot])
            print(f"{label}: {dt * 1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)

    if "--trace" in sys.argv:
        d = sys.argv[sys.argv.index("--trace") + 1]
        f = uv_fb(32)
        float(f(act["xyz"], tex, cot))
        jax.profiler.start_trace(d)
        for _ in range(3):
            v = f(act["xyz"], tex, cot)
        float(v)
        jax.profiler.stop_trace()
        print("trace ->", d)

    from texgs.tools.bench_stage3 import measure
    dt, aux = measure()
    print(f"full stage-3 step: {dt * 1e3:.1f} ms {aux}", flush=True)


if __name__ == "__main__":
    main()
