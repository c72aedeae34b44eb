#!/usr/bin/env python
"""Round-5: localize the stage-3 step's 3.7 s that is NOT the fused render.

r4_stage3_profile showed: fused uvtex render fwd+bwd (cap 4096) = 353 ms,
full step = 4100 ms.  Suspects for the difference:
  a. miss_correction at the controller-grown cap (512k) — fwd AND its VJP
  b. apply_uv_net_with_jac over 100k points
  c. SSIM x2 at 800x600 + inverse-consistency loss
  d. per-step host sync (one device_get, ~0.16 s measured r4)

Times each in isolation with the NOTES.md slope rule.
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

ITERS = 8


def slope_time(f, args, iters=ITERS, chain_idx=0):
    out = f(*args)
    jax.tree.map(lambda x: float(jnp.sum(x)), out)

    def run(k):
        a = list(args)
        t0 = time.time()
        v = None
        for _ in range(k):
            v = f(*a)
            first = jax.tree.leaves(v)[0]
            a[chain_idx] = a[chain_idx] + 0.0 * jnp.sum(first).astype(
                a[chain_idx].dtype)
        jax.tree.map(lambda x: float(jnp.sum(x)), v)
        return time.time() - t0

    n_small = max(iters // 4, 1)
    ts, tb = run(n_small), run(iters)
    return (tb - ts) / (iters - n_small)


def main():
    T, PIX, M, RES = 1900, 256, 32, 1024
    H, W = 600, 800
    rng = np.random.default_rng(0)

    # ---- a. miss_correction at several caps, ~292k real misses
    from texgs.kernels.pallas_textile import miss_correction

    w = rng.uniform(0.01, 0.4, size=(T, PIX, M)).astype(np.float32)
    d = rng.normal(size=(T, PIX, M, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    mlist = jnp.asarray(np.concatenate([w[..., None], d], -1), jnp.float32)
    tex = jnp.asarray(rng.uniform(size=(6, RES, RES, 3)), jnp.float32)
    # lattice of misses: (T, 2M, 128) bools, ~292k scattered true
    lat = np.zeros((T, 2 * M, 128), bool)
    n_miss = 292_000
    ids = rng.choice(T * 2 * M * 128, size=n_miss, replace=False)
    lat.reshape(-1)[ids] = True
    miss = jnp.asarray(lat)
    cot = jnp.asarray(rng.normal(size=(T, 3, PIX)), jnp.float32)

    for cap in (4096, 65536, 524288):
        f_fwd = jax.jit(lambda ml, tx, ms: miss_correction(
            ml, tx, ms, cap, "bilinear")[0])
        dt = slope_time(f_fwd, [mlist, tex, miss])
        print(f"miss_correction FWD cap={cap}: {dt*1e3:.1f} ms", flush=True)

        def loss(ml, tx, ms):
            out, _ = miss_correction(ml, tx, ms, cap, "bilinear")
            return jnp.sum(out * cot)
        f_fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
        dt = slope_time(f_fb, [mlist, tex, miss])
        print(f"miss_correction F+B cap={cap}: {dt*1e3:.1f} ms", flush=True)

    # ---- b. uv_net + jacobian over 100k points
    from texgs.config import load_config
    from texgs.nets.uv_net import apply_uv_net_with_jac, init_uv_net

    cfg = load_config("/root/repo/configs/prod_texture.yaml")
    uv_cfg = cfg.model_cfg.uv_net_cfg
    params = init_uv_net(jax.random.PRNGKey(0), uv_cfg)
    geo = jax.random.normal(jax.random.PRNGKey(1), (128,))
    xyz = jnp.asarray(rng.normal(size=(100_000, 3)), jnp.float32)

    f_jac = jax.jit(lambda x: apply_uv_net_with_jac(params, uv_cfg, x, geo))
    dt = slope_time(f_jac, [xyz])
    print(f"uv_net+jac 100k FWD: {dt*1e3:.1f} ms", flush=True)

    cot_uv = jnp.asarray(rng.normal(size=(100_000, 3)), jnp.float32)
    cot_j = jnp.asarray(rng.normal(size=(100_000, 3, 3)), jnp.float32)

    def jl(x):
        uv, jacm = apply_uv_net_with_jac(params, uv_cfg, x, geo)
        return jnp.sum(uv * cot_uv) + jnp.sum(jacm * cot_j)
    f_jac_g = jax.jit(jax.grad(jl))
    dt = slope_time(f_jac_g, [xyz])
    print(f"uv_net+jac 100k F+B(x): {dt*1e3:.1f} ms", flush=True)

    # ---- c. SSIM x2 + L1 x2 at 800x600
    from texgs import losses
    img = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
    gt = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)

    def photoloss(im):
        l1 = losses.l1_loss(im, gt)
        ls = 1.0 - losses.ssim_loss(im, gt)
        l1b = losses.l1_loss(im * 0.5, gt)
        lsb = 1.0 - losses.ssim_loss(im * 0.5, gt)
        return l1 + ls + l1b + lsb
    f_pl = jax.jit(jax.grad(photoloss))
    dt = slope_time(f_pl, [img])
    print(f"2x(L1+SSIM) 800x600 F+B: {dt*1e3:.1f} ms", flush=True)

    # ---- d. host sync cost: one tiny device_get per iteration
    x = jnp.float32(1.0)
    g = jax.jit(lambda v: v * 1.0000001)
    float(g(x))
    t0 = time.time()
    k = 20
    for _ in range(k):
        x = g(x)
        float(x)
    print(f"host read cost/step: {(time.time()-t0)/k*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
