#!/usr/bin/env python
"""Headline benchmark: fwd+bwd rasterization throughput (rays/s) per chip.

Measures one full differentiable render step — SH eval, EWA projection,
tile binning, alpha-composited forward, and gradients w.r.t. every Gaussian
parameter — at production shapes (100k Gaussians, 800x600), i.e. the hot
loop of stage-1 training (SURVEY.md §3.1).

Baseline (vs_baseline denominator): the reference CUDA implementation
trains 3DGS-class models at ~12 it/s at 800x600 on the RTX 2080 Ti cited
in its README (qualitative "real-time" claim; no numeric tables exist —
BASELINE.md), i.e. ~5.8M rays/s fwd+bwd.  BASELINE.json's target is >=2x
that per chip (vs_baseline >= 2.0).

Prints exactly one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

N_GAUSS = int(os.environ.get("BENCH_N", 100_000))
WIDTH = int(os.environ.get("BENCH_W", 800))
HEIGHT = int(os.environ.get("BENCH_H", 600))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
BACKEND = os.environ.get("BENCH_BACKEND", "")  # default: best available
BASELINE_RAYS_PER_S = 12.0 * 800 * 600  # ~5.8e6, see module docstring


def _run_bench(backend):
    import jax
    import jax.numpy as jnp

    from texgs.core.state import init_from_pcd
    from texgs.data.synthetic import blob_point_cloud, orbit_cameras
    from texgs.render import render

    pcd = blob_point_cloud(N_GAUSS, seed=0)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=3)
    cam = orbit_cameras(1, radius=3.5, width=WIDTH, height=HEIGHT)[0]
    target = jnp.zeros((3, HEIGHT, WIDTH))

    # NB: `target` is a jit ARGUMENT — large closure-captured device
    # arrays get corrupted when baked into big programs on the axon
    # platform (NOTES.md)
    @jax.jit
    def step(params, target):
        def loss_fn(p):
            out = render(cam, xyz=p["xyz"],
                         opacity=jax.nn.sigmoid(p["opacity"]),
                         scaling=jnp.exp(p["scaling"]),
                         rotation=p["rotation"] / (jnp.linalg.norm(
                             p["rotation"], axis=-1, keepdims=True) + 1e-12),
                         features=jnp.concatenate([p["f_dc"], p["f_rest"]], 1),
                         active_sh_degree=3, bg_color=jnp.zeros(3),
                         backend=backend)
            return (jnp.abs(out["render"] - target).mean()
                    + out["alpha"].mean() * 0.1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # dependency-chain the params so benchmark iterations serialize
        # (value-identical: + 0 * grad)
        new_params = jax.tree.map(lambda a, g: a + 0.0 * g, params, grads)
        return loss, new_params

    params = state.params_dict()

    # compile + warmup.  NB: jax.block_until_ready returns BEFORE device
    # execution completes on the axon remote platform (verified 2026-08-17)
    # — only a value read forces completion, and iterations are dependency-
    # chained so the queue cannot reorder or elide them.
    loss, _ = step(params, target)
    float(loss)

    def run(iters):
        p = params
        t0 = time.time()
        for _ in range(iters):
            loss, p = step(p, target)
        float(loss)
        return time.time() - t0

    n_small = max(ITERS // 4, 1)
    t_small = run(n_small)
    t_big = run(ITERS)
    dt = (t_big - t_small) / (ITERS - n_small)

    rays_per_s = WIDTH * HEIGHT / dt
    return {
        "metric": f"rays_per_s_fwd_bwd_{backend}",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }


def main():
    if "--verify" in sys.argv:
        # kernel-vs-twin allclose with the kernels compiled on the current
        # backend (texgs.tools.verify_compiled) instead of the throughput run
        from texgs.tools.verify_compiled import main as verify_main
        raise SystemExit(verify_main())

    # Always emit exactly one JSON line, degrading through backends if a
    # compile/runtime failure occurs (e.g. no TPU available).
    import traceback

    import jax

    default = BACKEND or ("pallas" if jax.default_backend() == "tpu"
                          else "scan")
    candidates = [default] + [b for b in ("scan",) if b != default]
    last_err = None
    for backend in candidates:
        try:
            print(json.dumps(_run_bench(backend)))
            return
        except Exception as e:  # noqa: BLE001 — must still emit a line
            last_err = e
            traceback.print_exc(file=sys.stderr)
    print(json.dumps({
        "metric": "rays_per_s_fwd_bwd_failed",
        "value": 0.0,
        "unit": "rays/s",
        "vs_baseline": 0.0,
    }))
    print(f"bench failed: {last_err}", file=sys.stderr)


if __name__ == "__main__":
    main()
