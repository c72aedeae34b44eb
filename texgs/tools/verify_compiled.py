"""On-device kernel verification: Mosaic-compiled Pallas vs the scan twin.

The pytest suite proves kernel == twin in *interpreter* mode on CPU
(tests/test_pallas_raster.py, test_uvtex_raster.py, test_textile.py); this
tool runs the same allclose checks with the kernels actually compiled on
the current backend (the real TPU chip under the axon plugin) at
production shapes, and emits one JSON verdict — the artifact VERDICT.md
round-1 weak #7 asked for.

Checks (all fwd values + every parameter cotangent, scan twin as oracle):
  raster     : 3DGS blend kernel (pallas vs scan), grads wrt
               xyz/scaling/rotation/opacity/f_dc through the full render
  uvtex      : UV-texture M-list kernel (pallas vs scan), grads incl.
               uvs and the texture cubemap, textile vs XLA texture path

Gradient tolerances are relative to the oracle gradient's max magnitude:
autodiff of cumprod(1-alpha) near the 0.99 clamp is ill-conditioned in any
implementation (NOTES.md), so per-element rtol is meaningless; the
max-relative error at 1e-3..1e-2 is the meaningful contract (same basis as
the reference's own kernel tests, SURVEY.md §4).

Usage: python bench.py --verify   (or python -m texgs.tools.verify_compiled)
Env: VERIFY_N (Gaussians, default 100000), VERIFY_W/H (800x600),
     VERIFY_TEX (cubemap res, 512).
"""

from __future__ import annotations

import json
import os

import numpy as np

REL_TOL_FWD = 1e-4    # vs output max, 99.9th percentile
REL_TOL_GRAD = 2e-2   # vs grad max, 99.9th percentile
# gross-corruption guards on the recorded MAX (ADVICE r3): loose enough to
# tolerate a borderline contribution flipping inclusion (alpha >= 1/255
# ~ 4e-3 relative; a sign-flipped max grad element ~ 1), tight enough that
# a corrupted pixel band (<0.1% of pixels, invisible to the percentile)
# still fails.
MAX_TOL_FWD = 100 * REL_TOL_FWD
MAX_TOL_GRAD = 1.0


def _rel_err(got, ref):
    """(q999, max) of |got - ref| relative to max|ref|.

    The gate is the 99.9th percentile, not the max: the sequential-stop
    semantics (alpha >= 1/255, alpha clamp 0.99, T < 1e-4 stop) make a
    handful of borderline contributions flip inclusion between any two
    f32 implementations that round differently (scan cumprod vs kernel
    log-space product; the CUDA reference has the same property), and one
    flipped contribution dominates a max-based metric while the field
    agrees to ~1e-7 everywhere else."""
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    denom = max(float(np.abs(ref).max()), 1e-12)
    err = np.abs(got - ref) / denom
    return float(np.quantile(err, 0.999)), float(err.max())


def _scene(n, width, height):
    from texgs.core.state import init_from_pcd
    from texgs.data.synthetic import blob_point_cloud, orbit_cameras

    pcd = blob_point_cloud(n, seed=0)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=2)
    cam = orbit_cameras(1, radius=3.5, width=width, height=height)[0]
    return state, cam


def verify_raster(n, width, height):
    import jax
    import jax.numpy as jnp

    from texgs.render import render

    state, cam = _scene(n, width, height)
    rng = np.random.default_rng(7)
    cot = jnp.asarray(rng.normal(size=(3, height, width)), jnp.float32)

    def loss(params, cot, backend):
        out = render(
            cam, xyz=params["xyz"],
            opacity=jax.nn.sigmoid(params["opacity"]),
            scaling=jnp.exp(params["scaling"]),
            rotation=params["rotation"] / (jnp.linalg.norm(
                params["rotation"], axis=-1, keepdims=True) + 1e-12),
            features=jnp.concatenate([params["f_dc"], params["f_rest"]], 1),
            active_sh_degree=2, bg_color=jnp.zeros(3), backend=backend)
        return (out["render"] * cot).sum(), (out["render"], out["alpha"],
                                             out["depth"], out["norm"])

    params = state.params_dict()
    results = {}
    vals, grads = {}, {}
    for backend in ("scan", "pallas"):
        f = jax.jit(jax.grad(lambda p, c: loss(p, c, backend),
                             has_aux=True))
        g, aux = f(params, cot)
        # force completion via value reads (block_until_ready lies on axon)
        grads[backend] = {k: np.asarray(v) for k, v in g.items()}
        vals[backend] = [np.asarray(a) for a in aux]

    # depth is alpha-NORMALIZED (depth/max(alpha, 1e-6)): on near-empty
    # pixels both backends emit noise-amplified quotients, so the depth
    # metric only counts covered pixels
    covered = np.asarray(vals["scan"][1]) > 1e-2
    for name, i in (("image", 0), ("alpha", 1), ("depth", 2), ("norm", 3)):
        a, b = vals["pallas"][i], vals["scan"][i]
        if name == "depth":
            a = np.asarray(a)[covered]
            b = np.asarray(b)[covered]
        q, mx = _rel_err(a, b)
        results[f"fwd_{name}"] = q
        results[f"fwd_{name}_max"] = mx
    for k in grads["scan"]:
        q, mx = _rel_err(grads["pallas"][k], grads["scan"][k])
        results[f"grad_{k}"] = q
        results[f"grad_{k}_max"] = mx
    ok = (all(results[f"fwd_{n_}"] <= REL_TOL_FWD
              for n_ in ("image", "alpha", "depth", "norm"))
          and all(results[f"grad_{k}"] <= REL_TOL_GRAD
                  for k in grads["scan"])
          and all(results[f"fwd_{n_}_max"] <= MAX_TOL_FWD
                  for n_ in ("image", "alpha", "depth", "norm"))
          and all(results[f"grad_{k}_max"] <= MAX_TOL_GRAD
                  for k in grads["scan"]))
    return ok, results


def verify_uvtex(n, width, height, tex_res):
    """pallas vs scan M-list/blend kernels, both on the exact XLA texture
    path (isolates the Pallas kernels; the textile texture path has its own
    twin check below).  UVs are a smooth analytic map (normalize(xyz)) with
    its true Jacobian, like a trained stage-2 net."""
    import jax
    import jax.numpy as jnp

    from texgs.render.uv_tex_render import uv_tex_render

    state, cam = _scene(n, width, height)
    rng = np.random.default_rng(11)
    xyz = state.xyz
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True) + 1e-9
    uvs = xyz / norm
    # d(x/|x|)/dx = (I - u u^T) / |x|, flattened (N, 9)
    eye = jnp.eye(3)[None]
    jac = (eye - uvs[:, :, None] * uvs[:, None, :]) / norm[:, :, None]
    grad_uvs = jac.reshape(-1, 9)
    texture = jnp.asarray(rng.uniform(size=(6, tex_res, tex_res, 3)),
                          jnp.float32)
    shs = jnp.asarray(rng.normal(size=(xyz.shape[0], 8, 3)) * 0.01,
                      jnp.float32)
    cot = jnp.asarray(rng.normal(size=(3, height, width)), jnp.float32)

    def loss(tex, uvs_, xyz_, cot, backend):
        out = uv_tex_render(
            cam, xyz=xyz_, opacity=state.get_opacity(),
            scaling=state.get_scaling(), rotation=state.get_rotation(),
            uvs=uvs_, grad_uvs=grad_uvs, texture=tex, shs=shs,
            active_sh_degree=2, bg_color=jnp.zeros(3), m=32,
            filter_mode="bilinear", backend=backend, tex_backend="xla")
        return (out["render"] * cot).sum(), out["render"]

    results = {}
    vals, grads = {}, {}
    for backend in ("scan", "pallas"):
        f = jax.jit(jax.grad(
            lambda t, u, x, c: loss(t, u, x, c, backend),
            argnums=(0, 1, 2), has_aux=True))
        g, img = f(texture, uvs, xyz, cot)
        grads[backend] = [np.asarray(a) for a in g]
        vals[backend] = np.asarray(img)

    q, mx = _rel_err(vals["pallas"], vals["scan"])
    results["fwd_image"] = q
    results["fwd_image_max"] = mx
    for name, i in (("texture", 0), ("uvs", 1), ("xyz", 2)):
        q, mx = _rel_err(grads["pallas"][i], grads["scan"][i])
        results[f"grad_{name}"] = q
        results[f"grad_{name}_max"] = mx
    ok = (results["fwd_image"] <= REL_TOL_FWD
          and results["fwd_image_max"] <= MAX_TOL_FWD
          and all(results[f"grad_{k}"] <= REL_TOL_GRAD
                  and results[f"grad_{k}_max"] <= MAX_TOL_GRAD
                  for k in ("texture", "uvs", "xyz")))
    return ok, results


def verify_textile(tex_res, n_tiles=256, m=32):
    """Windowed-VMEM textile kernel (Mosaic-compiled) vs the exact XLA
    cubemap twin on a coherent zero-miss M-list — the compiled counterpart
    of tests/test_textile.py."""
    import jax
    import jax.numpy as jnp

    from texgs.kernels.pallas_textile import tex_term_textile
    from texgs.kernels.uvtex_raster import mlist_tex_term

    PIX = 256
    h = w = int(np.sqrt(n_tiles)) * 16
    rng = np.random.default_rng(3)
    wgt = rng.uniform(0.01, 0.4, size=(n_tiles, PIX, m)).astype(np.float32)
    wgt = wgt * (rng.uniform(size=wgt.shape) < 0.6)
    # strictly IN-FACE per-tile footprints: tight (~5 sigma = 26 texels at
    # 512^2, keeps every tile at mip level 0) AND away from face edges
    # (|u|,|v| <= 0.55 of the half-extent).  Both matter for exactness:
    # wider footprints engage the textile mip path (area-filters by
    # design) and cross-face stragglers engage the round-5 bordered
    # catch-all pack (16^2 area-filtered by design) — the full-res XLA
    # twin is only an EXACT reference when neither path serves a request.
    # Both approximation paths carry their own divergence-bound tests in
    # test_textile.py.
    face = rng.integers(0, 6, size=(n_tiles, 1, 1))
    fu = rng.uniform(-0.55, 0.55, size=(n_tiles, 1, 1))
    fv = rng.uniform(-0.55, 0.55, size=(n_tiles, 1, 1))
    u = fu + 0.02 * rng.normal(size=(n_tiles, PIX, m))
    v = fv + 0.02 * rng.normal(size=(n_tiles, PIX, m))
    u = np.clip(u, -0.9, 0.9)
    v = np.clip(v, -0.9, 0.9)
    one = np.ones_like(u)
    by_face = np.stack([
        np.stack([one, -v, -u], -1), np.stack([-one, -v, u], -1),
        np.stack([u, one, v], -1), np.stack([u, -one, -v], -1),
        np.stack([u, -v, one], -1), np.stack([-u, -v, -one], -1)],
        axis=0)                                  # (6, T, PIX, m, 3)
    dirs = by_face[face[:, 0, 0], np.arange(n_tiles)]   # (T, PIX, m, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = np.where(wgt[..., None] > 0, dirs, 0.0).astype(np.float32)
    mlist = jnp.asarray(np.concatenate([wgt[..., None], dirs], axis=-1))
    tex = jnp.asarray(rng.uniform(size=(6, tex_res, tex_res, 3)),
                      jnp.float32)
    cot = jnp.asarray(rng.normal(size=(3, h, w)), jnp.float32)

    # cap sized like the trainer's adaptive TexMissController would settle:
    # cross-face stragglers scale with request count
    cap = max(4096, (n_tiles * PIX * m) // 16)
    f_twin = jax.jit(jax.value_and_grad(
        lambda ml, tx, c: jnp.sum(mlist_tex_term(ml, tx, h, w) * c),
        argnums=(0, 1)))
    f_fast = jax.jit(jax.value_and_grad(
        lambda ml, tx, c: jnp.sum(
            tex_term_textile(ml, tx, h, w, miss_cap=cap)[0] * c),
        argnums=(0, 1)))
    _, (g_ml_t, g_tex_t) = f_twin(mlist, tex, cot)
    _, (g_ml_f, g_tex_f) = f_fast(mlist, tex, cot)
    miss = int(jax.jit(lambda ml, tx: tex_term_textile(
        ml, tx, h, w, miss_cap=cap)[1])(mlist, tex))

    live = np.asarray(mlist[..., 0]) > 0
    qt, mt = _rel_err(g_tex_f, g_tex_t)
    qm, mm_ = _rel_err(np.asarray(g_ml_f)[live], np.asarray(g_ml_t)[live])
    results = {
        "unserved": miss,
        "grad_texture": qt, "grad_texture_max": mt,
        "grad_mlist": qm, "grad_mlist_max": mm_,
    }
    ok = (miss == 0 and results["grad_texture"] <= REL_TOL_GRAD
          and results["grad_mlist"] <= REL_TOL_GRAD
          and results["grad_texture_max"] <= MAX_TOL_GRAD
          and results["grad_mlist_max"] <= MAX_TOL_GRAD)
    return ok, results


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    import jax

    n = int(os.environ.get("VERIFY_N", 100_000))
    width = int(os.environ.get("VERIFY_W", 800))
    height = int(os.environ.get("VERIFY_H", 600))
    tex_res = int(os.environ.get("VERIFY_TEX", 512))

    verdict = {
        "backend": jax.default_backend(),
        "compiled": jax.default_backend() == "tpu",
        "shapes": {"n_gauss": n, "width": width, "height": height,
                   "tex_res": tex_res},
        "rel_tol_fwd": REL_TOL_FWD,
        "rel_tol_grad": REL_TOL_GRAD,
    }
    def _round(d):
        return {k: (round(v, 8) if isinstance(v, float) else v)
                for k, v in d.items()}

    ok1, r1 = verify_raster(n, width, height)
    verdict["raster"] = {"ok": ok1, **_round(r1)}
    ok2, r2 = verify_uvtex(n, width, height, tex_res)
    verdict["uvtex"] = {"ok": ok2, **_round(r2)}
    ok3, r3 = verify_textile(tex_res)
    verdict["textile"] = {"ok": ok3, **_round(r3)}
    verdict["ok"] = ok1 and ok2 and ok3
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
