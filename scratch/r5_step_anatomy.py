#!/usr/bin/env python
"""Round-5: anatomy of the post-catch-all ~295 ms stage-3 step.

The catch-all pack removed the 3.7 s miss correction; what remains is
~207 ms render f+b + ~45 ms losses/jac/Adams + amortized host read.
This script slope-times the render's sub-stages on the bench scene
(100k G, 800x600, m=32, 1024^2 tex) to locate the next lever, and
times the fused kernel at chunk sizes {128, 256, 512} to test whether
per-grid-step overhead dominates the sequential chunk grid.
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
    from texgs.core.state import init_from_pcd
    from texgs.data.synthetic import orbit_cameras, \
        textured_sphere_point_cloud
    from texgs.kernels.binning import build_pairs
    from texgs.kernels.pallas_uvtex_fused import fused_pallas
    from texgs.kernels.pallas_textile import tex_term_textile
    from texgs.kernels.project import project_gaussians
    from texgs.kernels.tile_raster import assemble_image, build_pair_attrs
    from texgs.kernels.uvtex_raster import (build_uv_rows,
                                            build_uvtex_tables,
                                            residual_sh_colors)

    N, W, H, TEX, M, CHUNK = 100_000, 800, 600, 1024, 32, 128
    pcd = textured_sphere_point_cloud(N, seed=0)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=3)
    cam = orbit_cameras(1, radius=3.5, width=W, height=H)[0]
    xyz = state.xyz
    nrm = jnp.linalg.norm(xyz, axis=-1, keepdims=True) + 1e-9
    uvs = xyz / nrm
    eye = jnp.eye(3)[None]
    jac = ((eye - uvs[:, :, None] * uvs[:, None, :]) / nrm[:, :, None])
    jac = jac.reshape(-1, 9)
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(size=(6, TEX, TEX, 3)), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(N, 15, 3)) * 0.01, jnp.float32)
    opac = state.get_opacity()
    scal = state.get_scaling()
    rot = state.get_rotation()
    pair_cap = 1 << 19

    # ---- stage A: projection + tables (everything before binning)
    def stageA(x):
        proj = project_gaussians(
            x, scal, rot, opac, jnp.zeros_like(x),
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tanfovx, cam.tanfovy)
        base = residual_sh_colors(shs, x, cam.camera_center, 3)
        proj = proj._replace(colors=base)
        tables = build_uvtex_tables(x, scal, rot, uvs, jac,
                                    cam.camera_center)
        return proj, tables

    fA = jax.jit(stageA)
    print(f"A project+tables FWD: {slope_time(fA, [xyz])*1e3:.1f} ms",
          flush=True)

    proj, tables = fA(xyz)
    proj = jax.tree.map(jax.lax.stop_gradient, proj)
    tables = jax.tree.map(jax.lax.stop_gradient, tables)

    # ---- stage B: binning (build_pairs, not differentiated)
    def stageB(m2d):
        return build_pairs(m2d, proj.depths, proj.radii, H, W,
                           pair_cap, CHUNK)

    fB = jax.jit(stageB)
    print(f"B build_pairs FWD: {slope_time(fB, [proj.means2d])*1e3:.1f} ms",
          flush=True)
    pairs = fB(proj.means2d)
    print(f"  n_pairs={int(pairs.n_pairs)} cap={pair_cap} "
          f"chunks={pair_cap // CHUNK}", flush=True)

    # ---- stage C: attr/uv-row gathers
    def stageC(p):
        attrs = build_pair_attrs(p._replace(), pairs, H, W, None)
        uv_rows = build_uv_rows(tables, pairs)
        return attrs, uv_rows

    fC = jax.jit(lambda m2d: stageC(proj._replace(means2d=m2d)))
    print(f"C gathers FWD: {slope_time(fC, [proj.means2d])*1e3:.1f} ms",
          flush=True)
    attrs, uv_rows = fC(proj.means2d)
    attrs = jax.lax.stop_gradient(attrs)
    uv_rows = jax.lax.stop_gradient(uv_rows)
    cot_img = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)

    # ---- stage D: the fused kernel alone, fwd and f+b, chunk sweep
    for chunk in (128, 256, 512):
        if chunk != CHUNK:
            pr = jax.jit(lambda m2d: build_pairs(
                m2d, proj.depths, proj.radii, H, W, pair_cap, chunk))(
                    proj.means2d)
            at, uvr = jax.jit(lambda m2d, c=chunk, p=pr: (
                build_pair_attrs(proj._replace(means2d=m2d), p, H, W, None),
                build_uv_rows(tables, p)))(proj.means2d)
        else:
            pr, at, uvr = pairs, attrs, uv_rows
        at = jax.lax.stop_gradient(at)
        uvr = jax.lax.stop_gradient(uvr)

        def fd(a, u, c=chunk, p=pr):
            return fused_pallas(a, u.T, p, cam, c, M)

        f_fwd = jax.jit(fd)
        dt = slope_time(f_fwd, [at, uvr])
        print(f"D fused chunk={chunk} FWD: {dt*1e3:.1f} ms", flush=True)

        def floss(a, u, c=chunk, p=pr):
            tiles, tfin, ml = fused_pallas(a, u.T, p, cam, c, M)
            return (jnp.sum(tiles * 0.001) + jnp.sum(tfin * 0.001)
                    + jnp.sum(ml * 0.001))

        f_fb = jax.jit(jax.grad(floss, argnums=(0, 1)))
        dt = slope_time(f_fb, [at, uvr])
        print(f"D fused chunk={chunk} F+B: {dt*1e3:.1f} ms", flush=True)

    # ---- stage E: textile texture term on the real M-list
    tiles_out, t_final, mlist = jax.jit(
        lambda a, u: fused_pallas(a, u.T, pairs, cam, CHUNK, M))(
            attrs, uv_rows)
    mlist = jax.lax.stop_gradient(mlist)

    def ftex(ml, tx):
        img, miss, raw = tex_term_textile(ml, tx, H, W, "bilinear", 4096)
        return img

    f_tex = jax.jit(ftex)
    print(f"E textile FWD: {slope_time(f_tex, [mlist, tex])*1e3:.1f} ms",
          flush=True)

    def ftex_l(ml, tx):
        img, miss, raw = tex_term_textile(ml, tx, H, W, "bilinear", 4096)
        return jnp.sum(img * cot_img)

    f_tex_g = jax.jit(jax.grad(ftex_l, argnums=(0, 1)))
    print(f"E textile F+B: {slope_time(f_tex_g, [mlist, tex])*1e3:.1f} ms",
          flush=True)

    # ---- stage F: assemble_image
    f_asm = jax.jit(lambda t, tf: assemble_image(t, tf, H, W,
                                                 jnp.zeros(3), 0, True))
    print(f"F assemble FWD: {slope_time(f_asm, [tiles_out, t_final])*1e3:.1f}"
          " ms", flush=True)


if __name__ == "__main__":
    main()
