#!/usr/bin/env python
"""Round-5: decompose the bench scene's 292k textile window misses.

Classes:
  A. active request on a dominant face (f_a/f_b) whose taps fail the
     slot window  -> footprint outliers (would be served by a per-face
     deepest-mip catch-all slot)
  B. active request on a dominant face failing only `inface` (bilinear
     footprint crosses the face boundary at the slot's level)
  C. active request whose face is NOT among the tile's two dominant
     faces -> needs a third slot or a global catch-all
Also: the weight mass of each class (quality impact bound).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texgs.core.state import init_from_pcd
from texgs.data.synthetic import orbit_cameras, textured_sphere_point_cloud
from texgs.render.uv_tex_render import uv_tex_render
from texgs.kernels.cubemap import direction_to_face_uv
from texgs.kernels import pallas_textile as ptx

N, W, H, TEX, M = 100_000, 800, 600, 1024, 32


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

    from texgs.kernels import project as proj_k
    from texgs.kernels.uvtex_raster import (build_uv_rows,
                                            build_uvtex_tables,
                                            residual_sh_colors)
    from texgs.kernels.binning import build_pairs
    from texgs.kernels.tile_raster import build_pair_attrs
    from texgs.kernels.pallas_uvtex_fused import fused_pallas

    opacity, scaling, rotation = (state.get_opacity(), state.get_scaling(),
                                  state.get_rotation())

    @jax.jit
    def get_mlist():
        proj = proj_k.project_gaussians(
            xyz, scaling, rotation, opacity, jnp.zeros_like(xyz),
            cam.world_view, cam.full_proj, cam.camera_center,
            cam.width, cam.height, cam.tanfovx, cam.tanfovy)
        base_colors = residual_sh_colors(shs, xyz, cam.camera_center, 3)
        proj2 = proj._replace(colors=base_colors)
        tables = build_uvtex_tables(xyz, scaling, rotation, uvs,
                                    jac.reshape(-1, 9), cam.camera_center)
        pair_cap = -(-max(4 * N, 1 << 14) // 128) * 128
        pairs = build_pairs(proj2.means2d, proj2.depths, proj2.radii,
                            H, W, pair_cap, 128)
        attrs = build_pair_attrs(proj2, pairs, H, W, None)
        uv_rows = build_uv_rows(tables, pairs)
        _, _, mlist = fused_pallas(attrs, uv_rows.T, pairs, cam, 128, M,
                                   height=H)
        return mlist

    mlist = get_mlist()

    t, pix, m, _ = mlist.shape
    cfg = ptx.make_cfg(t, m, TEX)
    rq = cfg.rq_rows
    w = jnp.moveaxis(mlist[..., 0], 1, 2).reshape(t, rq, 128)
    dirs = jnp.moveaxis(mlist[..., 1:4], 1, 2)
    face, u, v = direction_to_face_uv(dirs.reshape(-1, 3))
    face = face.reshape(t, rq, 128)
    active = np.asarray(w > 0)

    # replicate prep's dominant-face + window logic
    prep = ptx.textile_prep(mlist, cfg, "bilinear")
    miss = np.asarray(prep.miss)
    n_act, n_miss = active.sum(), miss.sum()
    print(f"tiles={t} active={n_act} miss={n_miss} "
          f"({100.0 * n_miss / n_act:.2f}%)")

    hist = np.stack([(active & (np.asarray(face) == f)).sum(axis=(1, 2))
                     for f in range(6)], axis=1)
    f_a = hist.argmax(axis=1)
    hist_b = hist.copy()
    hist_b[np.arange(t), f_a] = 0
    f_b = hist_b.argmax(axis=1)
    facen = np.asarray(face)
    on_dom = (facen == f_a[:, None, None]) | (facen == f_b[:, None, None])

    wn = np.asarray(w)
    cls_c = miss & ~on_dom
    cls_ab = miss & on_dom
    print(f"class C (off-dominant-face): {cls_c.sum()} "
          f"weight {wn[cls_c].sum():.1f}")
    print(f"class A/B (on-face fit fail): {cls_ab.sum()} "
          f"weight {wn[cls_ab].sum():.1f}")
    print(f"total active weight {wn[active].sum():.1f}")

    # how many distinct faces do active requests of a tile touch?
    per_tile_faces = [(hist > 0).sum(axis=1)]
    import collections
    cnt = collections.Counter((hist > 0).sum(axis=1).tolist())
    print("tiles by #faces touched:", dict(sorted(cnt.items())))

    # weight distribution of missed vs served
    print(f"miss weight quantiles: "
          f"{np.quantile(wn[miss], [0.5, 0.9, 0.99]).round(4).tolist()}"
          f" served: "
          f"{np.quantile(wn[active & ~miss], [0.5, 0.9, 0.99]).round(4).tolist()}")


if __name__ == "__main__":
    main()
