"""UV-texture render path (stage 3) — Taylor-expanded UV + cubemap texture.

Functional equivalent of /root/reference/render/uv_tex_render.py:7-77 built
on texgs.kernels.uvtex_raster.  See that module for the per-intersection UV
math and the texture-gradient accumulation strategy.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from texgs.core.camera import Camera
from texgs.kernels import project as proj_k


def uv_tex_render(viewpoint_camera: Camera, *,
                  xyz: jnp.ndarray,
                  opacity: jnp.ndarray,
                  scaling: jnp.ndarray,
                  rotation: jnp.ndarray,
                  uvs: jnp.ndarray,
                  grad_uvs: jnp.ndarray,
                  texture: jnp.ndarray,
                  shs: Optional[jnp.ndarray] = None,
                  active_sh_degree: int = 0,
                  bg_color: jnp.ndarray,
                  scaling_modifier: float = 1.0,
                  extra_attrs: Optional[jnp.ndarray] = None,
                  ndc_offset: Optional[jnp.ndarray] = None,
                  backend: str = "auto",
                  pair_cap: Optional[int] = None,
                  chunk: int = 128,
                  m: int = 32,
                  filter_mode: str = "bilinear",
                  tex_backend: str = "auto",
                  tex_miss_cap: int = 4096,
                  normalize_depth: bool = True,
                  row_offset=None,
                  band_height: Optional[int] = None,
                  with_no_sh: bool = False,
                  m_tail: bool = False) -> dict:
    """Render one view with per-intersection UV-mapped cubemap appearance.

    uvs: (N, 3) unit sphere points (UV centers); grad_uvs: (N, 9) flattened
    duv/dxyz Jacobians (treated as constants, parity with
    /root/reference/models/texture_gaussian3d.py:227); texture:
    (6, R, R, 3) cubemap in SH0 space; shs: (N, K-1, 3) view-dependent
    residual SH (degree >= 1 only — the DC term comes from the texture).

    with_no_sh: also return ``render_no_sh``, the texture-only image
    (== a second render at active_sh_degree=0) recovered from the same
    blend pass — see rasterize_uvtex.  The reference rasterizes twice for
    its no-SH photometric loss (texture_gaussian3d.py:375-389).
    """
    from texgs.kernels.uvtex_raster import rasterize_uvtex

    cam = viewpoint_camera
    proj = proj_k.project_gaussians(
        xyz, scaling, rotation, opacity,
        jnp.zeros_like(xyz),  # colors come from the texture per intersection
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy,
        scaling_modifier=scaling_modifier,
        ndc_offset=ndc_offset)

    out = rasterize_uvtex(
        proj, scaling * scaling_modifier, rotation, xyz,
        uvs, grad_uvs, texture, shs, active_sh_degree,
        cam, bg_color, extra_attrs=extra_attrs, pair_cap=pair_cap,
        chunk=chunk, m=m, filter_mode=filter_mode,
        normalize_depth=normalize_depth, backend=backend,
        tex_backend=tex_backend, tex_miss_cap=tex_miss_cap,
        row_offset=row_offset,
        band_height=band_height, with_no_sh=with_no_sh, m_tail=m_tail)

    return {
        "render": out.image,
        "render_no_sh": out.image_no_sh,
        "depth": out.depth,
        "norm": out.norm,
        "alpha": out.alpha,
        "extra": out.extra,
        "radii": proj.radii,
        "visibility_filter": proj.radii > 0,
        # binning diagnostics (None on the dense reference backend)
        "n_pairs": out.n_pairs,
        "pair_overflow": out.overflowed,
        "tex_miss": out.tex_miss,
        "tex_miss_total": out.tex_miss_total,
    }
