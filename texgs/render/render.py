"""3DGS render path: SH-colored Gaussian splatting (stages 1-2).

Functional equivalent of /root/reference/render/render.py:8-95, assembled
from the TPU kernels: eval SH -> project/cull -> tiled (or dense) raster.
Returns the same output dict keys.  Gradients w.r.t. screen-space means are
harvested by differentiating against ``ndc_offset`` (a zeros (N, 2) array)
instead of torch's retain_grad trick.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from texgs.core.camera import Camera
from texgs.kernels import project as proj_k
from texgs.kernels.reference import rasterize_reference
from texgs.kernels.tile_raster import rasterize_tiled


def render(viewpoint_camera: Camera, *,
           xyz: jnp.ndarray,
           opacity: jnp.ndarray,
           scaling: jnp.ndarray,
           rotation: jnp.ndarray,
           features: Optional[jnp.ndarray] = None,
           active_sh_degree: int = 0,
           bg_color: jnp.ndarray,
           scaling_modifier: float = 1.0,
           override_color: Optional[jnp.ndarray] = None,
           extra_attrs: Optional[jnp.ndarray] = None,
           ndc_offset: Optional[jnp.ndarray] = None,
           cov3d_precomp: Optional[jnp.ndarray] = None,
           backend: str = "auto",
           pair_cap: Optional[int] = None,
           chunk: int = 128,
           normalize_depth: bool = True,
           row_offset=None,
           band_height: Optional[int] = None) -> dict:
    """Render one view.

    All Gaussian inputs are *activated* values (exp-scaling, normalized
    rotation, sigmoid opacity), mirroring what the reference model feeds its
    rasterizer (/root/reference/render/render.py:41-72).  ``features`` are SH
    coefficients (N, K, 3); ``override_color`` (N, 3) bypasses SH.

    backend: 'auto' (dense oracle for small N, tiled otherwise), 'reference',
    'scan', or 'pallas'.
    """
    cam = viewpoint_camera
    if override_color is None:
        colors = proj_k.sh_colors(features, xyz, cam.camera_center,
                                  active_sh_degree)
    else:
        colors = override_color

    proj = proj_k.project_gaussians(
        xyz, scaling, rotation, opacity, colors,
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy,
        scaling_modifier=scaling_modifier,
        cov3d_precomp=cov3d_precomp,
        ndc_offset=ndc_offset)

    # Tile-sharded band rendering (texgs.dist.tile_parallel): shift the
    # projected means by the band's pixel row offset and rasterize a short
    # image — every kernel only ever sees tile-local coordinates, so a
    # traced shift costs one subtraction.
    height = cam.height
    if row_offset is not None:
        assert band_height is not None
        shift = jnp.stack([jnp.zeros_like(jnp.asarray(row_offset,
                                                      jnp.float32)),
                           jnp.asarray(row_offset, jnp.float32)])
        proj = proj._replace(means2d=proj.means2d - shift[None, :])
        height = band_height

    if backend == "auto":
        import jax
        if jax.default_backend() == "tpu":
            backend = "pallas"
        else:
            backend = "reference" if xyz.shape[0] <= 4096 else "scan"

    if backend == "reference":
        out = rasterize_reference(proj, height, cam.width, bg_color,
                                  extra_attrs=extra_attrs,
                                  normalize_depth=normalize_depth)
    else:
        out = rasterize_tiled(proj, height, cam.width, bg_color,
                              extra_attrs=extra_attrs, pair_cap=pair_cap,
                              chunk=chunk, normalize_depth=normalize_depth,
                              backend=backend)

    return {
        "render": out.image,
        "depth": out.depth,
        "norm": out.norm,
        "alpha": out.alpha,
        "extra": out.extra,
        "radii": proj.radii,
        "visibility_filter": proj.radii > 0,
        # binning diagnostics (None on the dense reference backend)
        "n_pairs": out.n_pairs,
        "pair_overflow": out.overflowed,
    }
