"""Dense reference rasterizer — the differentiable jnp oracle.

O(N * H * W) alpha-compositing of projected Gaussians, used as (a) the
correctness oracle every tiled/Pallas kernel is tested against (the
"python reference twin" pattern of the reference's kernel tests, SURVEY.md
§4) and (b) the renderer for small scenes on CPU.

Blending reproduces the sequential semantics of the CUDA rasterizer the
reference calls (/root/reference/render/render.py:75-84):
  alpha_i = min(0.99, opacity_i * exp(-0.5 d^T conic d)),
  contributions skipped when the exponent is positive or alpha < 1/255,
  front-to-back transmittance T with hard stop *before* the Gaussian that
  would push T below 1e-4 (emulated exactly with a cumulative-failure mask
  over the depth-sorted axis, so the vectorized result equals the
  sequential loop).
Coverage uses the same tile-rect rule as the tile binner so the oracle and
the tiled kernels make bit-identical coverage decisions.

Outputs: rgb, depth (alpha-normalized expected view-z by default; the
reference fork's raw blended-z is available via normalize_depth=False),
world normal, alpha, optional extra attribute channels.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from texgs.kernels.project import ProjectedGaussians

TILE = 16
ALPHA_CLAMP = 0.99
MIN_ALPHA = 1.0 / 255.0
T_STOP = 1e-4


class RasterOutput(NamedTuple):
    image: jnp.ndarray   # (3, H, W)
    depth: jnp.ndarray   # (1, H, W)
    norm: jnp.ndarray    # (3, H, W)
    alpha: jnp.ndarray   # (1, H, W)
    extra: Optional[jnp.ndarray]  # (E, H, W) or None
    # Binning diagnostics (tiled backends only): true uncapped pair count and
    # whether pair_cap was exceeded (pairs silently dropped -> callers must
    # retry at a larger cap, see texgs.train.pair_cap).
    n_pairs: Optional[jnp.ndarray] = None     # () int32
    overflowed: Optional[jnp.ndarray] = None  # () bool
    # Textile diagnostics (uvtex + tex_backend='textile' only): requests the
    # windowed kernel could not serve this frame (frame fell back to the
    # exact XLA tap path when > 0).
    tex_miss: Optional[jnp.ndarray] = None    # () int32
    # Raw window-miss count (served by the correction OR dropped): feeds
    # the TexMissController's cap-shrink schedule — an oversized static
    # miss cap makes the compacted correction's nonzero passes the
    # dominant per-step cost.
    tex_miss_total: Optional[jnp.ndarray] = None  # () int32
    # uvtex `with_no_sh=True` only: the texture-only image (what a second
    # rasterization at active_sh_degree=0 would produce), recovered from the
    # SAME blend pass: color = clamp(.5+SH_rest) + C0*tex is linear in the
    # per-Gaussian term, so no_sh = image - blend(clamp(.5+SH_rest) - .5).
    image_no_sh: Optional[jnp.ndarray] = None  # (3, H, W)


def tile_rect(means2d: jnp.ndarray, radii: jnp.ndarray, width: int, height: int):
    """Per-Gaussian covered tile rectangle [min, max), CUDA getRect parity.

    Returns int32 arrays (xmin, xmax, ymin, ymax) in tile units.
    """
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    r = radii.astype(jnp.float32)
    px, py = means2d[:, 0], means2d[:, 1]
    xmin = jnp.clip(((px - r) / TILE).astype(jnp.int32), 0, grid_x)
    xmax = jnp.clip(((px + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ymin = jnp.clip(((py - r) / TILE).astype(jnp.int32), 0, grid_y)
    ymax = jnp.clip(((py + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    return xmin, xmax, ymin, ymax


def gaussian_alpha(px, py, means2d, conics, opacities):
    """Raw blending alpha of each Gaussian at each pixel.

    px/py: (P,) pixel centers; gaussian arrays: (K, ...).  Returns (P, K).
    """
    dx = px[:, None] - means2d[None, :, 0]
    dy = py[:, None] - means2d[None, :, 1]
    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    power = -0.5 * (a[None, :] * dx * dx + c[None, :] * dy * dy) \
        - b[None, :] * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, opacities[None, :] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < MIN_ALPHA, 0.0, alpha)
    return alpha


def blend_weights(alpha: jnp.ndarray):
    """Sequential-consistent over-compositing weights.

    alpha: (P, K) in front-to-back depth order.  Returns (weights (P, K),
    final transmittance (P,)).
    """
    one_minus = 1.0 - alpha
    # Exclusive cumulative product of (1 - alpha) along the depth axis.
    t_excl = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), jnp.cumprod(one_minus[:, :-1], axis=-1)],
        axis=-1)
    fail = t_excl * one_minus < T_STOP
    done = jnp.cumsum(fail.astype(jnp.int32), axis=-1) > 0
    weights = alpha * t_excl * (~done)
    t_final = jnp.prod(jnp.where(done, 1.0, one_minus), axis=-1)
    return weights, t_final


def rasterize_reference(proj: ProjectedGaussians, height: int, width: int,
                        bg: jnp.ndarray, extra_attrs=None,
                        normalize_depth: bool = True,
                        row_block: int = 16) -> RasterOutput:
    """Rasterize projected Gaussians densely.

    proj fields are capacity-sized; dead/culled entries must have radius 0
    or opacity 0 (texgs.kernels.project guarantees this).
    """
    # Depth order among visible Gaussians (radius > 0).
    visible = proj.radii > 0
    sort_key = jnp.where(visible, proj.depths, jnp.inf)
    order = jnp.argsort(sort_key)

    means2d = proj.means2d[order]
    conics = proj.conics[order]
    colors = proj.colors[order]
    opacities = jnp.where(visible, proj.opacities, 0.0)[order]
    normals = proj.normals[order]
    depths = proj.depths[order]
    radii = proj.radii[order]
    extra = None if extra_attrs is None else extra_attrs[order]

    xmin, xmax, ymin, ymax = tile_rect(means2d, radii, width, height)
    covered = radii > 0

    n_row_blocks = -(-height // row_block)
    pad_h = n_row_blocks * row_block

    xs = jnp.arange(width, dtype=jnp.float32)
    e_dim = 0 if extra is None else extra.shape[1]

    def render_rows(r0):
        ys = r0 * row_block + jnp.arange(row_block, dtype=jnp.float32)
        py = jnp.repeat(ys, width)
        px = jnp.tile(xs, row_block)
        alpha = gaussian_alpha(px, py, means2d, conics, opacities)
        # Tile-rect coverage, identical to the binning rule.
        tx = (px / TILE).astype(jnp.int32)
        ty = (py / TILE).astype(jnp.int32)
        cov = ((tx[:, None] >= xmin[None, :]) & (tx[:, None] < xmax[None, :])
               & (ty[:, None] >= ymin[None, :]) & (ty[:, None] < ymax[None, :])
               & covered[None, :])
        alpha = jnp.where(cov, alpha, 0.0)
        weights, t_final = blend_weights(alpha)

        rgb = weights @ colors                       # (P, 3)
        rgb = rgb + t_final[:, None] * bg[None, :]
        nrm = weights @ normals                      # (P, 3)
        dep = weights @ depths[:, None]              # (P, 1)
        acc = 1.0 - t_final
        if normalize_depth:
            dep = dep / jnp.maximum(acc, 1e-6)[:, None]
        out = [rgb, dep, nrm, acc[:, None]]
        if extra is not None:
            out.append(weights @ extra)
        return jnp.concatenate(out, axis=-1)  # (P, 3+1+3+1+E)

    rows = jax.lax.map(render_rows, jnp.arange(n_row_blocks))
    flat = rows.reshape(pad_h, width, -1)[:height]  # (H, W, C)
    flat = jnp.moveaxis(flat, -1, 0)                # (C, H, W)

    image, depth, norm, alpha = flat[0:3], flat[3:4], flat[4:7], flat[7:8]
    extra_out = flat[8:8 + e_dim] if extra is not None else None
    return RasterOutput(image=image, depth=depth, norm=norm, alpha=alpha,
                        extra=extra_out)
