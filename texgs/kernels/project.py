"""Gaussian projection: EWA splatting math shared by all rasterizer paths.

TPU-native re-derivation of the preprocess stage of the reference's CUDA
rasterizer (`diff_gauss`, called at /root/reference/render/render.py:75-84;
internals follow the published 3DGS EWA lineage): frustum cull, perspective
projection of centers, first-order projection of the 3D covariance to a 2D
screen covariance with the +0.3 px low-pass dilation, conic + radius
computation, and the flattened-Gaussian shortest-axis world normal.

Everything is batched jnp running on the VPU/MXU — there is no per-Gaussian
scalar loop; XLA fuses this whole stage into a handful of elementwise ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from texgs.utils.transforms import (build_covariance_packed,
                                    rotation_channels, strip_symmetric)

# Gaussians closer than this view-space depth are culled (3DGS convention).
NEAR_CULL = 0.2
# Low-pass filter added to the diagonal of the 2D covariance (pixels^2).
COV2D_DILATION = 0.3


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray   # (N, 2) pixel coordinates of projected centers
    depths: jnp.ndarray    # (N,) view-space z
    conics: jnp.ndarray    # (N, 3) inverse 2D covariance (a, b, c) packed
    radii: jnp.ndarray     # (N,) int32 screen-space radius (0 = culled)
    colors: jnp.ndarray    # (N, 3) view-dependent RGB (>= 0)
    opacities: jnp.ndarray # (N,) activated opacity
    normals: jnp.ndarray   # (N, 3) world-space unit normal, camera-facing


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    return ((v + 1.0) * size - 1.0) * 0.5


def project_points(xyz: jnp.ndarray, full_proj: jnp.ndarray,
                   width: int, height: int, ndc_offset=None):
    """Project world points to (pixel xy, clip w).  Row-vector convention.

    ``ndc_offset`` is an optional (N, 2) zero tensor added to the NDC means:
    its cotangent is the screen-space positional gradient the densifier
    consumes (same trick/units as the reference's retain_grad on
    screenspace_points, /root/reference/render/render.py:16-20 — NDC-scale,
    i.e. pixel-gradient * [W/2, H/2])."""
    ones = jnp.ones_like(xyz[:, :1])
    p_hom = jnp.concatenate([xyz, ones], axis=-1) @ full_proj  # (N, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]
    ndc_xy = p_proj[:, :2]
    if ndc_offset is not None:
        ndc_xy = ndc_xy + ndc_offset
    means2d = jnp.stack([ndc2pix(ndc_xy[:, 0], width),
                         ndc2pix(ndc_xy[:, 1], height)], axis=-1)
    return means2d, p_hom[:, 3]


def compute_cov2d(xyz: jnp.ndarray, cov3d: jnp.ndarray,
                  world_view: jnp.ndarray, tanfovx: float, tanfovy: float,
                  focal_x: float, focal_y: float) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space.

    ``cov3d`` is packed (N, 6) upper triangle (xx, xy, xz, yy, yz, zz).
    Returns packed (N, 3) upper-triangular 2D covariance (a, b, c) with the
    +0.3 dilation applied.

    Channel form throughout: the textbook J @ W @ Sigma @ (J @ W)^T as
    batched (N, 2, 3)/(N, 3, 3) matmuls pads each intermediate to (8, 128)
    tiles on TPU (~GBs of HBM traffic at N=1e5); here the two rows of
    T = J @ W are expanded as T0 = a0 W0 + c0 W2, T1 = b1 W1 + c1 W2 with
    W row constants, so cov2d needs only the six scalars Wi Sigma Wj^T —
    one (N, 6) x (6, 6) contraction plus elementwise math.
    """
    # View-space centers; world_view is row-vector form so use p @ M.
    ones = jnp.ones_like(xyz[:, :1])
    t = (jnp.concatenate([xyz, ones], axis=-1) @ world_view)[:, :3]

    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz = t[:, 2]
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # T = J @ W rows: T0 = a0*W0 + c0*W2, T1 = b1*W1 + c1*W2
    a0 = focal_x * inv_z
    c0 = -focal_x * txtz * inv_z2
    b1 = focal_y * inv_z
    c1 = -focal_y * tytz * inv_z2

    # quad[i][j] = Wi Sigma Wj^T for (i,j) in [(0,0),(0,1),(0,2),(1,1),
    # (1,2),(2,2)]: a (6, 6) constant contraction of the packed channels.
    W = world_view[:3, :3].T  # world->view rotation, column form
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    rows = []
    for (i, j) in pairs:
        wi, wj = W[i], W[j]
        rows.append(jnp.stack([
            wi[0] * wj[0],
            wi[0] * wj[1] + wi[1] * wj[0],
            wi[0] * wj[2] + wi[2] * wj[0],
            wi[1] * wj[1],
            wi[1] * wj[2] + wi[2] * wj[1],
            wi[2] * wj[2],
        ]))
    quad_mat = jnp.stack(rows, axis=1)          # (6 channels, 6 pairs)
    q = cov3d @ quad_mat                        # (N, 6) scalars Wi S Wj
    s00, s01, s02, s11, s12, s22 = (q[:, 0], q[:, 1], q[:, 2], q[:, 3],
                                    q[:, 4], q[:, 5])

    a = a0 * a0 * s00 + 2 * a0 * c0 * s02 + c0 * c0 * s22 + COV2D_DILATION
    b = (a0 * b1 * s01 + a0 * c1 * s02 + c0 * b1 * s12 + c0 * c1 * s22)
    c = b1 * b1 * s11 + 2 * b1 * c1 * s12 + c1 * c1 * s22 + COV2D_DILATION
    return jnp.stack([a, b, c], axis=-1)


def flat_normals(scaling: jnp.ndarray, rotation: jnp.ndarray,
                 xyz: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """Shortest-axis normal of each (flattened) Gaussian, flipped to face the
    camera.  This is the fork's rendered-normal channel (SURVEY.md §2.2).

    Channel form (see transforms.rotation_channels): the R columns are
    selected with two nested wheres instead of materializing (N, 3, 3)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rotation_channels(rotation)
    idx = jnp.argmin(scaling, axis=-1)  # (N,) column of the shortest axis
    is0 = idx == 0
    is1 = idx == 1
    nx = jnp.where(is0, r00, jnp.where(is1, r01, r02))
    ny = jnp.where(is0, r10, jnp.where(is1, r11, r12))
    nz = jnp.where(is0, r20, jnp.where(is1, r21, r22))
    n = jnp.stack([nx, ny, nz], axis=-1)
    to_cam = campos[None, :] - xyz
    sign = jnp.sign((n * to_cam).sum(-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return n * sign


def project_gaussians(xyz, scaling, rotation, opacity, colors,
                      world_view, full_proj, campos,
                      width: int, height: int, tanfovx: float, tanfovy: float,
                      scaling_modifier: float = 1.0,
                      cov3d_precomp=None, ndc_offset=None) -> ProjectedGaussians:
    """Full preprocess: cull + project + conic/radius + normals.

    ``colors`` are per-Gaussian RGB (SH already evaluated, or an override).
    Culled Gaussians get radius 0 and opacity 0.
    """
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    if cov3d_precomp is None:
        cov3d = build_covariance_packed(scaling, rotation, scaling_modifier)
    elif cov3d_precomp.ndim == 3:        # (N, 3, 3) full matrices
        cov3d = strip_symmetric(cov3d_precomp)
    else:                                # already packed (N, 6)
        cov3d = cov3d_precomp

    means2d, depths = project_points(xyz, full_proj, width, height, ndc_offset)
    cov2d = compute_cov2d(xyz, cov3d, world_view, tanfovx, tanfovy,
                          focal_x, focal_y)

    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    conics = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1))

    # Also drop zero-opacity Gaussians (dead capacity-padding slots and
    # fully-transparent splats contribute nothing; culling them here keeps
    # them out of the tile pair lists).
    visible = (depths > NEAR_CULL) & det_ok & (opacity.reshape(-1) > 0.0)
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    op = jnp.where(visible, opacity.reshape(-1), 0.0)

    normals = flat_normals(scaling, rotation, xyz, campos)

    return ProjectedGaussians(
        means2d=means2d, depths=depths, conics=conics, radii=radii,
        colors=colors, opacities=op, normals=normals)


def sh_colors(features: jnp.ndarray, xyz: jnp.ndarray, campos: jnp.ndarray,
              active_sh_degree: int) -> jnp.ndarray:
    """Per-Gaussian view-dependent color from SH (direction = campos->center),
    clamped at 0 after the +0.5 offset, as the CUDA preprocess does."""
    from texgs.utils.sh import eval_sh
    dirs = xyz - campos[None, :]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    sh = jnp.swapaxes(features, -1, -2)  # (N, 3, K)
    rgb = eval_sh(active_sh_degree, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)
