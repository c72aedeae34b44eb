"""Normal losses: cosine normal loss + pseudo-normal-from-depth consistency.

Parity with /root/reference/losses/norm_reg_loss.py:
  norm_from_depth  — unproject depth to world via inv(world_view), 4-tap
                     finite differences with replicate padding, cross-product
                     normal, validity mask from gradient magnitude (:17-59).
  norm_loss        — masked mean(1 - <pred, gt>) (:61-67).
  norm_reg_loss    — rendered normal vs depth-derived normal (:70-77).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift_replicate(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift a (C, H, W) image by (dy, dx) with replicate (edge) padding.

    Equivalent to convolving with a one-hot 3x3 kernel over a
    replicate-padded image, as filter2d does in the reference."""
    pad = ((0, 0), (1, 1), (1, 1))
    xp = jnp.pad(x, pad, mode="edge")
    h, w = x.shape[1], x.shape[2]
    return xp[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def norm_from_depth(depth: jnp.ndarray, tanfovx: float, tanfovy: float,
                    world_view: jnp.ndarray, threshold: float = 1e-2):
    """Pseudo ground-truth normals from a rendered depth map.

    Args:
      depth: (1, H, W) view-space z.
      tanfovx/tanfovy: static half-angle tangents.
      world_view: (4, 4) row-vector world->view matrix (camera.world_view).
    Returns:
      (normal (3, H, W) world-space unit, mask (1, H, W) float)
    """
    _, H, W = depth.shape
    pix_x = jnp.arange(W, dtype=depth.dtype).reshape(1, 1, W)
    pix_y = jnp.arange(H, dtype=depth.dtype).reshape(1, H, 1)

    def pix2ndc(pix, s):
        return (2.0 * pix + 1.0) / s - 1.0

    ndc_x = pix2ndc(pix_x, W)
    ndc_y = pix2ndc(pix_y, H)
    coord_c = jnp.concatenate([
        ndc_x * tanfovx * depth,
        ndc_y * tanfovy * depth,
        depth,
        jnp.ones_like(depth),
    ], axis=0)  # (4, H, W) view-space homogeneous
    # world_view is the row-vector matrix; its transpose is the column-form
    # view matrix V with p_view = V @ p_world, so p_world = inv(V) @ p_view.
    inv_view = jnp.linalg.inv(world_view.T)
    coord_w = (inv_view @ coord_c.reshape(4, H * W)).reshape(4, H, W)
    xyz = coord_w[:3]

    grad_l = xyz - _shift_replicate(xyz, 0, -1)
    grad_r = _shift_replicate(xyz, 0, 1) - xyz
    grad_u = xyz - _shift_replicate(xyz, -1, 0)
    grad_d = _shift_replicate(xyz, 1, 0) - xyz

    grad_x = (grad_r + grad_l) / 2
    grad_y = (grad_d + grad_u) / 2

    def small(g):
        return jnp.linalg.norm(g, axis=0, keepdims=True) < threshold

    mask = small(grad_l) & small(grad_r) & small(grad_u) & small(grad_d)

    normal = jnp.cross(grad_y, grad_x, axis=0)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=0, keepdims=True), 1e-6)
    return normal, mask.astype(depth.dtype)


def norm_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask=None):
    """pred/gt: (3, H, W) unit normals; mask: (1, H, W) or None."""
    cos = (pred * gt).sum(axis=0, keepdims=True)
    if mask is None:
        return (1.0 - cos).mean()
    return ((1.0 - cos) * mask).sum() / (mask.sum() + 1e-6)


def norm_reg_loss(norm: jnp.ndarray, depth: jnp.ndarray, tanfovx: float,
                  tanfovy: float, world_view: jnp.ndarray, gt_alpha: jnp.ndarray):
    """Consistency of rendered normals with depth-derived normals.

    depth is treated as a constant (detached), matching
    /root/reference/losses/norm_reg_loss.py:72."""
    import jax
    norm2, mask = norm_from_depth(jax.lax.stop_gradient(depth), tanfovx,
                                  tanfovy, world_view)
    mask = gt_alpha * mask
    return norm_loss(norm, norm2, mask)
