"""Device-side (jnp) quaternion / covariance helpers.

Parity targets: build_rotation / build_scaling_rotation / strip_symmetric
(/root/reference/utils/general.py:73-119).  All functions are batched and
jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) wxyz quaternions (any norm) -> (N, 3, 3) rotation matrices."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / (norm + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (N, 3), (N, 4) -> (N, 3, 3)."""
    R = build_rotation(q)
    return R * s[..., None, :]


def build_covariance(scaling: jnp.ndarray, rotation: jnp.ndarray,
                     scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Full 3D covariance Sigma = L L^T, (N, 3, 3)."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return L @ jnp.swapaxes(L, -1, -2)


def rotation_channels(q: jnp.ndarray):
    """(N, 4) wxyz quaternions -> the 9 rotation-matrix entries as (N,)
    channels (r00..r22, row-major).

    Channel (struct-of-arrays) form: on TPU an (N, 3, 3) array is tiled to
    (8, 128) on its two minor dims — a ~380x padding blowup that turns the
    trivial quaternion->matrix math into GB of HBM traffic.  Flat (N,)
    channels stay dense."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q / (norm + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y))


def build_covariance_packed(scaling: jnp.ndarray, rotation: jnp.ndarray,
                            scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T packed as (N, 6) upper triangle
    (xx, xy, xz, yy, yz, zz) — value-identical to
    strip_symmetric(build_covariance(...)) but computed entirely in (N,)
    channels (no (N, 3, 3) intermediates; see rotation_channels)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rotation_channels(rotation)
    s = scaling_modifier * scaling
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) symmetric -> (N, 6) packed upper triangle
    (xx, xy, xz, yy, yz, zz), the layout the reference rasterizer consumes."""
    return jnp.stack([
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
    ], axis=-1)


def unstrip_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) packed -> (N, 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = [packed[..., i] for i in range(6)]
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
