"""GaussianState: the capacity-padded parameter pytree for 3D Gaussians.

The reference stores Gaussians as six separately-optimized nn.Parameters with
a *dynamic* count that changes under densify/clone/split/prune via optimizer
surgery (/root/reference/models/gaussian3d.py:39-44,185-254).  On TPU,
dynamic shapes force retraces, so we keep arrays at a fixed capacity ``C``
with the first ``n_alive`` rows live; padded rows carry raw opacity
``PAD_OPACITY`` (sigmoid ~ 0) and are additionally masked out by the
renderers.  Densification (texgs/train/densify.py) compacts/re-pads on
device with static shapes and only grows capacity (a retrace) when full.

Parameterization parity with the reference activations
(/root/reference/models/gaussian3d.py:16-31):
  scaling  = exp(_scaling)            rotation = normalize(_rotation) [wxyz]
  opacity  = sigmoid(_opacity)        features = SH coefficients, DC first
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

# Raw (pre-sigmoid) opacity assigned to dead/padded slots.
PAD_OPACITY = -20.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    xyz: Any            # (C, 3) world-space centers
    features_dc: Any    # (C, 1, 3) SH degree-0 coefficients
    features_rest: Any  # (C, (deg+1)^2-1, 3) higher-order SH coefficients
    scaling: Any        # (C, 3) log-scales
    rotation: Any       # (C, 4) unnormalized quaternions, (w, x, y, z)
    opacity: Any        # (C, 1) logit opacities
    n_alive: Any        # () int32 number of live Gaussians

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        total = 1 + self.features_rest.shape[1]
        deg = int(round(total ** 0.5)) - 1
        return deg

    def alive_mask(self) -> jnp.ndarray:
        return (jnp.arange(self.capacity) < self.n_alive)

    # --- activated views -------------------------------------------------
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / (
            jnp.linalg.norm(self.rotation, axis=-1, keepdims=True) + 1e-12)

    def get_opacity(self) -> jnp.ndarray:
        op = jax.nn.sigmoid(self.opacity)
        return op * self.alive_mask()[:, None].astype(op.dtype)

    def get_features(self) -> jnp.ndarray:
        """(C, (deg+1)^2, 3) SH coefficients, DC first."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def params_dict(self) -> dict:
        """The optimizable leaves, named as in the reference's param groups
        (/root/reference/models/gaussian3d.py:85-92)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "opacity": self.opacity,
            "scaling": self.scaling,
            "rotation": self.rotation,
        }

    def replace(self, **kw) -> "GaussianState":
        return dataclasses.replace(self, **kw)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def init_from_pcd(points, colors, max_sh_degree: int, capacity: int | None = None,
                  knn_dist2=None) -> GaussianState:
    """Initialize from an SfM/synthetic point cloud.

    Parity with Gaussian3D.initialize (/root/reference/models/gaussian3d.py:53-77):
    colors -> SH DC, log-scale = 0.5*log(mean sq dist to 3 NN), identity
    rotation, opacity 0.1.  ``knn_dist2`` is the per-point mean squared
    distance to the 3 nearest neighbours (texgs.kernels.knn); if None it is
    computed here.
    """
    from texgs.kernels.knn import mean_sq_dist_3nn
    from texgs.utils.sh import rgb2sh

    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    n = points.shape[0]
    if capacity is None:
        capacity = n
    assert capacity >= n

    if knn_dist2 is None:
        knn_dist2 = mean_sq_dist_3nn(points)
    dist2 = jnp.maximum(knn_dist2, 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    n_rest = (max_sh_degree + 1) ** 2 - 1

    def pad(x, fill=0.0):
        if capacity == n:
            return x
        pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    state = GaussianState(
        xyz=pad(points),
        features_dc=pad(rgb2sh(colors)[:, None, :]),
        features_rest=pad(jnp.zeros((n, n_rest, 3), jnp.float32)),
        scaling=pad(scales, fill=PAD_OPACITY),
        rotation=pad(rots).at[n:, 0].set(1.0),
        opacity=pad(inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32)),
                    fill=PAD_OPACITY),
        n_alive=jnp.asarray(n, jnp.int32),
    )
    return state
