"""Camera pytree used by the renderers and trainers.

Replaces the reference's torch ``Camera``/``MiniCam``
(/root/reference/utils/cameras.py:21-78) with a frozen, jit-friendly
dataclass: image dimensions and fovs are static aux data (hashable, so one
trace per resolution), matrices and ground-truth buffers are array leaves.

Matrix convention is row-vector/transposed, identical to the reference:
``world_view`` = getWorld2View2(...)^T, ``full_proj`` = world_view @ proj^T,
``camera_center`` = inv(world_view)[3, :3].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import numpy as np

from texgs.utils import graphics

ZNEAR = 0.01
ZFAR = 100.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    # --- array leaves ---
    world_view: Any          # (4, 4) f32, row-vector world->view
    full_proj: Any           # (4, 4) f32, row-vector world->clip
    camera_center: Any       # (3,) f32 world-space camera position
    image: Optional[Any]     # (3, H, W) f32 ground-truth rgb (premultiplied by alpha)
    alpha_mask: Optional[Any]  # (1, H, W) f32 or None
    normal: Optional[Any]      # (3, H, W) f32 in [-1, 1] or None
    depth: Optional[Any]       # (1, H, W) f32 or None
    # --- static aux data ---
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    fovx: float = dataclasses.field(metadata=dict(static=True))
    fovy: float = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(metadata=dict(static=True), default=ZNEAR)
    zfar: float = dataclasses.field(metadata=dict(static=True), default=ZFAR)
    uid: int = dataclasses.field(metadata=dict(static=True), default=0)
    image_name: str = dataclasses.field(metadata=dict(static=True), default="")

    @property
    def tanfovx(self) -> float:
        return math.tan(self.fovx * 0.5)

    @property
    def tanfovy(self) -> float:
        return math.tan(self.fovy * 0.5)

    def jit_view(self) -> "Camera":
        """The camera with identity-only statics (uid=0, image_name='').

        uid/image_name are static pytree aux data, so every distinct view
        passed to a jitted function is a fresh trace — a 64-view dataset
        retraces (and compile-cache-probes) the whole train step 64 times.
        Neither field enters any computation: trainers normalize cameras
        through this at every jit boundary so a stage compiles ONCE per
        (resolution, capacity); callers keep the original for logging and
        cache keys."""
        return dataclasses.replace(self, uid=0, image_name="")


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                image: Optional[np.ndarray] = None,
                alpha_mask: Optional[np.ndarray] = None,
                normal: Optional[np.ndarray] = None,
                depth: Optional[np.ndarray] = None,
                trans: Optional[np.ndarray] = None, scale: float = 1.0,
                znear: float = ZNEAR, zfar: float = ZFAR,
                uid: int = 0, image_name: str = "") -> Camera:
    """Build a Camera from COLMAP-style (R, T).

    ``image`` is (3, H, W) in [0, 1]; if ``alpha_mask`` is given the gt image
    is premultiplied by it (parity with /root/reference/utils/cameras.py:48-51).
    """
    w2v = graphics.get_world2view(R, T, translate=trans, scale=scale)  # column form
    proj = graphics.get_projection_matrix(znear, zfar, fovx, fovy)     # column form
    world_view = w2v.T.astype(np.float32)
    full_proj = (world_view @ proj.T).astype(np.float32)
    camera_center = np.linalg.inv(world_view)[3, :3].astype(np.float32)

    if image is not None:
        image = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
        if alpha_mask is not None:
            image = image * np.asarray(alpha_mask, np.float32)

    return Camera(
        world_view=world_view,
        full_proj=full_proj,
        camera_center=camera_center,
        image=image,
        alpha_mask=None if alpha_mask is None else np.asarray(alpha_mask, np.float32),
        normal=None if normal is None else np.asarray(normal, np.float32),
        depth=None if depth is None else np.asarray(depth, np.float32),
        width=int(width), height=int(height),
        fovx=float(fovx), fovy=float(fovy),
        znear=float(znear), zfar=float(zfar),
        uid=int(uid), image_name=image_name,
    )


def look_at_camera(eye: np.ndarray, target: np.ndarray, up: np.ndarray,
                   fovx: float, fovy: float, width: int, height: int,
                   **kwargs) -> Camera:
    """Convenience constructor for synthetic scenes/tests: camera at ``eye``
    looking at ``target``.  Returns a Camera with no ground-truth buffers
    unless provided via kwargs."""
    eye = np.asarray(eye, np.float64)
    forward = np.asarray(target, np.float64) - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(forward, right)
    # View rows: x->right, y->down (image y grows downward), z->forward.
    R_w2c = np.stack([right, down, forward], axis=0)
    # COLMAP convention: R stored as cam-to-world rotation, T world->cam.
    R = R_w2c.T
    T = -R_w2c @ eye
    return make_camera(R, T, fovx, fovy, width, height, **kwargs)
