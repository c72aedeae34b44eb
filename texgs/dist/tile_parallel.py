"""Tile-sharded rendering: image row-bands across mesh devices.

The sequence-parallel analogue for splatting (SURVEY.md §2.3/§5): the long
axes are rays and Gaussians, so we shard *image tile rows* over a mesh axis
— each chip bins and rasterizes only its horizontal band (Gaussian state
replicated; its per-band tile lists are built locally from the shared
projection, no cross-chip exchange needed because binning is cheap relative
to blending).  Band rendering reuses the single-chip pipeline unchanged:
the projected 2D means are shifted by the band's pixel row offset, and the
band is rasterized as a short image (kernels only ever see tile-local
coordinates, so a traced row shift is free).  Gradients of replicated
parameters are psum'd across the band axis by the caller's loss reduction.

``dp_tile_train_step`` composes this with data parallelism: a 2D mesh
(data, tile) where each data row takes one camera and its tile columns
split that camera's rows.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from texgs.core.camera import Camera
from texgs.kernels.reference import TILE
from texgs.losses import l1_loss, ssim_loss
from texgs.render.render import render
from texgs.train import optim
from texgs.dist.data_parallel import index_camera


def band_height(height: int, n_bands: int) -> int:
    """Per-device band height (tile-aligned; last band padded)."""
    tiles_y = -(-height // TILE)
    band_tiles = -(-tiles_y // n_bands)
    return band_tiles * TILE


def render_band(camera: Camera, row_offset, band_h: int, **render_kwargs):
    """Render rows [row_offset, row_offset + band_h) of camera's image.

    row_offset may be traced (e.g. axis_index * band_h inside shard_map).
    Returns the standard render() dict with (C, band_h, W) images.
    """
    band_cam = dataclasses.replace(camera, image=None, alpha_mask=None,
                                   normal=None, depth=None)
    return render(band_cam, row_offset=row_offset, band_height=band_h,
                  **render_kwargs)


def render_tile_sharded(mesh: Mesh, axis: str, camera: Camera, *,
                        xyz, opacity, scaling, rotation, features,
                        active_sh_degree: int, bg_color,
                        backend: str = "auto") -> dict:
    """Full-image render with rows sharded over mesh axis `axis`."""
    n_bands = mesh.shape[axis]
    band_h = band_height(camera.height, n_bands)

    @partial(shard_map, mesh=mesh, in_specs=(P(),), out_specs=P(axis),
             check_vma=False)
    def run(args):
        (xyz_, op_, sc_, rot_, feat_, bg_) = args
        i = jax.lax.axis_index(axis)
        out = render_band(camera, i * band_h, band_h,
                          xyz=xyz_, opacity=op_, scaling=sc_, rotation=rot_,
                          features=feat_, active_sh_degree=active_sh_degree,
                          bg_color=bg_, backend=backend)
        return jnp.concatenate([out["render"], out["depth"], out["norm"],
                                out["alpha"]], axis=0)[None]

    stacked = run((xyz, opacity, scaling, rotation, features, bg_color))
    # (n_bands, 8, band_h, W) -> full image channels
    full = stacked.transpose(1, 0, 2, 3).reshape(8, n_bands * band_h,
                                                 camera.width)
    full = full[:, :camera.height]
    return {"render": full[0:3], "depth": full[3:4], "norm": full[4:7],
            "alpha": full[7:8]}


def dp_tile_train_step(mesh: Mesh, state, params, adam, camera_batch: Camera,
                       active_sh_degree: int, lr, lambda_dssim: float = 0.2,
                       data_axis: str = "data", tile_axis: str = "tile"):
    """One training step over a 2D (data, tile) mesh: cameras sharded over
    `data_axis`, each camera's image rows sharded over `tile_axis`;
    gradients psum'd over both axes."""
    n_bands = mesh.shape[tile_axis]
    ref_cam = index_camera(camera_batch, 0)
    band_h = band_height(ref_cam.height, n_bands)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(data_axis)),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(st_in, params, adam, cam_shard):
        cam = index_camera(cam_shard, 0)
        band = jax.lax.axis_index(tile_axis)
        row0 = band * band_h
        gt_band = jax.lax.dynamic_slice_in_dim(
            jnp.pad(cam.image, ((0, 0), (0, n_bands * band_h - cam.height),
                                (0, 0))),
            row0, band_h, axis=1)
        # rows beyond the true image must not contribute to the loss
        rows = row0 + jnp.arange(band_h)
        row_mask = (rows < cam.height).astype(jnp.float32)[None, :, None]

        def loss_fn(p):
            st = st_in.replace(
                xyz=p["xyz"], features_dc=p["f_dc"],
                features_rest=p["f_rest"], opacity=p["opacity"],
                scaling=p["scaling"], rotation=p["rotation"])
            out = render_band(cam, row0, band_h,
                              xyz=st.xyz, opacity=st.get_opacity(),
                              scaling=st.get_scaling(),
                              rotation=st.get_rotation(),
                              features=st.get_features(),
                              active_sh_degree=active_sh_degree,
                              bg_color=jnp.zeros(3), backend="scan")
            img = out["render"] * row_mask
            gt = gt_band * row_mask
            # l1 over the full image = psum of per-band sums / total pixels
            err = jnp.abs(img - gt).sum()
            err = jax.lax.psum(err, tile_axis)
            n_px = 3 * cam.height * cam.width
            return err / n_px

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # psum's transpose SUMS the (replicated) cotangents, so each chip's
        # grad already carries an n_tile factor on top of its band's
        # contribution — the tile-axis pmean cancels it exactly (verified
        # by the mu == 0.1 * mean-camera-grad assertion in test_dist)
        grads = jax.lax.pmean(grads, tile_axis)
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        new_params, new_adam = optim.update(params, grads, adam, lr)
        return new_params, new_adam, loss

    # state as an argument: axon corrupts big closure-baked constants
    return jax.jit(step)(state, params, adam, camera_batch)
