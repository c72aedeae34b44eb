"""Pallas rasterizer vs scan reference twin — outputs and every cotangent.

Runs in Pallas interpreter mode on CPU (conftest pins the platform); the
same kernel code compiles with Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texgs.core.state import init_from_pcd
from texgs.data.synthetic import blob_point_cloud, orbit_cameras
from texgs.kernels import project as proj_k
from texgs.kernels.tile_raster import rasterize_tiled

CHUNK = 64


def _scene(n=384, size=48):
    pcd = blob_point_cloud(n, seed=3)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=1)
    cam = orbit_cameras(1, radius=3.5, width=size, height=size)[0]
    return state, cam


def _project(state, cam):
    colors = proj_k.sh_colors(state.get_features(), state.xyz,
                              cam.camera_center, 1)
    return proj_k.project_gaussians(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity(), colors, cam.world_view, cam.full_proj,
        cam.camera_center, cam.width, cam.height, cam.tanfovx, cam.tanfovy)


def test_pallas_forward_matches_scan():
    state, cam = _scene()
    proj = _project(state, cam)
    ref = rasterize_tiled(proj, cam.height, cam.width, jnp.zeros(3),
                          chunk=CHUNK, backend="scan")
    got = rasterize_tiled(proj, cam.height, cam.width, jnp.zeros(3),
                          chunk=CHUNK, backend="pallas")
    for name in ("image", "alpha", "depth", "norm"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)),
                                   atol=3e-5, err_msg=name)


def test_pallas_grads_match_scan():
    state, cam = _scene(n=256, size=32)
    target = jnp.zeros((3, cam.height, cam.width))

    def make_loss(backend):
        def f(xyz, scaling_raw, rotation, opacity_raw, fdc):
            st = state.replace(xyz=xyz, scaling=scaling_raw,
                               rotation=rotation, opacity=opacity_raw,
                               features_dc=fdc)
            proj = _project(st, cam)
            out = rasterize_tiled(proj, cam.height, cam.width, jnp.zeros(3),
                                  chunk=CHUNK, backend=backend)
            return (jnp.abs(out.image - target).mean() + out.alpha.mean()
                    + 0.01 * out.depth.mean() + 0.01 * out.norm.mean())
        return f

    args = (state.xyz, state.scaling, state.rotation, state.opacity,
            state.features_dc)
    g_ref = jax.grad(make_loss("scan"), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(make_loss("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xyz", "scaling", "rotation", "opacity", "f_dc"]
    for a, b, name in zip(g_ref, g_pal, names):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4,
                                   rtol=1e-3, err_msg=f"grad mismatch: {name}")


def test_pallas_empty_scene():
    state, cam = _scene(n=64, size=32)
    # move everything behind the camera -> nothing visible
    state = state.replace(xyz=state.xyz + jnp.array([0.0, 0.0, 1e4]))
    proj = _project(state, cam)
    out = rasterize_tiled(proj, cam.height, cam.width, jnp.ones(3),
                          chunk=CHUNK, backend="pallas")
    np.testing.assert_allclose(np.asarray(out.image), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)
