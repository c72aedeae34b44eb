"""Multi-device sharding on the virtual 8-device CPU mesh: data-parallel
steps, tile-sharded rendering, and the combined 2D (data, tile) mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texgs.core.state import init_from_pcd
from texgs.data.synthetic import blob_point_cloud, orbit_cameras
from texgs.dist.data_parallel import dp_train_step, stack_cameras
from texgs.dist.mesh import make_mesh
from texgs.dist.tile_parallel import (band_height, dp_tile_train_step,
                                      render_tile_sharded)
from texgs.render.render import render
from texgs.train import optim

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _scene(n=384, size=64, views=8):
    pcd = blob_point_cloud(n, seed=0)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=1)
    cams = orbit_cameras(views, radius=3.5, width=size, height=size)
    gt = []
    for c in cams:
        out = render(c, xyz=state.xyz, opacity=state.get_opacity(),
                     scaling=state.get_scaling(),
                     rotation=state.get_rotation(),
                     features=state.get_features(), active_sh_degree=1,
                     bg_color=jnp.zeros(3), backend="reference")
        gt.append(dataclasses.replace(c, image=out["render"]))
    return state, gt


def test_tile_sharded_render_matches_single():
    state, cams = _scene()
    cam = cams[0]
    mesh = make_mesh(4, axis_names=("tile",))
    out = render_tile_sharded(mesh, "tile", cam, xyz=state.xyz,
                              opacity=state.get_opacity(),
                              scaling=state.get_scaling(),
                              rotation=state.get_rotation(),
                              features=state.get_features(),
                              active_sh_degree=1, bg_color=jnp.zeros(3),
                              backend="scan")
    single = render(cam, xyz=state.xyz, opacity=state.get_opacity(),
                    scaling=state.get_scaling(),
                    rotation=state.get_rotation(),
                    features=state.get_features(), active_sh_degree=1,
                    bg_color=jnp.zeros(3), backend="scan")
    np.testing.assert_allclose(np.asarray(out["render"]),
                               np.asarray(single["render"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]),
                               np.asarray(single["alpha"]), atol=3e-5)


def test_band_height_alignment():
    assert band_height(64, 4) == 16
    assert band_height(600, 4) == 160  # 38 tile rows -> 10 per band
    assert band_height(48, 8) % 16 == 0


@pytest.mark.slow
def test_dp_step_runs_and_reduces_loss():
    state, cams = _scene(views=8)
    mesh = make_mesh(8, axis_names=("data",))
    batch = stack_cameras(cams)
    params = state.params_dict()
    params["f_dc"] = params["f_dc"] + 0.3
    adam = optim.init(params)

    losses = []
    for _ in range(6):
        params, adam, loss = dp_train_step(mesh, state, params, adam, batch,
                                           active_sh_degree=1, lr=1e-2,
                                           lambda_dssim=0.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_dp_tile_2d_mesh_step():
    state, cams = _scene(views=2)
    mesh = make_mesh(8, axis_names=("data", "tile"), shape=(2, 4))
    batch = stack_cameras(cams[:2])
    params = state.params_dict()
    params["f_dc"] = params["f_dc"] + 0.3
    adam = optim.init(params)

    p1, a1, loss = dp_tile_train_step(mesh, state, params, adam, batch,
                                      active_sh_degree=1, lr=5e-2)
    assert np.isfinite(float(loss)) and float(loss) > 0
    delta = float(jnp.abs(p1["f_dc"] - params["f_dc"]).max())
    assert delta > 0

    # the 2D-mesh GRADIENT equals the camera-mean single-device full-image
    # gradient: after one Adam step from zero state, mu = (1-b1) * grad
    def single_loss(p, cam):
        st = state.replace(xyz=p["xyz"], features_dc=p["f_dc"],
                           features_rest=p["f_rest"], opacity=p["opacity"],
                           scaling=p["scaling"], rotation=p["rotation"])
        out = render(cam, xyz=st.xyz, opacity=st.get_opacity(),
                     scaling=st.get_scaling(), rotation=st.get_rotation(),
                     features=st.get_features(), active_sh_degree=1,
                     bg_color=jnp.zeros(3), backend="scan")
        return jnp.abs(out["render"] - cam.image).mean()

    gfn = jax.jit(jax.grad(single_loss))
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2,
                          gfn(params, cams[0]), gfn(params, cams[1]))
    jax.tree.map(
        lambda mu, g: np.testing.assert_allclose(
            np.asarray(mu), 0.1 * np.asarray(g), atol=2e-6, rtol=1e-4),
        dict(a1.mu), g_mean)
    lfn = jax.jit(single_loss)
    l_single = (float(lfn(params, cams[0])) + float(lfn(params, cams[1]))) / 2
    np.testing.assert_allclose(float(loss), l_single, rtol=1e-5)
