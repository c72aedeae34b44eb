"""UV-texture rasterizer: oracle vs chunked path, outputs + cotangents.

Scene: Gaussians on a blob with uv = normalize(xyz) and the true Jacobian
of that map (jacfwd), a smooth procedural cubemap texture, opacities high
enough that per-pixel contributor counts stay well under the M truncation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texgs.core.camera import Camera
from texgs.core.state import init_from_pcd
from texgs.data.synthetic import blob_point_cloud, orbit_cameras
from texgs.kernels import project as proj_k
from texgs.kernels.cubemap import (direction_to_face_uv, face_uv_to_direction,
                                   sample_cubemap)
from texgs.kernels.uvtex_raster import rasterize_uvtex
from tests.test_rasterizer import assert_close_mostly


def _uv_map(xyz):
    return xyz / (jnp.linalg.norm(xyz, axis=-1, keepdims=True) + 1e-12)


def _uv_jacobians(xyz):
    jac = jax.vmap(jax.jacfwd(lambda p: p / (jnp.linalg.norm(p) + 1e-12)))(xyz)
    return jac.reshape(-1, 9)


def _texture(res=64):
    # smooth direction-dependent texture in SH0 space
    face = jnp.arange(6)
    u = (jnp.arange(res) + 0.5) / res * 2 - 1
    fu, fv = jnp.meshgrid(u, u, indexing="xy")
    texs = []
    for f in range(6):
        d = face_uv_to_direction(jnp.full(fu.shape, f, jnp.int32), fu, fv)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rgb = 0.5 + 0.4 * jnp.stack([
            jnp.sin(3 * d[..., 0]), jnp.cos(2 * d[..., 1]),
            jnp.sin(2 * d[..., 2])], axis=-1)
        texs.append((rgb - 0.5) / 0.28209479177387814)
    return jnp.stack(texs)


def _scene(n=400, size=48, opacity=6.0):
    pcd = blob_point_cloud(n, seed=7)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=3)
    state = state.replace(opacity=jnp.full_like(state.opacity, opacity))
    cam = orbit_cameras(1, radius=3.5, width=size, height=size)[0]
    uvs = _uv_map(state.xyz)
    jac = _uv_jacobians(state.xyz)
    shs = 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                   (state.capacity, 15, 3))
    return state, cam, uvs, jac, shs, _texture()


def _run(state, cam, uvs, jac, shs, tex, backend, deg=2):
    proj = proj_k.project_gaussians(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity(), jnp.zeros_like(state.xyz),
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy)
    # m=96 >= the max contributor count of this (soft-opacity) test scene,
    # so the chunked path is exactly the oracle; production default m=32
    # truncates the low-weight tail.
    # tex_backend pinned to the exact per-tap path: these tests compare the
    # M-list/blend backends; the windowed textile texture path (which may
    # *drop* beyond-cap misses on incoherent scenes like this one, relying
    # on the trainer's host-side retry) has its own suite, test_textile.py
    return rasterize_uvtex(proj, state.get_scaling(), state.get_rotation(),
                           state.xyz, uvs, jac, tex, shs, deg, cam,
                           jnp.zeros(3), backend=backend, chunk=64, m=96,
                           tex_backend="xla")


def test_cubemap_roundtrip():
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (500, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    face, u, v = direction_to_face_uv(d)
    d2 = face_uv_to_direction(face, u, v)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-5)


def test_cubemap_sampling_smooth():
    tex = _texture()
    d = jnp.array([[1.0, 0.01, 0.01], [0.01, 1.0, 0.01], [0.0, 0.0, -1.0]])
    out = sample_cubemap(tex, d)
    assert np.isfinite(np.asarray(out)).all()
    # sampling matches the generating function up to bilinear error
    expect = (0.5 + 0.4 * jnp.stack([
        jnp.sin(3 * d[:, 0] / jnp.linalg.norm(d, axis=1)),
        jnp.cos(2 * d[:, 1] / jnp.linalg.norm(d, axis=1)),
        jnp.sin(2 * d[:, 2] / jnp.linalg.norm(d, axis=1))], axis=-1)
        - 0.5) / 0.28209479177387814
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=0.05)


def test_uvtex_oracle_renders():
    state, cam, uvs, jac, shs, tex = _scene()
    out = _run(state, cam, uvs, jac, shs, tex, "reference")
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    assert img.max() > 0.1
    assert np.asarray(out.alpha).max() > 0.9


def test_uvtex_scan_matches_oracle():
    state, cam, uvs, jac, shs, tex = _scene()
    ref = _run(state, cam, uvs, jac, shs, tex, "reference")
    got = _run(state, cam, uvs, jac, shs, tex, "scan")
    assert_close_mostly(got.image, ref.image, atol=1e-4, frac=0.995,
                        hard_atol=3e-2, name="image")
    assert_close_mostly(got.alpha, ref.alpha, atol=2e-5, name="alpha")
    assert_close_mostly(got.norm, ref.norm, atol=2e-5, name="norm")


@pytest.mark.slow
def test_uvtex_grads_match_oracle():
    state, cam, uvs, jac, shs, tex = _scene(n=256, size=32)
    target = jnp.zeros((3, cam.height, cam.width))

    def make_loss(backend):
        def f(xyz, uvs_, tex_, shs_):
            st = state.replace(xyz=xyz)
            out = _run(st, cam, uvs_, jac, shs_, tex_, backend)
            return jnp.abs(out.image - target).mean()
        return f

    args = (state.xyz, uvs, tex, shs)
    g_ref = jax.grad(make_loss("reference"), argnums=(0, 1, 2, 3))(*args)
    g_scan = jax.grad(make_loss("scan"), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_ref, g_scan, ["xyz", "uvs", "texture", "shs"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=2e-3,
                                   err_msg=f"grad mismatch: {name}")
    # texture gradients must be nonzero (the texture explains the image)
    assert np.abs(np.asarray(g_scan[2])).max() > 0


def test_uvtex_texture_drives_image():
    state, cam, uvs, jac, shs, tex = _scene()
    out1 = _run(state, cam, uvs, jac, shs, tex, "scan")
    out2 = _run(state, cam, uvs, jac, shs, tex * 0 - 1.0, "scan")
    # darker texture -> darker image inside the object
    m = np.asarray(out1.alpha)[0] > 0.9
    assert (np.asarray(out1.image)[:, m].mean()
            > np.asarray(out2.image)[:, m].mean() + 0.1)


def test_uvtex_pallas_matches_scan():
    state, cam, uvs, jac, shs, tex = _scene(n=256, size=32)
    ref = _run(state, cam, uvs, jac, shs, tex, "scan")
    got = _run(state, cam, uvs, jac, shs, tex, "pallas")
    assert_close_mostly(got.image, ref.image, atol=1e-4, frac=0.995,
                        hard_atol=3e-2, name="image")
    assert_close_mostly(got.alpha, ref.alpha, atol=3e-5, name="alpha")


def test_uvtex_pallas_grads_match_scan():
    state, cam, uvs, jac, shs, tex = _scene(n=192, size=32)
    target = jnp.zeros((3, cam.height, cam.width))

    def make_loss(backend):
        def f(xyz, uvs_, tex_, shs_, scaling_raw):
            st = state.replace(xyz=xyz, scaling=scaling_raw)
            out = _run(st, cam, uvs_, jac, shs_, tex_, backend)
            return jnp.abs(out.image - target).mean()
        return f

    args = (state.xyz, uvs, tex, shs, state.scaling)
    g_ref = jax.grad(make_loss("scan"), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(make_loss("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_pal,
                          ["xyz", "uvs", "texture", "shs", "scaling"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def test_uvtex_fused_matches_scan():
    """Fused blend+M-list kernel (pallas_uvtex_fused): outputs equal the
    scan twin's."""
    state, cam, uvs, jac, shs, tex = _scene(n=256, size=32)
    ref = _run(state, cam, uvs, jac, shs, tex, "scan")
    got = _run(state, cam, uvs, jac, shs, tex, "fused")
    assert_close_mostly(got.image, ref.image, atol=1e-4, frac=0.995,
                        hard_atol=3e-2, name="image")
    assert_close_mostly(got.alpha, ref.alpha, atol=3e-5, name="alpha")
    assert_close_mostly(got.depth, ref.depth, atol=1e-4, name="depth")
    assert_close_mostly(got.norm, ref.norm, atol=3e-5, name="norm")


def test_uvtex_fused_grads_match_scan():
    """The fused backward's combined suffix trick must reproduce the two
    separate custom VJPs: every cotangent vs the scan twin."""
    state, cam, uvs, jac, shs, tex = _scene(n=192, size=32)
    target = jnp.zeros((3, cam.height, cam.width))

    def make_loss(backend):
        def f(xyz, uvs_, tex_, shs_, scaling_raw):
            st = state.replace(xyz=xyz, scaling=scaling_raw)
            out = _run(st, cam, uvs_, jac, shs_, tex_, backend)
            # touch every output so the blend-block AND M-list cotangents
            # are simultaneously non-trivial in the fused backward
            return (jnp.abs(out.image - target).mean()
                    + 0.1 * out.alpha.mean() + 0.01 * out.depth.mean()
                    + 0.01 * out.norm.mean())
        return f

    args = (state.xyz, uvs, tex, shs, state.scaling)
    g_ref = jax.grad(make_loss("scan"), argnums=(0, 1, 2, 3, 4))(*args)
    g_fus = jax.grad(make_loss("fused"), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b, name in zip(g_ref, g_fus,
                          ["xyz", "uvs", "texture", "shs", "scaling"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=2e-3,
                                   err_msg=f"grad mismatch: {name}")


def _run_ns(state, cam, uvs, jac, shs, tex, backend, deg=2,
            with_no_sh=False):
    proj = proj_k.project_gaussians(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity(), jnp.zeros_like(state.xyz),
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy)
    return rasterize_uvtex(proj, state.get_scaling(), state.get_rotation(),
                           state.xyz, uvs, jac, tex, shs, deg, cam,
                           0.3 * jnp.ones(3), backend=backend, chunk=64,
                           m=96, tex_backend="xla", with_no_sh=with_no_sh)


def test_uvtex_with_no_sh_matches_second_render():
    """with_no_sh recovers the texture-only image from the SAME blend pass;
    it must equal an explicit second rasterization at active_sh_degree=0
    (the reference's no-SH photometric pass, texture_gaussian3d.py:375-389)
    on every backend, with a non-zero bg color in play."""
    state, cam, uvs, jac, shs, tex = _scene(n=256, size=32)
    for backend in ("reference", "scan"):
        out = _run_ns(state, cam, uvs, jac, shs, tex, backend,
                      with_no_sh=True)
        ref_ns = _run_ns(state, cam, uvs, jac, shs, tex, backend, deg=0)
        assert out.image_no_sh is not None
        assert_close_mostly(out.image_no_sh, ref_ns.image, atol=3e-5,
                            name=f"no_sh[{backend}]")
        # the full-SH image must be unchanged by the extra channels
        base = _run_ns(state, cam, uvs, jac, shs, tex, backend)
        assert_close_mostly(out.image, base.image, atol=3e-6,
                            name=f"image[{backend}]")
        # degree 0: no_sh render IS the render
        out0 = _run_ns(state, cam, uvs, jac, shs, tex, backend, deg=0,
                       with_no_sh=True)
        np.testing.assert_allclose(np.asarray(out0.image_no_sh),
                                   np.asarray(out0.image))


def test_uvtex_with_no_sh_grads_match_second_render():
    """Gradients of a loss on the one-pass no-SH image must equal the
    two-pass formulation's (linearity of the blend in the SH term)."""
    state, cam, uvs, jac, shs, tex = _scene(n=192, size=32)
    target = jnp.zeros((3, cam.height, cam.width))

    def loss_one_pass(xyz, shs_, tex_):
        st = state.replace(xyz=xyz)
        out = _run_ns(st, cam, uvs, jac, shs_, tex_, "scan",
                      with_no_sh=True)
        return (jnp.abs(out.image - target).mean()
                + 0.5 * jnp.abs(out.image_no_sh - target).mean())

    def loss_two_pass(xyz, shs_, tex_):
        st = state.replace(xyz=xyz)
        out = _run_ns(st, cam, uvs, jac, shs_, tex_, "scan")
        out_ns = _run_ns(st, cam, uvs, jac, shs_, tex_, "scan", deg=0)
        return (jnp.abs(out.image - target).mean()
                + 0.5 * jnp.abs(out_ns.image - target).mean())

    args = (state.xyz, shs, tex)
    g1 = jax.grad(loss_one_pass, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(loss_two_pass, argnums=(0, 1, 2))(*args)
    for a, b, name in zip(g2, g1, ["xyz", "shs", "texture"]):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / denom, a / denom, atol=2e-4,
                                   err_msg=f"grad mismatch: {name}")


def _run_m(state, cam, uvs, jac, shs, tex, m, m_tail, deg=0):
    proj = proj_k.project_gaussians(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity(), jnp.zeros_like(state.xyz),
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy)
    return rasterize_uvtex(proj, state.get_scaling(), state.get_rotation(),
                           state.xyz, uvs, jac, tex, shs, deg, cam,
                           jnp.zeros(3), backend="scan", chunk=64, m=m,
                           tex_backend="xla", m_tail=m_tail)


def test_m_tail_correction_shrinks_truncation_error():
    """uvtex_m_tail: the residual-transmittance tail term (weight known
    exactly from the blend pass, UV proxied by the deepest captured slot)
    must move a truncated render strictly toward the exact one on a
    depth-complex scene — and must be a no-op when m is not truncating."""
    state, cam, uvs, jac, shs, tex = _scene(n=400, opacity=2.0)
    exact = np.asarray(_run_m(state, cam, uvs, jac, shs, tex, 96,
                              False).image)
    for m in (4, 8, 16):
        plain = np.asarray(_run_m(state, cam, uvs, jac, shs, tex, m,
                                  False).image)
        tail = np.asarray(_run_m(state, cam, uvs, jac, shs, tex, m,
                                 True).image)
        err_plain = np.abs(plain - exact).mean()
        err_tail = np.abs(tail - exact).mean()
        assert err_plain > 1e-5, "scene not depth-complex enough to test"
        assert err_tail < 0.6 * err_plain, (m, err_tail, err_plain)

    # m large enough: tail weight ~0, correction a near-no-op
    un96 = np.asarray(_run_m(state, cam, uvs, jac, shs, tex, 96,
                             True).image)
    np.testing.assert_allclose(un96, exact, atol=5e-4)


def test_m_tail_grads_flow_to_texture():
    state, cam, uvs, jac, shs, tex = _scene(n=256, size=32, opacity=2.0)

    def loss(t, m_tail):
        out = _run_m(state, cam, uvs, jac, shs, t, 4, m_tail)
        return (out.image ** 2).sum()

    g_plain = np.asarray(jax.grad(lambda t: loss(t, False))(tex))
    g_tail = np.asarray(jax.grad(lambda t: loss(t, True))(tex))
    assert np.isfinite(g_tail).all()
    # the tail term adds texture gradient mass beyond the truncated slots
    assert np.abs(g_tail).sum() > np.abs(g_plain).sum()
