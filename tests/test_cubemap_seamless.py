"""Seamless cube-edge filtering (nvdiffrast boundary_mode='cube' parity,
/root/reference/models/uv_map_gaussian3d.py:259 and the uv-tex rasterizer's
fetch).  VERDICT r2 item 5.

The brute-force oracle is a smooth function of DIRECTION baked into texel
centers: a correct seamless filter reconstructs it continuously across face
edges, while edge clamping leaves a visible step there.
"""

import jax
import jax.numpy as jnp
import numpy as np

from texgs.kernels.cubemap import (direction_to_face_uv,
                                   face_uv_to_direction, sample_cubemap)

RES = 32


def _f(d):
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return 0.5 + 0.4 * jnp.stack([
        jnp.sin(2.0 * d[..., 0]), jnp.cos(1.5 * d[..., 1]),
        jnp.sin(1.0 * d[..., 2] + 0.3)], axis=-1)


def _smooth_cubemap(res=RES):
    u = (jnp.arange(res) + 0.5) / res * 2 - 1
    fu, fv = jnp.meshgrid(u, u, indexing="xy")
    faces = []
    for f in range(6):
        d = face_uv_to_direction(jnp.full(fu.shape, f, jnp.int32), fu, fv)
        faces.append(_f(d))
    return jnp.stack(faces)


def _edge_arc(n=256):
    """Dense arc of directions crossing the +x/+z face edge."""
    t = jnp.linspace(-0.3, 0.3, n)
    d = jnp.stack([jnp.cos(t + jnp.pi / 4), 0.2 * jnp.ones_like(t),
                   jnp.sin(t + jnp.pi / 4)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_interior_taps_match_clamp():
    """Away from face edges the seamless path is bit-identical to the old
    clamped path (the re-resolved tap round-trips to the same texel)."""
    tex = _smooth_cubemap()
    rng = np.random.default_rng(0)
    d = rng.normal(size=(4096, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    face, u, v = direction_to_face_uv(jnp.asarray(d))
    interior = (np.abs(np.asarray(u)) < 1 - 2.0 / RES) & \
               (np.abs(np.asarray(v)) < 1 - 2.0 / RES)
    d = jnp.asarray(d[interior])
    np.testing.assert_array_equal(
        np.asarray(sample_cubemap(tex, d, "bilinear")),
        np.asarray(sample_cubemap(tex, d, "bilinear_clamp")))


def test_seam_continuity_and_accuracy():
    tex = _smooth_cubemap()
    d = _edge_arc()
    want = np.asarray(_f(d))
    got_seam = np.asarray(sample_cubemap(tex, d, "bilinear"))
    got_clamp = np.asarray(sample_cubemap(tex, d, "bilinear_clamp"))

    # reconstruction error ~ texel curvature everywhere, including the seam
    err_seam = np.abs(got_seam - want).max()
    err_clamp = np.abs(got_clamp - want).max()
    assert err_seam < 3e-3, err_seam
    assert err_seam < 0.5 * err_clamp, (err_seam, err_clamp)

    # continuity: adjacent samples along the arc never jump more than the
    # smooth function's own local variation allows
    step_f = np.abs(np.diff(want, axis=0)).max()
    step_seam = np.abs(np.diff(got_seam, axis=0)).max()
    assert step_seam < 3 * step_f + 1e-3, (step_seam, step_f)


def test_corner_exact_three_texel_average():
    """A sample at the EXACT cube corner resolves to the mean of the 3
    face-corner texels (nvdiffrast's seamless corner rule), with texture
    gradient 1/3 on each of the 3 faces meeting at the corner."""
    tex = _smooth_cubemap()
    d = jnp.asarray([[1.0, 1.0, 1.0]]) / np.sqrt(3.0)

    val, vjp = jax.vjp(lambda t: sample_cubemap(t, d, "bilinear"), tex)
    (g,) = vjp(jnp.ones_like(val))
    g = np.asarray(g)

    # gradient w.r.t. one output channel touches exactly 3 texels...
    g1 = np.asarray(jax.grad(
        lambda t: sample_cubemap(t, d, "bilinear")[0, 0])(tex))[..., 0]
    nz = np.argwhere(np.abs(g1) > 1e-9)
    assert len(nz) == 3, nz
    # ...one per face, weight 1/3 each
    assert len(set(nz[:, 0])) == 3, nz
    np.testing.assert_allclose(g1[np.abs(g1) > 1e-9], 1.0 / 3.0, rtol=1e-5)
    # and the value is their mean
    texels = np.asarray(tex)[nz[:, 0], nz[:, 1], nz[:, 2]]
    np.testing.assert_allclose(np.asarray(val)[0], texels.mean(axis=0),
                               rtol=1e-5)


def test_corner_taps_finite_and_close():
    """At cube corners (3-texel ambiguity) the corner average must stay
    within the local texel spread of the smooth oracle."""
    tex = _smooth_cubemap()
    corner = jnp.asarray([1.0, 1.0, 1.0])
    rng = np.random.default_rng(1)
    d = corner[None, :] + 0.02 * jnp.asarray(rng.normal(size=(256, 3)),
                                             jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(sample_cubemap(tex, d, "bilinear"))
    want = np.asarray(_f(d))
    assert np.isfinite(got).all()
    assert np.abs(got - want).max() < 2e-2


def test_texel_gradients_cross_edges():
    """d(loss)/d(texture) from samples JUST INSIDE face 0 near its +z edge
    must touch texels of the adjacent face too (clamping kills exactly
    these cross-face cotangents)."""
    tex = _smooth_cubemap()
    # face 0 (+x), u -> -1 edge adjoins face 4 (+z)
    u = jnp.full((64,), -1.0 + 0.2 / RES)
    v = jnp.linspace(-0.8, 0.8, 64)
    d = face_uv_to_direction(jnp.zeros(64, jnp.int32), u, v)

    g = jax.grad(lambda t: sample_cubemap(t, d, "bilinear").sum())(tex)
    g = np.asarray(g)
    assert np.abs(g[0]).sum() > 0          # own face
    assert np.abs(g[4]).sum() > 0, "no cross-edge texture gradient"
    g_clamp = np.asarray(jax.grad(
        lambda t: sample_cubemap(t, d, "bilinear_clamp").sum())(tex))
    assert np.abs(g_clamp[4]).sum() == 0   # the old behavior, for contrast


def test_textile_edge_requests_match_seamless_twin():
    """Edge-crossing requests route through the textile miss correction
    (seamless sample_cubemap), so kernel+correction == seamless twin
    exactly even when footprints straddle face edges."""
    from texgs.kernels.pallas_textile import tex_term_textile
    from texgs.kernels.uvtex_raster import mlist_tex_term

    n_tiles, m, res = 4, 8, 128
    h = w = 32
    pix = 256
    rng = np.random.default_rng(7)
    wgt = (rng.uniform(0.05, 0.4, size=(n_tiles, pix, m))
           .astype(np.float32) * (rng.uniform(size=(n_tiles, pix, m)) < 0.5))
    # directions hugging the +x/+z edge: half the footprints cross it
    t = rng.uniform(-0.1, 0.1, size=(n_tiles, pix, m))
    d = np.stack([np.cos(t + np.pi / 4),
                  0.3 * rng.normal(size=t.shape),
                  np.sin(t + np.pi / 4)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = np.where(wgt[..., None] > 0, d, 0.0)
    mlist = jnp.asarray(np.concatenate([wgt[..., None], d], axis=-1))
    tex = _smooth_cubemap(res)

    img_t = np.asarray(mlist_tex_term(mlist, tex, h, w))
    # catch_size=0: this test pins the EXACT correction path's contract
    # (kernel + correction == seamless twin).  The production default at
    # res >= 128 serves edge-crossers from the bordered catch-all pack
    # instead (seamless but area-filtered at 16^2) — its exact-parity and
    # divergence bounds live in test_textile.py's catch tests.
    img_f, miss, _ = tex_term_textile(mlist, tex, h, w, miss_cap=8192,
                                      catch_size=0)
    assert int(miss) == 0
    # atol 1e-4: the correction accumulates in a different f32
    # order than the twin's in-place sum
    np.testing.assert_allclose(np.asarray(img_f), img_t, atol=1e-4)
