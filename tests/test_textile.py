"""Windowed textile kernel vs the XLA sample_cubemap twin (fwd + VJP).

The kernel-vs-reference-twin pattern (SURVEY.md §4) applied to the
stage-3 texture term: texgs.kernels.pallas_textile must reproduce
uvtex_raster.mlist_tex_term's outputs and gradients (w.r.t. the M-list
slots and the texture) wherever its windows serve the requests; scenes
engineered to overflow the windows must report misses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texgs.kernels.pallas_textile import make_cfg, tex_term_textile
from texgs.kernels.uvtex_raster import mlist_tex_term

H = W = 32          # 2x2 tiles of 16x16
T, PIX, M = 4, 256, 8
RES = 64


def _random_mlist(seed=0, coherent=True, fill=0.6):
    """Synthetic M-lists: per tile the slot uvs cluster around one
    direction (coherent=True mimics a smooth trained UV map)."""
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.01, 0.4, size=(T, PIX, M)).astype(np.float32)
    w = w * (rng.uniform(size=w.shape) < fill)
    if coherent:
        centers = rng.normal(size=(T, 1, 1, 3))
        centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
        dirs = centers + 0.08 * rng.normal(size=(T, PIX, M, 3))
    else:
        dirs = rng.normal(size=(T, PIX, M, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = np.where(w[..., None] > 0, dirs, 0.0)
    return jnp.asarray(
        np.concatenate([w[..., None], dirs], axis=-1).astype(np.float32))


def _texture(seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(6, RES, RES, 3)).astype(np.float32))


@pytest.mark.parametrize("filter_mode", ["bilinear", "nearest"])
def test_textile_forward_matches_twin(filter_mode):
    mlist = _random_mlist()
    tex = _texture()
    want = mlist_tex_term(mlist, tex, H, W, filter_mode)
    got, miss, _ = tex_term_textile(mlist, tex, H, W, filter_mode)
    assert int(miss) == 0, "coherent scene must fit the windows"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_textile_vjp_matches_twin():
    # seed 0 is a zero-miss scene (checked below) — the VJP contract only
    # holds when every request is served; on miss the caller falls back
    mlist = _random_mlist(seed=0)
    tex = _texture(seed=4)
    assert int(tex_term_textile(mlist, tex, H, W)[1]) == 0
    rng = np.random.default_rng(5)
    cot = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))

    def f_twin(ml, tx):
        return jnp.sum(mlist_tex_term(ml, tx, H, W) * cot)

    def f_fast(ml, tx):
        img, _, _ = tex_term_textile(ml, tx, H, W)
        return jnp.sum(img * cot)

    g_ml_t, g_tex_t = jax.grad(f_twin, argnums=(0, 1))(mlist, tex)
    g_ml_f, g_tex_f = jax.grad(f_fast, argnums=(0, 1))(mlist, tex)

    np.testing.assert_allclose(np.asarray(g_tex_f), np.asarray(g_tex_t),
                               atol=3e-5, rtol=1e-3)
    # mlist grads compared on live slots only: the twin also propagates a
    # w-cotangent into w=0 padding slots (C0 * tex at the zero direction),
    # which the M-list VJP discards anyway (documented divergence)
    live = np.asarray(mlist[..., 0]) > 0
    np.testing.assert_allclose(np.asarray(g_ml_f)[live],
                               np.asarray(g_ml_t)[live],
                               atol=3e-5, rtol=1e-3)
    # uv components of dead slots must be zero in both
    assert np.abs(np.asarray(g_ml_f)[~live][..., 1:]).max() == 0.0


def test_textile_reports_misses_on_incoherent_uvs():
    # fully random uvs per slot: > 2 faces per tile and huge bboxes.
    # miss_cap=0 disables the correction so raw misses surface.
    mlist = _random_mlist(seed=7, coherent=False)
    tex = _texture()
    _, miss, _ = tex_term_textile(mlist, tex, H, W, miss_cap=0)
    assert int(miss) > 0


def test_textile_miss_correction_exact():
    """A coherent scene with a few rogue slots: the windowed kernel misses
    them, the K-bounded correction resolves them through the twin's exact
    sample_cubemap path — output and grads must match the twin while the
    reported unserved count stays zero."""
    rng = np.random.default_rng(11)
    ml = np.array(_random_mlist(seed=0))
    rogue = rng.normal(size=(6, 3))
    rogue /= np.linalg.norm(rogue, axis=-1, keepdims=True)
    for i in range(6):                      # scatter across tiles/pixels
        t_i, p_i = i % T, (37 * i) % PIX
        ml[t_i, p_i, 2, 0] = 0.3
        ml[t_i, p_i, 2, 1:] = rogue[i]
    mlist = jnp.asarray(ml)
    tex = _texture(seed=12)
    n_raw = int(tex_term_textile(mlist, tex, H, W, miss_cap=0)[1])
    assert n_raw > 0, "rogue slots must miss the windows"

    want = mlist_tex_term(mlist, tex, H, W)
    got, unserved, _ = tex_term_textile(mlist, tex, H, W)
    assert int(unserved) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    cot = jnp.asarray(np.random.default_rng(13).normal(
        size=(3, H, W)).astype(np.float32))
    g_t = jax.grad(lambda m, tx: jnp.sum(
        mlist_tex_term(m, tx, H, W) * cot), argnums=(0, 1))(mlist, tex)
    g_f = jax.grad(lambda m, tx: jnp.sum(
        tex_term_textile(m, tx, H, W)[0] * cot), argnums=(0, 1))(mlist, tex)
    np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_t[1]),
                               atol=3e-5, rtol=1e-3)
    live = np.asarray(mlist[..., 0]) > 0
    np.testing.assert_allclose(np.asarray(g_f[0])[live],
                               np.asarray(g_t[0])[live],
                               atol=3e-5, rtol=1e-3)


def test_textile_edge_clamp_gradients():
    """Requests right at a face edge: clamped taps must zero the wx/wy
    gradient exactly like the twin's clipped gather."""
    rng = np.random.default_rng(9)
    # directions very close to the +x face center column u ~ +-1 edges
    base = np.array([1.0, 0.0, 0.0])
    dirs = base + np.stack([np.zeros(16), np.linspace(-0.999, 0.999, 16),
                            np.full(16, 0.9993)], axis=-1) * 1.0
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    ml = np.zeros((T, PIX, M, 4), np.float32)
    ml[0, :16, 0, 0] = 0.5
    ml[0, :16, 0, 1:] = dirs
    mlist = jnp.asarray(ml)
    tex = _texture(seed=10)
    cot = jnp.ones((3, H, W), jnp.float32)

    g_t = jax.grad(lambda m: jnp.sum(
        mlist_tex_term(m, tex, H, W) * cot))(mlist)
    g_f = jax.grad(lambda m: jnp.sum(
        tex_term_textile(m, tex, H, W)[0] * cot))(mlist)
    np.testing.assert_allclose(np.asarray(g_f)[0, :16, 0],
                               np.asarray(g_t)[0, :16, 0],
                               atol=3e-5, rtol=1e-3)


def test_textile_cfg_geometry():
    cfg = make_cfg(4, 8, 64)
    assert cfg.w_rows == 64 and cfg.n_half == 1 and cfg.cols == 64
    assert cfg.n_levels == 1 and cfg.atlas_rows == 64
    cfg = make_cfg(1900, 32, 1024)
    assert cfg.w_rows == 72 and cfg.n_half == 2 and cfg.wc == 256
    assert cfg.rq_rows == 64 and cfg.n_blocks == 8
    # mip chain 1024..64 (the last level fits any footprint in one window)
    assert cfg.level_sizes == (1024, 512, 256, 128, 64)
    assert cfg.level_orgs == (0, 1024, 1536, 1792, 1920)
    # production res enables the bordered 16^2 catch-all pack: 24 rows
    # (18 bordered + pad to the 8-row group) after the level rows
    assert cfg.catch_size == 16 and cfg.catch_org == 1992
    assert cfg.catch_rows == 24
    assert cfg.atlas_rows == 2016 and cfg.atlas_rows % 8 == 0


def test_textile_mip_serves_wide_footprints():
    """A tile whose uv footprint spans most of a face must be served from a
    coarser mip level (zero misses) and match the XLA twin sampling the
    explicitly downsampled texture at that level — including the texture
    gradient folded through the mean-pool."""
    from texgs.kernels.pallas_textile import build_atlas, make_cfg, textile_prep

    res = 256
    rng = np.random.default_rng(21)
    tex = jnp.asarray(rng.uniform(size=(6, res, res, 3)).astype(np.float32))

    # all requests on the +x face, spread over ~the whole face: footprint
    # ~res texels >> the 72x128 window at level 0 -> level 2 (size 64)
    ml = np.zeros((T, PIX, M, 4), np.float32)
    yy = np.linspace(-0.9, 0.9, PIX)
    for t_i in range(T):
        for s_i in range(4):
            d = np.stack([np.ones(PIX), yy, np.full(PIX, 0.2 * s_i - 0.3)],
                         axis=-1)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            ml[t_i, :, s_i, 0] = 0.25
            ml[t_i, :, s_i, 1:] = d
    mlist = jnp.asarray(ml)

    cfg = make_cfg(T, M, res)
    assert cfg.level_sizes == (256, 128, 64)
    prep = textile_prep(mlist, cfg)
    assert int(prep.n_miss) == 0, "wide footprint must be mip-served"

    got, unserved, _ = tex_term_textile(mlist, tex, H, W)
    assert int(unserved) == 0

    # twin: bilinear sampling of the level the prep chose.  All requests
    # share one face/slot, so the level is uniform; read it off the meta.
    def down(t, k):
        for _ in range(k):
            s = t.shape[1] // 2
            t = t.reshape(6, s, 2, s, 2, 3).mean(axis=(2, 4))
        return t

    lvl = 2
    def twin(tex_):
        return mlist_tex_term(mlist, down(tex_, lvl), H, W)

    want = twin(tex)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    cot = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    g_t = jax.grad(lambda tx: jnp.sum(twin(tx) * cot))(tex)
    g_f = jax.grad(lambda tx: jnp.sum(
        tex_term_textile(mlist, tx, H, W)[0] * cot))(tex)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_t),
                               atol=3e-5, rtol=1e-3)


# ---------------------------------------------------------------- catch-all

def _edge_mlist(res, seed=3, face_sign=1.0):
    """All requests within half a texel of the +x face's u=+1 edge: every
    bilinear tap crosses the face boundary at every mip level, so without
    the catch-all pack every request would miss its windows."""
    rng = np.random.default_rng(seed)
    w = rng.uniform(0.05, 0.4, size=(T, PIX, M)).astype(np.float32)
    u = 1.0 - rng.uniform(0, 0.9 / (2 * res), size=(T, PIX, M))
    v = rng.uniform(-0.6, 0.6, size=(T, PIX, M))
    # face 0 (+x): u = -z/x, v = -y/x  ->  dir = (1, -v, -u)
    d = np.stack([np.ones_like(u), -v, -u], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(
        np.concatenate([w[..., None], d], axis=-1).astype(np.float32))


def _down(t, size):
    while t.shape[1] > size:
        s = t.shape[1] // 2
        t = t.reshape(6, s, 2, s, 2, 3).mean(axis=(2, 4))
    return t


def test_textile_catch_serves_edge_crossers_exactly():
    """Requests whose taps cross the face edge at every level are served
    by the bordered catch-all pack, seamlessly, matching sample_cubemap of
    the catch_size-downsampled texture exactly (incl. texture grads folded
    through the mip chain and the pack borders)."""
    res = 128
    rng = np.random.default_rng(7)
    tex = jnp.asarray(rng.uniform(size=(6, res, res, 3)).astype(np.float32))
    mlist = _edge_mlist(res)

    got, miss, raw = tex_term_textile(mlist, tex, H, W)
    assert int(miss) == 0 and int(raw) == 0, \
        "catch-all must leave no misses"

    def twin(tx):
        return mlist_tex_term(mlist, _down(tx, 16), H, W)

    want = twin(tex)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)

    cot = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
    g_t = jax.grad(lambda tx: jnp.sum(twin(tx) * cot))(tex)
    g_f = jax.grad(lambda tx: jnp.sum(
        tex_term_textile(mlist, tx, H, W)[0] * cot))(tex)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_t),
                               atol=3e-5, rtol=1e-3)

    # mlist (uv-direction) gradients flow through the catch fraction chain
    g_m = jax.grad(lambda m: jnp.sum(
        tex_term_textile(m, tex, H, W)[0] * cot))(mlist)
    g_mt = jax.grad(lambda m: jnp.sum(
        mlist_tex_term(m, _down(tex, 16), H, W) * cot))(mlist)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_mt),
                               atol=3e-5, rtol=1e-3)


def test_textile_catch_off_still_reports_misses():
    res = 128
    rng = np.random.default_rng(7)
    tex = jnp.asarray(rng.uniform(size=(6, res, res, 3)).astype(np.float32))
    mlist = _edge_mlist(res)
    _, _, raw = tex_term_textile(mlist, tex, H, W, miss_cap=0,
                                 catch_size=0)
    n_act = int(jnp.sum(mlist[..., 0] > 0))
    assert int(raw) == n_act, "with the catch disabled every edge request " \
                              "must be reported missed"


def test_textile_catch_divergence_bounded_incoherent():
    """Incoherent (worst-case) scene at production-style res: the catch
    pack serves what the windows cannot; the result must stay close to the
    exact full-res twin (the catch serves only boundary-band and outlier
    requests, a small minority)."""
    res = 256
    rng = np.random.default_rng(11)
    tex = jnp.asarray(rng.uniform(size=(6, res, res, 3)).astype(np.float32))
    mlist = _random_mlist(seed=5, coherent=False)
    got, miss, raw = tex_term_textile(mlist, tex, H, W)
    assert int(miss) == 0 and int(raw) == 0
    want = mlist_tex_term(mlist, tex, H, W)
    err = float(jnp.mean((got - want) ** 2))
    ref = float(jnp.mean(want ** 2))
    # catch-served requests are area-filtered at 16^2 instead of exact;
    # on this worst case (every slot uv fully random -> a large minority
    # of requests in the cross-face band) the measured divergence is
    # ~3% of signal power; trained scenes serve far fewer via the catch
    # (see NOTES.md round-5 miss anatomy: 4.75% of requests, and those
    # mostly Taylor-overshoot noise)
    assert err < 0.1 * ref, (err, ref)
