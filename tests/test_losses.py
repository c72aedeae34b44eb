import jax
import jax.numpy as jnp
import numpy as np

from texgs import losses
from texgs.core.camera import look_at_camera


def _rand_img(key, c, h, w):
    return jax.random.uniform(key, (c, h, w))


def test_l1_l2():
    a = jnp.ones((3, 4, 4))
    b = jnp.zeros((3, 4, 4))
    assert np.isclose(losses.l1_loss(a, b), 1.0)
    assert np.isclose(losses.l2_loss(2 * a, b), 4.0)


def test_ssim_self_is_one():
    img = _rand_img(jax.random.PRNGKey(0), 3, 32, 32)
    assert np.isclose(float(losses.ssim_loss(img, img)), 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    key = jax.random.PRNGKey(1)
    img = _rand_img(key, 3, 32, 32)
    noisy = jnp.clip(img + 0.3 * jax.random.normal(key, img.shape), 0, 1)
    assert float(losses.ssim_loss(img, noisy)) < 0.97


def test_ssim_matches_direct_conv2d():
    # cross-check the separable implementation against a direct 2D window
    import math
    key = jax.random.PRNGKey(2)
    img1 = _rand_img(key, 1, 24, 24)
    img2 = _rand_img(jax.random.PRNGKey(3), 1, 24, 24)

    w1d = np.array([math.exp(-((x - 5) ** 2) / (2 * 1.5 ** 2)) for x in range(11)])
    w1d /= w1d.sum()
    w2d = np.outer(w1d, w1d)

    # direct (non-separable) conv via jax
    k = jnp.asarray(w2d, jnp.float32).reshape(1, 1, 11, 11)

    def blur(x):
        return jax.lax.conv_general_dilated(
            x[None], k, (1, 1), [(5, 5), (5, 5)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (1, 1, 24, 24), (1, 1, 11, 11), ("NCHW", "OIHW", "NCHW")))[0]

    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1 ** 2
    s2 = blur(img2 * img2) - mu2 ** 2
    s12 = blur(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    expected = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
                / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))).mean()
    got = losses.ssim_loss(img1, img2)
    assert np.isclose(float(got), float(expected), atol=1e-5)


def test_zero_one_loss():
    v = jnp.full((4,), 0.5)
    assert np.isclose(float(losses.zero_one_loss(v)), 2 * np.log(0.5), atol=1e-6)
    binary = jnp.array([1e-3, 1 - 1e-3])
    assert float(losses.zero_one_loss(binary)) < float(losses.zero_one_loss(v))


def test_smooth_loss_flat_is_zero():
    rgb = jnp.ones((3, 8, 8)) * 0.5
    value = jnp.ones((3, 8, 8)) * 0.3
    mask = jnp.ones((1, 8, 8))
    assert np.isclose(float(losses.smooth_loss(rgb, value, mask)), 0.0, atol=1e-6)
    # non-flat value -> positive
    value2 = value.at[:, :, 4:].set(0.9)
    assert float(losses.smooth_loss(rgb, value2, mask)) > 1e-3


def test_norm_from_depth_plane():
    # A camera looking down -z at a plane z=0 from (0,0,-4): constant view
    # depth 4 => the derived world normal must be +/- z.
    cam = look_at_camera(np.array([0.0, 0.0, -4.0]), np.zeros(3),
                         np.array([0.0, 1.0, 0.0]), 0.6, 0.6, 16, 16)
    depth = jnp.full((1, 16, 16), 4.0)
    # at 16x16 the pixel footprint exceeds the reference's default 1e-2
    # gradient threshold, so pass an appropriately scaled threshold
    normal, mask = losses.norm_from_depth(depth, cam.tanfovx, cam.tanfovy,
                                          jnp.asarray(cam.world_view),
                                          threshold=1.0)
    nz = np.asarray(normal[2])
    assert np.allclose(np.abs(nz), 1.0, atol=1e-3)
    # constant-depth plane viewed head-on: gradients small => mask all 1
    assert float(mask.mean()) == 1.0


def test_norm_loss_identical_is_zero():
    n = jnp.zeros((3, 4, 4)).at[2].set(1.0)
    assert np.isclose(float(losses.norm_loss(n, n)), 0.0, atol=1e-6)
    m = jnp.ones((1, 4, 4))
    assert np.isclose(float(losses.norm_loss(n, -n, m)), 2.0, atol=1e-6)


def test_second_order_smooth_runs():
    v = _rand_img(jax.random.PRNGKey(4), 3, 16, 16)
    rgb = _rand_img(jax.random.PRNGKey(5), 3, 16, 16)
    out = losses.second_order_smooth_loss(v, rgb=rgb)
    assert np.isfinite(float(out))
