import jax.numpy as jnp
import numpy as np

from texgs.kernels.knn import mean_sq_dist_3nn


def test_grid_knn():
    # 1D line of points spaced 1 apart: interior points have 3NN sq dists
    # {1, 1, 4} -> mean 2; endpoints {1, 4, 9} -> mean 14/3.
    pts = jnp.stack([jnp.arange(10.0), jnp.zeros(10), jnp.zeros(10)], axis=1)
    d2 = np.asarray(mean_sq_dist_3nn(pts))
    assert np.allclose(d2[1:-1], 2.0, atol=1e-5)
    assert np.allclose(d2[[0, -1]], 14.0 / 3, atol=1e-5)


def test_matches_bruteforce_random():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(333, 3)), jnp.float32)
    got = np.asarray(mean_sq_dist_3nn(pts, block_size=64))
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    d = np.asarray(d) + np.eye(333) * 1e9
    expect = np.sort(d, axis=1)[:, :3].mean(1)
    assert np.allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_tiny_cloud():
    pts = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [0, 2.0, 0]])
    d2 = np.asarray(mean_sq_dist_3nn(pts))
    assert np.allclose(d2[0], (1.0 + 4.0) / 2, atol=1e-5)
