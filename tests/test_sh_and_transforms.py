import jax
import jax.numpy as jnp
import numpy as np

from texgs.utils import sh as sh_mod
from texgs.utils import transforms


def test_sh_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    assert np.allclose(sh_mod.sh2rgb(sh_mod.rgb2sh(rgb)), rgb, atol=1e-6)


def test_sh_degree0_constant():
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.normal(size=(5, 3, 16)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = sh_mod.eval_sh(0, coeffs, dirs)
    assert np.allclose(out, sh_mod.C0 * coeffs[..., 0], atol=1e-6)


def test_sh_orthonormality_montecarlo():
    # SH basis functions must be orthonormal on the sphere: estimate the
    # Gram matrix by Monte-Carlo and compare to identity (deg <= 2 here).
    rng = np.random.default_rng(1)
    n = 200000
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # basis value of each of the 9 functions at each dir: feed one-hot coeffs
    eye = jnp.eye(9)[None, :, :].repeat(n, axis=0)  # (n, 9, 9) channel=coeff
    vals = sh_mod.eval_sh(2, eye.transpose(0, 2, 1), jnp.asarray(dirs, jnp.float32))
    vals = np.asarray(vals)  # (n, 9)
    gram = 4 * np.pi * vals.T @ vals / n
    assert np.allclose(gram, np.eye(9), atol=0.15)


def test_build_rotation_orthonormal():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
    R = transforms.build_rotation(q)
    eye = jnp.eye(3)[None].repeat(10, axis=0)
    assert np.allclose(R @ jnp.swapaxes(R, 1, 2), eye, atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_identity_quat_rotation():
    q = jnp.array([[1.0, 0, 0, 0]])
    assert np.allclose(transforms.build_rotation(q)[0], np.eye(3), atol=1e-7)


def test_covariance_psd_and_pack_roundtrip():
    rng = np.random.default_rng(3)
    s = jnp.asarray(np.exp(rng.normal(size=(8, 3))), jnp.float32)
    q = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    cov = transforms.build_covariance(s, q)
    evals = np.linalg.eigvalsh(np.asarray(cov))
    assert (evals > 0).all()
    packed = transforms.strip_symmetric(cov)
    assert np.allclose(transforms.unstrip_symmetric(packed), cov, atol=1e-6)
    # eigenvalues are the squared scales
    assert np.allclose(np.sort(evals, axis=1),
                       np.sort(np.asarray(s) ** 2, axis=1), rtol=1e-4)
