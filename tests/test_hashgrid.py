"""Pallas hash-grid gather vs the XLA twin: features + every cotangent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texgs.nets.hashgrid import apply_hashgrid, init_hashgrid


def _setup(n=1500, n_levels=4, f=2, log2=12, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = init_hashgrid(k1, n_levels, f, log2)
    # spread initial table values so gradients are non-trivial
    params = {"table": params["table"]
              + 0.1 * jax.random.normal(k1, params["table"].shape)}
    x = jax.random.uniform(k2, (n, 3))
    return params, x


def test_pallas_hashgrid_matches_xla():
    params, x = _setup()
    want = apply_hashgrid(params, x, backend="xla")
    got = apply_hashgrid(params, x, backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)


def test_pallas_hashgrid_grads_match_xla():
    params, x = _setup(n=700)
    cot = jax.random.normal(jax.random.PRNGKey(3), (700, 4 * 2))

    def loss(backend):
        return lambda t, xx: jnp.sum(
            apply_hashgrid({"table": t}, xx, backend=backend) * cot)

    g_t_x, g_x_x = jax.grad(loss("xla"), argnums=(0, 1))(params["table"], x)
    g_t_p, g_x_p = jax.grad(loss("pallas"), argnums=(0, 1))(params["table"], x)
    np.testing.assert_allclose(np.asarray(g_t_p), np.asarray(g_t_x),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_x_p), np.asarray(g_x_x),
                               atol=1e-4, rtol=1e-4)
    assert np.abs(np.asarray(g_t_p)).max() > 0


@pytest.mark.slow
def test_pallas_hashgrid_jvp_matches_xla():
    """stage-3 computes duv/dxyz with jacfwd (3 JVPs) through the encoding
    — the JVP must flow through the trilinear weights exactly like the
    twin's (the gather itself is tangent-constant)."""
    params, x = _setup(n=500, n_levels=3)
    for seed in range(3):
        tx = jax.random.normal(jax.random.PRNGKey(seed), x.shape)
        _, jvp_x = jax.jvp(
            lambda p: apply_hashgrid(params, p, backend="xla"), (x,), (tx,))
        _, jvp_p = jax.jvp(
            lambda p: apply_hashgrid(params, p, backend="pallas"), (x,), (tx,))
        np.testing.assert_allclose(np.asarray(jvp_p), np.asarray(jvp_x),
                                   atol=1e-4, rtol=1e-4)
