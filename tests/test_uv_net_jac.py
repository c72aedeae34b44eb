"""apply_uv_net_with_jac == (apply_uv_net, vmap(jacfwd)) — the hand-rolled
forward-mode pass that replaced jax.linearize in stage-3's _uvs_and_jac
(the linearize JVP graph crashes the TPU compiler at scale; NOTES.md
round 3).  Exactness here is what lets the swap claim identical trainer
semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from texgs.config import Cfg
from texgs.nets.uv_net import (apply_uv_net, apply_uv_net_with_jac,
                               init_uv_net)


def _cfg():
    return Cfg({
        "emb_dim": 16,
        "pre_mlp_cfg": {"n_hidden_layers": 1, "n_neurons": 16},
        "mlp_cfg": {"n_hidden_layers": 2, "n_neurons": 16},
    })


def _setup(n=257, seed=0):
    cfg = _cfg()
    params = init_uv_net(jax.random.PRNGKey(seed), cfg)
    geo = 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 1), (16,))
    xyz = jax.random.normal(jax.random.PRNGKey(seed + 2), (n, 3))
    return cfg, params, geo, xyz


def test_primal_matches_apply_uv_net():
    cfg, params, geo, xyz = _setup()
    uvs_ref = apply_uv_net(params, cfg, xyz, geo)
    uvs, _ = apply_uv_net_with_jac(params, cfg, xyz, geo)
    np.testing.assert_allclose(np.asarray(uvs), np.asarray(uvs_ref),
                               rtol=1e-6, atol=1e-6)


def test_jacobian_matches_jacfwd():
    cfg, params, geo, xyz = _setup()
    _, jac = apply_uv_net_with_jac(params, cfg, xyz, geo)
    jac_ref = jax.vmap(jax.jacfwd(
        lambda p: apply_uv_net(params, cfg, p[None], geo)[0]))(xyz)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref),
                               rtol=1e-5, atol=1e-6)


def test_param_gradients_flow_through_primal_only():
    cfg, params, geo, xyz = _setup()

    def loss_fused(p, g):
        uvs, jac = apply_uv_net_with_jac(p, cfg, xyz, g)
        return (uvs ** 2).sum() + (jac ** 2).sum()

    def loss_ref(p, g):
        return (apply_uv_net(p, cfg, xyz, g) ** 2).sum()

    g1 = jax.grad(loss_fused)(params, geo)
    g2 = jax.grad(loss_ref)(params, geo)
    # jac is stop-grad: the jac**2 term contributes nothing
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_xyz_scale_offset_prescale():
    cfg, params, geo, xyz = _setup()
    cfg.xyz_offset = [0.1, -0.2, 0.3]
    cfg.xyz_scale = [2.0, 0.5, 1.5]
    _, jac = apply_uv_net_with_jac(params, cfg, xyz, geo)
    jac_ref = jax.vmap(jax.jacfwd(
        lambda p: apply_uv_net(params, cfg, p[None], geo)[0]))(xyz)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref),
                               rtol=1e-5, atol=1e-6)
