"""L1/L2 pixel losses (parity: /root/reference/losses/pixelwise_loss.py)."""

import jax.numpy as jnp


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()
