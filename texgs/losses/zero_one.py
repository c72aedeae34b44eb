"""Opacity binarization regularizer (parity: /root/reference/losses/zero_one_loss.py).

mean(log v + log(1 - v)) — most negative at v in {0, 1}, pushing opacities
toward binary."""

import jax.numpy as jnp


def zero_one_loss(value, epsilon: float = 1e-3):
    val = jnp.clip(value, epsilon, 1 - epsilon)
    return (jnp.log(val) + jnp.log(1 - val)).mean()
