"""Bilateral edge-aware smoothness regularizers.

smooth_loss: first-order, 4 neighbour pairs (x, y and both diagonals) with
exp(-|drgb|/gamma) bilateral weights and a mask; parity with
/root/reference/losses/smooth_loss.py:4-27.
second_order_smooth_loss: second-order variant (unused on the reference main
path but part of the public loss API, /root/reference/losses/smooth_loss.py:40-78).
"""

from __future__ import annotations

import jax.numpy as jnp


def smooth_loss(rgb, value, mask=None, gamma: float = 0.1):
    """rgb: (3, H, W) guidance image; value: (C, H, W); mask: (1, H, W)."""
    bilateral = lambda x: jnp.exp(-jnp.abs(x).sum(0, keepdims=True) / gamma)

    w1 = bilateral(rgb[:, :, :-1] - rgb[:, :, 1:])
    w2 = bilateral(rgb[:, :-1, :] - rgb[:, 1:, :])
    w3 = bilateral(rgb[:, :-1, :-1] - rgb[:, 1:, 1:])
    w4 = bilateral(rgb[:, 1:, :-1] - rgb[:, :-1, 1:])

    if mask is not None:
        mask = mask.astype(rgb.dtype)
        w1 = w1 * mask[:, :, :-1] * mask[:, :, 1:]
        w2 = w2 * mask[:, :-1, :] * mask[:, 1:, :]
        w3 = w3 * mask[:, :-1, :-1] * mask[:, 1:, 1:]
        w4 = w4 * mask[:, 1:, :-1] * mask[:, :-1, 1:]

    tv = lambda x: jnp.abs(x).sum()
    l1 = tv(w1 * (value[:, :, :-1] - value[:, :, 1:])) / (w1.sum() + 1e-6)
    l2 = tv(w2 * (value[:, :-1, :] - value[:, 1:, :])) / (w2.sum() + 1e-6)
    l3 = tv(w3 * (value[:, :-1, :-1] - value[:, 1:, 1:])) / (w3.sum() + 1e-6)
    l4 = tv(w4 * (value[:, 1:, :-1] - value[:, :-1, 1:])) / (w4.sum() + 1e-6)
    return (l1 + l2 + l3 + l4) / 4


def second_order_smooth_loss(value, rgb=None, depth=None,
                             depth_threshold: float = 1e-2, alpha=None):
    w_x = w_y = None
    if rgb is not None:
        w_x = jnp.exp(-jnp.abs(rgb[:, :, 1:] - rgb[:, :, :-1]).sum(0, keepdims=True))
        w_y = jnp.exp(-jnp.abs(rgb[:, 1:, :] - rgb[:, :-1, :]).sum(0, keepdims=True))
    if depth is not None:
        w_x = ((depth[:, :, 1:] - depth[:, :, :-1]) < depth_threshold).astype(value.dtype)
        w_y = ((depth[:, 1:, :] - depth[:, :-1, :]) < depth_threshold).astype(value.dtype)
    if alpha is not None:
        w_x = alpha[:, :, 1:] * alpha[:, :, :-1]
        w_y = alpha[:, 1:, :] * alpha[:, :-1, :]

    gx = value[:, :, 1:] - value[:, :, :-1]   # (C, H, W-1)
    gy = value[:, 1:, :] - value[:, :-1, :]   # (C, H-1, W)

    def pad_last(x, n):  # pad width dim on the right
        return jnp.pad(x, ((0, 0), (0, 0), (0, n)))

    def pad_h(x, n):  # pad height dim on the bottom
        return jnp.pad(x, ((0, 0), (0, n), (0, 0)))

    g2x = (pad_last(jnp.abs(gx[:, :, 1:] - gx[:, :, :-1]).sum(0, keepdims=True), 1)
           + pad_h(jnp.abs(gx[:, 1:, :] - gx[:, :-1, :]).sum(0, keepdims=True), 1))
    g2y = (pad_last(jnp.abs(gy[:, :, 1:] - gy[:, :, :-1]).sum(0, keepdims=True), 1)
           + pad_h(jnp.abs(gy[:, 1:, :] - gy[:, :-1, :]).sum(0, keepdims=True), 1))

    if w_x is not None:
        g2x = g2x * w_x
        g2y = g2y * w_y
    return g2x.mean() + g2y.mean()
