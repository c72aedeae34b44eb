"""Windowed SSIM, 11x11 Gaussian window sigma=1.5.

Parity with /root/reference/losses/ssim_loss.py:16-54: depthwise conv with
zero 'same' padding, C1=0.01^2, C2=0.03^2, returns the *similarity* (callers
use 1 - ssim as the loss term).  Implemented as two separable 1D convolutions
so XLA maps it onto cheap fused convs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float):
    xs = [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
          for x in range(window_size)]
    s = sum(xs)
    return tuple(x / s for x in xs)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' zero-padded separable Gaussian blur of (C, H, W)."""
    c = img.shape[0]
    pad = window.shape[0] // 2
    x = img[None]  # (1, C, H, W)
    kh = jnp.tile(window.reshape(1, 1, -1, 1), (c, 1, 1, 1))
    kw = jnp.tile(window.reshape(1, 1, 1, -1), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dn, feature_group_count=c)
    return x[0]


def ssim_loss(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
              sigma: float = 1.5) -> jnp.ndarray:
    """img1, img2: (C, H, W) in [0, 1].  Returns mean SSIM (scalar)."""
    window = jnp.asarray(_gaussian_window(window_size, sigma), img1.dtype)

    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))
    return ssim_map.mean()
