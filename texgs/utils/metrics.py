"""Evaluation metrics (parity: /root/reference/utils/metrics.py).

psnr/ssim in jnp; normal mean-angular-error; the paper's geometric-mean
"avg_error"; LPIPS is optional (torchvision VGG backbone) and degrades to
None when unavailable — the reference lazy-imports lpips the same way
(utils/metrics.py:49-58).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def psnr(img1, img2):
    """Per-image PSNR over flattened pixels (parity: metrics.py:21-23)."""
    mse = ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(1, keepdims=True)
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))


def ssim(img1, img2):
    from texgs.losses import ssim_loss
    return float(ssim_loss(jnp.asarray(img1), jnp.asarray(img2)))


def mae(pred_normal, gt_normal, mask=None):
    """Mean angular error in degrees between normal maps (3, H, W)."""
    cos = (pred_normal * gt_normal).sum(0)
    cos = jnp.clip(cos, -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cos))
    if mask is not None:
        m = mask[0] > 0.5
        return (ang * m).sum() / jnp.maximum(m.sum(), 1)
    return ang.mean()


def avg_error(psnr_v: float, ssim_v: float, lpips_v: float) -> float:
    """Paper's geometric-mean aggregate (metrics.py:60-67)."""
    psnr_term = 10 ** (-psnr_v / 10)
    ssim_term = np.sqrt(1 - ssim_v)
    return float(np.exp(np.mean(np.log(np.array(
        [psnr_term, ssim_term, lpips_v])))))


_lpips_model = None


def lpips(img1, img2):
    """LPIPS (VGG), optional: requires the `lpips` package and pretrained
    weights, neither of which ship in a zero-egress environment.  Returns
    None when unavailable — same graceful degradation as the reference's
    lazy import (/root/reference/utils/metrics.py:49-58)."""
    global _lpips_model
    try:
        import lpips as lpips_pkg
        import torch
        if _lpips_model is None:
            _lpips_model = lpips_pkg.LPIPS(net="vgg")
        with torch.no_grad():
            a = torch.from_numpy(np.asarray(img1, np.float32))[None] * 2 - 1
            b = torch.from_numpy(np.asarray(img2, np.float32))[None] * 2 - 1
            return float(_lpips_model(a, b))
    except Exception:
        return None
