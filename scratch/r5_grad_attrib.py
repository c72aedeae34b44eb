#!/usr/bin/env python
"""Which stage-3 loss term inflates Gaussian scales? (round-5 regression)

The production stage-3 run regressed after the Gaussian optimizer engaged
at iter 2500: n_pairs 339k -> 983k, scale q99 doubled, test PSNR
25.26 -> 19.48.  This script loads a mid-run checkpoint and attributes
the log-scaling gradient (negative = Adam grows the Gaussian) to each
loss term, over (a) all alive Gaussians and (b) the top-1% largest — and
re-measures the photometric term at m=32 / m=32+tail / m=128 to test the
m-truncation feedback hypothesis (truncated texture mass -> photometric
gradient inflates splats to compensate).

Usage: python scratch/r5_grad_attrib.py <ckpt> [view_idx]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from texgs import losses
from texgs.config import load_config
from texgs.io import checkpoint as ckpt
from texgs.nets.uv_net import apply_uv_net_with_jac
from texgs.render.uv_tex_render import uv_tex_render

CKPT = sys.argv[1]
VIEW = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    cfg = load_config("/root/repo/output/_run_cfgs/prod_texture.yaml")
    sd, it = ckpt.load(CKPT)
    p = sd["params"]
    n_alive = int(np.asarray(p["n_alive"]))
    uvp = jax.tree.map(jnp.asarray, sd["net_state"])

    from texgs.data.scene import create_dataset
    from texgs.utils.logger import get_logger
    scene = create_dataset(cfg.dataset_cfg, get_logger("attrib"), "/tmp",
                           False)
    cam = scene.getTrainCameras()[VIEW].jit_view()

    xyz = jnp.asarray(p["xyz"])
    alive = (jnp.arange(xyz.shape[0]) < n_alive)
    raw_scaling = jnp.asarray(p["scaling"])
    rotr = jnp.asarray(p["rotation"])
    shs = jnp.asarray(p["shs"])
    tex = jnp.asarray(p["texture"])
    opac_raw = jnp.asarray(p["opacity"])
    print(f"ckpt iter {it}: n_alive {n_alive}", flush=True)

    uvs, jacf = apply_uv_net_with_jac(uvp["uv_net"],
                                      cfg.model_cfg.uv_net_cfg, xyz,
                                      uvp["geo_emb"])
    jacf = jax.lax.stop_gradient(jacf.reshape(-1, 9))
    gt = jnp.asarray(cam.image)
    if cam.alpha_mask is not None:
        gt_alpha = jnp.asarray(cam.alpha_mask)
        print("using TRUE alpha mask, coverage",
              float(gt_alpha.mean()), flush=True)
    else:
        gt_alpha = jnp.ones((1,) + gt.shape[1:], gt.dtype)
        print("NO alpha mask: gt_alpha = ones", flush=True)
    gt_norm = jnp.asarray(cam.normal) if cam.normal is not None else None

    def render(scaling_raw, m, m_tail):
        opacity = jax.nn.sigmoid(opac_raw) * alive[:, None]
        scaling = jnp.exp(scaling_raw)
        rot = rotr / (jnp.linalg.norm(rotr, axis=-1, keepdims=True) + 1e-12)
        return uv_tex_render(
            cam, xyz=xyz, opacity=opacity, scaling=scaling, rotation=rot,
            uvs=uvs, grad_uvs=jacf, texture=tex, shs=shs,
            active_sh_degree=3, bg_color=jnp.zeros(3), m=m,
            backend="fused", tex_backend="textile", with_no_sh=True,
            m_tail=m_tail)

    big_np = np.asarray(jnp.exp(raw_scaling).max(axis=1))
    alive_np = np.asarray(alive)
    thr = float(np.quantile(big_np[alive_np], 0.99))
    topmask = jnp.asarray((big_np >= thr) & alive_np)[:, None]
    nm = float(topmask.sum())

    def report(name, term_fn, m=32, m_tail=False):
        def f(s):
            out = render(s, m, m_tail)
            return term_fn(out)
        g = jax.jit(jax.grad(f))(raw_scaling)
        # dead-capacity slots can carry non-finite partials (exp'd garbage
        # scales); they are gated out of the real update by n_alive masks
        g = jnp.where(jnp.isfinite(g) & alive[:, None], g, 0.0)
        g_all = float(g.sum() / alive.sum() / 3)
        g_top = float((g * topmask).sum() / nm / 3)
        print(f"{name:28s} mean dL/dlog_s all {g_all:+.3e}  "
              f"top1% {g_top:+.3e}", flush=True)

    lam = dict(dssim=0.2, no_sh=2.0, alpha=1.0, norm=0.1, norm_smooth=0.5)

    def rgb_term(out):
        return ((1 - lam["dssim"]) * losses.l1_loss(out["render"], gt)
                + lam["dssim"] * (1 - losses.ssim_loss(out["render"], gt)))

    def nosh_term(out):
        i = out["render_no_sh"]
        return lam["no_sh"] * ((1 - lam["dssim"]) * losses.l1_loss(i, gt)
                               + lam["dssim"] * (1 - losses.ssim_loss(i, gt)))

    def alpha_term(out):
        return lam["alpha"] * losses.l1_loss(out["alpha"], gt_alpha)

    def norm_term(out):
        return lam["norm"] * losses.norm_loss(out["norm"], gt_norm, gt_alpha)

    def smooth_term(out):
        return lam["norm_smooth"] * losses.smooth_loss(gt, out["norm"],
                                                       gt_alpha)

    report("rgb (m=32)", rgb_term)
    report("no_sh (m=32)", nosh_term)
    report("alpha", alpha_term)
    if gt_norm is not None:
        report("norm", norm_term)
    report("norm_smooth", smooth_term)
    # m-truncation sensitivity of the photometric pull
    report("rgb (m=32, tail)", rgb_term, m=32, m_tail=True)
    report("rgb (m=128)", rgb_term, m=128)
    report("no_sh (m=32, tail)", nosh_term, m=32, m_tail=True)
    report("no_sh (m=128)", nosh_term, m=128)

    # truncation saturation: how many pixels fill all 32 slots?
    out = jax.jit(lambda s: render(s, 32, False))(raw_scaling)
    print("n_pairs:", int(out["n_pairs"]), flush=True)


if __name__ == "__main__":
    main()
