"""Standalone evaluation: render a checkpoint over a scene split and report
PSNR / SSIM (+ LPIPS and the paper's geometric-mean avg_error when
available) — the metrics workflow of /root/reference/utils/metrics.py and
train.py's visualize(), as a tool usable on any checkpoint.

  python evaluate.py <config.yaml> --ckpt <ckpt> [--split test|train]
                     [--out metrics.json] [--save_images DIR]
"""

from __future__ import annotations

import json
import os

import numpy as np


def evaluate(cfg, ckpt_path: str, split: str = "test", out_path=None,
             save_images=None, log=None):
    import jax.numpy as jnp

    from texgs.data.scene import create_dataset
    from texgs.io import checkpoint as ckpt
    from texgs.losses import l1_loss, ssim_loss
    from texgs.train.models import create_model
    from texgs.utils import metrics
    from texgs.utils.logger import get_logger

    log = log or get_logger("texgs")
    work_dir = os.path.dirname(out_path) if out_path else "."
    model = create_model(cfg.model_cfg, log, work_dir, False)
    model.bind_train_cfg(cfg.train_cfg, cfg.dataset_cfg.background)
    sd, iteration = ckpt.load(ckpt_path)
    model.load_state_dict(sd, cfg.optim_cfg)

    scene = create_dataset(cfg.dataset_cfg, log, work_dir, debug=cfg.debug)
    cams = (scene.getTestCameras() if split == "test"
            else scene.getTrainCameras())
    if not cams:
        raise ValueError(f"no cameras in split {split}")

    rows = []
    for idx, vp in enumerate(cams):
        pkg = model.visual_step(iteration or 0, 0, vp, None)
        image = jnp.clip(pkg["image"], 0.0, 1.0)
        gt = jnp.clip(vp.image, 0.0, 1.0)
        row = {
            "view": vp.image_name or str(idx),
            "psnr": float(metrics.psnr(image, gt).mean()),
            "ssim": float(ssim_loss(image, gt)),
            "l1": float(l1_loss(image, gt)),
        }
        lp = metrics.lpips(np.asarray(image), np.asarray(gt))
        if lp is not None:
            row["lpips"] = lp
        if vp.normal is not None and "norm" in pkg:
            row["normal_mae_deg"] = float(metrics.mae(
                pkg["norm"], jnp.asarray(vp.normal), vp.alpha_mask))
        rows.append(row)
        if save_images:
            import imageio
            os.makedirs(save_images, exist_ok=True)
            imageio.imwrite(
                os.path.join(save_images, f"{idx:05d}.png"),
                (np.asarray(image).transpose(1, 2, 0) * 255).astype(np.uint8))
        log.info(f"[{row['view']}] psnr {row['psnr']:.2f} "
                 f"ssim {row['ssim']:.4f}")

    summary = {
        "split": split,
        "n_views": len(rows),
        "iteration": iteration,
        "psnr": float(np.mean([r["psnr"] for r in rows])),
        "ssim": float(np.mean([r["ssim"] for r in rows])),
        "l1": float(np.mean([r["l1"] for r in rows])),
    }
    if all("lpips" in r for r in rows):
        summary["lpips"] = float(np.mean([r["lpips"] for r in rows]))
        summary["avg_error"] = metrics.avg_error(
            summary["psnr"], summary["ssim"], summary["lpips"])
    log.info(f"== {split}: PSNR {summary['psnr']:.2f} "
             f"SSIM {summary['ssim']:.4f} over {len(rows)} views ==")

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "views": rows}, f, indent=1)
    return summary, rows


def main():
    from argparse import ArgumentParser
    parser = ArgumentParser(description="Evaluate a checkpoint")
    parser.add_argument("config")
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--split", default="test", choices=["test", "train"])
    parser.add_argument("--out", default=None)
    parser.add_argument("--save_images", default=None)
    args = parser.parse_args()

    from texgs.config import load_config
    cfg = load_config(args.config)
    cfg.debug = False
    evaluate(cfg, args.ckpt, args.split, args.out, args.save_images)


if __name__ == "__main__":
    main()
