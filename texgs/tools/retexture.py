"""Texture swapping + full-view rendering (appearance editing inference).

Parity with /root/reference/retexture.py: load a stage-3 checkpoint,
optionally replace the texture from a cross-layout cubemap PNG
(change_texture blend modes), render every train/test view composited over
the background with the GT alpha, write PNGs.
"""

from __future__ import annotations

import os

import numpy as np


def render_views(model, cameras, out_dir: str, bg, log=None):
    import imageio
    import jax.numpy as jnp

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for idx, vp in enumerate(cameras):
        pkg = model.visual_step(0, 0, vp, None)
        image = np.asarray(jnp.clip(pkg["image"], 0, 1))
        if vp.alpha_mask is not None:
            gt_alpha = np.asarray(vp.alpha_mask)
            bg_np = np.asarray(bg, np.float32).reshape(3, 1, 1)
            image = image * gt_alpha + bg_np * (1 - gt_alpha)
        path = os.path.join(out_dir, f"{idx:05d}.png")
        imageio.imwrite(path, (image.transpose(1, 2, 0) * 255).astype(np.uint8))
        paths.append(path)
    if log:
        log.info(f"wrote {len(paths)} views to {out_dir}")
    return paths


def retexture(cfg, ckpt_path: str, out_dir: str,
              load_texture_from: str | None = None, mode: int = 0,
              splits=("train", "test"), log=None):
    import imageio

    from texgs.data.scene import create_dataset
    from texgs.io import checkpoint as ckpt
    from texgs.train.texture_gaussian3d import TextureGaussian3D
    from texgs.utils.logger import get_logger

    log = log or get_logger("texgs")
    os.makedirs(out_dir, exist_ok=True)
    model = TextureGaussian3D(cfg.model_cfg, log, out_dir)
    model.bind_train_cfg(cfg.train_cfg, cfg.dataset_cfg.background)
    sd, _ = ckpt.load(ckpt_path)
    model.load_state_dict(sd, cfg.optim_cfg)

    if load_texture_from:
        img = np.asarray(imageio.imread(load_texture_from), np.float32) / 255.0
        res = model.tex_res
        if img.shape[:2] != (3 * res, 4 * res):
            from PIL import Image
            pil = Image.fromarray((img[..., :3] * 255).astype(np.uint8))
            img = np.asarray(pil.resize((4 * res, 3 * res)), np.float32) / 255.0
        model.change_texture(img[..., :3], mode=mode)
        log.info(f"applied texture {load_texture_from} (mode {mode})")

    scene = create_dataset(cfg.dataset_cfg, log, out_dir, debug=cfg.debug)
    bg = cfg.dataset_cfg.get_or("background", [0, 0, 0])
    outs = {}
    if "train" in splits:
        outs["train"] = render_views(model, scene.getTrainCameras(),
                                     os.path.join(out_dir, "train"), bg, log)
    if "test" in splits:
        outs["test"] = render_views(model, scene.getTestCameras(),
                                    os.path.join(out_dir, "test"), bg, log)
    return model, outs


def main():
    from argparse import ArgumentParser
    parser = ArgumentParser(description="Retexture + render all views")
    parser.add_argument("config")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, default="./retexture_out")
    parser.add_argument("--load_texture_from", type=str, default=None)
    parser.add_argument("--mode", type=int, default=0,
                        help="-1 replace, 0 luminance, 1 multiply, 2 divide, "
                             "3 masked blend")
    args = parser.parse_args()

    from texgs.config import load_config
    cfg = load_config(args.config)
    cfg.debug = False
    retexture(cfg, args.ckpt, args.out, args.load_texture_from, args.mode)


if __name__ == "__main__":
    main()
