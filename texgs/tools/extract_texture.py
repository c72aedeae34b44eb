"""Export a stage-3 texture as a cross-layout cubemap PNG.

Parity with /root/reference/extract_texture.py: load the TextureGaussian3D
checkpoint, assemble cube_map(), write PNG.
"""

from __future__ import annotations

import os

import numpy as np


def extract_texture(cfg, ckpt_path: str, out_path: str, log=None):
    import imageio

    from texgs.io import checkpoint as ckpt
    from texgs.train.texture_gaussian3d import TextureGaussian3D
    from texgs.utils.logger import get_logger

    log = log or get_logger("texgs")
    model = TextureGaussian3D(cfg.model_cfg, log, os.path.dirname(out_path))
    sd, _ = ckpt.load(ckpt_path)
    model.load_state_dict(sd, cfg.optim_cfg)
    cube = np.asarray(model.cube_map())
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    imageio.imwrite(out_path, (np.clip(cube, 0, 1) * 255).astype(np.uint8))
    return cube


def main():
    from argparse import ArgumentParser
    parser = ArgumentParser(description="Extract cubemap texture PNG")
    parser.add_argument("config")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, default="texture.png")
    args = parser.parse_args()

    from texgs.config import load_config
    cfg = load_config(args.config)
    extract_texture(cfg, args.ckpt, args.out)


if __name__ == "__main__":
    main()
