#!/usr/bin/env python
"""Training CLI (parity: /root/reference/train.py:189-237).

  python train.py <config.yaml> [--workspace ./output] [--run_name NAME]
                  [--debug] [--resume_from CKPT] [--platform cpu|tpu]
"""

from __future__ import annotations

import os
from argparse import ArgumentParser
from datetime import datetime


def parse_args():
    parser = ArgumentParser(description="texgs — Textured Gaussian Splatting on TPU")
    parser.add_argument("config", help="path to config file")
    parser.add_argument("--workspace", type=str, default="./output")
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--debug", action="store_true",
                        help="tiny deterministic run, no artifacts")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (detect_anomaly analogue)")
    parser.add_argument("--resume_from", type=str, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        help="force jax platform (cpu/tpu)")
    parser.add_argument("--seed", type=int, default=0,
                        help="global seed (safe_state analogue)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of iterations "
                             "100-110 to this directory")
    return parser.parse_args()


def main():
    args = parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))

    from texgs.config import dump_config, load_config
    from texgs.train.driver import train, _tb_writer
    from texgs.utils.logger import get_logger

    import random as _random

    import numpy as _np

    _random.seed(args.seed)
    _np.random.seed(args.seed)

    cfg = load_config(args.config)
    cfg.model_cfg.seed = args.seed
    cfg.profile_dir = args.profile_dir
    run_name = args.run_name or os.path.splitext(os.path.basename(args.config))[0]
    cfg.work_dir = os.path.abspath(os.path.join(
        args.workspace, run_name, datetime.now().strftime("%Y-%m-%d_%H-%M-%S")))
    cfg.resume_from = args.resume_from
    cfg.debug = args.debug

    if not cfg.debug:
        os.makedirs(cfg.work_dir, exist_ok=True)
        os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
        dump_config(cfg, os.path.join(cfg.work_dir, "config.yaml"))

    log_file = (os.path.join(cfg.work_dir, "TextureGS.log")
                if not cfg.debug else None)
    log = get_logger(name="texgs", log_file=log_file)
    if not cfg.debug:
        log.info(f"Work folder: {cfg.work_dir}")
    tb_writer = _tb_writer(cfg.work_dir, cfg.debug)

    train(cfg, log, tb_writer)


if __name__ == "__main__":
    main()
