#!/usr/bin/env python
"""Is the ~17 MB/step host-RSS leak ours or the remote-device client's?

Runs the stage-1 trainer on the CPU platform (synthetic scene, tiny
shapes) for a few thousand iterations and prints host RSS every 250.
Linear growth here => the leak is in texgs (pending queue, logger, ...);
flat here => the leak is the axon tunnel client's per-transfer buffers,
and long TPU runs must be segmented via wall-clock ckpts + --resume_from.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from texgs.config import load_config
from texgs.train.driver import _host_rss_gib, train
from texgs.utils.logger import get_logger


def main():
    cfg = load_config("/root/repo/configs/synthetic_smoke.yaml")
    cfg.work_dir = "/tmp/texgs_leak_probe"
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.train_cfg.num_iterations = int(os.environ.get("PROBE_ITERS", 3000))
    cfg.train_cfg.visual_iters = []
    cfg.train_cfg.ckpt_iters = []
    cfg.train_cfg.ckpt_wall_minutes = 0
    cfg.train_cfg.densify_until_iter = 300
    log = get_logger("texgs-leak")

    r0 = _host_rss_gib()
    print(f"rss start {r0:.3f} GiB", flush=True)
    train(cfg, log, None, progress=False)
    r1 = _host_rss_gib()
    print(f"rss end {r1:.3f} GiB (delta {1024*(r1-r0):.1f} MiB "
          f"over 3000 iters = {1024*1024*(r1-r0)/3000:.1f} KiB/iter)",
          flush=True)


if __name__ == "__main__":
    main()
