#!/usr/bin/env python
"""Locate the per-iteration host leak (CPU platform, tracemalloc).

r5_leak_probe measured ~410 KiB/iter on CPU — so the leak is in the
Python/jax stack, not (only) the axon tunnel client.  This probe trains
the same tiny stage-1 config, snapshots tracemalloc at iter 200 and
iter 800, and prints the top allocation-site diffs plus live jax array
counts at both points.
"""
import os
import sys
import tracemalloc

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from texgs.config import load_config
from texgs.data.scene import create_dataset
from texgs.train.models import create_model
from texgs.utils.logger import get_logger


def main():
    cfg = load_config("/root/repo/configs/synthetic_smoke.yaml")
    cfg.work_dir = "/tmp/texgs_leak_probe2"
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.train_cfg.densify_until_iter = 100
    log = get_logger("texgs-leak2")

    model = create_model(cfg.model_cfg, log, cfg.work_dir, False)
    scene = create_dataset(cfg.dataset_cfg, log, cfg.work_dir, False)
    model.bind_train_cfg(cfg.train_cfg, cfg.dataset_cfg.get_or(
        "background", [0, 0, 0]))
    model.initialize(scene.scene_info.point_cloud, scene.cameras_extent)
    model.setup_optim(cfg.optim_cfg)
    views = list(scene.getTrainCameras())

    tracemalloc.start(10)
    snap1 = None
    n1 = n2 = 0
    for it in range(1, 801):
        vp = views[it % len(views)]
        loss, stats, extra = model.compute_loss(it, 800, vp, None,
                                                cfg.loss_cfg)
        float(loss)
        model.optimize_step(it, 800, cfg.train_cfg, extra)
        if it == 200:
            import gc
            gc.collect()
            snap1 = tracemalloc.take_snapshot()
            n1 = len(jax.live_arrays())
    import gc
    gc.collect()
    snap2 = tracemalloc.take_snapshot()
    n2 = len(jax.live_arrays())
    print(f"live jax arrays: {n1} @200 -> {n2} @800", flush=True)
    for st in snap2.compare_to(snap1, "lineno")[:15]:
        print(st, flush=True)


if __name__ == "__main__":
    main()
