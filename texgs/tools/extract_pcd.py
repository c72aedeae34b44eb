"""Extract a pseudo-GT surface cloud from a stage-1 checkpoint.

Parity with /root/reference/extract_pcd.py: load the stage-1 Gaussians,
farthest-point-sample the centers down to ``num_points`` (default 16384),
save .npy + .ply — the chamfer target for stage 2.
"""

from __future__ import annotations

import os

import numpy as np


def extract_pcd(ckpt_path: str, out_path: str, num_points: int = 16384,
                log=None) -> np.ndarray:
    import jax.numpy as jnp

    from texgs.io import checkpoint as ckpt
    from texgs.io.ply import write_ply_xyz
    from texgs.kernels.chamfer import farthest_point_sampling

    sd, _ = ckpt.load(ckpt_path)
    p = sd["params"]
    n_alive = int(p["n_alive"])
    xyz = jnp.asarray(p["xyz"][:n_alive])
    if log:
        log.info(f"FPS downsampling {n_alive} -> {num_points} points")
    k = min(num_points, n_alive)
    idx = farthest_point_sampling(xyz, k)
    pts = np.asarray(xyz[idx])

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    base = out_path[:-4] if out_path.endswith((".npy", ".ply")) else out_path
    np.save(base + ".npy", pts)
    write_ply_xyz(base + ".ply", pts)
    return pts


def main():
    from argparse import ArgumentParser
    parser = ArgumentParser(description="Extract pseudo-GT point cloud")
    parser.add_argument("config", help="stage-1 config (for work_dir layout) "
                        "or checkpoint path")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--num_points", type=int, default=16384)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    from texgs.utils.logger import get_logger
    log = get_logger("texgs")
    ckpt_path = args.ckpt or args.config
    out = args.out or os.path.join(os.path.dirname(os.path.dirname(ckpt_path)),
                                   "pcd")
    extract_pcd(ckpt_path, out, args.num_points, log)


if __name__ == "__main__":
    main()
