"""Scene container: dataset auto-detection, camera building, extents.

Parity with /root/reference/dataset/scene.py:8-72 — marker-file detection
(sparse/ -> COLMAP, transforms_train.json -> Blender, inputs/sfm_scene.json
-> NeILF), input.ply + cameras.json dumps, shuffling, nerf++ extent, and
the per-resolution-scale camera lists with the reference's resolution
rules (utils/cameras.py:81-127: -1 caps width at 1600px).

Adds a "synthetic" procedural dataset (cfg.data_root_dir == "synthetic://
<kind>?n=...&views=...") whose ground truth is rendered from a known
Gaussian scene — the debug-mode tiny-scene idea from SURVEY.md §4, with no
data on disk.
"""

from __future__ import annotations

import json
import os
import random
from typing import Optional

import numpy as np

from texgs.config import Cfg
from texgs.core.camera import Camera, make_camera
from texgs.data.readers import (CameraInfo, SceneInfo, read_blender_scene,
                                read_colmap_scene, read_neilf_scene)
from texgs.utils.graphics import fov2focal

_WARNED_BIG = False


def _resize(img: np.ndarray, resolution: tuple[int, int]) -> np.ndarray:
    """PIL-equivalent resize of (H, W[, C]) float arrays to (W', H')."""
    from PIL import Image
    w, h = resolution
    if img.shape[1] == w and img.shape[0] == h:
        return np.asarray(img, np.float32)
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        pil = Image.fromarray((arr * 255).astype(np.uint8), "L")
        return np.asarray(pil.resize((w, h)), np.float32) / 255.0
    chans = [Image.fromarray((arr[..., c] * 255).astype(np.uint8), "L")
             .resize((w, h)) for c in range(arr.shape[-1])]
    return np.stack([np.asarray(c, np.float32) / 255.0 for c in chans], -1)


def _stage(cam: Camera) -> Camera:
    """Device-stage a camera's array leaves ONCE at scene-load time.

    Cameras are jit arguments, so numpy leaves (the 5.8 MB ground-truth
    image above all) would be host->device transferred on EVERY train
    step — on the remote-TPU platform that is a per-step tunnel transfer
    whose client-side buffer is never reclaimed (measured ~6 MB/step of
    host RSS growth in the round-5 stage-3 production run, ~60 GB over a
    10k-iter stage; see NOTES.md).  Staging the leaves as device arrays
    up front removes both the per-step transfer and the leak.  Device
    cost: n_views x ~8 MB — 0.5 GB HBM for the 72-view production scene.
    """
    import jax

    return jax.tree.map(jax.device_put, cam)


def load_camera(cfg: Cfg, uid: int, info: CameraInfo,
                resolution_scale: float) -> Camera:
    """CameraInfo -> Camera with the reference resolution rules."""
    global _WARNED_BIG
    orig_w, orig_h = info.width, info.height
    res_setting = cfg.get_or("resolution", -1)
    if res_setting in (1, 2, 4, 8):
        resolution = (round(orig_w / (resolution_scale * res_setting)),
                      round(orig_h / (resolution_scale * res_setting)))
    else:
        if res_setting == -1:
            if orig_w > 1600:
                if not _WARNED_BIG:
                    print("[ INFO ] large input images (>1.6K width), "
                          "rescaling to 1.6K — set resolution=1 to disable")
                    _WARNED_BIG = True
                global_down = orig_w / 1600
            else:
                global_down = 1
        else:
            global_down = orig_w / res_setting
        scale = float(global_down) * float(resolution_scale)
        resolution = (int(orig_w / scale), int(orig_h / scale))

    image = _resize(info.image, resolution).transpose(2, 0, 1)

    alpha = None
    if info.alpha is not None:
        alpha = (_resize(info.alpha, resolution) > 0).astype(np.float32)[None]
    elif info.image.shape[-1] == 4:
        alpha = _resize(info.image[..., 3], resolution)[None]

    normal = None
    if info.normal is not None:
        normal = _resize(info.normal, resolution).transpose(2, 0, 1) * 2.0 - 1.0

    depth = None
    if info.depth is not None and (resolution
                                   == (info.depth.shape[1], info.depth.shape[0])):
        depth = np.asarray(info.depth, np.float32)[None]

    return make_camera(info.R, info.T, info.FovX, info.FovY,
                       resolution[0], resolution[1], image=image,
                       alpha_mask=alpha, normal=normal, depth=depth,
                       uid=uid, image_name=info.image_name)


def camera_to_json(uid: int, info: CameraInfo) -> dict:
    rt = np.zeros((4, 4))
    rt[:3, :3] = info.R.transpose()
    rt[:3, 3] = info.T
    rt[3, 3] = 1.0
    w2c = np.linalg.inv(rt)
    return {
        "id": uid, "img_name": info.image_name,
        "width": info.width, "height": info.height,
        "position": w2c[:3, 3].tolist(),
        "rotation": [r.tolist() for r in w2c[:3, :3]],
        "fy": fov2focal(info.FovY, info.height),
        "fx": fov2focal(info.FovX, info.width),
    }


class Scene:
    scene_info: SceneInfo

    def __init__(self, cfg: Cfg, log, work_dir: str, debug: bool = False):
        self.cfg = cfg
        self.log = log
        self.train_cameras: dict[float, list[Camera]] = {}
        self.test_cameras: dict[float, list[Camera]] = {}

        root = cfg.data_root_dir
        if str(root).startswith("synthetic://"):
            from texgs.data.synthetic_scene import make_synthetic_scene_info
            scene_info = make_synthetic_scene_info(str(root), cfg, debug=debug)
        elif os.path.exists(os.path.join(root, "sparse")):
            log.info("Found colmap folder, assuming Colmap data set!")
            scene_info = read_colmap_scene(root, cfg.get_or("image_path", None),
                                           cfg.eval, log=log, debug=debug)
        elif os.path.exists(os.path.join(root, "transforms_train.json")):
            log.info("Found transforms_train.json, assuming Blender data set!")
            scene_info = read_blender_scene(root, cfg.background, cfg.eval,
                                            log=log, debug=debug)
        elif os.path.exists(os.path.join(root, "inputs/sfm_scene.json")):
            log.info("Found sfm_scene.json, assuming NeILF data set!")
            scene_info = read_neilf_scene(root, cfg.background, cfg.eval,
                                          log=log, debug=debug)
        else:
            raise AssertionError(f"Could not recognize scene type at {root}")
        self.scene_info = scene_info

        if not debug and cfg.save_init_pcd and scene_info.ply_path \
                and os.path.exists(scene_info.ply_path):
            with open(scene_info.ply_path, "rb") as src, \
                    open(os.path.join(work_dir, "input.ply"), "wb") as dst:
                dst.write(src.read())

        if not debug and cfg.save_cameras:
            def dump(cams, filename):
                with open(os.path.join(work_dir, filename), "w") as f:
                    json.dump([camera_to_json(i, c) for i, c in enumerate(cams)], f)
            all_cams = []
            if scene_info.test_cameras:
                dump(scene_info.test_cameras, "test_cameras.json")
                all_cams += scene_info.test_cameras
            if scene_info.train_cameras:
                dump(scene_info.train_cameras, "train_cameras.json")
                all_cams += scene_info.train_cameras
            dump(all_cams, "cameras.json")

        if cfg.shuffle:
            random.shuffle(scene_info.train_cameras)
            random.shuffle(scene_info.test_cameras)

        self.cameras_extent = scene_info.nerf_normalization["radius"]

        # Globally unique uids across splits: test uids continue after the
        # train enumeration.  Per-list enumerate (the reference's scheme,
        # loadCam call sites) collides train uid k with test uid k, and
        # stage 2 caches depth/alpha by uid (uv_map_gaussian3d.depth_alpha)
        # — a collision would serve the wrong camera's cache entry.
        n_train = len(scene_info.train_cameras)
        for rs in (cfg.resolution_scales or [1.0]):
            log.info("Loading Training Cameras")
            self.train_cameras[rs] = [_stage(load_camera(cfg, i, c, rs))
                                      for i, c in enumerate(scene_info.train_cameras)]
            log.info("Loading Test Cameras")
            self.test_cameras[rs] = [_stage(load_camera(cfg, n_train + i, c, rs))
                                     for i, c in enumerate(scene_info.test_cameras)]

    def getTrainCameras(self, scale: float = 1.0) -> list[Camera]:
        return self.train_cameras[scale]

    def getTestCameras(self, scale: float = 1.0) -> list[Camera]:
        return self.test_cameras[scale]


type2dataset = {"scene": Scene}


def create_dataset(cfg: Cfg, *args, **kwargs) -> Scene:
    return type2dataset[cfg.type](cfg, *args, **kwargs)
