"""Scene readers: COLMAP / Blender(NeRF-synthetic) / NeILF(DTU) / synthetic.

Behavior parity with /root/reference/dataset/dataset_readers.py (cited per
function) re-expressed numpy-first: readers produce ``CameraInfo`` records
holding float arrays (H, W, C) in [0, 1] rather than PIL handles, and the
Scene layer turns them into texgs Camera pytrees.
"""

from __future__ import annotations

import glob
import json
import os
import re
from pathlib import Path
from typing import NamedTuple, Optional

import numpy as np

from texgs.utils.graphics import (BasicPointCloud, focal2fov, fov2focal,
                                  get_nerf_pp_norm, get_world2view,
                                  qvec2rotmat)


class CameraInfo(NamedTuple):
    uid: int
    R: np.ndarray
    T: np.ndarray
    FovY: float
    FovX: float
    image: np.ndarray              # (H, W, 3) float in [0, 1]
    image_path: str
    image_name: str
    width: int
    height: int
    normal: Optional[np.ndarray] = None  # (H, W, 3) in [0, 1] (0.5*(n+1))
    alpha: Optional[np.ndarray] = None   # (H, W) float in [0, 1]
    depth: Optional[np.ndarray] = None   # (H, W) float


class SceneInfo(NamedTuple):
    point_cloud: Optional[BasicPointCloud]
    train_cameras: list
    test_cameras: list
    nerf_normalization: dict
    ply_path: Optional[str]


def _nerfpp_norm_from_infos(cam_infos) -> dict:
    centers = []
    for cam in cam_infos:
        w2c = get_world2view(cam.R, cam.T)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    return get_nerf_pp_norm(np.stack(centers))


def load_img(path: str) -> np.ndarray:
    """LDR image -> float (H, W, C) in [0, 1]
    (dataset_readers.py:286-313, EXR path excluded as in the reference)."""
    import imageio.v2 as imageio
    if "." not in os.path.basename(path):
        files = glob.glob(path + ".*")
        assert files, f"no image file found for {path}"
        path = files[0]
    img = np.asarray(imageio.imread(path), np.float32)
    return img / 255.0


def load_mask(path: str) -> np.ndarray:
    """Binary mask from a grayscale png (> 0.1 threshold on raw values,
    parity with dataset_readers.py:103,427)."""
    import imageio.v2 as imageio
    m = np.asarray(imageio.imread(path, mode="L"))
    return (m > 0.1).astype(np.float32)


def load_pfm(path: str) -> np.ndarray:
    """Portable float map (normals for DTU), vertically flipped
    (dataset_readers.py:316-345)."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError("not a PFM file")
        dims = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dims:
            raise ValueError("malformed PFM header")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
        shape = (height, width, 3) if color else (height, width)
        data = data.reshape(shape)[::-1]
    return np.ascontiguousarray(data)


def load_depth(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    return np.asarray(imageio.imread(path), np.float32)


# ----------------------------------------------------------------- COLMAP

def read_colmap_scene(path: str, images: Optional[str], eval_split: bool,
                      llffhold: int = 8, log=None, debug: bool = False
                      ) -> SceneInfo:
    """COLMAP reader incl. optional ../masks folder
    (dataset_readers.py:65-190)."""
    from texgs.data import colmap as cm
    from texgs.data import native

    sparse = os.path.join(path, "sparse/0")
    extr = intr = None
    if os.path.exists(os.path.join(sparse, "images.bin")):
        # native C++ fast path; the Python parser is the fallback/reference
        extr = native.read_images_binary(os.path.join(sparse, "images.bin"))
        intr = native.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    if extr is None or intr is None:
        try:
            extr = cm.read_images_binary(os.path.join(sparse, "images.bin"))
            intr = cm.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        except FileNotFoundError:
            extr = cm.read_images_text(os.path.join(sparse, "images.txt"))
            intr = cm.read_cameras_text(os.path.join(sparse, "cameras.txt"))

    reading_dir = images if images else "images"
    folder = os.path.join(path, reading_dir)

    infos = []
    for key in extr:
        im = extr[key]
        cam = intr[im.camera_id]
        if cam.model == "SIMPLE_PINHOLE":
            fovx = focal2fov(cam.params[0], cam.width)
            fovy = focal2fov(cam.params[0], cam.height)
        elif cam.model == "PINHOLE":
            fovx = focal2fov(cam.params[0], cam.width)
            fovy = focal2fov(cam.params[1], cam.height)
        else:
            raise AssertionError(
                "only undistorted COLMAP models supported (SIMPLE_PINHOLE / "
                "PINHOLE)")
        R = qvec2rotmat(im.qvec).T
        T = np.array(im.tvec)
        image_path = os.path.join(folder, os.path.basename(im.name))
        image_name = os.path.basename(image_path).split(".")[0]
        img = load_img(image_path)[..., :3]
        mask_path = os.path.join(folder, "../masks", image_name + ".png")
        alpha = None
        if os.path.exists(mask_path):
            alpha = load_mask(mask_path)
            img = img * alpha[..., None]
        infos.append(CameraInfo(
            uid=cam.id, R=R, T=T, FovY=fovy, FovX=fovx, image=img,
            image_path=image_path, image_name=image_name,
            width=cam.width, height=cam.height, alpha=alpha))

    infos.sort(key=lambda c: c.image_name)
    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []
    if debug:
        train, test = train[:5], test[:5]

    ply_path = os.path.join(sparse, "points3D.ply")
    from texgs.io import ply as plyio
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = cm.read_points3d_binary(
                os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = cm.read_points3d_text(
                os.path.join(sparse, "points3D.txt"))
        plyio.write_ply_xyz(ply_path, xyz, colors=rgb,
                            normals=np.zeros_like(xyz))
    pcd = plyio.read_pcd(ply_path)

    return SceneInfo(point_cloud=pcd, train_cameras=train, test_cameras=test,
                     nerf_normalization=_nerfpp_norm_from_infos(train),
                     ply_path=ply_path)


# ---------------------------------------------------------------- Blender

def _read_transforms(path: str, transformsfile: str, background,
                     extension: str = ".png", debug: bool = False):
    """NeRF-synthetic camera reader with normal/alpha companion images
    (dataset_readers.py:192-248)."""
    with open(os.path.join(path, transformsfile)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    bg = np.asarray(background, np.float32)

    infos = []
    for idx, frame in enumerate(contents["frames"]):
        if debug and idx > 5:
            break
        image_path = os.path.join(path, frame["file_path"] + extension)
        normal_path = os.path.join(path, frame["file_path"] + "_normal" + extension)
        alpha_path = os.path.join(path, frame["file_path"] + "_alpha" + extension)

        c2w = np.array(frame["transform_matrix"], np.float64)
        # OpenGL/Blender (Y up, Z back) -> COLMAP (Y down, Z forward)
        c2w[:3, 1:3] *= -1
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]

        data = load_img(image_path)
        if data.shape[-1] == 4:
            rgb = data[..., :3] * data[..., 3:4] + bg * (1 - data[..., 3:4])
            file_alpha = data[..., 3]
        else:
            rgb, file_alpha = data[..., :3], None

        normal = load_img(normal_path)[..., :3] if os.path.exists(normal_path) else None
        if os.path.exists(alpha_path):
            alpha = (load_img(alpha_path)[..., 0] > 0).astype(np.float32)
        elif normal is not None:
            # alpha from normal-length fallback (dataset_readers.py:236-241)
            nd = normal * 2.0 - 1.0
            alpha = (np.linalg.norm(nd, axis=-1) > 0.5).astype(np.float32)
        elif file_alpha is not None:
            alpha = (file_alpha > 0).astype(np.float32)
        else:
            alpha = None

        h, w = rgb.shape[:2]
        fovy = focal2fov(fov2focal(fovx, w), h)
        infos.append(CameraInfo(
            uid=idx, R=R, T=T, FovY=fovy, FovX=fovx, image=rgb,
            image_path=image_path, image_name=Path(image_path).stem,
            width=w, height=h, normal=normal, alpha=alpha))
    return infos


def read_blender_scene(path: str, background, eval_split: bool,
                       extension: str = ".png", log=None,
                       debug: bool = False) -> SceneInfo:
    train = _read_transforms(path, "transforms_train.json", background,
                             extension, debug)
    test_file = os.path.join(path, "transforms_test.json")
    test = (_read_transforms(path, "transforms_test.json", background,
                             extension, debug)
            if os.path.exists(test_file) else [])
    if not eval_split:
        train = train + test
        test = []

    ply_path = os.path.join(path, "points3d.ply")
    from texgs.io import ply as plyio
    from texgs.utils.sh import sh2rgb
    if not os.path.exists(ply_path):
        num_pts = 100_000
        if log:
            log.info(f"Generating random point cloud ({num_pts})...")
        xyz = np.random.random((num_pts, 3)) * 2.6 - 1.3
        colors = np.asarray(sh2rgb(np.random.random((num_pts, 3)) / 255.0))
        plyio.write_ply_xyz(ply_path, xyz, colors=colors,
                            normals=np.zeros_like(xyz))
    pcd = plyio.read_pcd(ply_path)

    return SceneInfo(point_cloud=pcd, train_cameras=train, test_cameras=test,
                     nerf_normalization=_nerfpp_norm_from_infos(train),
                     ply_path=ply_path)


# ------------------------------------------------------------------ NeILF

def read_neilf_scene(path: str, background, eval_split: bool, log=None,
                     debug: bool = False) -> SceneInfo:
    """NeILF/DTU reader: sfm_scene.json + per-view depth/normal/mask, bbox
    rescale, fixed validation indexes [6, 13, 30, 35]
    (dataset_readers.py:360-500)."""
    validation_indexes = []
    if eval_split:
        if "dtu" in path.lower():
            validation_indexes = [6, 13, 30, 35]
        else:
            raise NotImplementedError("NeILF eval split only defined for DTU")

    inputs = os.path.join(path, "inputs")
    with open(os.path.join(inputs, "sfm_scene.json")) as f:
        sfm = json.load(f)

    bbox_transform = np.array(sfm["bbox"]["transform"]).reshape(4, 4).copy()
    diag = bbox_transform[[0, 1, 2], [0, 1, 2]]
    bbox_transform[[0, 1, 2], [0, 1, 2]] = diag.max() / 2
    bbox_inv = np.linalg.inv(bbox_transform)

    image_list = sfm["image_path"]["file_paths"]
    train, test = [], []
    for i, (index, cam_info) in enumerate(sfm["camera_track_map"]["images"].items()):
        if debug and i >= 5:
            break
        if cam_info["flg"] != 2:
            continue
        extrinsic = np.array(cam_info["camera"]["extrinsic"]).reshape(4, 4)
        c2w = np.linalg.inv(extrinsic)
        c2w[:3, 3] = (c2w[:4, 3] @ bbox_inv.T)[:3]
        extrinsic = np.linalg.inv(c2w)
        R = extrinsic[:3, :3].T
        T = extrinsic[:3, 3]
        focal = cam_info["camera"]["intrinsic"]["focal"]

        image_path = os.path.join(inputs, image_list[index])
        base = os.path.basename(image_list[index])
        ext = os.path.splitext(image_list[index])[-1]
        img = load_img(image_path)[..., :3]

        depth_path = os.path.join(inputs, "depths", base.replace(ext, ".tiff"))
        depth = load_depth(depth_path) * bbox_inv[0, 0] \
            if os.path.exists(depth_path) else None
        normal_path = os.path.join(inputs, "normals", base.replace(ext, ".pfm"))
        normal = load_pfm(normal_path) if os.path.exists(normal_path) else None
        mask_path = os.path.join(inputs, "pmasks", base.replace(ext, ".png"))
        mask = load_mask(mask_path) if os.path.exists(mask_path) \
            else np.ones(img.shape[:2], np.float32)

        img = img * mask[..., None]
        is_test = int(index) in validation_indexes
        if not is_test:
            if depth is not None:
                depth = depth * mask
            if normal is not None:
                normal = normal * mask[..., None]
        if normal is not None:
            normal = (normal + 1.0) / 2.0  # store in [0, 1] like image files

        h, w = img.shape[:2]
        info = CameraInfo(
            uid=int(index), R=R, T=T,
            FovY=focal2fov(focal[1], h), FovX=focal2fov(focal[0], w),
            image=img, image_path=image_path, image_name=Path(image_path).stem,
            width=w, height=h, alpha=mask, normal=normal, depth=depth)
        (test if is_test else train).append(info)

    # sparse point cloud rescaled into the bbox frame
    from texgs.io import ply as plyio
    ply_path = os.path.join(inputs, "model", "sparse_bbx_scale.ply")
    if not os.path.exists(ply_path):
        org = plyio.read_pcd(os.path.join(inputs, "model", "sparse.ply"))
        pts = np.concatenate([org.points, np.ones_like(org.points[:, :1])],
                             axis=-1)
        xyz = (pts @ bbox_inv.T)[:, :3]
        plyio.write_ply_xyz(ply_path, xyz, colors=org.colors,
                            normals=org.normals)
    pcd = plyio.read_pcd(ply_path)

    return SceneInfo(point_cloud=pcd, train_cameras=train, test_cameras=test,
                     nerf_normalization=_nerfpp_norm_from_infos(train),
                     ply_path=ply_path)
