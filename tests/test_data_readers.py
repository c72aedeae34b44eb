"""Dataset readers over fabricated on-disk scenes: COLMAP binary, Blender
(NeRF-synthetic with normal/alpha companions), NeILF/DTU, and the Scene
auto-detection + resolution rules."""

import json
import os

import numpy as np
import pytest

from texgs.config import Cfg
from texgs.data import colmap as cm
from texgs.data.scene import Scene
from texgs.io import ply as plyio
from texgs.utils.graphics import fov2focal, qvec2rotmat, rotmat2qvec


def _write_img(path, arr):
    import imageio
    imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))


def _random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q, rng.normal(size=3)


@pytest.fixture()
def colmap_scene(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "colmap"
    (root / "sparse" / "0").mkdir(parents=True)
    (root / "images").mkdir()

    w, h = 64, 48
    focal = 60.0
    cams = {1: cm.ColmapCamera(1, "PINHOLE", w, h,
                               np.array([focal, focal, w / 2, h / 2]))}
    images = {}
    for i in range(10):
        q, t = _random_pose(rng)
        name = f"img_{i:03d}.png"
        images[i + 1] = cm.ColmapImage(i + 1, q, t, 1, name)
        _write_img(root / "images" / name, rng.uniform(size=(h, w, 3)))

    cm.write_cameras_binary(root / "sparse/0/cameras.bin", cams)
    cm.write_images_binary(root / "sparse/0/images.bin", images)
    xyz = rng.normal(size=(100, 3))
    rgb = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    cm.write_points3d_binary(root / "sparse/0/points3D.bin", xyz, rgb)
    return root, images, xyz


def test_colmap_binary_roundtrip(colmap_scene):
    root, images, xyz = colmap_scene
    cams2 = cm.read_cameras_binary(root / "sparse/0/cameras.bin")
    assert cams2[1].model == "PINHOLE"
    ims2 = cm.read_images_binary(root / "sparse/0/images.bin")
    assert len(ims2) == 10
    np.testing.assert_allclose(ims2[3].qvec, images[3].qvec)
    assert ims2[3].name == images[3].name
    xyz2, rgb2, _ = cm.read_points3d_binary(root / "sparse/0/points3D.bin")
    np.testing.assert_allclose(xyz2, xyz)


def test_colmap_scene_reader(colmap_scene, tmp_path):
    root, _, _ = colmap_scene
    log = _log()
    cfg = Cfg(dict(type="scene", data_root_dir=str(root), eval=True,
                   background=[0, 0, 0], shuffle=False,
                   resolution_scales=[1.0], resolution=1,
                   save_init_pcd=False, save_cameras=False))
    scene = Scene(cfg, log, str(tmp_path))
    # llffhold=8: every 8th of 10 -> 2 test cams
    assert len(scene.getTestCameras()) == 2
    assert len(scene.getTrainCameras()) == 8
    cam = scene.getTrainCameras()[0]
    assert cam.image.shape == (3, 48, 64)
    assert scene.cameras_extent > 0
    # ply conversion side effect
    assert os.path.exists(root / "sparse/0/points3D.ply")


@pytest.fixture()
def blender_scene(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "blender"
    (root / "train").mkdir(parents=True)
    (root / "test").mkdir(parents=True)

    def make_split(split, n):
        frames = []
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3) * 3
            name = f"./{split}/r_{i}"
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
            rgba = rng.uniform(size=(32, 32, 4))
            _write_img(root / f"{split}/r_{i}.png", rgba)
            normal = rng.uniform(size=(32, 32, 3))
            _write_img(root / f"{split}/r_{i}_normal.png", normal)
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    make_split("train", 6)
    make_split("test", 2)
    return root


def test_blender_scene_reader(blender_scene, tmp_path):
    log = _log()
    cfg = Cfg(dict(type="scene", data_root_dir=str(blender_scene), eval=True,
                   background=[1, 1, 1], shuffle=False,
                   resolution_scales=[1.0], resolution=1,
                   save_init_pcd=False, save_cameras=False))
    scene = Scene(cfg, log, str(tmp_path))
    assert len(scene.getTrainCameras()) == 6
    assert len(scene.getTestCameras()) == 2
    cam = scene.getTrainCameras()[0]
    assert cam.image.shape == (3, 32, 32)
    assert cam.normal is not None and cam.normal.shape == (3, 32, 32)
    assert cam.alpha_mask is not None
    # random 100k init cloud generated + persisted
    assert scene.scene_info.point_cloud.points.shape[0] == 100_000
    assert os.path.exists(blender_scene / "points3d.ply")


@pytest.fixture()
def neilf_scene(tmp_path):
    rng = np.random.default_rng(2)
    root = tmp_path / "dtu_scan"
    inputs = root / "inputs"
    for sub in ("images", "depths", "normals", "pmasks", "model"):
        (inputs / sub).mkdir(parents=True)

    h, w = 24, 32
    image_paths = {}
    cam_map = {}
    for i in range(8):
        q, t = _random_pose(rng)
        R = qvec2rotmat(q)
        ext = np.eye(4)
        ext[:3, :3] = R.T
        ext[:3, 3] = t
        name = f"images/{i:06d}.png"
        image_paths[str(i)] = name
        cam_map[str(i)] = {
            "flg": 2,
            "camera": {
                "extrinsic": ext.reshape(-1).tolist(),
                "intrinsic": {"focal": [40.0, 40.0], "ppt": [w / 2, h / 2]},
            },
        }
        _write_img(inputs / name, rng.uniform(size=(h, w, 3)))
        import imageio
        imageio.imwrite(inputs / "depths" / f"{i:06d}.tiff",
                        rng.uniform(1, 3, (h, w)).astype(np.float32))
        # PF (color) pfm normal file
        nrm = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
        with open(inputs / "normals" / f"{i:06d}.pfm", "wb") as f:
            f.write(b"PF\n")
            f.write(f"{w} {h}\n".encode())
            f.write(b"-1.0\n")
            nrm[::-1].astype("<f4").tofile(f)
        mask = (rng.uniform(size=(h, w)) > 0.3).astype(np.float32)
        _write_img(inputs / "pmasks" / f"{i:06d}.png", mask)

    bbox = np.eye(4) * 2.0
    bbox[3, 3] = 1.0
    with open(inputs / "sfm_scene.json", "w") as f:
        json.dump({
            "bbox": {"transform": bbox.reshape(-1).tolist()},
            "image_path": {"file_paths": image_paths},
            "camera_track_map": {"images": cam_map},
        }, f)
    pts = rng.normal(size=(50, 3))
    plyio.write_ply_xyz(inputs / "model" / "sparse.ply", pts,
                        colors=rng.uniform(size=(50, 3)),
                        normals=np.zeros((50, 3)))
    return root


def test_neilf_scene_reader(neilf_scene, tmp_path):
    log = _log()
    cfg = Cfg(dict(type="scene", data_root_dir=str(neilf_scene), eval=True,
                   background=[0, 0, 0], shuffle=False,
                   resolution_scales=[1.0], resolution=1,
                   save_init_pcd=False, save_cameras=False))
    scene = Scene(cfg, log, str(tmp_path))
    # validation indexes [6, 13, 30, 35]: only 6 exists among 0..7
    assert len(scene.getTestCameras()) == 1
    assert len(scene.getTrainCameras()) == 7
    cam = scene.getTrainCameras()[0]
    assert cam.image.shape == (3, 24, 32)
    assert cam.depth is not None and cam.depth.shape == (1, 24, 32)
    assert cam.normal is not None
    assert cam.alpha_mask is not None
    # bbox rescale applied to the sparse cloud
    assert os.path.exists(neilf_scene / "inputs/model/sparse_bbx_scale.ply")


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(77, 3)).astype(np.float32)
    colors = rng.uniform(size=(77, 3)).astype(np.float32)
    path = tmp_path / "x.ply"
    plyio.write_ply_xyz(path, pts, colors=colors, normals=pts * 0.5)
    pcd = plyio.read_pcd(path)
    np.testing.assert_allclose(pcd.points, pts, atol=1e-6)
    np.testing.assert_allclose(pcd.colors, colors, atol=1 / 255 + 1e-6)
    np.testing.assert_allclose(pcd.normals, pts * 0.5, atol=1e-6)


def test_resolution_cap(tmp_path, blender_scene):
    # resolution -1 with width > 1600 downsamples to 1600
    from texgs.data.readers import CameraInfo
    from texgs.data.scene import load_camera
    rng = np.random.default_rng(4)
    info = CameraInfo(uid=0, R=np.eye(3), T=np.zeros(3), FovY=0.8, FovX=0.8,
                      image=rng.uniform(size=(1200, 2000, 3)),
                      image_path="", image_name="big", width=2000,
                      height=1200)
    cfg = Cfg(dict(resolution=-1))
    cam = load_camera(cfg, 0, info, 1.0)
    assert cam.width == 1600 and cam.height == 960


def _log():
    from texgs.utils.logger import get_logger
    return get_logger("texgs-test")


def test_camera_uids_unique_across_splits(blender_scene, tmp_path):
    """Regression: train/test uids must not collide (stage-2 caches by uid).

    Reference assigns uids per split (loadCam enumerate), which is safe there
    only because nothing keys on them; our stage-2 depth/alpha cache does."""
    log = _log()
    cfg = Cfg(dict(type="scene", data_root_dir=str(blender_scene), eval=True,
                   background=[1, 1, 1], shuffle=False,
                   resolution_scales=[1.0], resolution=1,
                   save_init_pcd=False, save_cameras=False))
    scene = Scene(cfg, log, str(tmp_path))
    train_uids = {c.uid for c in scene.getTrainCameras()}
    test_uids = {c.uid for c in scene.getTestCameras()}
    assert not (train_uids & test_uids)
    assert len(train_uids) == len(scene.getTrainCameras())
    assert len(test_uids) == len(scene.getTestCameras())


def test_stage2_depth_alpha_cache_keying():
    """A train and a test camera that share a uid (legacy checkpoints /
    hand-built cameras) must not alias in the stage-2 cache."""
    from texgs.core.camera import make_camera
    from texgs.train.uv_map_gaussian3d import UVMapGaussian3D

    model = object.__new__(UVMapGaussian3D)
    model._depth_alpha_cache = {}
    model.gauss = None
    calls = []
    model._render_depth_alpha = lambda gauss, cam: calls.append(cam) or \
        (len(calls), None, None, None)

    def cam(uid, name):
        return make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                           width=8, height=8, uid=uid, image_name=name)

    a = cam(0, "train_0")
    b = cam(0, "test_0")
    assert model.depth_alpha(a)[0] == 1
    assert model.depth_alpha(b)[0] == 2          # would alias pre-fix
    assert model.depth_alpha(a)[0] == 1          # still cached
    assert len(calls) == 2
    # the jitted render sees NORMALIZED statics (camera.jit_view: one
    # trace per capacity, not per view) while the cache keys stay per-view
    assert all(c.uid == 0 and c.image_name == "" for c in calls)


def test_blender_datagen_pose_convention():
    """scripts/render_obj_file.py writes hand-built OpenGL look-at c2w
    matrices (reference scripts/render_obj_file.py:545-564); through the
    Blender reader's convention flip they must put the world origin on the
    camera's +Z optical axis at the orbit radius."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "render_obj_file",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "render_obj_file.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    radius = 1.5
    for elev, azim in [(0, 0), (30, 45), (-20, 200), (85, 310)]:
        pos = mod.orbit_position(elev, azim, radius)
        c2w = mod.lookat_c2w(pos)
        # orthonormal rotation, camera at pos
        np.testing.assert_allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3),
                                   atol=1e-12)
        np.testing.assert_allclose(c2w[:3, 3], pos)
        # reader convention (readers.py read_blender): flip Y/Z columns,
        # invert -> COLMAP w2c with +Z forward
        flipped = c2w.copy()
        flipped[:3, 1:3] *= -1
        w2c = np.linalg.inv(flipped)
        origin_cam = w2c[:3, :3] @ np.zeros(3) + w2c[:3, 3]
        np.testing.assert_allclose(origin_cam, [0, 0, radius], atol=1e-12)

    # northern-hemisphere clamp mirrors z
    pos = mod.orbit_position(-30, 0, radius, only_northern_hemisphere=True)
    assert pos[2] > 0
