"""Native C++ IO library vs the pure-Python reference parsers."""

import numpy as np
import pytest

from texgs.data import colmap as cm
from texgs.data import native
from texgs.io import ply as plyio


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return True


def test_points3d_parity(built, tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "points3D.bin"
    xyz = rng.normal(size=(500, 3))
    rgb = rng.integers(0, 255, (500, 3)).astype(np.uint8)
    err = rng.uniform(size=(500, 1))
    cm.write_points3d_binary(path, xyz, rgb, err)

    py = cm.read_points3d_binary(path)
    nat = native.read_points3d_binary(str(path))
    assert nat is not None
    np.testing.assert_allclose(nat[0], py[0])
    np.testing.assert_array_equal(nat[1], py[1])
    np.testing.assert_allclose(nat[2], py[2])


def test_images_cameras_parity(built, tmp_path):
    rng = np.random.default_rng(1)
    ipath = tmp_path / "images.bin"
    cpath = tmp_path / "cameras.bin"
    images = {}
    for i in range(25):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        images[i + 1] = cm.ColmapImage(i + 1, q, rng.normal(size=3), 1,
                                       f"frame_{i:04d}.png")
    cams = {1: cm.ColmapCamera(1, "PINHOLE", 800, 600,
                               np.array([500.0, 510.0, 400.0, 300.0])),
            2: cm.ColmapCamera(2, "SIMPLE_PINHOLE", 640, 480,
                               np.array([450.0, 320.0, 240.0]))}
    cm.write_images_binary(ipath, images)
    cm.write_cameras_binary(cpath, cams)

    py_i = cm.read_images_binary(ipath)
    na_i = native.read_images_binary(str(ipath))
    assert na_i is not None and set(na_i) == set(py_i)
    for k in py_i:
        np.testing.assert_allclose(na_i[k].qvec, py_i[k].qvec)
        np.testing.assert_allclose(na_i[k].tvec, py_i[k].tvec)
        assert na_i[k].name == py_i[k].name
        assert na_i[k].camera_id == py_i[k].camera_id

    py_c = cm.read_cameras_binary(cpath)
    na_c = native.read_cameras_binary(str(cpath))
    assert na_c is not None and set(na_c) == set(py_c)
    for k in py_c:
        assert na_c[k].model == py_c[k].model
        assert (na_c[k].width, na_c[k].height) == (py_c[k].width,
                                                  py_c[k].height)
        np.testing.assert_allclose(na_c[k].params, py_c[k].params)


def test_ply_parity(built, tmp_path):
    rng = np.random.default_rng(2)
    path = tmp_path / "cloud.ply"
    pts = rng.normal(size=(333, 3)).astype(np.float32)
    colors = rng.uniform(size=(333, 3)).astype(np.float32)
    normals = rng.normal(size=(333, 3)).astype(np.float32)
    plyio.write_ply_xyz(path, pts, colors=colors, normals=normals)

    nat = native.read_ply_xyz(str(path))
    assert nat is not None
    np.testing.assert_allclose(nat[0], pts, atol=1e-6)
    np.testing.assert_allclose(nat[1], colors, atol=1 / 255 + 1e-6)
    np.testing.assert_allclose(nat[2], normals, atol=1e-6)
