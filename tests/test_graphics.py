import numpy as np

from texgs.core.camera import look_at_camera, make_camera
from texgs.utils import graphics


def test_projection_matrix_values():
    P = graphics.get_projection_matrix(0.01, 100.0, 0.9, 0.7)
    import math
    assert np.isclose(P[0, 0], 0.01 / (math.tan(0.45) * 0.01))
    assert np.isclose(P[1, 1], 1.0 / math.tan(0.35))
    assert np.isclose(P[3, 2], 1.0)
    assert np.isclose(P[2, 2], 100.0 / (100.0 - 0.01))
    assert np.isclose(P[2, 3], -(100.0 * 0.01) / (100.0 - 0.01))
    # z in [0, 1]: near plane maps to 0, far plane to 1 (after w divide)
    for z, expect in [(0.01, 0.0), (100.0, 1.0)]:
        p = P @ np.array([0, 0, z, 1.0])
        assert np.isclose(p[2] / p[3], expect, atol=1e-6)


def test_world2view_camera_center():
    rng = np.random.default_rng(0)
    # random valid rotation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = graphics.qvec2rotmat(q)
    T = rng.normal(size=3)
    w2v = graphics.get_world2view(R, T)
    # camera center = point that maps to the view-space origin
    center = np.linalg.inv(w2v)[:3, 3]
    mapped = w2v @ np.append(center, 1.0)
    assert np.allclose(mapped[:3], 0.0, atol=1e-6)


def test_camera_matrices_row_vector_convention():
    cam = look_at_camera(np.array([0.0, 0.0, -4.0]), np.zeros(3),
                         np.array([0.0, 1.0, 0.0]), 0.8, 0.8, 64, 64)
    # origin is 4 units in front of the camera: view z == 4
    p = np.array([0.0, 0.0, 0.0, 1.0]) @ np.asarray(cam.world_view)
    assert np.isclose(p[2], 4.0, atol=1e-5)
    # and projects to NDC center with clip w == view z
    c = np.array([0.0, 0.0, 0.0, 1.0]) @ np.asarray(cam.full_proj)
    assert np.isclose(c[3], 4.0, atol=1e-5)
    assert np.allclose(c[:2] / c[3], 0.0, atol=1e-6)
    assert np.allclose(np.asarray(cam.camera_center), [0, 0, -4], atol=1e-5)


def test_qvec_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = graphics.qvec2rotmat(q)
        assert np.allclose(graphics.rotmat2qvec(R), q, atol=1e-6)


def test_nerfpp_norm():
    centers = np.array([[1.0, 0, 0], [-1.0, 0, 0], [0, 1.0, 0], [0, -1.0, 0]])
    out = graphics.get_nerf_pp_norm(centers)
    assert np.allclose(out["translate"], 0.0)
    assert np.isclose(out["radius"], 1.1)


def test_fov_focal_roundtrip():
    assert np.isclose(graphics.focal2fov(graphics.fov2focal(0.9, 640), 640), 0.9)
