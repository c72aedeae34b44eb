"""Procedural dataset: ground truth rendered from a known Gaussian scene.

``data_root_dir: synthetic://blob?n=4096&views=16&size=128`` produces a
fully in-memory SceneInfo whose images/alphas/normals come from the dense
oracle rasterizer over a known Gaussian cloud — the end-to-end smoke-test
scene of BASELINE.json configs[0], with no files on disk.
"""

from __future__ import annotations

import math
from urllib.parse import parse_qs, urlparse

import jax.numpy as jnp
import numpy as np

from texgs.core.state import init_from_pcd
from texgs.data.readers import CameraInfo, SceneInfo, _nerfpp_norm_from_infos
from texgs.data.synthetic import blob_point_cloud, orbit_cameras, sphere_point_cloud
from texgs.kernels import project as proj_k
from texgs.kernels.reference import rasterize_reference
from texgs.utils.graphics import BasicPointCloud


def make_synthetic_scene_info(uri: str, cfg, debug: bool = False) -> SceneInfo:
    parsed = urlparse(uri)
    kind = parsed.netloc or "blob"
    q = {k: v[0] for k, v in parse_qs(parsed.query).items()}
    n = int(q.get("n", 4096))
    views = int(q.get("views", 16))
    size = int(q.get("size", 128))
    seed = int(q.get("seed", 0))
    if debug:
        views = min(views, 6)

    pcd = (sphere_point_cloud(n, seed=seed) if kind == "sphere"
           else blob_point_cloud(n, seed=seed))
    gt_state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=0)
    # boost opacity so the target object is solid
    gt_state = gt_state.replace(
        opacity=jnp.full_like(gt_state.opacity, 4.0))

    cams = orbit_cameras(views, radius=3.5, width=size, height=size)
    bg = jnp.asarray(cfg.get_or("background", [0, 0, 0]), jnp.float32)

    import jax

    @jax.jit
    def render_gt(state, cam):
        colors = proj_k.sh_colors(state.get_features(), state.xyz,
                                  cam.camera_center, 0)
        proj = proj_k.project_gaussians(
            state.xyz, state.get_scaling(), state.get_rotation(),
            state.get_opacity(), colors, cam.world_view, cam.full_proj,
            cam.camera_center, cam.width, cam.height, cam.tanfovx,
            cam.tanfovy)
        return rasterize_reference(proj, cam.height, cam.width, bg)

    infos = []
    for cam in cams:
        out = render_gt(gt_state, cam)
        image = np.clip(np.asarray(out.image).transpose(1, 2, 0), 0, 1)
        alpha = np.asarray(out.alpha[0])
        normal = np.clip(0.5 * (np.asarray(out.norm).transpose(1, 2, 0) + 1),
                         0, 1)
        # recover (R, T) from the orbit camera's row-vector world_view
        w2c = np.asarray(cam.world_view).T
        infos.append(CameraInfo(
            uid=cam.uid, R=w2c[:3, :3].T, T=w2c[:3, 3],
            FovY=cam.fovy, FovX=cam.fovx, image=image,
            image_path=f"synthetic/{cam.image_name}",
            image_name=cam.image_name, width=cam.width, height=cam.height,
            alpha=(alpha > 0.5).astype(np.float32), normal=normal))

    n_test = max(1, views // 8)
    train, test = infos[n_test:], infos[:n_test]

    # Init cloud: noisy subsample of the true surface (plays the role of the
    # SfM sparse cloud).
    rng = np.random.default_rng(seed + 1)
    sel = rng.choice(n, size=min(n, 1024), replace=False)
    noisy = pcd.points[sel] + rng.normal(scale=0.02, size=(len(sel), 3))
    init_pcd = BasicPointCloud(points=noisy.astype(np.float32),
                               colors=pcd.colors[sel],
                               normals=pcd.normals[sel])

    return SceneInfo(point_cloud=init_pcd, train_cameras=train,
                     test_cameras=test,
                     nerf_normalization=_nerfpp_norm_from_infos(train),
                     ply_path=None)
