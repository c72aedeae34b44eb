#!/usr/bin/env python
"""Write a procedural scene to disk in NeRF-synthetic (Blender) format.

The data-prep counterpart of the reference's Blender renderer
(/root/reference/scripts/render_obj_file.py, which drives bpy): produces
``transforms_train.json`` / ``transforms_test.json`` plus per-view PNGs with
``_normal`` / ``_alpha`` companion images, using texgs's own oracle
renderer — so the full on-disk Blender-reader path can be exercised without
Blender.  For real .obj assets, see scripts/render_obj_file.py (requires a
Blender install).

Usage:
  python scripts/make_synthetic_dataset.py out_dir [--kind blob] [--n 4096]
         [--views 64] [--test_views 8] [--size 400]
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TEXGS_CPU"):
    # data prep never needs the TPU; the axon sitecustomize pins
    # JAX_PLATFORMS, so the override must happen through jax.config
    import jax

    jax.config.update("jax_platforms", "cpu")


def _write_pfm(path: str, data: np.ndarray) -> None:
    """Little-endian PFM, vertically flipped (the convention
    texgs.data.readers.load_pfm / the reference's DTU normals use)."""
    data = np.asarray(data, np.float32)
    color = data.ndim == 3 and data.shape[2] == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        data[::-1].astype("<f").tofile(f)


def _write_neilf(args, cams, gt_view, activated, pcd):
    """NeILF/DTU layout: inputs/sfm_scene.json + images/ + depths/*.tiff +
    normals/*.pfm + pmasks/*.png + model/sparse.ply — everything
    texgs.data.readers.read_neilf_scene consumes (mirroring the reference's
    DTU preprocessing, dataset_readers.py:360-500).  All views live in one
    flat index space; the reader's fixed DTU validation indexes pick the
    test split when 'dtu' is in the directory name."""
    import dataclasses as _dc
    import math

    import imageio.v2 as imageio

    inputs = os.path.join(args.out_dir, "inputs")
    for sub in ("images", "depths", "normals", "pmasks", "model"):
        os.makedirs(os.path.join(inputs, sub), exist_ok=True)

    # diag 2 -> the reader's max/2 rule makes bbox_inv the identity (the
    # scene is already unit-scale), so depths/points pass through unchanged
    bbox = {"transform": [2.0, 0, 0, 0, 0, 2.0, 0, 0,
                          0, 0, 2.0, 0, 0, 0, 0, 1.0]}
    file_paths = {}
    images_map = {}
    for i, cam in enumerate(cams):
        out = gt_view(_dc.replace(cam, uid=0, image_name=""), *activated)
        rgb = np.clip(np.asarray(out["render"]).transpose(1, 2, 0), 0, 1)
        alpha = np.clip(np.asarray(out["alpha"][0]), 0, 1)
        normal = np.asarray(out["norm"]).transpose(1, 2, 0)
        depth = np.asarray(out["depth"][0])

        name = f"{i:06d}"
        imageio.imwrite(os.path.join(inputs, "images", name + ".png"),
                        (rgb * 255).astype(np.uint8))
        imageio.imwrite(os.path.join(inputs, "pmasks", name + ".png"),
                        ((alpha > 0.5) * 255).astype(np.uint8))
        _write_pfm(os.path.join(inputs, "normals", name + ".pfm"),
                   np.clip(normal, -1, 1))
        imageio.imwrite(os.path.join(inputs, "depths", name + ".tiff"),
                        depth.astype(np.float32))

        w2c = np.asarray(cam.world_view, np.float64).T  # row-vec -> standard
        fx = cam.width / (2 * math.tan(cam.fovx / 2))
        fy = cam.height / (2 * math.tan(cam.fovy / 2))
        file_paths[str(i)] = f"images/{name}.png"
        images_map[str(i)] = {
            "flg": 2,
            "camera": {"extrinsic": w2c.reshape(-1).tolist(),
                       "intrinsic": {"focal": [fx, fy]}},
        }

    with open(os.path.join(inputs, "sfm_scene.json"), "w") as f:
        json.dump({"bbox": bbox,
                   "image_path": {"file_paths": file_paths},
                   "camera_track_map": {"images": images_map}}, f)

    from texgs.io import ply as plyio
    plyio.write_ply_xyz(os.path.join(inputs, "model", "sparse.ply"),
                        np.asarray(pcd.points),
                        colors=np.asarray(pcd.colors),
                        normals=np.zeros_like(np.asarray(pcd.points)))


def _write_colmap(args, cams, gt_view, activated, pcd):
    """COLMAP layout: sparse/0/{cameras,images,points3D}.bin + images/ —
    everything texgs.data.readers.read_colmap_scene consumes (mirroring the
    reference's primary DTU path, dataset_readers.py:65-190).  PINHOLE
    model; the reader's llffhold=8 split assigns every 8th image (sorted by
    name) to the test set when dataset_cfg.eval is on."""
    import dataclasses as _dc
    import math

    import imageio.v2 as imageio
    import numpy as np

    from texgs.data import colmap as cm
    from texgs.utils.graphics import rotmat2qvec

    sparse = os.path.join(args.out_dir, "sparse", "0")
    img_dir = os.path.join(args.out_dir, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    cameras, images = {}, {}
    for i, cam in enumerate(cams):
        out = gt_view(_dc.replace(cam, uid=0, image_name=""), *activated)
        rgb = np.clip(np.asarray(out["render"]).transpose(1, 2, 0), 0, 1)
        name = f"{i:06d}.png"
        imageio.imwrite(os.path.join(img_dir, name),
                        (rgb * 255).astype(np.uint8))

        w2c = np.asarray(cam.world_view, np.float64).T  # row-vec -> standard
        fx = cam.width / (2 * math.tan(cam.fovx / 2))
        fy = cam.height / (2 * math.tan(cam.fovy / 2))
        cameras[i + 1] = cm.ColmapCamera(
            id=i + 1, model="PINHOLE", width=cam.width, height=cam.height,
            params=np.array([fx, fy, cam.width / 2.0, cam.height / 2.0]))
        images[i + 1] = cm.ColmapImage(
            id=i + 1, qvec=rotmat2qvec(w2c[:3, :3]), tvec=w2c[:3, 3],
            camera_id=i + 1, name=name)

    cm.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cameras)
    cm.write_images_binary(os.path.join(sparse, "images.bin"), images)
    rgbf = np.clip(np.asarray(pcd.colors), 0, 1) * 255
    cm.write_points3d_binary(os.path.join(sparse, "points3D.bin"),
                             np.asarray(pcd.points), rgbf)


def main():
    parser = ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--kind", default="blob",
                        choices=["blob", "sphere", "checker"])
    parser.add_argument("--n", type=int, default=4096)
    parser.add_argument("--views", type=int, default=64)
    parser.add_argument("--test_views", type=int, default=8)
    parser.add_argument("--size", type=int, default=400)
    parser.add_argument("--width", type=int, default=0,
                        help="image width (default: --size, square)")
    parser.add_argument("--height", type=int, default=0)
    parser.add_argument("--spiral", action="store_true",
                        help="spiral orbit (elevation sweep) instead of a "
                             "single ring — full-sphere coverage for "
                             "UV/texture training")
    parser.add_argument("--backend", default="reference",
                        choices=["reference", "scan", "pallas"],
                        help="GT renderer: 'reference' = dense oracle "
                             "(exact, CPU-feasible only at tiny sizes); "
                             "'scan'/'pallas' = production tiled kernels "
                             "(allclose-tested vs the oracle; required for "
                             "production shapes like 800x600 x 100k G)")
    parser.add_argument("--format", default="blender",
                        choices=["blender", "neilf", "colmap"],
                        help="on-disk layout: NeRF-synthetic transforms_*."
                             "json, NeILF/DTU inputs/sfm_scene.json with "
                             "depth .tiff / normal .pfm / pmask companions "
                             "(reference dataset_readers.py:360-500), or "
                             "COLMAP sparse/0 binaries + images/ "
                             "(dataset_readers.py:65-190).  The NeILF eval "
                             "split is the fixed DTU indexes [6, 13, 30, "
                             "35], active when the out_dir name contains "
                             "'dtu'; the COLMAP eval split is llffhold=8")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--init_ply", action="store_true",
                        help="also write the true point cloud as "
                             "points3d.ply (otherwise the Blender reader "
                             "falls back to a random 100k-point init, "
                             "reference dataset_readers.py:192-284)")
    args = parser.parse_args()

    import imageio
    import jax
    import jax.numpy as jnp

    from texgs.core.state import init_from_pcd
    from texgs.data.synthetic import (blob_point_cloud, orbit_cameras,
                                      sphere_point_cloud,
                                      textured_sphere_point_cloud)
    from texgs.render import render as render_fn

    makers = {"sphere": sphere_point_cloud,
              "checker": textured_sphere_point_cloud,
              "blob": blob_point_cloud}
    pcd = makers[args.kind](args.n, seed=args.seed)
    state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=0)
    state = state.replace(opacity=jnp.full_like(state.opacity, 4.0))

    total = args.views + args.test_views
    width = args.width or args.size
    height = args.height or args.size
    cams = orbit_cameras(total, radius=3.5, width=width, height=height,
                         spiral=args.spiral)

    # ONE jitted render reused for every view: the camera is a pytree
    # ARGUMENT (its uid/image_name statics are stripped so all views share
    # a trace), and params are arguments too — axon corrupts big
    # closure-captured arrays (NOTES.md)
    import dataclasses as _dc

    @jax.jit
    def gt_view(cam, xyz, opacity, scaling, rotation, features):
        return render_fn(cam, xyz=xyz, opacity=opacity, scaling=scaling,
                         rotation=rotation, features=features,
                         active_sh_degree=0, bg_color=jnp.zeros(3),
                         backend=args.backend)

    activated = (state.xyz, state.get_opacity(), state.get_scaling(),
                 state.get_rotation(), state.get_features())

    if args.format == "neilf":
        _write_neilf(args, cams, gt_view, activated, pcd)
        print(f"wrote {total} views to {args.out_dir} (NeILF format)")
        return
    if args.format == "colmap":
        _write_colmap(args, cams, gt_view, activated, pcd)
        print(f"wrote {total} views to {args.out_dir} (COLMAP format)")
        return

    splits = {"train": cams[: args.views], "test": cams[args.views:]}
    os.makedirs(args.out_dir, exist_ok=True)
    for split, split_cams in splits.items():
        os.makedirs(os.path.join(args.out_dir, split), exist_ok=True)
        frames = []
        for i, cam in enumerate(split_cams):
            out = gt_view(_dc.replace(cam, uid=0, image_name=""),
                          *activated)
            rgb = np.clip(np.asarray(out["render"]).transpose(1, 2, 0), 0, 1)
            alpha = np.clip(np.asarray(out["alpha"][0]), 0, 1)
            normal = np.clip(
                0.5 * (np.asarray(out["norm"]).transpose(1, 2, 0) + 1), 0, 1)

            name = f"r_{i}"
            rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
            imageio.imwrite(
                os.path.join(args.out_dir, split, name + ".png"),
                (rgba * 255).astype(np.uint8))
            imageio.imwrite(
                os.path.join(args.out_dir, split, name + "_normal.png"),
                (normal * 255).astype(np.uint8))
            imageio.imwrite(
                os.path.join(args.out_dir, split, name + "_alpha.png"),
                ((alpha > 0.5)[..., None].repeat(3, -1) * 255).astype(np.uint8))

            # camera-to-world in OpenGL/Blender convention (the reader flips
            # the Y/Z axes back, data/readers.py)
            w2c = np.asarray(cam.world_view).T
            c2w = np.linalg.inv(w2c)
            c2w[:3, 1:3] *= -1
            frames.append({"file_path": f"./{split}/{name}",
                           "transform_matrix": c2w.tolist()})

        with open(os.path.join(args.out_dir, f"transforms_{split}.json"),
                  "w") as f:
            json.dump({"camera_angle_x": cams[0].fovx, "frames": frames}, f,
                      indent=1)

    if args.init_ply:
        from texgs.io import ply as plyio
        plyio.write_ply_xyz(os.path.join(args.out_dir, "points3d.ply"),
                            np.asarray(pcd.points),
                            colors=np.asarray(pcd.colors),
                            normals=np.zeros_like(np.asarray(pcd.points)))
    print(f"wrote {total} views to {args.out_dir}")


if __name__ == "__main__":
    main()
