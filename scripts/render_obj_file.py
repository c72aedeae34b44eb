#!/usr/bin/env python
"""Render an .obj with Blender into NeRF-synthetic format (data prep).

Behavior parity with /root/reference/scripts/render_obj_file.py (which also
runs inside Blender's bundled Python):

* scene reset + .obj import, multi-root-safe normalization to a 0.7-side
  box centered at the origin (ref `normalize_scene`, :274-300);
* four-sun studio light rig (key/fill/rim/bottom, shadowless, energy 1 —
  ref `randomize_lighting`, :82-136);
* 35mm camera forced to a 39.6 deg horizontal FOV, positioned on an
  elevation x azimuth orbit of radius 1.5 with an optional
  northern-hemisphere clamp (ref `set_camera_location`, :19-44);
* the camera pose written to transforms_train.json is the hand-built
  OpenGL-convention look-at matrix (+Z from target to camera, world up
  [0,0,1]) — NOT Blender's matrix_world — exactly as the reference does
  (ref :540-566); empty transforms_test.json / transforms_val.json are
  emitted alongside (ref :573-578);
* Cycles/EEVEE settings: 512x512 RGBA PNG, film_transparent, 128 samples,
  bounce limits, denoising (ref :610-636).

The pose math lives in `lookat_c2w` so tests can validate the convention
without bpy (Blender is not installed in the TPU image; for a Blender-free
synthetic dataset use scripts/make_synthetic_dataset.py).

Usage:
  blender --background --python scripts/render_obj_file.py -- \
      --object_path model.obj --output_dir out [--num_renders 12] \
      [--elevs 0 20 40] [--engine CYCLES] [--only_northern_hemisphere]
"""

import json
import math
import os
import sys
from argparse import ArgumentParser

import numpy as np


def orbit_position(elev_deg: float, azim_deg: float, radius: float,
                   only_northern_hemisphere: bool = False) -> np.ndarray:
    """Camera position on the orbit sphere (ref set_camera_location :19-32)."""
    el = np.deg2rad(elev_deg)
    az = np.deg2rad(azim_deg)
    pos = np.array([radius * np.cos(el) * np.cos(az),
                    radius * np.cos(el) * np.sin(az),
                    radius * np.sin(el)], dtype=np.float64)
    if only_northern_hemisphere:
        pos[2] = abs(pos[2])
    return pos


def lookat_c2w(pos: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Camera-to-world matrix looking from `pos` at the origin.

    OpenGL/NeRF convention: the camera looks along its -Z, so the +Z column
    points from the target back toward the camera.  Identical math to the
    reference's hand-built matrix (ref render_obj_file.py:545-564)."""
    up = np.asarray(up, dtype=np.float64)
    z = pos / np.linalg.norm(pos)
    if abs(np.dot(up, z)) > 1.0 - 1e-9:   # looking straight up/down the
        up = np.array([0.0, 1.0, 0.0])    # world up: pick a fallback up
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    y = y / np.linalg.norm(y)
    mat = np.zeros((4, 4))
    mat[:3, 0] = x
    mat[:3, 1] = y
    mat[:3, 2] = z
    mat[:3, 3] = pos
    mat[3, 3] = 1.0
    return mat


def parse_args(argv):
    parser = ArgumentParser()
    parser.add_argument("--object_path", required=True,
                        help="Path to the .obj file")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--engine", default="BLENDER_EEVEE",
                        choices=["CYCLES", "BLENDER_EEVEE"])
    parser.add_argument("--only_northern_hemisphere", action="store_true",
                        default=False)
    parser.add_argument("--num_renders", type=int, default=12,
                        help="Azimuth steps per elevation ring")
    parser.add_argument("--gpu", type=int, default=0,
                        help="Render device index (ignored off-CUDA)")
    parser.add_argument("--elevs", type=float, nargs="+", default=[0.0],
                        help="Elevation angles in degrees")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--radius", type=float, default=1.5)
    return parser.parse_args(argv)


FOV_X_DEG = 39.6
LIGHT_RIG = [
    # name, rotation_euler — the reference's fixed 4-sun studio rig
    ("Key_Light", (0.785398, 0.0, -0.785398)),
    ("Fill_Light", (0.785398, 0.0, 2.35619)),
    ("Rim_Light", (-0.785398, 0.0, -3.92699)),
    ("Bottom_Light", (3.14159, 0.0, 0.0)),
]


def main():
    import bpy  # only inside Blender
    from mathutils import Vector

    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    args = parse_args(argv)
    os.makedirs(os.path.join(args.output_dir, "train"), exist_ok=True)

    scene = bpy.context.scene
    render = scene.render

    # ---- render settings (ref :610-636)
    render.engine = args.engine
    render.image_settings.file_format = "PNG"
    render.image_settings.color_mode = "RGBA"
    render.resolution_x = args.size
    render.resolution_y = args.size
    render.resolution_percentage = 100
    render.film_transparent = True
    scene.cycles.samples = 128
    scene.cycles.diffuse_bounces = 1
    scene.cycles.glossy_bounces = 1
    scene.cycles.transparent_max_bounces = 3
    scene.cycles.transmission_bounces = 3
    scene.cycles.filter_width = 0.01
    scene.cycles.use_denoising = True
    try:  # GPU preferences exist only when the cycles addon has devices
        prefs = bpy.context.preferences.addons["cycles"].preferences
        prefs.get_devices()
        scene.cycles.device = "GPU"
        accel = [d for d in prefs.devices if d.type in ("OPTIX", "CUDA")]
        # --gpu indexes the ACCELERATOR list (CPU entries excluded) so the
        # default --gpu 0 enables the first GPU wherever Blender lists it
        pick = accel if accel else list(prefs.devices)
        for d in prefs.devices:
            d.use = False
        if pick:
            pick[min(args.gpu, len(pick) - 1)].use = True
    except Exception:
        scene.cycles.device = "CPU"

    # ---- reset scene: drop everything but cameras/lights (ref :139-161)
    for obj in list(bpy.data.objects):
        if obj.type not in {"CAMERA", "LIGHT"}:
            bpy.data.objects.remove(obj, do_unlink=True)
    for coll in (bpy.data.materials, bpy.data.textures, bpy.data.images):
        for item in list(coll):
            coll.remove(item, do_unlink=True)

    bpy.ops.import_scene.obj(filepath=args.object_path)

    # ---- camera (create if the factory one was emptied out)
    if "Camera" not in bpy.data.objects:
        cam_data = bpy.data.cameras.new("Camera")
        cam = bpy.data.objects.new("Camera", cam_data)
        scene.collection.objects.link(cam)
    cam = bpy.data.objects["Camera"]
    scene.camera = cam
    cam.data.lens = 35
    cam.data.sensor_width = 32
    cam.data.lens_unit = "FOV"
    cam.data.angle = math.radians(FOV_X_DEG)

    # ---- normalize scene to a 0.7 box at the origin (ref :274-300)
    def meshes():
        return [o for o in scene.objects if o.type == "MESH"]

    def roots():
        return [o for o in scene.objects if not o.parent]

    if len(roots()) > 1:
        parent_empty = bpy.data.objects.new("ParentEmpty", None)
        scene.collection.objects.link(parent_empty)
        for obj in roots():
            if obj is not parent_empty:
                obj.parent = parent_empty

    def bbox():
        lo = Vector((math.inf,) * 3)
        hi = Vector((-math.inf,) * 3)
        for o in meshes():
            for corner in o.bound_box:
                w = o.matrix_world @ Vector(corner)
                lo = Vector(map(min, lo, w))
                hi = Vector(map(max, hi, w))
        return lo, hi

    lo, hi = bbox()
    scale = 0.7 / max(hi - lo)
    for obj in roots():
        if obj.type not in ("CAMERA", "LIGHT"):
            obj.scale = obj.scale * scale
    for obj in meshes():
        obj.rotation_euler = [0, 0, 0]
    bpy.context.view_layer.update()
    lo, hi = bbox()
    offset = -(lo + hi) / 2
    for obj in meshes():
        obj.matrix_world.translation += offset

    # ---- light rig (ref randomize_lighting :82-136)
    for obj in list(bpy.data.objects):
        if obj.type == "LIGHT":
            bpy.data.objects.remove(obj, do_unlink=True)
    for name, rot in LIGHT_RIG:
        data = bpy.data.lights.new(name=name, type="SUN")
        data.use_shadow = False
        data.specular_factor = 1.0
        data.energy = 1.0
        light = bpy.data.objects.new(name, data)
        scene.collection.objects.link(light)
        light.rotation_euler = rot

    # ---- orbit render loop (ref render_object :525-570)
    frames = []
    cnt = 0
    for elev in args.elevs:
        for i in range(args.num_renders):
            azimuth = 360.0 / args.num_renders * i
            pos = orbit_position(elev, azimuth, args.radius,
                                 args.only_northern_hemisphere)
            cam.location = Vector(pos)
            direction = -cam.location
            cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
            bpy.context.view_layer.update()

            render.filepath = os.path.join(args.output_dir, "train",
                                           f"{cnt:03d}.png")
            bpy.ops.render.render(write_still=True)
            frames.append({
                "file_path": os.path.join(".", "train", f"{cnt:03d}"),
                "rotation": 0,
                "transform_matrix": lookat_c2w(pos).tolist(),
            })
            cnt += 1

    transforms = {"camera_angle_x": math.radians(FOV_X_DEG), "frames": frames}
    with open(os.path.join(args.output_dir, "transforms_train.json"), "w") as f:
        json.dump(transforms, f)
    transforms["frames"] = []
    for split in ("test", "val"):
        with open(os.path.join(args.output_dir,
                               f"transforms_{split}.json"), "w") as f:
            json.dump(transforms, f)
    print(f"rendered {cnt} views to {args.output_dir}")


if __name__ == "__main__":
    main()
