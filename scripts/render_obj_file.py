#!/usr/bin/env python
"""Render an .obj with Blender into NeRF-synthetic format (data prep).

Capability parity with /root/reference/scripts/render_obj_file.py (which
also runs inside Blender's bundled Python): normalizes the object to the
unit box, orbits a 35mm camera at radius 1.5 over an elevation x azimuth
grid with a sun + environment light, renders RGBA (film_transparent for the
alpha channel) and normal passes, and writes ``transforms_train.json``.

Requires a Blender installation (bpy is not available in the TPU image —
for a Blender-free synthetic dataset use scripts/make_synthetic_dataset.py):

  blender --background --python scripts/render_obj_file.py -- \
      --obj model.obj --out out_dir [--views 64] [--size 800]
"""

import json
import math
import os
import sys
from argparse import ArgumentParser


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    parser = ArgumentParser()
    parser.add_argument("--obj", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--views", type=int, default=64)
    parser.add_argument("--elevations", type=int, default=4)
    parser.add_argument("--size", type=int, default=800)
    parser.add_argument("--radius", type=float, default=1.5)
    return parser.parse_args(argv)


def main():
    import bpy  # only inside Blender
    from mathutils import Vector

    args = parse_args()
    os.makedirs(os.path.join(args.out, "train"), exist_ok=True)

    # clean scene, import and normalize the object to the unit box
    bpy.ops.wm.read_factory_settings(use_empty=True)
    bpy.ops.import_scene.obj(filepath=args.obj)
    objs = [o for o in bpy.context.scene.objects if o.type == "MESH"]
    mins = Vector((1e9, 1e9, 1e9))
    maxs = Vector((-1e9, -1e9, -1e9))
    for o in objs:
        for v in o.bound_box:
            w = o.matrix_world @ Vector(v)
            mins = Vector(map(min, mins, w))
            maxs = Vector(map(max, maxs, w))
    center = (mins + maxs) / 2
    scale = 1.0 / max((maxs - mins)) if max(maxs - mins) > 0 else 1.0
    for o in objs:
        o.location -= center
        o.scale = o.scale * scale

    scene = bpy.context.scene
    scene.render.engine = "CYCLES"
    scene.render.film_transparent = True
    scene.render.resolution_x = args.size
    scene.render.resolution_y = args.size
    scene.render.image_settings.color_mode = "RGBA"

    # lighting: sun + uniform world light
    sun = bpy.data.objects.new("Sun", bpy.data.lights.new("Sun", "SUN"))
    scene.collection.objects.link(sun)
    world = bpy.data.worlds.new("World")
    world.use_nodes = True
    world.node_tree.nodes["Background"].inputs[1].default_value = 1.0
    scene.world = world

    cam_data = bpy.data.cameras.new("Cam")
    cam_data.lens = 35
    cam = bpy.data.objects.new("Cam", cam_data)
    scene.collection.objects.link(cam)
    scene.camera = cam

    frames = []
    per_el = max(1, args.views // args.elevations)
    idx = 0
    for ei in range(args.elevations):
        el = math.radians(10 + 50 * ei / max(1, args.elevations - 1))
        for ai in range(per_el):
            az = 2 * math.pi * ai / per_el
            cam.location = (args.radius * math.cos(az) * math.cos(el),
                            args.radius * math.sin(az) * math.cos(el),
                            args.radius * math.sin(el))
            direction = -Vector(cam.location)
            cam.rotation_euler = direction.to_track_quat("-Z", "Y").to_euler()
            bpy.context.view_layer.update()

            name = f"r_{idx}"
            scene.render.filepath = os.path.join(args.out, "train",
                                                 name + ".png")
            bpy.ops.render.render(write_still=True)
            frames.append({
                "file_path": f"./train/{name}",
                "transform_matrix": [list(row) for row in cam.matrix_world],
            })
            idx += 1

    fovx = 2 * math.atan(cam_data.sensor_width / (2 * cam_data.lens))
    with open(os.path.join(args.out, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": fovx, "frames": frames}, f, indent=1)
    print(f"rendered {idx} views to {args.out}")


if __name__ == "__main__":
    main()
