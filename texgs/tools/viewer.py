"""Interactive viewer: orbit camera + live TPU/CPU rendering over HTTP.

The reference viewer (/root/reference/viewer.py + utils/viewer_renderer.py)
is a GLFW/imgui window fed by CUDA-GL interop — meaningless on a headless
TPU host (SURVEY.md §2.2).  The TPU-native equivalent streams JAX-rendered
frames to a browser: a tiny self-contained HTTP server serving an HTML5
canvas; drag = orbit, wheel = dolly, buttons switch render mode
(rgb / depth / alpha / normal) and scaling modifier, matching the reference
UI's controls (viewer.py:155-199).

Usage:  python viewer.py <stage3_config.yaml> --ckpt <ckpt> [--port 8000]
"""

from __future__ import annotations

import io
import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html><html><head><title>texgs viewer</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:10px}
canvas{border:1px solid #444;cursor:grab}button{margin:2px}
</style></head><body>
<div>
  <button onclick="setMode('rgb')">rgb</button>
  <button onclick="setMode('depth')">depth</button>
  <button onclick="setMode('alpha')">alpha</button>
  <button onclick="setMode('norm')">normal</button>
  scale <input id="scale" type="range" min="0.1" max="2.0" step="0.1"
    value="1.0" onchange="refresh()">
  fov <input id="fov" type="range" min="20" max="120" step="1"
    value="50" onchange="refresh()">
  <button onclick="screenshot()">screenshot</button>
  <span id="stat"></span>
</div>
<canvas id="c" width="{W}" height="{H}"></canvas>
<script>
let az=0, el=0.3, r=3.5, mode='rgb', drag=false, lx=0, ly=0, busy=false;
const c=document.getElementById('c'), ctx=c.getContext('2d');
c.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return;az+=(e.clientX-lx)*0.01;
  el=Math.max(-1.4,Math.min(1.4,el+(e.clientY-ly)*0.01));
  lx=e.clientX;ly=e.clientY;refresh();};
c.onwheel=e=>{e.preventDefault();r=Math.max(0.5,r+e.deltaY*0.002);refresh();};
function setMode(m){mode=m;refresh();}
function screenshot(){
  const a=document.createElement('a');
  a.download='texgs_'+Date.now()+'.png';
  a.href=c.toDataURL('image/png'); a.click();}
async function refresh(){
  if(busy)return; busy=true;
  const s=document.getElementById('scale').value;
  const f=document.getElementById('fov').value;
  const t0=performance.now();
  const img=new Image();
  img.onload=()=>{ctx.drawImage(img,0,0);busy=false;
    document.getElementById('stat').textContent=
      ' '+(performance.now()-t0).toFixed(0)+'ms';};
  img.src=`/frame?az=${az}&el=${el}&r=${r}&mode=${mode}&scale=${s}&fov=${f}&t=${Date.now()}`;
}
refresh();
</script></body></html>"""


class ViewerState:
    def __init__(self, model, width: int, height: int, fov_deg: float = 50.0):
        self.model = model
        self.width = width
        self.height = height
        self.fov_deg = fov_deg
        self.lock = threading.Lock()

    def render_frame(self, az: float, el: float, radius: float, mode: str,
                     scale: float, fov_deg: float = None) -> np.ndarray:
        import jax.numpy as jnp

        from texgs.core.camera import look_at_camera

        eye = np.array([radius * math.cos(az) * math.cos(el),
                        radius * math.sin(az) * math.cos(el),
                        radius * math.sin(el)])
        # fov is jit-static camera aux data; quantize to whole degrees so
        # the slider produces a bounded set of compiled programs (parity
        # control with the reference UI's fov slider, viewer.py:155-199)
        fovx = math.radians(round(fov_deg if fov_deg else self.fov_deg))
        fovy = 2 * math.atan(math.tan(fovx / 2) * self.height / self.width)
        cam = look_at_camera(eye, np.zeros(3), np.array([0.0, 0.0, 1.0]),
                             fovx, fovy, self.width, self.height)
        with self.lock:
            try:
                pkg = self.model.visual_step(0, 0, cam, None,
                                             scaling_modifier=scale)
            except TypeError:
                pkg = self.model.visual_step(0, 0, cam, None)
        if mode == "depth":
            d = np.asarray(pkg["depth"][0])
            a = np.asarray(pkg["alpha"][0]) > 0.5
            if a.any():
                lo, hi = d[a].min(), d[a].max()
                d = np.where(a, (d - lo) / (hi - lo + 1e-8), 0)
            img = np.stack([d] * 3, -1)
        elif mode == "alpha":
            a = np.asarray(pkg["alpha"][0])
            img = np.stack([a] * 3, -1)
        elif mode == "norm":
            img = 0.5 * (np.asarray(pkg["norm"]).transpose(1, 2, 0) + 1)
        else:
            img = np.asarray(pkg["image"]).transpose(1, 2, 0)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def serve(state: ViewerState, port: int = 8000):
    import imageio

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse
            u = urlparse(self.path)
            if u.path == "/":
                body = (_PAGE.replace("{W}", str(state.width))
                        .replace("{H}", str(state.height))).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif u.path == "/frame":
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                frame = state.render_frame(
                    float(q.get("az", 0)), float(q.get("el", 0.3)),
                    float(q.get("r", 3.5)), q.get("mode", "rgb"),
                    float(q.get("scale", 1.0)),
                    float(q.get("fov", 0)) or None)
                buf = io.BytesIO()
                imageio.imwrite(buf, frame, format="png")
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(buf.getvalue())
            else:
                self.send_response(404)
                self.end_headers()

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"texgs viewer at http://localhost:{port}/")
    server.serve_forever()


def main():
    from argparse import ArgumentParser
    parser = ArgumentParser(description="texgs browser viewer")
    parser.add_argument("config")
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--load_texture_from", type=str, default=None)
    parser.add_argument("--mode", type=int, default=0)
    args = parser.parse_args()

    from texgs.config import load_config
    from texgs.io import checkpoint as ckpt
    from texgs.utils.logger import get_logger

    cfg = load_config(args.config)
    log = get_logger("texgs")

    model_type = cfg.model_cfg.type
    if model_type == "TextureGaussian3D":
        from texgs.train.texture_gaussian3d import TextureGaussian3D
        model = TextureGaussian3D(cfg.model_cfg, log, ".")
    else:
        from texgs.train.gaussian3d import Gaussian3D
        model = Gaussian3D(cfg.model_cfg, log, ".")
    model.bind_train_cfg(cfg.train_cfg, cfg.dataset_cfg.background)
    sd, _ = ckpt.load(args.ckpt)
    model.load_state_dict(sd, cfg.optim_cfg)

    if args.load_texture_from and model_type == "TextureGaussian3D":
        import imageio
        img = np.asarray(imageio.imread(args.load_texture_from),
                         np.float32) / 255.0
        model.change_texture(img[..., :3], mode=args.mode)

    serve(ViewerState(model, args.width, args.height), args.port)


if __name__ == "__main__":
    main()
