"""Multi-host bring-up: initialize_dist + the production sharded step across
REAL process boundaries (2 processes x 4 virtual CPU devices), validating
the jax.distributed wiring that multi-host TPU uses over DCN.

SURVEY.md §2.3 row 'communication backend': this is the strongest
validation available without pod hardware — collectives actually cross a
Gloo process boundary, and both processes must agree on the loss.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

WORKER = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["TEXGS_REPO"])

pid = int(sys.argv[1])
from texgs.dist.mesh import initialize_dist, make_mesh
initialize_dist(coordinator=f"127.0.0.1:{os.environ['TEXGS_PORT']}",
                num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8

import dataclasses
import jax.numpy as jnp
import numpy as np
from texgs.core.state import init_from_pcd
from texgs.data.synthetic import blob_point_cloud, orbit_cameras
from texgs.dist.data_parallel import stack_cameras
from texgs.dist.sharded import stage1_sharded_step
from texgs.train import densify, optim

pcd = blob_point_cloud(256, seed=0)
state = init_from_pcd(pcd.points, pcd.colors, max_sh_degree=1)
cams = orbit_cameras(2, radius=3.5, width=32, height=32)
cams = [dataclasses.replace(c, image=jnp.zeros((3, 32, 32))) for c in cams]

lrs = {k: jnp.float32(v) for k, v in dict(
    xyz=1e-3, f_dc=2.5e-3, f_rest=1.25e-4, opacity=5e-2, scaling=5e-3,
    rotation=1e-3).items()}
lambdas = {"bg": jnp.zeros(3), **{k: jnp.float32(v) for k, v in dict(
    dssim=0.2, alpha=1.0, opacity_reg=0.01, depth=0.0, norm=0.0,
    norm_smooth=0.5, norm_reg=0.0).items()}}
flags = (True, True, False, False, True, False, True)

mesh = make_mesh(8, axis_names=("data", "tile"), shape=(2, 4))
adam = optim.init(state.params_dict())
stats = densify.init_stats(state.capacity)
new_state, _, _, loss, _ = stage1_sharded_step(
    mesh, state, adam, stats, stack_cameras(cams), lrs, lambdas,
    jnp.asarray(True), flags, 1, backend="scan")
lv = float(loss)
assert np.isfinite(lv)
print(f"MPOK {pid} {lv:.6f}", flush=True)
'''


@pytest.mark.timeout(600)
def test_two_process_production_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = {**os.environ, "TEXGS_REPO": os.path.abspath(repo),
           "TEXGS_PORT": str(port)}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    losses = []
    for out in outs:
        ok = [ln for ln in out.splitlines() if ln.startswith("MPOK")]
        assert ok, out[-3000:]
        losses.append(float(ok[0].split()[2]))
    assert losses[0] == losses[1], "processes disagree on the psum'd loss"
