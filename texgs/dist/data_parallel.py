"""Data-parallel training step: cameras sharded over chips, grads psum'd.

The reference trains on one camera per iteration on one GPU
(/root/reference/train.py:142-149); on TPU we batch one camera per chip
along the mesh's 'data' axis, replicate the Gaussian state, and all-reduce
(pmean) gradients before a replicated Adam update.  XLA overlaps the psum
with backward compute (latency-hiding scheduler).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from texgs.core.camera import Camera
from texgs.core.state import GaussianState
from texgs.losses import l1_loss, ssim_loss
from texgs.render.render import render
from texgs.train import optim


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree."""
    ref = cams[0]
    leaves = {}
    for f in ("world_view", "full_proj", "camera_center", "image",
              "alpha_mask", "normal", "depth"):
        vals = [getattr(c, f) for c in cams]
        if vals[0] is None:
            leaves[f] = None
        else:
            leaves[f] = jnp.stack([jnp.asarray(v) for v in vals])
    return dataclasses.replace(ref, **leaves)


def index_camera(batch: Camera, i) -> Camera:
    """Select camera i from a batched Camera (arrays only)."""
    pick = lambda x: None if x is None else x[i]
    return dataclasses.replace(
        batch, world_view=pick(batch.world_view),
        full_proj=pick(batch.full_proj),
        camera_center=pick(batch.camera_center), image=pick(batch.image),
        alpha_mask=pick(batch.alpha_mask), normal=pick(batch.normal),
        depth=pick(batch.depth))


def dp_train_step(mesh: Mesh, state: GaussianState, params, adam,
                  camera_batch: Camera, active_sh_degree: int, lr,
                  lambda_dssim: float = 0.2):
    """One data-parallel step over `mesh` (axis 'data').

    camera_batch: stacked cameras, leading dim == mesh size.  Returns
    (new_params, new_adam, mean loss); params/adam are replicated.
    """

    # check_vma=False: the rasterizer's scan carries are created inside the
    # body (zeros) and joined with device-varying camera data; disabling the
    # varying-axis check avoids having to thread pvary through the kernels.
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P("data")),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(st_in, params, adam, cam_shard):
        cam = index_camera(cam_shard, 0)  # one camera per chip

        def loss_fn(p):
            st = st_in.replace(
                xyz=p["xyz"], features_dc=p["f_dc"],
                features_rest=p["f_rest"], opacity=p["opacity"],
                scaling=p["scaling"], rotation=p["rotation"])
            out = render(cam, xyz=st.xyz, opacity=st.get_opacity(),
                         scaling=st.get_scaling(),
                         rotation=st.get_rotation(),
                         features=st.get_features(),
                         active_sh_degree=active_sh_degree,
                         bg_color=jnp.zeros(3), backend="scan")
            img = out["render"]
            return ((1 - lambda_dssim) * l1_loss(img, cam.image)
                    + lambda_dssim * (1 - ssim_loss(img, cam.image)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        new_params, new_adam = optim.update(params, grads, adam, lr)
        return new_params, new_adam, loss

    # state passed as an argument: large closure-captured arrays get
    # corrupted when baked into big jit programs on the axon platform
    return jax.jit(step)(state, params, adam, camera_batch)
