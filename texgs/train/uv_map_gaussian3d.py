"""Stage-2 model: UV-mapping networks over frozen Gaussians (UVMapGaussian3D).

Functional JAX re-architecture of /root/reference/models/uv_map_gaussian3d.py:
Gaussians come frozen from the stage-1 checkpoint; the trainables are
UVNet / InvUVNet / geo embedding.  Per-iteration losses (:167-238):
  Linv     — cycle ||x - inv(uv(x))||² on depth-unprojected surface points
             (alpha > 0.5 mask)
  Lchamfer — bidirectional chamfer of inverse-mapped sphere samples vs the
             stage-1 extracted pseudo-GT cloud
  Lpatch   — single-directional chamfer on a directional-cap sample
  Linv2    — sphere cycle ||uv(inv(s)) - s||²

Because the Gaussians are frozen, per-camera depth/alpha maps are rendered
once and cached (the reference re-rasterizes every iteration purely because
its CUDA kernel is cheap; the loss inputs are identical).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from texgs.config import Cfg, in_range
from texgs.core.camera import Camera
from texgs.kernels.chamfer import chamfer_distance
from texgs.kernels.cubemap import chessboard_cubemap, sample_cubemap
from texgs.nets.uv_net import (apply_inv_uv_net, apply_uv_net, init_inv_uv_net,
                               init_uv_net, patch_sample_sphere, sample_sphere)
from texgs.render.render import render
from texgs.train import optim
from texgs.utils.schedules import warmup_multistep


def depth2world(depth: jnp.ndarray, full_proj: jnp.ndarray, zfar: float,
                znear: float) -> jnp.ndarray:
    """(H, W) view-z depth -> (H, W, 3) world points.

    Parity with /root/reference/models/uv_map_gaussian3d.py:155-165:
    clip = [ndc_x*d, ndc_y*d, zclip(d), d], world = clip @ inv(full_proj)
    (row-vector convention)."""
    H, W = depth.shape
    pix_x = jnp.arange(W, dtype=depth.dtype)
    pix_y = jnp.arange(H, dtype=depth.dtype)
    ndc_x = (pix_x * 2 + 1) / W - 1.0
    ndc_y = (pix_y * 2 + 1) / H - 1.0
    ndc_y, ndc_x = jnp.meshgrid(ndc_y, ndc_x, indexing="ij")
    zclip = zfar * depth / (zfar - znear) - zfar * znear / (zfar - znear)
    clip = jnp.stack([ndc_x * depth, ndc_y * depth, zclip, depth],
                     axis=-1).reshape(-1, 4)
    world = clip @ jnp.linalg.inv(full_proj)
    return world[:, :3].reshape(H, W, 3)


class UVMapGaussian3D:
    """Driver-facing API parity with the reference model."""

    def __init__(self, cfg: Cfg, log, work_dir: str, debug: bool = False):
        self.cfg = cfg
        self.log = log
        self.debug = debug
        key = jax.random.PRNGKey(int(cfg.get_or("seed", 1)))
        k1, k2, k3, self._rng = jax.random.split(key, 4)
        self.net_params = {
            "uv_net": init_uv_net(k1, cfg.uv_net_cfg),
            "inv_uv_net": init_inv_uv_net(k2, cfg.inv_uv_net_cfg),
            "geo_emb": jax.random.normal(k3, (int(cfg.geo_emb_dim),)),
        }
        self.adam: Optional[optim.AdamState] = None
        self.lr_fn = None
        self.optim_cfg: Optional[Cfg] = None
        self.gauss = None         # frozen stage-1 arrays (dict)
        self.pcd = None           # (M, 3) pseudo-GT surface cloud
        self._bg = jnp.zeros(3)
        self._train_cfg = None
        self._depth_alpha_cache: dict = {}
        self._step_count = 0

    # ------------------------------------------------------------- setup
    def bind_train_cfg(self, train_cfg: Cfg, bg):
        self._train_cfg = train_cfg
        self._bg = jnp.asarray(bg, jnp.float32)

    def initialize(self, pcd_unused, spatial_lr_scale_unused):
        from texgs.io import checkpoint as ckpt
        sd, _ = ckpt.load(self.cfg.init_from)
        p = sd["params"]
        self.gauss = {
            "xyz": jnp.asarray(p["xyz"]),
            "scaling": jnp.asarray(p["scaling"]),
            "rotation": jnp.asarray(p["rotation"]),
            "opacity": jnp.asarray(p["opacity"]),
            "n_alive": jnp.asarray(p["n_alive"], jnp.int32),
        }
        self.log.info("Number of points at initialisation : "
                      f"{int(self.gauss['n_alive'])}")
        if self.cfg.pcd_load_from:
            self.pcd = jnp.asarray(np.load(self.cfg.pcd_load_from),
                                   jnp.float32)

    def setup_optim(self, optim_cfg: Cfg):
        self.optim_cfg = optim_cfg
        self.adam = optim.init(self.net_params)
        self.lr_fn = {
            "uv_net": warmup_multistep(optim_cfg.uv_net_lr,
                                       optim_cfg.uv_net_milestones,
                                       optim_cfg.uv_net_gamma),
            "inv_uv_net": warmup_multistep(optim_cfg.inv_uv_net_lr,
                                           optim_cfg.uv_net_milestones,
                                           optim_cfg.uv_net_gamma),
        }

    def _lrs(self) -> dict:
        s = self._step_count
        return {
            "uv_net": jnp.float32(self.lr_fn["uv_net"](s)),
            "inv_uv_net": jnp.float32(self.lr_fn["inv_uv_net"](s)),
            "geo_emb": jnp.float32(self.lr_fn["uv_net"](s)),
        }

    # --------------------------------------------------- frozen renders
    @functools.partial(jax.jit, static_argnames=("self",))
    def _render_depth_alpha(self, gauss, camera: Camera):
        alive = (jnp.arange(gauss["xyz"].shape[0]) < gauss["n_alive"])
        opacity = jax.nn.sigmoid(gauss["opacity"]) * alive[:, None]
        rot = gauss["rotation"] / (jnp.linalg.norm(
            gauss["rotation"], axis=-1, keepdims=True) + 1e-12)
        out = render(camera, xyz=gauss["xyz"], opacity=opacity,
                     scaling=jnp.exp(gauss["scaling"]), rotation=rot,
                     override_color=jnp.zeros_like(gauss["xyz"]),
                     bg_color=self._bg)
        return out["depth"], out["alpha"], out["norm"], out["render"]

    def depth_alpha(self, camera: Camera):
        # (uid, image_name) key: uids are globally unique across splits
        # (scene.py), the name guards against any residual aliasing
        key = (camera.uid, camera.image_name)
        if key not in self._depth_alpha_cache:
            self._depth_alpha_cache[key] = self._render_depth_alpha(
                self.gauss, camera.jit_view())
        return self._depth_alpha_cache[key]

    # ------------------------------------------------------ jitted core
    @functools.partial(jax.jit, static_argnames=("self", "flags", "n_points"))
    def _train_step(self, net_params, adam, pcd, depth, alpha,
                    camera: Camera, key, lrs, lambdas, flags: tuple,
                    n_points: int):
        (use_inv, use_chamfer, use_patch, use_inv2) = flags
        cfg = self.cfg

        def loss_fn(nets):
            geo_emb = nets["geo_emb"]
            loss = 0.0
            stats = {}

            if use_inv:
                world = depth2world(depth[0], camera.full_proj, camera.zfar,
                                    camera.znear).reshape(-1, 3)
                wmask = (alpha.reshape(-1) > 0.5).astype(jnp.float32)
                if n_points and n_points < world.shape[0]:
                    score = jax.random.uniform(key, (world.shape[0],))
                    score = jnp.where(wmask > 0, score, -1.0)
                    _, sel = jax.lax.top_k(score, n_points)
                    world = world[sel]
                    wmask = wmask[sel]
                world = jax.lax.stop_gradient(world)
                uv = apply_uv_net(nets["uv_net"], cfg.uv_net_cfg, world,
                                  geo_emb)
                inv = apply_inv_uv_net(nets["inv_uv_net"],
                                       cfg.inv_uv_net_cfg, uv, geo_emb)
                err = ((world - inv) ** 2).sum(-1)
                linv = (err * wmask).sum() / (wmask.sum() + 1e-6)
                loss = loss + lambdas["inverse"] * linv
                stats["Linv"] = linv

            sample_uvs = None
            sample_inv = None
            k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
            n_sample = int(cfg.inv_uv_net_cfg.n_sample_points)

            if use_chamfer or use_inv2:
                sample_uvs = sample_sphere(k1, n_sample)
                sample_inv = apply_inv_uv_net(nets["inv_uv_net"],
                                              cfg.inv_uv_net_cfg,
                                              sample_uvs, geo_emb)
            if use_chamfer:
                lch = chamfer_distance(sample_inv, pcd)
                loss = loss + lambdas["chamfer"] * lch
                stats["Lchamfer"] = lch
            if use_patch:
                patch_uvs = patch_sample_sphere(
                    k2, n_sample, int(cfg.inv_uv_net_cfg.patch_scale))
                patch_inv = apply_inv_uv_net(nets["inv_uv_net"],
                                             cfg.inv_uv_net_cfg,
                                             patch_uvs, geo_emb)
                lpch = chamfer_distance(patch_inv, pcd,
                                        single_directional=True)
                loss = loss + lambdas["patch_chamfer"] * lpch
                stats["Lpatch_chamfer"] = lpch
            if use_inv2:
                inv_uvs = apply_uv_net(nets["uv_net"], cfg.uv_net_cfg,
                                       sample_inv, geo_emb)
                linv2 = ((inv_uvs - sample_uvs) ** 2).sum(-1).mean()
                loss = loss + lambdas["inverse2"] * linv2
                stats["Linv2"] = linv2

            stats["total_loss"] = loss
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            net_params)
        new_params, adam = optim.update(net_params, grads, adam, {
            "uv_net": jax.tree.map(lambda _: lrs["uv_net"],
                                   net_params["uv_net"]),
            "inv_uv_net": jax.tree.map(lambda _: lrs["inv_uv_net"],
                                       net_params["inv_uv_net"]),
            "geo_emb": lrs["geo_emb"],
        })
        return new_params, adam, loss, stats

    # -------------------------------------------------------- driver API
    def compute_loss(self, cur_iter: int, total_iter: int, viewpoint: Camera,
                     render_unused, loss_cfg: Cfg):
        lc = loss_cfg
        flags = (
            bool(lc.lambda_inverse) and in_range(cur_iter, lc.inverse_range),
            bool(lc.lambda_chamfer) and in_range(cur_iter, lc.chamfer_range)
            and self.pcd is not None,
            bool(lc.lambda_patch_chamfer)
            and in_range(cur_iter, lc.patch_chamfer_range)
            and self.pcd is not None,
            bool(lc.lambda_inverse2) and in_range(cur_iter, lc.inverse_range2),
        )
        lambdas = {
            "inverse": jnp.float32(lc.get_or("lambda_inverse", 0.0)),
            "chamfer": jnp.float32(lc.get_or("lambda_chamfer", 0.0)),
            "patch_chamfer": jnp.float32(lc.get_or("lambda_patch_chamfer", 0.0)),
            "inverse2": jnp.float32(lc.get_or("lambda_inverse2", 0.0)),
        }
        depth, alpha, _, _ = self.depth_alpha(viewpoint)
        self._rng, key = jax.random.split(self._rng)
        n_points = int(self.cfg.get_or("max_inverse_points", 0))
        pcd = self.pcd if self.pcd is not None else jnp.zeros((1, 3))
        self.net_params, self.adam, loss, stats = self._train_step(
            self.net_params, self.adam, pcd, depth, alpha,
            viewpoint.jit_view(), key,
            self._lrs(), lambdas, flags, n_points)
        # ONE deferred device->host transfer for all per-step scalars: the
        # read of step k-1's stats overlaps step k's device execution (the
        # tunnel tax, NOTES.md round 4).  Stage 2 has no retry control, so
        # the lag is display-only.
        pend, self._pending_stats = self._pending_stats, stats
        stats = jax.device_get(pend if pend is not None else stats)
        return stats["total_loss"], stats, {}

    _pending_stats = None

    def flush(self):
        if self._pending_stats is not None:
            st, self._pending_stats = self._pending_stats, None
            return jax.device_get(st)
        return None

    def optimize_step(self, cur_iter: int, total_iter: int, train_cfg: Cfg,
                      extra_info: dict):
        # Adam applied inside _train_step; advance the scheduler epoch
        # (torch steps it after optimizer.step, uv_map_gaussian3d.py:240-247).
        self._step_count += 1

    # ----------------------------------------------------------- eval/io
    @functools.partial(jax.jit, static_argnames=("self",))
    def _chess_image(self, net_params, depth, alpha, camera: Camera):
        geo_emb = net_params["geo_emb"]
        world = depth2world(depth[0], camera.full_proj, camera.zfar,
                            camera.znear).reshape(-1, 3)
        mask = (alpha.reshape(-1) > 0.5).astype(jnp.float32)
        uv = apply_uv_net(net_params["uv_net"], self.cfg.uv_net_cfg, world,
                          geo_emb)
        rgb = sample_cubemap(chessboard_cubemap(), uv)
        alpha_flat = alpha.reshape(-1)
        img = (rgb * (alpha_flat * mask)[:, None]
               + self._bg[None, :] * (1 - alpha_flat)[:, None])
        H, W = depth.shape[-2:]
        return img.reshape(H, W, 3).transpose(2, 0, 1)

    def visual_step(self, cur_iter: int, total_iter: int, viewpoint: Camera,
                    render_unused):
        depth, alpha, norm, image = self.depth_alpha(viewpoint)
        chess = self._chess_image(self.net_params, depth, alpha,
                                  viewpoint.jit_view())
        return dict(image=image, chess_image=chess, depth=depth, norm=norm,
                    alpha=alpha)

    def save_point_cloud(self, path: str):
        from texgs.io.ply import write_ply_xyz
        key = jax.random.PRNGKey(12345)
        uvs = sample_sphere(key, 8192)
        xyz = apply_inv_uv_net(self.net_params["inv_uv_net"],
                               self.cfg.inv_uv_net_cfg, uvs,
                               self.net_params["geo_emb"])
        write_ply_xyz(path, np.asarray(xyz))

    def state_dict(self) -> dict:
        return dict(
            net_state=jax.tree.map(np.asarray, self.net_params),
            optim_state=dict(
                mu=jax.tree.map(np.asarray, self.adam.mu),
                nu=jax.tree.map(np.asarray, self.adam.nu),
                count=jax.tree.map(np.asarray, self.adam.count),
                step_count=self._step_count),
        )

    def load_state_dict(self, sd: dict, optim_cfg: Cfg):
        self.initialize(None, None)
        self.net_params = jax.tree.map(jnp.asarray, sd["net_state"])
        self.setup_optim(optim_cfg)
        os_ = sd["optim_state"]
        self.adam = optim.AdamState(
            mu=jax.tree.map(jnp.asarray, os_["mu"]),
            nu=jax.tree.map(jnp.asarray, os_["nu"]),
            count=jax.tree.map(jnp.asarray, os_["count"]))
        self._step_count = int(os_["step_count"])
