"""Stage-1 model: vanilla-ish 3DGS geometry training (Gaussian3D).

Functional JAX re-architecture of /root/reference/models/gaussian3d.py.
The per-iteration compute — render, gated loss assembly, gradients, Adam —
is one jitted function; host code only orchestrates schedules and the
(rare) densification ops from texgs.train.densify.  Gating booleans and
the active SH degree are static jit arguments, so the handful of distinct
loss configurations each compile once; learning rates and loss weights are
traced scalars and never retrigger compilation.

Checkpoint schema (named, explicit — SURVEY.md §5):
  hyperparams: active_sh_degree, spatial_lr_scale
  params:      xyz, f_dc, f_rest, scaling, rotation, opacity, n_alive
  adam:        mu/nu/count per param
  stats:       xyz_gradient_accum, denom, max_radii2d
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from texgs import losses
from texgs.config import Cfg, in_range
from texgs.core.camera import Camera
from texgs.core.state import GaussianState, init_from_pcd
from texgs.render.render import render
from texgs.train import densify, optim
from texgs.train.pair_cap import PairCapController
from texgs.utils.schedules import expon_lr


def stage1_loss_terms(image, depth, norm, alpha, camera: Camera,
                      gt_image, gt_alpha, opacity_act,
                      flags: tuple, lambdas: dict):
    """Gated stage-1 loss assembly from rendered channels.

    Shared verbatim by the single-chip jitted step and the sharded
    production step (texgs.dist.sharded) so both train the *same* loss
    (/root/reference/models/gaussian3d.py:352-422).  flags gate each term
    statically; lambdas are traced scalars.
    """
    (use_alpha, use_opacity_reg, use_depth, use_norm, use_norm_smooth,
     use_norm_reg, _track_stats) = flags

    ll1 = losses.l1_loss(image, gt_image)
    lssim = 1.0 - losses.ssim_loss(image, gt_image)
    loss = ((1.0 - lambdas["dssim"]) * ll1 + lambdas["dssim"] * lssim)
    stats_d = dict(Ll1=ll1, Lssim=lssim)

    if use_alpha:
        la = losses.l1_loss(alpha, gt_alpha)
        loss = loss + lambdas["alpha"] * la
        stats_d["Lalpha"] = la
    if use_opacity_reg:
        lor = losses.zero_one_loss(opacity_act)
        loss = loss + lambdas["opacity_reg"] * lor
        stats_d["Lopacity_reg"] = lor
    if use_depth:
        ld = losses.l1_loss(depth, camera.depth)
        loss = loss + lambdas["depth"] * ld
        stats_d["Ldepth"] = ld
    if use_norm:
        ln = losses.norm_loss(norm, camera.normal, gt_alpha)
        loss = loss + lambdas["norm"] * ln
        stats_d["Lnorm"] = ln
    if use_norm_smooth:
        lns = losses.smooth_loss(gt_image, norm, gt_alpha)
        loss = loss + lambdas["norm_smooth"] * lns
        stats_d["Lnorm_smooth"] = lns
    if use_norm_reg:
        lnr = losses.norm_reg_loss(norm, depth, camera.tanfovx,
                                   camera.tanfovy, camera.world_view,
                                   gt_alpha)
        loss = loss + lambdas["norm_reg"] * lnr
        stats_d["Lnorm_reg"] = lnr

    stats_d["total_loss"] = loss
    return loss, stats_d


def _round_capacity(n: int) -> int:
    """Pad to the next power of two (>= 2048) — growth forces a retrace, so
    power-of-two buckets bound the number of recompilations."""
    cap = 2048
    while cap < n:
        cap *= 2
    return cap


class Gaussian3D:
    """Stage-1 geometry model with the reference's driver-facing API
    (initialize / setup_optim / compute_loss / optimize_step / visual_step /
    state_dict / load_state_dict — models/base.py:5-46)."""

    def __init__(self, cfg: Cfg, log, work_dir: str, debug: bool = False):
        self.cfg = cfg
        self.log = log
        self.work_dir = work_dir
        self.debug = debug
        self.active_sh_degree = 0
        self.max_sh_degree = int(cfg.sh_degree)
        self.spatial_lr_scale = 0.0
        self.state: Optional[GaussianState] = None
        self.adam: Optional[optim.AdamState] = None
        self.stats: Optional[densify.DensifyStats] = None
        self.optim_cfg: Optional[Cfg] = None
        self.xyz_lr_fn = None
        self.backend = cfg.get_or("backend", "auto")
        self._rng = jax.random.PRNGKey(int(cfg.get_or("seed", 0)))
        self._pair_caps = PairCapController(log=log)

    # ------------------------------------------------------------------ setup
    def initialize(self, pcd, spatial_lr_scale: float):
        self.spatial_lr_scale = float(spatial_lr_scale)
        n = pcd.points.shape[0]
        self.state = init_from_pcd(pcd.points, pcd.colors, self.max_sh_degree,
                                   capacity=_round_capacity(n))
        self.log.info(f"Number of points at initialisation : {n} "
                      f"(capacity {self.state.capacity})")

    def setup_optim(self, optim_cfg: Cfg):
        self.optim_cfg = optim_cfg
        self.adam = optim.init(self.state.params_dict())
        self.stats = densify.init_stats(self.state.capacity)
        self.xyz_lr_fn = expon_lr(
            lr_init=optim_cfg.position_lr_init * self.spatial_lr_scale,
            lr_final=optim_cfg.position_lr_final * self.spatial_lr_scale,
            lr_delay_mult=optim_cfg.position_lr_delay_mult,
            max_steps=optim_cfg.position_lr_max_steps)

    def _lrs(self, iteration: int) -> dict:
        oc = self.optim_cfg
        return {
            "xyz": jnp.float32(self.xyz_lr_fn(iteration)),
            "f_dc": jnp.float32(oc.feature_lr),
            "f_rest": jnp.float32(oc.feature_lr / 20.0),
            "opacity": jnp.float32(oc.opacity_lr),
            "scaling": jnp.float32(oc.scaling_lr),
            "rotation": jnp.float32(oc.rotation_lr),
        }

    # ------------------------------------------------------------- jitted core
    @functools.partial(jax.jit, static_argnames=(
        "self", "flags", "active_sh_degree", "pair_cap", "backend"))
    def _train_step(self, state: GaussianState, adam, stats, camera: Camera,
                    lrs, lambdas, apply_adam, flags: tuple,
                    active_sh_degree: int, pair_cap: Optional[int] = None,
                    backend: str = "auto"):
        """Fused render + loss + grads (+ Adam & densify-stat accumulation)."""
        track_stats = flags[6]
        capacity = state.capacity

        gt_image = camera.image
        if camera.alpha_mask is not None:
            gt_alpha = camera.alpha_mask
        else:
            gt_alpha = jnp.ones((1,) + gt_image.shape[1:], gt_image.dtype)

        def loss_fn(params, ndc_zero):
            st = state.replace(
                xyz=params["xyz"], features_dc=params["f_dc"],
                features_rest=params["f_rest"], opacity=params["opacity"],
                scaling=params["scaling"], rotation=params["rotation"])
            out = render(camera,
                         xyz=st.xyz, opacity=st.get_opacity(),
                         scaling=st.get_scaling(), rotation=st.get_rotation(),
                         features=st.get_features(),
                         active_sh_degree=active_sh_degree,
                         bg_color=lambdas["bg"], ndc_offset=ndc_zero,
                         backend=backend, pair_cap=pair_cap)
            loss, stats_d = stage1_loss_terms(
                out["render"], out["depth"], out["norm"], out["alpha"],
                camera, gt_image, gt_alpha, st.get_opacity(), flags, lambdas)
            return loss, (stats_d, out["radii"],
                          out["n_pairs"], out["pair_overflow"])

        params = state.params_dict()
        ndc_zero = jnp.zeros((capacity, 2), jnp.float32)
        (loss, (stats_d, radii, n_pairs, overflow)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, ndc_zero)
        param_grads, vs_grad = grads
        if n_pairs is not None:
            stats_d["n_pairs"] = n_pairs
            stats_d["pair_overflow"] = overflow

        if track_stats:
            stats = densify.add_stats(stats, vs_grad, radii)

        # apply_adam is traced: on surgery iterations the update is computed
        # but discarded (parity with torch, where surgery drops .grad before
        # optimizer.step()).  A select keeps one compiled program for both.
        new_params, new_adam = optim.update(params, param_grads, adam, lrs)
        pick = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(apply_adam, a, b), new, old)
        params = pick(new_params, params)
        adam = optim.AdamState(mu=pick(new_adam.mu, adam.mu),
                               nu=pick(new_adam.nu, adam.nu),
                               count=pick(new_adam.count, adam.count))
        state = state.replace(
            xyz=params["xyz"], features_dc=params["f_dc"],
            features_rest=params["f_rest"], opacity=params["opacity"],
            scaling=params["scaling"], rotation=params["rotation"])

        return state, adam, stats, loss, stats_d

    @functools.partial(jax.jit, static_argnames=("self", "active_sh_degree",
                                                 "scaling_modifier"))
    def _render_view(self, state: GaussianState, camera: Camera,
                     bg, active_sh_degree: int,
                     scaling_modifier: float = 1.0):
        return render(camera, xyz=state.xyz, opacity=state.get_opacity(),
                      scaling=state.get_scaling(),
                      rotation=state.get_rotation(),
                      features=state.get_features(),
                      active_sh_degree=active_sh_degree, bg_color=bg,
                      scaling_modifier=scaling_modifier,
                      backend=self.backend)

    # -------------------------------------------------------------- driver API
    def oneup_sh_degree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    def compute_loss(self, cur_iter: int, total_iter: int, viewpoint: Camera,
                     render_unused, loss_cfg: Cfg):
        # LR schedule + SH warmup (gaussian3d.py:353-357)
        if cur_iter % 1000 == 0:
            self.oneup_sh_degree()

        lc = loss_cfg
        flags = (
            bool(lc.lambda_alpha) and in_range(cur_iter, lc.alpha_range),
            bool(lc.lambda_opacity_reg) and in_range(cur_iter, lc.opacity_reg_range),
            bool(lc.lambda_depth) and in_range(cur_iter, lc.depth_range)
            and viewpoint.depth is not None,
            bool(lc.lambda_norm) and in_range(cur_iter, lc.norm_range)
            and viewpoint.normal is not None,
            bool(lc.lambda_norm_smooth) and in_range(cur_iter, lc.norm_smooth_range),
            bool(lc.lambda_norm_reg) and in_range(cur_iter, lc.norm_reg_range),
            cur_iter <= self._densify_until(),
        )
        lambdas = {
            "bg": self._bg,
            "dssim": jnp.float32(lc.lambda_dssim),
            "alpha": jnp.float32(lc.get_or("lambda_alpha", 0.0)),
            "opacity_reg": jnp.float32(lc.get_or("lambda_opacity_reg", 0.0)),
            "depth": jnp.float32(lc.get_or("lambda_depth", 0.0)),
            "norm": jnp.float32(lc.get_or("lambda_norm", 0.0)),
            "norm_smooth": jnp.float32(lc.get_or("lambda_norm_smooth", 0.0)),
            "norm_reg": jnp.float32(lc.get_or("lambda_norm_reg", 0.0)),
        }
        apply_adam = jnp.asarray(not self._surgery_planned(cur_iter))

        # Pair-cap feedback loop with DEFERRED validation: a static cap
        # sizes every pair array; on overflow (pairs silently dropped) the
        # step is rolled back, the cap grown, and the step re-run — exact,
        # because the step is functional (texgs.train.pair_cap).
        #
        # Wall-clock shape (round-4 tunnel tax, NOTES.md): every host read
        # of a device scalar is a tunnel round trip (~0.2 s), so (a) all
        # per-step scalars travel in ONE jax.device_get, and (b) that read
        # is DEFERRED one step — step k dispatches on step k-1's (still
        # unvalidated) outputs, then k-1's stats are read while k executes.
        # On the rare overflow, k-1 is rolled back + re-run synchronously
        # and the speculative k is re-dispatched.  The driver therefore
        # sees step k-1's loss/stats at iteration k (display-only lag);
        # flush() forces validation before surgery/eval/checkpoint.
        default_cap = max(4 * self.state.capacity, 1 << 14)
        viewpoint = viewpoint.jit_view()   # one trace per capacity, not view
        lrs = self._lrs(cur_iter)

        # capture at dispatch time so a rollback re-run of step k uses the
        # SH degree it was dispatched with (ADVICE r4)
        sh_degree = self.active_sh_degree

        def run(cap):
            return self._train_step(
                self.state, self.adam, self.stats, viewpoint, lrs, lambdas,
                apply_adam, flags, sh_degree, cap, self.backend)

        prev = (self.state, self.adam, self.stats)
        result = run(self._pair_caps.current(default_cap))
        self.state, self.adam, self.stats = result[:3]
        lagged = self._validate_pending()
        if self._rolled_back:
            # the speculative dispatch above used rolled-back params
            self._rolled_back = False
            prev = (self.state, self.adam, self.stats)
            result = run(self._pair_caps.current(default_cap))
            self.state, self.adam, self.stats = result[:3]
        self._pending = dict(stats=result[4], prev=prev, run=run,
                             default_cap=default_cap)
        if lagged is None:
            # nothing was pending (first step, or a flush consumed it):
            # reuse the last validated stats for display; only the very
            # first step of a run must validate synchronously
            lagged = self._last_stats if self._last_stats is not None \
                else self.flush()
        self._last_stats = lagged
        return lagged["total_loss"], lagged, {}

    _pending = None
    _rolled_back = False
    _last_stats = None

    def _validate_pending(self):
        """device_get + pair-cap control for the in-flight step; on
        overflow rolls back to the pre-step snapshot and re-runs with the
        grown cap until clean.  Returns the step's host stats (or None if
        nothing was pending)."""
        p, self._pending = self._pending, None
        if p is None:
            return None
        stats_d = jax.device_get(p["stats"])
        for _attempt in range(4):
            if "pair_overflow" not in stats_d:
                return stats_d
            n_pairs = int(stats_d["n_pairs"])
            if not bool(stats_d["pair_overflow"]):
                self._pair_caps.observe(n_pairs, p["default_cap"])
                return stats_d
            self._pair_caps.grow(n_pairs, p["default_cap"])
            self.state, self.adam, self.stats = p["prev"]
            self._rolled_back = True
            result = p["run"](self._pair_caps.current(p["default_cap"]))
            self.state, self.adam, self.stats = result[:3]
            stats_d = jax.device_get(result[4])
        return stats_d

    def flush(self):
        """Validate any in-flight step (driver calls this before eval /
        checkpoint; optimize_step before densify surgery)."""
        st = self._validate_pending()
        self._rolled_back = False
        return st

    # Surgery schedule helpers --------------------------------------------
    _train_cfg: Optional[Cfg] = None
    _bg = None

    def bind_train_cfg(self, train_cfg: Cfg, bg):
        """Driver hands over train_cfg/bg once (used for schedule decisions
        inside compute_loss, mirroring how the reference model reads
        train_cfg in optimize_step)."""
        self._train_cfg = train_cfg
        self._bg = jnp.asarray(bg, jnp.float32)

    def _densify_until(self) -> int:
        tc = self._train_cfg
        return int(tc.densify_until_iter) if tc and tc.densify_until_iter else 0

    def _surgery_planned(self, cur_iter: int) -> bool:
        """Will optimize_step run an op that recreates params this iter?
        If so the Adam update is skipped — parity with torch, where
        densification replaces Parameters and their .grad is lost before
        optimizer.step() (gaussian3d.py:424-462)."""
        tc = self._train_cfg
        if tc is None:
            return False
        if cur_iter <= self._densify_until():
            if tc.opacity_prune_interval and cur_iter % tc.opacity_prune_interval == 0:
                return True
            if tc.opacity_prune_iters and cur_iter in tc.opacity_prune_iters:
                return True
            if (cur_iter > tc.densify_from_iter
                    and cur_iter % tc.densification_interval == 0):
                return True
            if cur_iter % tc.opacity_reset_interval == 0:
                return True
            if (tc.min_scale_reset_interval
                    and cur_iter > tc.min_scale_reset_from_iter
                    and cur_iter % tc.min_scale_reset_interval == 0):
                return True
        else:
            if tc.opacity_prune_interval and cur_iter % tc.opacity_prune_interval == 0:
                return True
            if tc.opacity_prune_iters and cur_iter in tc.opacity_prune_iters:
                return True
            if (tc.min_scale_reset_interval
                    and cur_iter % tc.min_scale_reset_interval == 0):
                return True
        return False

    def optimize_step(self, cur_iter: int, total_iter: int, train_cfg: Cfg,
                      extra_info: dict):
        """Densify/prune/reset scheduling (gaussian3d.py:424-462).  The Adam
        step already happened inside _train_step unless surgery was planned."""
        tc = train_cfg
        oc = self.optim_cfg

        # surgery mutates state: validate the in-flight step first so a
        # late rollback can never clobber it (deferred validation)
        if self._pending is not None:
            ivals = (tc.opacity_prune_interval, tc.densification_interval,
                     tc.opacity_reset_interval, tc.min_scale_reset_interval)
            if (any(i and cur_iter % int(i) == 0 for i in ivals)
                    or (tc.opacity_prune_iters
                        and cur_iter in tc.opacity_prune_iters)):
                self.flush()

        def opacity_prune_due():
            if tc.opacity_prune_interval and cur_iter % tc.opacity_prune_interval == 0:
                return True
            return bool(tc.opacity_prune_iters) and cur_iter in tc.opacity_prune_iters

        if cur_iter <= self._densify_until():
            if opacity_prune_due():
                self.state, self.adam, self.stats = densify.opacity_prune(
                    self.state, self.adam, self.stats,
                    float(tc.opacity_prune_theshold))

            if (cur_iter > tc.densify_from_iter
                    and cur_iter % tc.densification_interval == 0):
                size_threshold = 20 if cur_iter > tc.opacity_reset_interval else None
                self._densify_and_prune(float(tc.densify_grad_threshold),
                                        0.005, size_threshold,
                                        float(oc.percent_dense))

            if cur_iter % tc.opacity_reset_interval == 0:
                self.state, self.adam = densify.reset_opacity(self.state, self.adam)

            if (tc.min_scale_reset_interval
                    and cur_iter > tc.min_scale_reset_from_iter
                    and cur_iter % tc.min_scale_reset_interval == 0):
                self.state, self.adam = densify.reset_min_scale(self.state, self.adam)
        else:
            if opacity_prune_due():
                self.state, self.adam, self.stats = densify.opacity_prune(
                    self.state, self.adam, self.stats,
                    float(tc.opacity_prune_theshold))
            if (tc.min_scale_reset_interval
                    and cur_iter % tc.min_scale_reset_interval == 0):
                self.state, self.adam = densify.reset_min_scale(self.state, self.adam)

    def _densify_and_prune(self, max_grad, min_opacity, max_screen_size,
                           percent_dense):
        need = int(densify.required_capacity(
            self.state, self.stats, max_grad, self.spatial_lr_scale,
            percent_dense))
        if need > self.state.capacity:
            new_cap = _round_capacity(need)
            self.log.info(f"Growing capacity {self.state.capacity} -> {new_cap}")
            self.state, self.adam, self.stats = densify.grow_capacity(
                self.state, self.adam, self.stats, new_cap)
        self._rng, key = jax.random.split(self._rng)
        self.state, self.adam, self.stats, _overflow = densify.densify_and_prune(
            self.state, self.adam, self.stats, key,
            max_grad=max_grad, min_opacity=min_opacity,
            extent=self.spatial_lr_scale, max_screen_size=max_screen_size,
            percent_dense=percent_dense)

    # ---------------------------------------------------------------- eval/io
    def visual_step(self, cur_iter: int, total_iter: int, viewpoint: Camera,
                    render_unused, scaling_modifier: float = 1.0):
        out = self._render_view(self.state, viewpoint.jit_view(), self._bg,
                                self.active_sh_degree,
                                float(scaling_modifier))
        return dict(image=out["render"], depth=out["depth"],
                    norm=out["norm"], alpha=out["alpha"])

    @property
    def n_points(self) -> int:
        return int(self.state.n_alive)

    def get_opacity_np(self):
        return np.asarray(self.state.get_opacity())[: self.n_points]

    def save_point_cloud(self, path: str):
        from texgs.io.ply import write_ply_xyz
        xyz = np.asarray(self.state.xyz)[: self.n_points]
        write_ply_xyz(path, xyz)

    def state_dict(self) -> dict:
        return dict(
            hyperparams=dict(active_sh_degree=self.active_sh_degree,
                             spatial_lr_scale=self.spatial_lr_scale),
            params={k: np.asarray(v) for k, v in
                    {**self.state.params_dict(),
                     "n_alive": self.state.n_alive}.items()},
            adam=dict(
                mu={k: np.asarray(v) for k, v in self.adam.mu.items()},
                nu={k: np.asarray(v) for k, v in self.adam.nu.items()},
                count={k: np.asarray(v) for k, v in self.adam.count.items()}),
            stats=dict(
                xyz_gradient_accum=np.asarray(self.stats.xyz_gradient_accum),
                denom=np.asarray(self.stats.denom),
                max_radii2d=np.asarray(self.stats.max_radii2d)),
        )

    def load_state_dict(self, sd: dict, optim_cfg: Cfg):
        hp = sd["hyperparams"]
        self.active_sh_degree = int(hp["active_sh_degree"])
        self.spatial_lr_scale = float(hp["spatial_lr_scale"])
        p = sd["params"]
        self.state = GaussianState(
            xyz=jnp.asarray(p["xyz"]), features_dc=jnp.asarray(p["f_dc"]),
            features_rest=jnp.asarray(p["f_rest"]),
            scaling=jnp.asarray(p["scaling"]),
            rotation=jnp.asarray(p["rotation"]),
            opacity=jnp.asarray(p["opacity"]),
            n_alive=jnp.asarray(p["n_alive"], jnp.int32))
        self.setup_optim(optim_cfg)
        self.adam = optim.AdamState(
            mu={k: jnp.asarray(v) for k, v in sd["adam"]["mu"].items()},
            nu={k: jnp.asarray(v) for k, v in sd["adam"]["nu"].items()},
            count={k: jnp.asarray(v) for k, v in sd["adam"]["count"].items()})
        st = sd["stats"]
        self.stats = densify.DensifyStats(
            xyz_gradient_accum=jnp.asarray(st["xyz_gradient_accum"]),
            denom=jnp.asarray(st["denom"]),
            max_radii2d=jnp.asarray(st["max_radii2d"]))
