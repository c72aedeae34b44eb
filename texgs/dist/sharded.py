"""Sharded *production* training steps — the real stage-1/stage-3 losses
under shard_map on a 2D (data, tile) mesh.

Strategy (the sequence-parallel analogue for splatting, SURVEY.md §2.3/§5):

* cameras are sharded over the ``data`` axis (one per mesh row);
* each camera's image rows are sharded over the ``tile`` axis — every chip
  bins + rasterizes only its horizontal band with the *unchanged*
  single-chip kernels (Gaussian state replicated, projected means shifted
  by the band row offset);
* the rendered band channels are ``all_gather``ed along the tile axis and
  the full-image production loss (texgs.train.gaussian3d.stage1_loss_terms
  / texgs.train.texture_gaussian3d.stage3_loss_terms — the *same code* the
  single-chip jitted steps run, windowed SSIM and all) is computed
  replicated; autodiff through all_gather routes each chip's pixel
  cotangents back to its own band (the transpose is a scatter), so the
  per-chip parameter gradients are exactly that band's contribution;
* gradients are psum'd over ``tile`` and pmean'd over ``data`` — one
  collective pair per step, overlapping backward via XLA's scheduler.
  This includes the stage-3 texture cubemap gradient: each band's bilinear
  texel scatter is partial, and the tile-axis psum is the cross-chip
  texture-gradient reduction named in SURVEY.md §5.

With mesh (data=1, tile=1) the math is bit-identical to the single-chip
steps; tests assert grad equality against them on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from texgs.core.camera import Camera
from texgs.dist.data_parallel import index_camera
from texgs.dist.tile_parallel import band_height
from texgs.render.render import render
from texgs.render.uv_tex_render import uv_tex_render
from texgs.train import densify, optim
from texgs.train.gaussian3d import stage1_loss_terms
from texgs.train.texture_gaussian3d import stage3_loss_terms


def _grad_scale(x, s: float):
    """Value-preserving gradient rescale (x unchanged, dx scaled by s).

    Loss terms that touch *parameters directly* (opacity zero-one reg,
    stage-3 inverse cycle) are computed replicated on every tile chip —
    without this 1/n_tiles rescale the tile-axis psum would over-count
    exactly those terms' gradients n_tiles times (render-path terms are
    per-band partials and psum correctly)."""
    if s == 1.0:
        return x
    return jax.tree.map(
        lambda a: a * s + jax.lax.stop_gradient(a) * (1.0 - s), x)


def _gather_bands(channels: jnp.ndarray, tile_axis: str,
                  height: int) -> jnp.ndarray:
    """(C, band_h, W) per chip -> full (C, H, W) on every chip.

    all_gather's transpose is a cross-chip cotangent SUM (psum_scatter):
    with the full-image loss replicated on every tile chip, each band's
    pixel cotangent arrives n_tile x.  The value-preserving 1/n rescale
    makes the downstream tile-axis psum of parameter gradients count every
    pixel exactly once (the direct-param loss terms are handled separately
    by _grad_scale at their call sites)."""
    n = int(jax.lax.psum(1, tile_axis))
    channels = _grad_scale(channels, 1.0 / n)
    g = jax.lax.all_gather(channels, tile_axis)          # (n_bands, C, bh, W)
    full = jnp.moveaxis(g, 0, 1).reshape(
        channels.shape[0], -1, channels.shape[-1])
    return full[:, :height]


def _gt_of(cam: Camera):
    gt_image = cam.image
    if cam.alpha_mask is not None:
        gt_alpha = cam.alpha_mask
    else:
        gt_alpha = jnp.ones((1,) + gt_image.shape[1:], gt_image.dtype)
    return gt_image, gt_alpha


# --------------------------------------------------------------- stage 1

@functools.partial(
    jax.jit, static_argnames=("mesh", "flags", "active_sh_degree",
                              "pair_cap", "backend", "data_axis",
                              "tile_axis", "shard_mode"))
def stage1_sharded_step(mesh: Mesh, state, adam, stats, camera_batch: Camera,
                        lrs, lambdas, apply_adam, flags: tuple,
                        active_sh_degree: int, pair_cap=None,
                        backend: str = "scan", data_axis: str = "data",
                        tile_axis: str = "tile",
                        shard_mode: str = "tile"):
    """Sharded twin of ``Gaussian3D._train_step`` (same returns).

    camera_batch: stacked cameras with leading dim == mesh.shape[data_axis]
    (one camera per data row; every camera same static resolution).
    Densify stats generalize the reference's one-camera-per-step semantics
    to a batch: per-Gaussian |ndc grad| / visibility summed over the batch
    cameras, max_radii2d maxed over them.

    shard_mode selects how the non-data mesh axes split the render work:
    'tile' = horizontal image bands gathered to the full image (the SP
    analogue); 'gauss' = depth-rank Gaussian slices folded with the over
    operator (texgs.dist.gauss_sharded — the ring-attention analogue);
    'tile+gauss' = both at once on a 3-axis (data, tile, gauss) mesh:
    each chip rasterizes one row band of one depth slice (gauss-fold the
    band, then gather bands).  All modes compute the identical full-image
    production loss replicated.
    """
    assert shard_mode in ("tile", "gauss", "tile+gauss")
    gauss_axis = "gauss" if shard_mode == "tile+gauss" else None
    track_stats = flags[6]
    ref_cam = index_camera(camera_batch, 0)
    height, width = ref_cam.height, ref_cam.width
    n_bands = mesh.shape[tile_axis]
    n_repl = n_bands * (mesh.shape[gauss_axis] if gauss_axis else 1)
    band_h = band_height(height, n_bands)
    capacity = state.capacity

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(data_axis)),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False)
    def run(params, cam_shard):
        cam = index_camera(cam_shard, 0)
        gt_image, gt_alpha = _gt_of(cam)
        band = jax.lax.axis_index(tile_axis)
        row0 = band * band_h

        def loss_fn(p, ndc_zero):
            st = state.replace(
                xyz=p["xyz"], features_dc=p["f_dc"],
                features_rest=p["f_rest"], opacity=p["opacity"],
                scaling=p["scaling"], rotation=p["rotation"])
            if shard_mode == "gauss":
                from texgs.dist.gauss_sharded import gauss_sharded_render
                out = gauss_sharded_render(
                    cam, xyz=st.xyz, opacity=st.get_opacity(),
                    scaling=st.get_scaling(), rotation=st.get_rotation(),
                    features=st.get_features(),
                    active_sh_degree=active_sh_degree,
                    bg_color=lambdas["bg"], ndc_offset=ndc_zero,
                    axis_name=tile_axis, backend=backend,
                    pair_cap=pair_cap)
                full = jnp.concatenate([out["render"], out["depth"],
                                        out["norm"], out["alpha"]], axis=0)
            elif shard_mode == "tile+gauss":
                from texgs.dist.gauss_sharded import gauss_sharded_render
                out = gauss_sharded_render(
                    cam, xyz=st.xyz, opacity=st.get_opacity(),
                    scaling=st.get_scaling(), rotation=st.get_rotation(),
                    features=st.get_features(),
                    active_sh_degree=active_sh_degree,
                    bg_color=lambdas["bg"], ndc_offset=ndc_zero,
                    axis_name=gauss_axis, backend=backend,
                    pair_cap=pair_cap,
                    row_offset=row0, band_height=band_h)
                bands = jnp.concatenate([out["render"], out["depth"],
                                         out["norm"], out["alpha"]], axis=0)
                full = _gather_bands(bands, tile_axis, height)
            else:
                out = render(cam, xyz=st.xyz, opacity=st.get_opacity(),
                             scaling=st.get_scaling(),
                             rotation=st.get_rotation(),
                             features=st.get_features(),
                             active_sh_degree=active_sh_degree,
                             bg_color=lambdas["bg"], ndc_offset=ndc_zero,
                             backend=backend, pair_cap=pair_cap,
                             row_offset=row0, band_height=band_h)
                bands = jnp.concatenate([out["render"], out["depth"],
                                         out["norm"], out["alpha"]], axis=0)
                full = _gather_bands(bands, tile_axis, height)
            loss, stats_d = stage1_loss_terms(
                full[0:3], full[3:4], full[4:7], full[7:8], cam,
                gt_image, gt_alpha,
                _grad_scale(st.get_opacity(), 1.0 / n_repl),
                flags, lambdas)
            return loss, (stats_d, out["radii"],
                          out["n_pairs"], out["pair_overflow"])

        ndc_zero = jnp.zeros((capacity, 2), jnp.float32)
        (loss, (stats_d, radii, n_pairs, overflow)), grads = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, ndc_zero)
        param_grads, vs_grad = grads

        # full gradients: band/slice contributions summed, camera-mean
        # over data
        param_grads = jax.lax.psum(param_grads, tile_axis)
        if gauss_axis:
            param_grads = jax.lax.psum(param_grads, gauss_axis)
        param_grads = jax.lax.pmean(param_grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        stats_d = jax.lax.pmean(stats_d, data_axis)

        # densify stats: per-camera ndc grad = tile-psum; batch = data-sum
        vs_grad = jax.lax.psum(vs_grad, tile_axis)
        if gauss_axis:
            vs_grad = jax.lax.psum(vs_grad, gauss_axis)
        gnorm = jnp.linalg.norm(vs_grad[:, :2], axis=-1, keepdims=True)
        visible = radii > 0
        d_accum = jax.lax.psum(jnp.where(visible[:, None], gnorm, 0.0),
                               data_axis)
        d_denom = jax.lax.psum(visible[:, None].astype(jnp.float32),
                               data_axis)
        r_max = jax.lax.pmax(
            jnp.where(visible, radii.astype(jnp.float32), 0.0), data_axis)

        if n_pairs is not None:
            n_pairs = jax.lax.psum(n_pairs, tile_axis)
            if gauss_axis:
                n_pairs = jax.lax.psum(n_pairs, gauss_axis)
            n_pairs = jax.lax.pmax(n_pairs, data_axis)
            # overflow is device-varying across EVERY axis (a single band /
            # depth slice can overflow alone); reduce over all or a
            # non-zero chip's True is silently dropped by out_specs P()
            overflow = jax.lax.pmax(overflow, tile_axis)
            if gauss_axis:
                overflow = jax.lax.pmax(overflow, gauss_axis)
            overflow = jax.lax.pmax(overflow, data_axis)
            stats_d = dict(stats_d, n_pairs=n_pairs, pair_overflow=overflow)
        return param_grads, loss, stats_d, d_accum, d_denom, r_max

    params = state.params_dict()
    param_grads, loss, stats_d, d_accum, d_denom, r_max = run(
        params, camera_batch)

    new_stats = stats
    if track_stats:
        new_stats = densify.DensifyStats(
            xyz_gradient_accum=stats.xyz_gradient_accum + d_accum,
            denom=stats.denom + d_denom,
            max_radii2d=jnp.maximum(stats.max_radii2d, r_max))

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
    return state, adam, new_stats, loss, stats_d


# --------------------------------------------------------------- stage 3

@functools.partial(
    jax.jit, static_argnames=("mesh", "model_fns", "flags",
                              "active_sh_degree",
                              "n_inv_points", "pair_cap", "m", "backend",
                              "tex_backend", "tex_miss_cap", "filter_mode",
                              "uv_net_cfg", "inv_uv_net_cfg", "data_axis",
                              "tile_axis", "shard_mode"))
def stage3_sharded_step(mesh: Mesh, model_fns, gauss_params, uv_params,
                        tex_params, adam_g, adam_uv, adam_tex,
                        camera_batch: Camera, key, lrs, lambdas,
                        apply_flags, flags: tuple, active_sh_degree: int,
                        n_inv_points: int, uv_net_cfg, inv_uv_net_cfg,
                        pair_cap=None, m: int = 32, backend: str = "scan",
                        tex_backend: str = "xla", tex_miss_cap: int = 4096,
                        filter_mode: str = "bilinear",
                        data_axis: str = "data", tile_axis: str = "tile",
                        shard_mode: str = "tile"):
    """Sharded twin of ``TextureGaussian3D._train_step`` (same returns).

    model_fns: (activated_fn, uvs_and_jac_fn) — the model's `_activated`
    and `_uvs_and_jac` bound methods (pure functions of the param pytrees),
    so this module trains exactly the model's parameterization.
    The texture cubemap gradient is partial per band and psum'd over the
    tile axis (SURVEY.md §5's texture-gradient reduction).

    shard_mode: 'tile' = image row bands; 'gauss' = depth-rank Gaussian
    slices folded with the over operator (dist.gauss_sharded — the texture
    term folds too, being linear in the blend weights); 'tile+gauss' =
    both on a 3-axis (data, tile, gauss) mesh.
    """
    assert shard_mode in ("tile", "gauss", "tile+gauss")
    gauss_axis = "gauss" if shard_mode == "tile+gauss" else None
    activated_fn, uvs_and_jac_fn = model_fns
    use_no_sh = flags[7]
    apply_g, apply_uv, apply_tex = apply_flags
    ref_cam = index_camera(camera_batch, 0)
    height = ref_cam.height
    n_bands = mesh.shape[tile_axis]
    n_repl = n_bands * (mesh.shape[gauss_axis] if gauss_axis else 1)
    band_h = band_height(height, n_bands)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)
    def run(gp, up, tp, cam_shard, key_):
        cam = index_camera(cam_shard, 0)
        gt_image, gt_alpha = _gt_of(cam)
        band = jax.lax.axis_index(tile_axis)
        row0 = band * band_h

        def do_render(act, uvs, jac, texture, deg):
            if shard_mode in ("gauss", "tile+gauss"):
                from texgs.dist.gauss_sharded import \
                    gauss_sharded_uv_tex_render
                band_kw = ({"row_offset": row0, "band_height": band_h}
                           if shard_mode == "tile+gauss" else {})
                return gauss_sharded_uv_tex_render(
                    cam, xyz=act["xyz"], opacity=act["opacity"],
                    scaling=act["scaling"], rotation=act["rotation"],
                    uvs=uvs, grad_uvs=jac, texture=texture,
                    shs=act["shs"], active_sh_degree=deg,
                    bg_color=lambdas["bg"],
                    axis_name=gauss_axis or tile_axis, m=m,
                    filter_mode=filter_mode, backend=backend,
                    tex_backend=tex_backend, tex_miss_cap=tex_miss_cap,
                    pair_cap=pair_cap, with_no_sh=use_no_sh, **band_kw)
            return uv_tex_render(
                cam, xyz=act["xyz"], opacity=act["opacity"],
                scaling=act["scaling"], rotation=act["rotation"],
                uvs=uvs, grad_uvs=jac, texture=texture, shs=act["shs"],
                active_sh_degree=deg, bg_color=lambdas["bg"], m=m,
                filter_mode=filter_mode, backend=backend,
                tex_backend=tex_backend, tex_miss_cap=tex_miss_cap,
                pair_cap=pair_cap,
                row_offset=row0, band_height=band_h,
                with_no_sh=use_no_sh)

        def loss_fn(gp_, up_, tp_):
            act = activated_fn(gp_)
            uvs, jac = uvs_and_jac_fn(up_, gp_["xyz"])
            out = do_render(act, uvs, jac, tp_["texture"],
                            active_sh_degree)
            bands = jnp.concatenate([out["render"], out["depth"],
                                     out["norm"], out["alpha"]], axis=0)
            if use_no_sh:
                # same-pass no-SH image (with_no_sh) — no second render
                bands = jnp.concatenate([bands, out["render_no_sh"]],
                                        axis=0)
            if shard_mode == "gauss":
                full = bands  # already full-image, fold done in the render
            else:
                full = _gather_bands(bands, tile_axis, height)
            image_ns = full[8:11] if use_no_sh else None
            loss, stats = stage3_loss_terms(
                full[0:3], full[3:4], full[4:7], full[7:8], image_ns, cam,
                gt_image, gt_alpha,
                _grad_scale(act["opacity"], 1.0 / n_repl),
                _grad_scale(up_, 1.0 / n_repl), key_,
                uv_net_cfg, inv_uv_net_cfg, n_inv_points, flags, lambdas)
            if out["n_pairs"] is not None:
                n_pairs = jax.lax.psum(
                    jax.lax.stop_gradient(out["n_pairs"]), tile_axis)
                overflow = jax.lax.pmax(out["pair_overflow"], tile_axis)
                if gauss_axis:
                    n_pairs = jax.lax.psum(n_pairs, gauss_axis)
                    overflow = jax.lax.pmax(overflow, gauss_axis)
                stats["n_pairs"] = n_pairs
                stats["pair_overflow"] = overflow
            if out.get("tex_miss") is not None:
                miss = jax.lax.psum(out["tex_miss"], tile_axis)
                if gauss_axis:
                    miss = jax.lax.psum(miss, gauss_axis)
                stats["tex_miss"] = miss
            return loss, stats

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(gp, up, tp)
        grads = jax.lax.psum(grads, tile_axis)    # incl. texture cubemap
        if gauss_axis:
            grads = jax.lax.psum(grads, gauss_axis)
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        stats = jax.lax.pmean(stats, data_axis)
        return grads[0], grads[1], grads[2], loss, stats

    g_g, g_uv, g_tex, loss, stats = run(gauss_params, uv_params, tex_params,
                                        camera_batch, key)

    def gated(new, old, flag):
        return jax.tree.map(lambda a, b: jnp.where(flag, a, b), new, old)

    g_lrs = {"xyz": lrs["xyz"], "opacity": lrs["opacity"],
             "scaling": lrs["scaling"], "rotation": lrs["rotation"]}
    if "shs" in gauss_params:
        g_lrs["shs"] = lrs["shs"]
    new_g, new_adam_g = optim.update(gauss_params, g_g, adam_g, g_lrs)
    gauss_params = gated(new_g, gauss_params, apply_g)
    adam_g = gated(new_adam_g, adam_g, apply_g)

    uv_lrs = {"uv_net": jax.tree.map(lambda _: lrs["uv_net"],
                                     uv_params["uv_net"]),
              "inv_uv_net": jax.tree.map(lambda _: lrs["inv_uv_net"],
                                         uv_params["inv_uv_net"]),
              "geo_emb": lrs["uv_net"]}
    new_uv, new_adam_uv = optim.update(uv_params, g_uv, adam_uv, uv_lrs)
    uv_params = gated(new_uv, uv_params, apply_uv)
    adam_uv = gated(new_adam_uv, adam_uv, apply_uv)

    new_tex, new_adam_tex = optim.update(tex_params, g_tex, adam_tex,
                                         {"texture": lrs["tex"]})
    tex_params = gated(new_tex, tex_params, apply_tex)
    adam_tex = gated(new_adam_tex, adam_tex, apply_tex)

    return (gauss_params, uv_params, tex_params, adam_g, adam_uv,
            adam_tex, loss, stats)
