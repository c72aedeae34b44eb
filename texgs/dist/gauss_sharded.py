"""Depth-ordered Gaussian sharding: the over-operator cross-chip reduce.

The ring-attention analogue for splatting named in SURVEY.md §5/§7: the
alpha-compositing "over" operator is associative, so depth-contiguous
Gaussian subsets rendered on different chips fold into the exact image:

    C = C_front + T_front * C_back        T = T_front * T_back

Per step, every chip

  1. projects the full (replicated) Gaussian set — a few ms of matmuls,
     negligible next to rasterization (bench_stage1_breakdown.py);
  2. takes its *contiguous depth-rank slice* of the visible Gaussians
     (argsort of view depth, culled entries rank last) — the slicing is
     what makes the cross-chip fold depth-ordered, and it cuts the hot
     binning + blending work n_chips x;
  3. rasterizes only its slice with the unchanged single-chip kernels
     (premultiplied channels, bg deferred);
  4. all_gathers the per-chip (channels, transmittance) images along the
     ``gauss`` axis (XLA lowers the gather as an ICI ring) and folds them
     front-to-back with the over operator.

Semantics vs single-chip: the T < T_STOP early-stop tests each chip's
*local* transmittance, so entries the single-chip stop would drop can
contribute across a slice boundary.  The worst-case per-channel divergence
is the largest weight a stopped entry could have carried:
alpha * t_excl_at_stop <= ALPHA_CLAMP * T_STOP / (1 - ALPHA_CLAMP) ~= 1e-2
(reached only for near-opaque Gaussians right at the stop point; soft
scenes sit orders of magnitude lower — the stage-1 test asserts 5e-4 on a
soft blob, the uvtex test 6e-3 on an alpha~0.99 scene).

Memory argument (why replicated parameters are acceptable at target
scale): 10^6 Gaussians x 59 f32 params (SH3) = 236 MB, 10^7 = 2.4 GB —
both far under a v5e chip's 16 GB HBM next to activations.  This module
therefore shards *work and gradients*, not parameter storage; a
storage-sharded variant would add an all_to_all depth reshard per step
with identical downstream math.

Gradient bookkeeping: the full-image loss is computed replicated on every
gauss-axis chip, so each slice's cotangent arrives through all_gather's
transpose n x (a cross-chip sum of identical cotangents).  The
value-preserving 1/n rescale inside ``_over_fold`` makes the caller's
tile/gauss-axis ``psum`` of parameter gradients count every pixel exactly
once — the same contract as texgs.dist.sharded._gather_bands.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from texgs.core.camera import Camera
from texgs.dist.sharded import _grad_scale
from texgs.kernels import project as proj_k
from texgs.kernels.binning import build_pairs
from texgs.kernels.tile_raster import (assemble_image, build_pair_attrs,
                                       rasterize_scan)


def over_fold(channels: jnp.ndarray, trans: jnp.ndarray):
    """Fold depth-ordered premultiplied slices with the over operator.

    channels: (n, F, H, W) premultiplied per-slice channel sums, front
    slice first; trans: (n, 1, H, W) per-slice transmittance.  Returns
    (C_total (F, H, W), T_total (1, H, W)).  Linear fold — n is the chip
    count, the collective (not this loop) is the cost.
    """
    t_excl = jnp.concatenate(
        [jnp.ones_like(trans[:1]), jnp.cumprod(trans[:-1], axis=0)], axis=0)
    c_total = jnp.sum(t_excl * channels, axis=0)
    t_total = jnp.prod(trans, axis=0)[0]
    return c_total, t_total[None]


def gauss_sharded_render(viewpoint_camera: Camera, *,
                         xyz: jnp.ndarray,
                         opacity: jnp.ndarray,
                         scaling: jnp.ndarray,
                         rotation: jnp.ndarray,
                         features: Optional[jnp.ndarray] = None,
                         active_sh_degree: int = 0,
                         bg_color: jnp.ndarray,
                         override_color: Optional[jnp.ndarray] = None,
                         ndc_offset: Optional[jnp.ndarray] = None,
                         axis_name: str = "gauss",
                         backend: str = "scan",
                         pair_cap: Optional[int] = None,
                         chunk: int = 128,
                         normalize_depth: bool = True,
                         row_offset=None,
                         band_height: Optional[int] = None) -> dict:
    """render() twin that shards rasterization by depth-rank Gaussian
    slices across ``axis_name``; call inside shard_map with all Gaussian
    inputs replicated.  Returns the full-image output dict on every chip.

    row_offset/band_height compose with tile-band sharding on another
    mesh axis: each chip rasterizes one row band of one depth slice, the
    gauss-axis fold here returns the folded *band*, and the caller
    gathers bands over its tile axis as usual — the 3D
    (data, tile, gauss) decomposition.
    """
    cam = viewpoint_camera
    n = xyz.shape[0]
    n_chips = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    assert n % n_chips == 0, (
        f"capacity {n} must divide the '{axis_name}' axis ({n_chips})")
    s = n // n_chips

    if override_color is None:
        colors = proj_k.sh_colors(features, xyz, cam.camera_center,
                                  active_sh_degree)
    else:
        colors = override_color
    proj = proj_k.project_gaussians(
        xyz, scaling, rotation, opacity, colors,
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy,
        ndc_offset=ndc_offset)

    height = cam.height
    if row_offset is not None:
        assert band_height is not None
        shift = jnp.stack([jnp.zeros_like(jnp.asarray(row_offset,
                                                      jnp.float32)),
                           jnp.asarray(row_offset, jnp.float32)])
        proj = proj._replace(means2d=proj.means2d - shift[None, :])
        height = band_height

    # contiguous depth-rank slice (culled Gaussians rank last: they emit
    # no pairs wherever they land)
    key = jnp.where(proj.radii > 0, proj.depths, jnp.inf)
    order = jax.lax.stop_gradient(jnp.argsort(key))
    mine = jax.lax.dynamic_slice_in_dim(order, idx * s, s)
    sliced = jax.tree.map(lambda a: a[mine], proj)

    if pair_cap is None:
        pair_cap = max(4 * n, 1 << 14)
    # Depth-contiguous slices are pair-count skewed (near Gaussians have
    # the largest footprints), so a uniform pair_cap/n split would let the
    # front slice overflow while total pairs stay under cap.  2x headroom
    # absorbs typical skew; a genuinely overflowing slice sets
    # pairs.overflowed, which callers reduce over the axis and feed the
    # pair-cap controller — growing pair_cap grows the slice cap too.
    slice_cap = -(-max(min(2 * pair_cap // n_chips, pair_cap),
                       1 << 12) // chunk) * chunk

    pairs = build_pairs(sliced.means2d, sliced.depths, sliced.radii,
                        height, cam.width, slice_cap, chunk)
    attrs = build_pair_attrs(sliced, pairs, height, cam.width, None)
    if backend == "pallas":
        from texgs.kernels.pallas_raster import rasterize_pallas
        tiles_out, t_final = rasterize_pallas(attrs, pairs, height,
                                              cam.width, chunk)
    else:
        tiles_out, t_final = rasterize_scan(attrs, pairs, height,
                                            cam.width, chunk)
    # premultiplied slice images: bg deferred, depth left unnormalized
    part = assemble_image(tiles_out, t_final, height, cam.width,
                          jnp.zeros(3, attrs.dtype), 0,
                          normalize_depth=False)
    chans = jnp.concatenate([part.image, part.depth, part.norm], axis=0)
    trans = 1.0 - part.alpha

    # 1/n cotangent rescale through the replicated-loss all_gather
    chans = _grad_scale(chans, 1.0 / n_chips)
    trans = _grad_scale(trans, 1.0 / n_chips)
    g_c = jax.lax.all_gather(chans, axis_name)       # (n, 7, H, W)
    g_t = jax.lax.all_gather(trans, axis_name)       # (n, 1, H, W)
    c_tot, t_tot = over_fold(g_c, g_t)

    acc = 1.0 - t_tot
    rgb = c_tot[0:3] + t_tot * bg_color[:, None, None]
    dep = c_tot[3:4]
    if normalize_depth:
        dep = dep / jnp.maximum(acc, 1e-6)
    nrm = c_tot[4:7]

    # full-set radii for densify stats: scatter the slice back, sum shards
    radii_full = jnp.zeros((n,), sliced.radii.dtype).at[mine].set(
        sliced.radii)
    radii_full = jax.lax.psum(radii_full, axis_name)

    # diagnostics stay per-slice (callers psum/pmax over the axis exactly
    # like the tile-band path, so the two modes share reduction code)
    n_pairs = pairs.n_pairs
    overflow = pairs.overflowed
    return {
        "render": rgb,
        "depth": dep,
        "norm": nrm,
        "alpha": acc,
        "extra": None,
        "radii": radii_full,
        "visibility_filter": radii_full > 0,
        "n_pairs": n_pairs,
        "pair_overflow": overflow,
    }


def gauss_sharded_uv_tex_render(viewpoint_camera: Camera, *,
                                xyz: jnp.ndarray,
                                opacity: jnp.ndarray,
                                scaling: jnp.ndarray,
                                rotation: jnp.ndarray,
                                uvs: jnp.ndarray,
                                grad_uvs: jnp.ndarray,
                                texture: jnp.ndarray,
                                shs=None,
                                active_sh_degree: int = 0,
                                bg_color: jnp.ndarray,
                                axis_name: str = "gauss",
                                backend: str = "scan",
                                tex_backend: str = "xla",
                                tex_miss_cap: int = 4096,
                                m: int = 32,
                                filter_mode: str = "bilinear",
                                pair_cap=None,
                                chunk: int = 128,
                                normalize_depth: bool = True,
                                row_offset=None,
                                band_height: Optional[int] = None,
                                with_no_sh: bool = False) -> dict:
    """uv_tex_render twin sharded by depth-rank Gaussian slices.

    The per-intersection texture term is *linear in the blend weights*, so
    each slice's full premultiplied output (texture term included, local
    weights) folds with the same over operator as the plain channels — no
    cross-chip M-list merge is needed, and each slice gets its own M slots
    (effective per-pixel list depth n_chips * m >= the single-chip m).
    Same bounded local-T_STOP divergence as gauss_sharded_render.
    """
    from texgs.kernels.uvtex_raster import rasterize_uvtex

    cam = viewpoint_camera
    n = xyz.shape[0]
    n_chips = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    assert n % n_chips == 0, (
        f"capacity {n} must divide the '{axis_name}' axis ({n_chips})")
    s = n // n_chips

    proj = proj_k.project_gaussians(
        xyz, scaling, rotation, opacity, jnp.zeros_like(xyz),
        cam.world_view, cam.full_proj, cam.camera_center,
        cam.width, cam.height, cam.tanfovx, cam.tanfovy)
    key = jnp.where(proj.radii > 0, proj.depths, jnp.inf)
    order = jax.lax.stop_gradient(jnp.argsort(key))
    mine = jax.lax.dynamic_slice_in_dim(order, idx * s, s)

    if pair_cap is None:
        pair_cap = max(4 * n, 1 << 14)
    slice_cap = max(min(2 * pair_cap // n_chips, pair_cap), 1 << 12)

    sl = lambda a: a[mine]
    out = rasterize_uvtex(
        jax.tree.map(sl, proj), sl(scaling), sl(rotation), sl(xyz),
        sl(uvs), sl(grad_uvs), texture,
        None if shs is None else sl(shs), active_sh_degree, cam,
        jnp.zeros(3),  # bg deferred to the fold
        pair_cap=slice_cap, chunk=chunk, m=m, normalize_depth=False,
        filter_mode=filter_mode, backend=backend, tex_backend=tex_backend,
        tex_miss_cap=tex_miss_cap,
        row_offset=row_offset, band_height=band_height,
        with_no_sh=with_no_sh)

    chan_list = [out.image, out.depth, out.norm]
    if with_no_sh:
        # premultiplied (bg deferred) and linear in the slice's weights, so
        # the no-SH image folds with the same over operator
        chan_list.append(out.image_no_sh)
    chans = jnp.concatenate(chan_list, axis=0)
    trans = 1.0 - out.alpha
    chans = _grad_scale(chans, 1.0 / n_chips)
    trans = _grad_scale(trans, 1.0 / n_chips)
    g_c = jax.lax.all_gather(chans, axis_name)
    g_t = jax.lax.all_gather(trans, axis_name)
    c_tot, t_tot = over_fold(g_c, g_t)

    acc = 1.0 - t_tot
    rgb = c_tot[0:3] + t_tot * bg_color[:, None, None]
    dep = c_tot[3:4]
    if normalize_depth:
        dep = dep / jnp.maximum(acc, 1e-6)
    nrm = c_tot[4:7]
    rgb_ns = (c_tot[7:10] + t_tot * bg_color[:, None, None]
              if with_no_sh else None)

    radii_full = jnp.zeros((n,), proj.radii.dtype).at[mine].set(
        proj.radii[mine])
    radii_full = jax.lax.psum(radii_full, axis_name)

    return {
        "render": rgb,
        "render_no_sh": rgb_ns,
        "depth": dep,
        "norm": nrm,
        "alpha": acc,
        "extra": None,
        "radii": radii_full,
        "visibility_filter": radii_full > 0,
        "n_pairs": out.n_pairs,
        "pair_overflow": out.overflowed,
        "tex_miss": out.tex_miss,
    }
