"""Full three-stage pipeline integration test (geometry -> UV map -> texture)
on a tiny scene read from FILES ON DISK, plus the extract/retexture/viewer
tools.

The CPU-scale version of the reference's stage-sequenced workflow
(/root/reference/README.md:100-139): each stage hands its checkpoint to the
next, exactly as the configs do on DTU.  The dataset is generated in
NeRF-synthetic (Blender) format by scripts/make_synthetic_dataset.py and
trained through the on-disk reader path (readers.read_blender_scene), and
final metrics are gated against tests/goldens/pipeline_3stage.json.
"""


import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from texgs.config import load_config
from texgs.train.driver import train
from texgs.utils.logger import get_logger

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "pipeline_3stage.json")


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipe"))


@pytest.fixture(scope="module")
def disk_scene(tmp_path_factory):
    """Blender-format dataset written to disk (VERDICT r1 item 7: train the
    stages from files through the reader, not synthetic://).

    Runs the generator CLI in a subprocess — both for realism (it is the
    user-facing data-prep entry point) and because its eager oracle renders
    leave enough XLA-CPU compiler state behind to crash LLVM in a later
    big in-process compile (observed: deterministic SIGSEGV/ENOMEM in the
    stage-3 _render_eval compile when generated in-process)."""
    import subprocess
    out = str(tmp_path_factory.mktemp("dataset"))
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "make_synthetic_dataset.py")
    env = dict(os.environ, TEXGS_CPU="1")
    subprocess.run(
        [sys.executable, script, out, "--n", "512", "--views", "6",
         "--test_views", "2", "--size", "48", "--init_ply"],
        check=True, env=env, timeout=600)
    assert os.path.exists(os.path.join(out, "transforms_train.json"))
    assert os.path.exists(os.path.join(out, "points3d.ply"))
    return out


@pytest.fixture(scope="module")
def stage1(workdir, disk_scene):
    cfg = load_config(os.path.join(CFG_DIR, "synthetic_smoke.yaml"))
    cfg.work_dir = os.path.join(workdir, "s1")
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.dataset_cfg.data_root_dir = disk_scene
    cfg.train_cfg.num_iterations = 150
    cfg.train_cfg.visual_iters = [150]
    cfg.train_cfg.ckpt_iters = [150]
    cfg.train_cfg.densify_from_iter = 20
    cfg.train_cfg.densification_interval = 50
    cfg.train_cfg.densify_until_iter = 120
    cfg.loss_cfg.norm_range = [0, None]
    cfg.loss_cfg.norm_smooth_range = [0, None]
    cfg.loss_cfg.opacity_reg_range = [0, None]
    log = get_logger("texgs-test")
    model, scene, ev = train(cfg, log, None, progress=False)
    ckpt_path = os.path.join(cfg.work_dir, "checkpoints", "150")
    return cfg, ckpt_path, scene, ev


@pytest.fixture(scope="module")
def pcd_path(stage1, workdir):
    from texgs.tools.extract_pcd import extract_pcd
    _, ckpt_path, _, _ = stage1
    out = os.path.join(workdir, "pcd")
    pts = extract_pcd(ckpt_path, out, num_points=512)
    assert pts.shape == (512, 3)
    assert np.isfinite(pts).all()
    return out + ".npy"


@pytest.fixture(scope="module")
def stage2(stage1, pcd_path, workdir, disk_scene):
    _, s1_ckpt, scene, _ = stage1
    jax.clear_caches()   # shed stage-1 executables (see stage3 note)
    cfg = load_config(os.path.join(CFG_DIR, "synthetic_uv_map.yaml"))
    cfg.work_dir = os.path.join(workdir, "s2")
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.dataset_cfg.data_root_dir = disk_scene
    cfg.model_cfg.init_from = s1_ckpt
    cfg.model_cfg.pcd_load_from = pcd_path
    cfg.model_cfg.max_inverse_points = 2048
    cfg.model_cfg.inv_uv_net_cfg.n_sample_points = 256
    cfg.model_cfg.inv_uv_net_cfg.pre_mlp_cfg.hash_grid_cfg.n_levels = 4
    cfg.train_cfg.num_iterations = 120
    cfg.train_cfg.visual_iters = [120]
    cfg.train_cfg.ckpt_iters = [120]
    log = get_logger("texgs-test")
    model, scene2, ev = train(cfg, log, None, scene=scene, progress=False)
    ckpt_path = os.path.join(cfg.work_dir, "checkpoints", "120")
    return cfg, model, ckpt_path


def test_stage2_losses_finite_and_learning(stage2):
    cfg, model, ckpt_path = stage2
    assert os.path.exists(ckpt_path + ".npz")
    # the inverse cycle must be reasonably tight after a few steps on this
    # tiny scene: measure ||x - inv(uv(x))|| on the gaussian centers
    from texgs.nets.uv_net import apply_inv_uv_net, apply_uv_net
    n = int(model.gauss["n_alive"])
    xyz = model.gauss["xyz"][:n]
    uv = apply_uv_net(model.net_params["uv_net"], cfg.model_cfg.uv_net_cfg,
                      xyz, model.net_params["geo_emb"])
    # uv on the unit sphere
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(uv, axis=1)), 1.0,
                               atol=1e-4)
    inv = apply_inv_uv_net(model.net_params["inv_uv_net"],
                           cfg.model_cfg.inv_uv_net_cfg, uv,
                           model.net_params["geo_emb"])
    err = float(jnp.linalg.norm(xyz - inv, axis=1).mean())
    assert np.isfinite(err)
    assert err < 2.0  # scene diameter ~2.4; the cycle must be in range


def test_stage2_chess_visualization(stage2):
    """The chess visualization must actually map UVs: the checkerboard
    cubemap has distinct cyan/red cells, so the composited image over a
    surface-covering view must contain BOTH colors (not just shape)."""
    cfg, model, _ = stage2
    from texgs.data.synthetic import orbit_cameras
    cam = orbit_cameras(1, radius=3.5, width=48, height=48)[0]
    pkg = model.visual_step(0, 0, cam, None)
    chess = np.asarray(pkg["chess_image"])
    assert chess.shape == (3, 48, 48)
    assert np.isfinite(chess).all()
    # foreground = pixels the splat covers; cyan cells have B>R, red R>B
    fg = chess.max(axis=0) > 0.2
    assert fg.sum() > 50, "chess image empty"
    rb = chess[0][fg] - chess[2][fg]
    assert (rb > 0.1).any() and (rb < -0.1).any(),         "chessboard colors missing - UVs not mapped"


@pytest.fixture(scope="module")
def stage3(stage1, stage2, workdir, disk_scene):
    _, s1_ckpt, scene, _ = stage1
    # XLA-CPU's LLVM crashes (SIGSEGV/ENOMEM) compiling the stage-3 eval
    # after the hundreds of programs stages 1-2 compile in-process; the
    # same compile succeeds in a fresh process.  Shedding the cached
    # executables keeps the compiler healthy.
    jax.clear_caches()
    _, _, s2_ckpt = stage2
    cfg = load_config(os.path.join(CFG_DIR, "synthetic_texture.yaml"))
    cfg.work_dir = os.path.join(workdir, "s3")
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.dataset_cfg.data_root_dir = disk_scene
    cfg.model_cfg.init_from = s1_ckpt
    cfg.model_cfg.init_uv_map_from = s2_ckpt
    cfg.model_cfg.max_inverse_points = 2048
    cfg.model_cfg.inv_uv_net_cfg.n_sample_points = 256
    cfg.model_cfg.inv_uv_net_cfg.pre_mlp_cfg.hash_grid_cfg.n_levels = 4
    cfg.model_cfg.tex_cfg.resolution = 64
    cfg.model_cfg.tex_cfg.max_sh_degree = 1
    cfg.model_cfg.uvtex_m = 16
    # 240 iters (was 60, VERDICT r4 item 6): enough texture signal on the
    # tiny scene that the stage-1-relative gate in test_golden_metrics is
    # meaningful — a mediocre-but-stable texture stage must FAIL CI.
    iters3 = 240
    cfg.train_cfg.num_iterations = iters3
    cfg.train_cfg.visual_iters = [iters3]
    cfg.train_cfg.ckpt_iters = [iters3]
    cfg.train_cfg.min_scale_reset_interval = 0
    cfg.optim_cfg.gaussian_optim_range = [30, None]
    # 60 CPU-affordable iters at the reference tex_lr=0.0025 move texels
    # by ~0.15 SH0 units (~+1 dB) — not enough signal to gate on.  The
    # tiny test is a plumbing + learning-direction gate, so it runs a
    # proportionally larger texture step; production schedules keep the
    # reference LR (configs/prod_texture.yaml, 10k iters).
    cfg.optim_cfg.tex_lr = 0.02
    cfg.loss_cfg.rgb_no_sh_range = [30, None]
    cfg.loss_cfg.alpha_range = [30, None]
    cfg.loss_cfg.norm_smooth_range = [30, None]
    cfg.loss_cfg.inverse_range = [30, None]
    log = get_logger("texgs-test")
    # untrained (zero-texture) eval on the same scene: the relational
    # floor for test_stage3_learns_texture (VERDICT r3 item 5 — a broken-
    # but-stable texture stage must not pass just by being stable)
    from texgs.train.driver import visualize
    from texgs.train.models import create_model
    m0 = create_model(cfg.model_cfg, log, cfg.work_dir, False)
    m0.bind_train_cfg(cfg.train_cfg, cfg.dataset_cfg.background)
    m0.initialize(scene.scene_info.point_cloud, scene.cameras_extent)
    m0.setup_optim(cfg.optim_cfg)
    ev0 = visualize(None, 0, 60, m0, scene, log)
    del m0
    model, scene3, ev = train(cfg, log, None, scene=scene, progress=False)
    ckpt_path = os.path.join(cfg.work_dir, "checkpoints", str(iters3))
    return cfg, model, ckpt_path, ev, scene, ev0


def test_stage3_learns_texture(stage3):
    cfg, model, ckpt_path, ev, scene, ev0 = stage3
    assert os.path.exists(ckpt_path + ".npz")
    tex = np.asarray(model.tex_params["texture"])
    assert np.abs(tex).max() > 1e-3, "texture never received gradient"
    assert ev is not None and np.isfinite(ev["test"]["psnr"])
    assert ev["test"]["psnr"] > 10.0
    # relational: training must BEAT the untrained zero-texture model by a
    # clear margin on held-out views (margin re-checked when goldens move;
    # production convergence is gated by goldens/pipeline_prod.json)
    assert ev["test"]["psnr"] >= ev0["test"]["psnr"] + 2.0, (ev, ev0)


def test_stage3_tools(stage3, workdir):
    cfg, model, ckpt_path, _, scene, _ = stage3
    from texgs.tools.extract_texture import extract_texture
    out_png = os.path.join(workdir, "texture.png")
    cube = extract_texture(cfg, ckpt_path, out_png)
    assert os.path.exists(out_png)
    res = cfg.model_cfg.tex_cfg.resolution
    assert cube.shape == (3 * res, 4 * res, 3)

    # change_texture roundtrip: replace mode must give back what we put in
    import imageio
    img = np.asarray(imageio.imread(out_png), np.float32) / 255.0
    model.change_texture(img[..., :3], mode=-1)
    cube2 = np.asarray(model.cube_map())
    np.testing.assert_allclose(cube2, np.clip(cube, 0, 1), atol=2e-2)

    # viewer renders a frame headlessly
    from texgs.tools.viewer import ViewerState
    vs = ViewerState(model, 48, 48)
    for mode in ("rgb", "depth", "alpha", "norm"):
        frame = vs.render_frame(0.3, 0.2, 3.5, mode, 1.0)
        assert frame.shape == (48, 48, 3) and frame.dtype == np.uint8
    # fov control (reference UI parity, viewer.py:155-199): a wider fov
    # shrinks the object => fewer covered pixels
    wide = vs.render_frame(0.3, 0.2, 3.5, "alpha", 1.0, fov_deg=100)
    narrow = vs.render_frame(0.3, 0.2, 3.5, "alpha", 1.0, fov_deg=40)
    assert (wide > 127).sum() < (narrow > 127).sum()


def test_retexture_tool(stage3, workdir):
    cfg, model, ckpt_path, _, scene, _ = stage3
    from texgs.tools.retexture import retexture
    out_dir = os.path.join(workdir, "retex")
    import imageio
    # solid gray replacement texture
    res = cfg.model_cfg.tex_cfg.resolution
    tex_img = np.full((3 * res, 4 * res, 3), 128, np.uint8)
    tex_path = os.path.join(workdir, "swap.png")
    imageio.imwrite(tex_path, tex_img)
    cfg2 = load_config(os.path.join(CFG_DIR, "synthetic_texture.yaml"))
    for k, v in cfg.items():
        cfg2[k] = v
    cfg2.debug = False
    _, outs = retexture(cfg2, ckpt_path, out_dir,
                        load_texture_from=tex_path, mode=-1, splits=("test",))
    assert outs["test"], "no views rendered"
    img = imageio.imread(outs["test"][0])
    assert img.shape[:2] == (48, 48)


def test_golden_metrics(stage1, stage3):
    """Gate the on-disk pipeline's final metrics against checked-in goldens
    (the CPU-scale stand-in for the DTU parity table, BASELINE.md — real
    DTU data is not mountable in this environment).

    Regenerate after an intentional quality change with
    TEXGS_WRITE_GOLDENS=1 pytest tests/test_pipeline_3stage.py -k golden
    and commit the refreshed json."""
    _, _, _, ev1 = stage1
    _, _, _, ev3, _, _ = stage3
    if os.environ.get("TEXGS_WRITE_GOLDENS"):
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
        golden.update(
            stage1_test_psnr=round(float(ev1["test"]["psnr"]), 3),
            stage3_test_psnr=round(float(ev3["test"]["psnr"]), 3),
            stage3_test_ssim=round(float(ev3["test"]["ssim"]), 4))
        golden.pop("_comment", None)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(golden, f, indent=1)
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert ev1["test"]["psnr"] >= golden["stage1_test_psnr"] - golden["margin_db"], \
        (ev1, golden)
    assert ev3["test"]["psnr"] >= golden["stage3_test_psnr"] - golden["margin_db"], \
        (ev3, golden)
    assert ev3["test"]["ssim"] >= golden["stage3_test_ssim"] - golden["margin_ssim"], \
        (ev3, golden)
    # stage-1-RELATIVE bound (VERDICT r4 item 6): the textured model must
    # track the geometry stage on the same scene even at tiny scale — the
    # absolute goldens above catch regressions vs the recorded run, this
    # catches a texture stage that is "stable but mediocre" from birth.
    assert ev3["test"]["psnr"] >= ev1["test"]["psnr"] - golden["rel_margin_db"], \
        (ev3, ev1, golden)


def test_change_texture_blend_modes():
    """change_texture modes 0-3 parity with the reference blend math
    (/root/reference/models/texture_gaussian3d.py:463-495): luminance
    modulation, multiply, divide, masked additive blend."""
    from texgs.train.texture_gaussian3d import TextureGaussian3D, rgb2sh0, \
        sh02rgb

    rng = np.random.default_rng(5)
    res = 8
    ori_rgb = rng.uniform(0.05, 0.3, size=(6, res, res, 3)).astype(np.float32)
    swap = np.zeros((3 * res, 4 * res, 3), np.float32)
    swap_rgb = rng.uniform(0.2, 1.0, size=(6, res, res, 3)).astype(np.float32)
    # cross layout: +x,-x,+y,-y,+z,-z at the reference's face positions
    slots = [(res, 2 * res), (res, 0), (0, res), (2 * res, res),
             (res, res), (res, 3 * res)]
    for f, (r0, c0) in enumerate(slots):
        swap[r0:r0 + res, c0:c0 + res] = swap_rgb[f]

    def fresh():
        m = object.__new__(TextureGaussian3D)
        m.tex_params = {"texture": jnp.asarray(rgb2sh0(ori_rgb))}
        return m

    # mode -1: replace
    m = fresh(); m.change_texture(swap, mode=-1)
    np.testing.assert_allclose(np.asarray(sh02rgb(m.tex_params["texture"])),
                               swap_rgb, atol=1e-5)
    # mode 0: luminance-modulated
    m = fresh(); m.change_texture(swap, mode=0)
    lum = np.clip(ori_rgb * 3, 0, 1).mean(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(sh02rgb(m.tex_params["texture"])),
                               swap_rgb * lum, atol=1e-5)
    # mode 1: multiply
    m = fresh(); m.change_texture(swap, mode=1)
    np.testing.assert_allclose(np.asarray(sh02rgb(m.tex_params["texture"])),
                               swap_rgb * ori_rgb, atol=1e-5)
    # mode 2: divide (sh02rgb readback clamps to [0, 1], reference parity)
    m = fresh(); m.change_texture(swap, mode=2)
    np.testing.assert_allclose(np.asarray(sh02rgb(m.tex_params["texture"])),
                               np.clip(ori_rgb / np.maximum(swap_rgb, 1e-6),
                                       0, 1), atol=1e-5)
    # mode 3: masked additive blend (reference: ori[mask] = 2*mean*new;
    # new += ori)
    m = fresh(); m.change_texture(swap, mode=3)
    mask = (swap_rgb.sum(-1) > 0.01)[..., None]
    want = swap_rgb + np.where(mask,
                               2 * ori_rgb.mean(-1, keepdims=True) * swap_rgb,
                               ori_rgb)
    np.testing.assert_allclose(np.asarray(sh02rgb(m.tex_params["texture"])),
                               np.clip(want, 0, 1), atol=1e-5)
