"""Three-stage pipeline through the NeILF/DTU reader path (VERDICT r2
item 7): the flagship dataset format — inputs/sfm_scene.json with depth
.tiff / normal .pfm / pmask companions and the fixed DTU validation
indexes — proven beyond reader unit tests by actually TRAINING from the
files (reference dataset_readers.py:360-500 + README.md:100-139 workflow).

Scaled to CPU (48^2, short schedules): the blender-format golden test
(test_pipeline_3stage.py) owns the quality gate; this module owns the
NeILF reader -> scene -> trainer plumbing, companion-buffer consumption,
and the fixed eval split.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from texgs.config import load_config
from texgs.train.driver import train
from texgs.utils.logger import get_logger

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.fixture(scope="module")
def neilf_scene(tmp_path_factory):
    """NeILF dataset on disk — 'dtu' in the dirname activates the fixed
    validation indexes [6, 13, 30, 35], so 36+ views are generated."""
    import subprocess
    root = tmp_path_factory.mktemp("neilf")
    out = str(root / "dtu_synth")
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "make_synthetic_dataset.py")
    env = dict(os.environ, TEXGS_CPU="1")
    subprocess.run(
        [sys.executable, script, out, "--format", "neilf", "--n", "512",
         "--views", "16", "--test_views", "0", "--size", "48", "--spiral"],
        check=True, env=env, timeout=900)
    assert os.path.exists(os.path.join(out, "inputs", "sfm_scene.json"))
    assert os.path.exists(
        os.path.join(out, "inputs", "normals", "000000.pfm"))
    return out


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("neilf_pipe"))


@pytest.fixture(scope="module")
def stage1(workdir, neilf_scene):
    cfg = load_config(os.path.join(CFG_DIR, "synthetic_smoke.yaml"))
    cfg.work_dir = os.path.join(workdir, "s1")
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.dataset_cfg.data_root_dir = neilf_scene
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
    return cfg, os.path.join(cfg.work_dir, "checkpoints", "150"), scene, ev


def test_reader_split_and_companions(stage1):
    """Fixed DTU validation indexes carve the test split; alpha/normal
    companions reach the camera buffers (they feed lambda_alpha /
    lambda_norm losses)."""
    _, _, scene, _ = stage1
    train_cams = scene.getTrainCameras()
    test_cams = scene.getTestCameras()
    assert len(test_cams) == 2    # indexes 6, 13 (30, 35 beyond range)
    assert len(train_cams) == 14
    cam = train_cams[0]
    assert cam.alpha_mask is not None and cam.normal is not None
    assert cam.image.shape == (3, 48, 48)
    # premultiplied gt: background must be exactly 0 where the mask is 0
    img = np.asarray(cam.image)
    msk = np.asarray(cam.alpha_mask[0])
    assert np.abs(img[:, msk < 0.5]).max() == 0.0


def test_stage1_trains_from_neilf(stage1):
    cfg, ckpt, _, ev = stage1
    assert os.path.exists(ckpt + ".npz")
    assert ev is not None and np.isfinite(ev["test"]["psnr"])
    assert ev["test"]["psnr"] > 15.0, ev


@pytest.fixture(scope="module")
def stage2(stage1, workdir, neilf_scene):
    import jax

    from texgs.tools.extract_pcd import extract_pcd
    cfg1, s1_ckpt, scene, _ = stage1
    jax.clear_caches()
    pcd_out = os.path.join(workdir, "pcd")
    extract_pcd(s1_ckpt, pcd_out, num_points=512)

    cfg = load_config(os.path.join(CFG_DIR, "synthetic_uv_map.yaml"))
    cfg.work_dir = os.path.join(workdir, "s2")
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.dataset_cfg.data_root_dir = neilf_scene
    cfg.model_cfg.init_from = s1_ckpt
    cfg.model_cfg.pcd_load_from = pcd_out + ".npy"
    cfg.model_cfg.max_inverse_points = 2048
    cfg.model_cfg.inv_uv_net_cfg.n_sample_points = 256
    cfg.model_cfg.inv_uv_net_cfg.pre_mlp_cfg.hash_grid_cfg.n_levels = 4
    cfg.train_cfg.num_iterations = 80
    cfg.train_cfg.visual_iters = [80]
    cfg.train_cfg.ckpt_iters = [80]
    log = get_logger("texgs-test")
    model, _, _ = train(cfg, log, None, scene=scene, progress=False)
    return cfg, os.path.join(cfg.work_dir, "checkpoints", "80")


def test_stage3_trains_from_neilf(stage1, stage2, workdir, neilf_scene):
    import jax
    _, s1_ckpt, scene, _ = stage1
    _, s2_ckpt = stage2
    jax.clear_caches()
    cfg = load_config(os.path.join(CFG_DIR, "synthetic_texture.yaml"))
    cfg.work_dir = os.path.join(workdir, "s3")
    os.makedirs(os.path.join(cfg.work_dir, "checkpoints"), exist_ok=True)
    cfg.debug = False
    cfg.dataset_cfg.data_root_dir = neilf_scene
    cfg.model_cfg.init_from = s1_ckpt
    cfg.model_cfg.init_uv_map_from = s2_ckpt
    cfg.model_cfg.max_inverse_points = 2048
    cfg.model_cfg.inv_uv_net_cfg.n_sample_points = 256
    cfg.model_cfg.inv_uv_net_cfg.pre_mlp_cfg.hash_grid_cfg.n_levels = 4
    cfg.model_cfg.tex_cfg.resolution = 64
    cfg.model_cfg.tex_cfg.max_sh_degree = 1
    cfg.model_cfg.uvtex_m = 16
    cfg.train_cfg.num_iterations = 40
    cfg.train_cfg.visual_iters = [40]
    cfg.train_cfg.ckpt_iters = [40]
    cfg.train_cfg.min_scale_reset_interval = 0
    cfg.optim_cfg.gaussian_optim_range = [20, None]
    cfg.loss_cfg.rgb_no_sh_range = [20, None]
    cfg.loss_cfg.alpha_range = [20, None]
    cfg.loss_cfg.norm_smooth_range = [20, None]
    cfg.loss_cfg.inverse_range = [20, None]
    log = get_logger("texgs-test")
    model, _, ev = train(cfg, log, None, scene=scene, progress=False)
    tex = np.asarray(model.tex_params["texture"])
    assert np.abs(tex).max() > 1e-3, "texture never received gradient"
    assert ev is not None and np.isfinite(ev["test"]["psnr"])
