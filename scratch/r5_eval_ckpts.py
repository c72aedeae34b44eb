#!/usr/bin/env python
"""Evaluate test PSNR of several stage-3 ckpts in ONE process (one scene
load, one compiled eval program)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from texgs.config import load_config
from texgs.io import checkpoint as ckpt
from texgs.train.models import create_model
from texgs.data.scene import create_dataset
from texgs.utils.logger import get_logger
from texgs.utils import metrics
from texgs.losses import ssim_loss

cfg = load_config("/root/repo/output/_run_cfgs/prod_texture.yaml")
log = get_logger("evalq")
model = create_model(cfg.model_cfg, log, "/tmp", False)
model.bind_train_cfg(cfg.train_cfg, cfg.dataset_cfg.background)
scene = create_dataset(cfg.dataset_cfg, log, "/tmp", debug=False)
cams = scene.getTestCameras()
for path in sys.argv[1:]:
    sd, it = ckpt.load(path)
    model.load_state_dict(sd, cfg.optim_cfg)
    ps, ss = [], []
    for vp in cams:
        out, _ = model._render_eval(model.gauss_params, model.uv_params,
                                    model.tex_params, vp.jit_view(),
                                    model.active_sh_degree)
        img = jnp.clip(out["render"], 0, 1)
        gt = jnp.clip(vp.image, 0, 1)
        ps.append(float(metrics.psnr(img, gt).mean()))
        ss.append(float(ssim_loss(img, gt)))
    print(f"{path.split('/')[-1]:8s} iter~{it}: test PSNR "
          f"{np.mean(ps):.2f} SSIM {np.mean(ss):.4f}", flush=True)
