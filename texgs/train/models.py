"""Model registry (parity: /root/reference/models/__init__.py:5-12)."""

from __future__ import annotations


def create_model(model_cfg, log, work_dir, debug=False):
    t = model_cfg.type
    if t == "Gaussian3D":
        from texgs.train.gaussian3d import Gaussian3D
        return Gaussian3D(model_cfg, log, work_dir, debug)
    if t == "UVMapGaussian3D":
        from texgs.train.uv_map_gaussian3d import UVMapGaussian3D
        return UVMapGaussian3D(model_cfg, log, work_dir, debug)
    if t == "TextureGaussian3D":
        from texgs.train.texture_gaussian3d import TextureGaussian3D
        return TextureGaussian3D(model_cfg, log, work_dir, debug)
    raise KeyError(f"unknown model type {t}")
