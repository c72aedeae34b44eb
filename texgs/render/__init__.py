"""Render-function registry (parity: /root/reference/render/__init__.py)."""

from .render import render
from .uv_tex_render import uv_tex_render

type2render_func = {
    "render": render,
    "uv_tex_render": uv_tex_render,
}


def create_render_func(render_cfg):
    return type2render_func[render_cfg.type]


__all__ = ["render", "uv_tex_render", "create_render_func", "type2render_func"]
