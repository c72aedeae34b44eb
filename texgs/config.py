"""Config system: YAML -> attribute dicts with presence/range semantics.

The reference drives everything from YAML configs whose *missing keys are
falsy* (addict semantics — see /root/reference/train.py:214-217 and the
presence checks like `if loss_cfg.lambda_depth` at
/root/reference/models/gaussian3d.py:390).  We reproduce exactly that
contract so the shipped reference YAML configs work verbatim, with a small
self-contained ``Cfg`` class instead of the ``addict`` dependency.

Iteration-range gating (`in_range`) mirrors /root/reference/models/base.py:10-14:
``Null`` bounds are open, the interval is (start, end].
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml


class Cfg(dict):
    """Attribute-accessible dict where missing keys yield an empty, falsy Cfg.

    ``cfg.missing`` and ``cfg['missing']`` both return ``Cfg()`` (which is
    falsy) without inserting anything, so feature flags can be tested with
    plain truthiness just like the reference's addict configs.
    """

    def __init__(self, mapping: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        if mapping is not None:
            for k, v in mapping.items():
                self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Cfg):
            return value
        if isinstance(value, Mapping):
            return Cfg(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Cfg._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Cfg._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        if key.startswith("__"):  # keep pickling & copy protocols sane
            raise AttributeError(key)
        return self[key]

    def __missing__(self, key: str) -> "Cfg":
        return Cfg()

    def __delattr__(self, key: str) -> None:
        if key in self:
            del self[key]

    def __deepcopy__(self, memo: dict) -> "Cfg":
        out = Cfg()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out

    def to_dict(self) -> dict:
        def unwrap(v: Any) -> Any:
            if isinstance(v, Cfg):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)

    def get_or(self, key: str, default: Any) -> Any:
        """Value if the key is present (even if falsy), else default."""
        return self[key] if key in self else default

    def __hash__(self) -> int:
        """Deep value hash consistent with dict equality, so a Cfg can be a
        static jit argument (e.g. the net cfgs of dist.sharded steps)."""
        def freeze(v: Any) -> Any:
            if isinstance(v, Mapping):
                return tuple(sorted((k, freeze(x)) for k, x in v.items()))
            if isinstance(v, (list, tuple)):
                return tuple(freeze(x) for x in v)
            return v

        return hash(freeze(self))


def load_config(path: str | os.PathLike) -> Cfg:
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    return Cfg(raw or {})


def dump_config(cfg: Cfg, path: str | os.PathLike) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def in_range(iteration: int, iter_range: Any) -> bool:
    """Iteration gating with open ``Null`` bounds; interval is (start, end].

    Parity with BaseModel.in_range (/root/reference/models/base.py:10-14):
    an absent/empty range means "always on".
    """
    if not iter_range:
        return True
    if len(iter_range) != 2:
        return True
    start = 0 if iter_range[0] is None else iter_range[0]
    end = int(1e7) if iter_range[1] is None else iter_range[1]
    return start < iteration <= end
