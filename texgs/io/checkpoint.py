"""Checkpointing with an explicit named schema.

Replaces the reference's ``torch.save((state_dict, iteration))`` positional
tuples (/root/reference/train.py:184, models/*.py state_dict) with named
nested dicts flattened into a .npz + JSON metadata — the implicit
positional schema contract (SURVEY.md §5 checkpoint/resume) becomes
explicit keys, so cross-stage handoff loads by name.

Format: ``<path>`` is an .npz with keys ``<dotted.path>`` for every array
leaf, plus a ``__meta__.json`` sidecar holding non-array leaves
(iteration, hyperparams, capacities).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(prefix: str, obj: Any, arrays: dict, meta: dict):
    if isinstance(obj, dict):
        for k, v in obj.items():
            _flatten(f"{prefix}.{k}" if prefix else str(k), v, arrays, meta)
    elif isinstance(obj, (list, tuple)):
        meta[prefix + ".__len__"] = len(obj)
        meta[prefix + ".__tuple__"] = isinstance(obj, tuple)
        for i, v in enumerate(obj):
            _flatten(f"{prefix}.{i}", v, arrays, meta)
    elif isinstance(obj, (np.ndarray, jax.Array)):
        arrays[prefix] = np.asarray(obj)
    elif obj is None:
        meta[prefix + ".__none__"] = True
    else:
        meta[prefix] = obj


def save(path: str, tree: dict, iteration: int | None = None):
    arrays: dict = {}
    meta: dict = {"__iteration__": iteration}
    _flatten("", tree, arrays, meta)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)


def _meta_path(path: str) -> str:
    base = path if path.endswith(".npz") else path + ".npz"
    return base + ".meta.json"


def load(path: str):
    """Returns (tree, iteration)."""
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if not os.path.exists(npz_path) and os.path.exists(path):
        npz_path = path
    data = np.load(npz_path)
    with open(_meta_path(path)) as f:
        meta = json.load(f)

    tree: dict = {}

    def insert(key: str, value):
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for k in data.files:
        insert(k, data[k])
    iteration = meta.pop("__iteration__", None)
    lists: dict[str, dict] = {}
    for k, v in meta.items():
        if k.endswith(".__len__"):
            lists[k[: -len(".__len__")]] = {"len": v}
        elif k.endswith(".__tuple__"):
            lists.setdefault(k[: -len(".__tuple__")], {})["tuple"] = v
        elif k.endswith(".__none__"):
            insert(k[: -len(".__none__")], None)
        else:
            insert(k, v)

    # Convert numbered dicts back into lists/tuples (deepest first so nested
    # sequences materialize before their parents).
    for key in sorted(lists, key=lambda s: -s.count(".")):
        info = lists[key]
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node[p]
        d = node[parts[-1]] if parts[-1] else tree
        seq = [d[str(i)] for i in range(info["len"])]
        if info.get("tuple"):
            seq = tuple(seq)
        if parts[-1]:
            node[parts[-1]] = seq
        else:
            tree = seq  # top-level sequence
    return tree, iteration
