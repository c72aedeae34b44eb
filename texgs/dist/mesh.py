"""Device mesh construction for multi-chip training.

The reference is strictly single-GPU (SURVEY.md §2.3); scaling here is
jax-native: a Mesh over the pod slice, shard_map/pjit with explicit
PartitionSpecs, psum/all_gather collectives over ICI.  `initialize_dist()`
wires multi-host via jax.distributed when launched across hosts.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_dist(coordinator: str | None = None, num_processes: int | None = None,
                    process_id: int | None = None) -> None:
    """Multi-host bring-up (no-op on a single host)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Mesh over the first n devices.  With multiple axis names, `shape`
    gives the per-axis sizes (defaults to putting everything on axis 0)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices)
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n_devices
    dev_array = np.array(devices[:n_devices]).reshape(shape)
    return Mesh(dev_array, axis_names)
