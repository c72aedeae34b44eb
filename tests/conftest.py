"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU (SURVEY.md §4).  The hosting
environment pins JAX_PLATFORMS to the TPU plugin via sitecustomize, so we
override the platform through jax.config *before* the backend initializes
(env vars alone are re-overridden by the plugin's registration hook).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

jax.config.update("jax_enable_x64", False)


import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (disk pipelines, subprocess "
             "trainings) — the full suite takes >20 min on CPU")


def pytest_collection_modifyitems(config, items):
    """Default `pytest tests/ -q` stays under ~5 min; the slow tier
    (`--runslow`) adds the 3-stage disk pipeline, the multi-process
    bring-up, and the long driver trainings (README: two-tier suite)."""
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow — run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(autouse=True, scope="module")
def _shed_xla_executables():
    """XLA-CPU's LLVM aborts/segfaults compiling large programs after many
    hundreds of compiles accumulate in one process (first seen in the
    stage-3 eval of the disk-pipeline test; the same compile succeeds in a
    fresh process).  Shedding compiled executables between test modules
    keeps the compiler healthy at the cost of some recompilation."""
    yield
    jax.clear_caches()
