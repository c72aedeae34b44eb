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
