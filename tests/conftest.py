"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device SPMD code is tested without TPU hardware via XLA's host
platform device forcing — the standard JAX trick (SURVEY.md §4). The env
vars must be set before jax initialises its backends, hence this conftest
sets them at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
