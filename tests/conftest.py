"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device SPMD code is tested without TPU hardware via XLA's host
platform device forcing — the standard JAX trick (SURVEY.md §4). This
environment force-registers the 'axon' TPU platform through sitecustomize
and sets jax_platforms itself, so the env var alone is not enough: the
config update below (before any backend initialisation) is what makes the
CPU mesh take effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the single host CPU core makes first
# compiles expensive; reruns hit the cache.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except AttributeError:
    pass
