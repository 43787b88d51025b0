"""Runtime setup helpers (compilation cache, virtual CPU meshes)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: first compiles of the big configs
    take minutes; subsequent process launches hit the cache."""
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu_mesh(devices: int = 8) -> None:
    """Select the virtual multi-device CPU platform (tests / dry runs).

    Must run before any JAX backend initialisation. This image registers
    the 'axon' TPU platform via sitecustomize and pins jax_platforms, so
    the config update (not the env var) is what takes effect.
    """
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
