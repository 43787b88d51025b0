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
    # Cache the XLA program only, not backend AOT kernel blobs: the
    # XLA:CPU AOT results are keyed without the host's machine features,
    # so a cache written on one host floods stderr with
    # "cpu_aot_loader.cc ... could lead to SIGILL" errors when read on
    # another (observed polluting BENCH_r03.json's tail; round-3 verdict
    # item). The HLO-level cache keeps virtually all of the compile-time
    # win.
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except AttributeError:  # older jax without the flag
        pass


def probe_accelerator(timeout_s: float = 240.0) -> bool:
    """True iff the accelerator backend initializes AND computes in a
    subprocess within ``timeout_s``.

    The tunneled-TPU failure mode this defends against (docs/DESIGN.md
    failure mode 5): the backend neither initializes nor raises —
    ``jax.devices()`` blocks forever — so a platform-based CPU fallback
    in the parent never triggers and the whole process hangs past any
    driver timeout. Probing in a subprocess converts "hung tunnel" into
    a falsy return the caller can act on (bench.py falls back to CPU,
    ``cli doctor`` reports device.ok=false).

    Safe to call before the parent touches its own backend: only
    ``subprocess`` runs here. The child prints a MARKED line because
    stdout may also carry banners from sitecustomize platform
    registration on exactly the broken environments being probed.
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    report = probe_device(timeout_s)
    return bool(report["ok"]) and report["platform"] != "cpu"


def probe_device(timeout_s: float = 240.0) -> dict:
    """Subprocess device probe with details (``cli doctor``'s report row).

    Returns ``{"ok": True, "platform": ..., "count": ...}`` when the
    default backend initializes and computes within the deadline, else
    ``{"ok": False, "error": ...}``. Same hang-safety rationale as
    ``probe_accelerator``.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; d = jax.devices()[0]; "
            "x = jax.device_put(jnp.ones((8, 8)), d); "
            "print('VTD_PROBE', d.platform, len(jax.devices()), "
            "float(x.sum()))")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"ok": False,
                "error": f"backend did not answer within {timeout_s}s "
                         "(hung tunnel?)"}
    marked = [line.split() for line in out.stdout.splitlines()
              if line.startswith("VTD_PROBE ")]
    if out.returncode == 0 and marked and len(marked[-1]) == 4:
        _, platform, count, _ = marked[-1]
        return {"ok": True, "platform": platform, "count": int(count)}
    return {"ok": False,
            "error": (out.stderr.strip().splitlines() or ["?"])[-1]}


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
