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


def probe_device_retrying(attempts: int = 3, timeout_s: float = 90.0,
                          backoff_s: float = 20.0) -> dict:
    """Retrying device probe with a self-documenting report.

    Round-4 post-mortem: ``BENCH_r04.json`` recorded a CPU-fallback smoke
    because the single-shot probe hit one transient tunnel outage at
    capture time and the round's official perf record carried no TPU
    number. This wrapper retries ``probe_device`` up to ``attempts``
    times with linear backoff (``backoff_s``, ``2*backoff_s``, ...)
    between tries, and returns a report that documents every attempt so
    a fallback explains itself in the emitted artifact:

    ``{"ok": bool, "platform": ..., "count": ..., "attempts": [
       {"ok": ..., "error"/"platform": ..., "elapsed_s": ...}, ...],
       "total_s": ...}``

    Success short-circuits. ``JAX_PLATFORMS=cpu`` (explicit CPU ask)
    returns immediately with one synthetic attempt, same as
    ``probe_accelerator``.
    """
    import time

    start = time.monotonic()
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return {"ok": False, "attempts": [
            {"ok": False, "error": "JAX_PLATFORMS=cpu set; nothing to "
                                   "probe", "elapsed_s": 0.0}],
            "total_s": 0.0}
    tries = []
    for i in range(max(1, attempts)):
        if i > 0:
            time.sleep(backoff_s * i)
        t0 = time.monotonic()
        report = probe_device(timeout_s)
        report["elapsed_s"] = round(time.monotonic() - t0, 1)
        tries.append(report)
        if report["ok"]:
            if report.get("platform") != "cpu":
                return {"ok": True, "platform": report["platform"],
                        "count": report["count"], "attempts": tries,
                        "total_s": round(time.monotonic() - start, 1)}
            # A healthy probe that lands on the host CPU is a
            # DETERMINISTIC "no accelerator here" — retrying it only
            # burns the backoff schedule (round-5 review finding).
            # Annotate so the report reads as an answer, not a failure.
            report["error"] = ("probe answered but on the host CPU — "
                               "no accelerator visible")
            return {"ok": False, "platform": "cpu", "attempts": tries,
                    "total_s": round(time.monotonic() - start, 1)}
    return {"ok": False, "attempts": tries,
            "total_s": round(time.monotonic() - start, 1)}


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
