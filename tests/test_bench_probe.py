"""Accelerator probe (utils/runtime.py): must never hang the caller.

bench.py and ``cli doctor`` both route through this probe; a hung TPU
tunnel has to read as "dead" (False / device.ok=false), not wedge the
process past every driver timeout (docs/DESIGN.md failure mode 5).
"""

from vision_transformer_detector_tpu.utils.runtime import probe_accelerator


def test_probe_respects_cpu_env(monkeypatch):
    """With JAX_PLATFORMS=cpu there is nothing to probe — instant False
    (no subprocess, no backend touch)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert probe_accelerator(timeout_s=0.001) is False


def test_probe_timeout_returns_false(monkeypatch):
    """A backend that cannot answer within the deadline reads as dead —
    the subprocess is killed and the probe returns False instead of
    blocking (the 2026-08-18 hung-tunnel wedge)."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert probe_accelerator(timeout_s=0.05) is False


def test_probe_parses_marked_line_only(monkeypatch):
    """Banner noise on the child's stdout (sitecustomize platform
    registration prints on exactly the broken environments being
    probed) must not break the parse: only the VTD_PROBE line counts."""
    import subprocess

    def fake_run(*args, **kwargs):
        return subprocess.CompletedProcess(
            args, 0, stdout="axon banner line\nVTD_PROBE tpu 1 64.0\n",
            stderr="")

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert probe_accelerator(timeout_s=1.0) is True


def test_probe_rejects_cpu_platform(monkeypatch):
    """A probe that lands on the host CPU is not an accelerator."""
    import subprocess

    def fake_run(*args, **kwargs):
        return subprocess.CompletedProcess(
            args, 0, stdout="VTD_PROBE cpu 1 64.0\n", stderr="")

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert probe_accelerator(timeout_s=1.0) is False
