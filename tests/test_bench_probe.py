"""Accelerator probe (utils/runtime.py): must never hang the caller.

bench.py and ``cli doctor`` both route through this probe; a hung TPU
tunnel has to read as "dead" (False / device.ok=false), not wedge the
process past every driver timeout (docs/DESIGN.md failure mode 5).
"""

from vision_transformer_detector_tpu.utils import runtime
from vision_transformer_detector_tpu.utils.runtime import (
    probe_accelerator, probe_device_retrying)


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


# ---------------------------------------------------------------------------
# Retrying probe (round-5: BENCH_r04 was lost to a single-shot probe
# hitting one transient tunnel outage; the retrying wrapper must survive
# a transient failure and document every attempt either way).


def test_retrying_probe_cpu_env_short_circuits(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    report = probe_device_retrying(attempts=3, timeout_s=0.01,
                                   backoff_s=0.0)
    assert report["ok"] is False
    assert len(report["attempts"]) == 1
    assert "JAX_PLATFORMS" in report["attempts"][0]["error"]


def test_retrying_probe_survives_transient_outage(monkeypatch):
    """First attempt times out (the r4 capture scenario), second finds
    the chip — the report is a success that shows both attempts."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    calls = iter([
        {"ok": False, "error": "backend did not answer within 90s"},
        {"ok": True, "platform": "tpu", "count": 1},
    ])
    monkeypatch.setattr(runtime, "probe_device", lambda t: next(calls))
    import time as _time
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    report = probe_device_retrying(attempts=3, timeout_s=1.0,
                                   backoff_s=5.0)
    assert report["ok"] is True
    assert report["platform"] == "tpu"
    assert len(report["attempts"]) == 2
    assert "error" in report["attempts"][0]


def test_retrying_probe_success_short_circuits(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    n = {"count": 0}

    def fake(t):
        n["count"] += 1
        return {"ok": True, "platform": "tpu", "count": 4}

    monkeypatch.setattr(runtime, "probe_device", fake)
    report = probe_device_retrying(attempts=3)
    assert report["ok"] is True and n["count"] == 1
    assert report["count"] == 4


def test_retrying_probe_cpu_answer_short_circuits(monkeypatch):
    """A healthy probe that lands on the host CPU is a deterministic
    'no accelerator' answer — no backoff retries, and the report
    carries an explanatory error instead of a bare ok:true attempt."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    n = {"count": 0}

    def fake(t):
        n["count"] += 1
        return {"ok": True, "platform": "cpu", "count": 1}

    monkeypatch.setattr(runtime, "probe_device", fake)
    report = probe_device_retrying(attempts=3, backoff_s=60.0)
    assert report["ok"] is False
    assert report["platform"] == "cpu"
    assert n["count"] == 1
    assert "host CPU" in report["attempts"][0]["error"]


def test_retrying_probe_exhaustion_documents_all(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(
        runtime, "probe_device",
        lambda t: {"ok": False, "error": "hung tunnel?"})
    import time as _time
    monkeypatch.setattr(_time, "sleep", lambda s: None)
    report = probe_device_retrying(attempts=3, backoff_s=1.0)
    assert report["ok"] is False
    assert len(report["attempts"]) == 3
    assert all("error" in a for a in report["attempts"])
