"""bench.py accelerator probe: must never hang the bench process."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _probe_accelerator  # noqa: E402


def test_probe_respects_cpu_env(monkeypatch):
    """With JAX_PLATFORMS=cpu there is nothing to probe — instant False
    (no subprocess, no backend touch)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert _probe_accelerator(timeout_s=0.001) is False


def test_probe_timeout_returns_false(monkeypatch):
    """A backend that cannot answer within the deadline reads as dead —
    the subprocess is killed and the probe returns False instead of
    blocking (the 2026-08-18 hung-tunnel wedge)."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert _probe_accelerator(timeout_s=0.05) is False
