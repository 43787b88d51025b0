"""Driver-contract tests for __graft_entry__.py.

The driver imports the module and calls ``dryrun_multichip(8)`` directly in
a fresh process with NO environment preparation (round-1 regression:
MULTICHIP_r01.json failed because the CPU-mesh setup lived only under
``__main__``). These tests exercise that exact path.
"""

import os
import subprocess
import sys

import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    """conftest already initialised the 8-device CPU backend; the call must
    work with the backend pre-initialised (no re-exec needed)."""
    sys.path.insert(0, REPO_DIR)
    try:
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO_DIR)


@pytest.mark.parametrize("n", [3, 6])
def test_dryrun_multichip_any_device_count(n):
    """Batch size must be a multiple of the data axis for every n (round-1
    advisor finding: n=6 -> data=3 failed the divisibility check)."""
    sys.path.insert(0, REPO_DIR)
    try:
        import __graft_entry__
        __graft_entry__.dryrun_multichip(n)
    finally:
        sys.path.remove(REPO_DIR)


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """The literal driver scenario: fresh python, bare import, direct call,
    no env vars prepared."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO_DIR,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout
