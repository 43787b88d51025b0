"""The worked example (examples/end_to_end.py) stays green.

It walks the reference notebook's arc (dataset -> train -> evaluate ->
plot -> visualize -> export -> serve) through the public API and is the
onboarding surface the README points at — round 5 found it was the one
executable document no test exercised.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_example_end_to_end_runs_green(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "examples", "end_to_end.py")
    # Same sitecustomize caveat as everywhere: force the CPU platform
    # via the config update inside a -c shim, not the env var.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; "
        f"sys.argv = ['end_to_end.py', '--workdir', {str(tmp_path)!r}, "
        "'--epochs', '4']; "
        f"runpy.run_path({script!r}, run_name='__main__')"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo,
                          capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    stages = [json.loads(line) for line in proc.stdout.splitlines()
              if line.startswith("{")]
    names = {s.get("stage") for s in stages}
    assert {"dataset", "train", "evaluate", "export", "serve"} <= names, (
        sorted(names))
    assert stages[-1].get("ok") is True, stages[-1]
