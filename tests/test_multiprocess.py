"""REAL multi-process SPMD: two jax.distributed processes, one device
each, gloo collectives.

Everything else in the suite exercises multi-DEVICE sharding inside one
process (the virtual CPU mesh); this is the only place the actual
multi-host topology runs — jax.distributed bring-up, global-array
assembly from process-local shards, a gradient psum that crosses a
process boundary, and the multi-process Trainer.init_state path (plain
device_put cannot target another process's devices).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # live multi-process gloo groups: ~400 s of the suite (round-5 tiering)

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multiprocess_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# Gloo's rendezvous KV-get carries a hard-coded 30 s deadline inside the
# C++ collectives (make_gloo_tcp_collectives takes no timeout); on this
# 1-core host a loaded machine can stall a worker's import long enough
# for its peer to exhaust that window. That failure is environmental,
# not a product bug — retry once on its exact signature.
_GLOO_FLAKE = "Gloo context initialization failed"


def _run_workers(mode_args, nprocs, out, label, attempts=2):
    """Launch nprocs multiprocess_worker.py processes; returns their
    logs once all exit 0. Retries (fresh port) when a worker died with
    the gloo rendezvous-deadline signature; any other failure asserts."""
    env = dict(os.environ)
    # The workers must see ONE local CPU device each (true multi-host
    # shape) — scrub the suite's virtual-8-device forcing.
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    logs = []
    for attempt in range(attempts):
        port = _free_port()
        procs = [subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nprocs), str(port),
             str(out)] + list(mode_args),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for pid in range(nprocs)]
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail(f"{label} worker timed out")
            logs.append(stdout)
        if all(p.returncode == 0 for p in procs):
            return logs
        if (attempt + 1 < attempts
                and any(_GLOO_FLAKE in log for log in logs)):
            continue
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-2000:]
    return logs


@pytest.mark.parametrize("mode", ["dp", "tp", "ring", "dp_tp"])
def test_two_process_training_matches_single_device(tmp_path, mode):
    """dp: gradient psum crosses the process boundary. tp: megatron
    param shardings + their all-gathers/reduces cross it, then a
    COLLECTIVE orbax checkpoint round-trips the TP-sharded state.
    ring: the ring-attention K/V rotation (collective-permute) hops the
    process boundary and still equals plain einsum attention. dp_tp:
    4 processes on a 2x2 mesh — the pod topology, with each process's
    batch rows derived from the sharding (process_batch_indices) and an
    order-sensitive assembly check inside the worker."""
    nprocs = 4 if mode == "dp_tp" else 2
    out = tmp_path / "mp.json"
    _run_workers([mode], nprocs, out, "multiprocess")

    results = json.loads(out.read_text())
    # Across a REAL process boundary equals the single-device run on
    # the full batch (collectives over gloo; fp32 reassociation only).
    np.testing.assert_allclose(results["dist"], results["single"],
                               rtol=1e-5)
    # Training progressed (two distinct steps).
    assert results["dist"][1] < results["dist"][0]
    if mode == "dp":
        # Multi-process eval (global labels + jitted metric) tracks the
        # single-device evaluation; params differ only by fp32
        # reassociation, so a tiny tolerance absorbs threshold flips.
        assert 0.0 <= results["ap_dist"] <= 1.0
        assert abs(results["ap_dist"] - results["ap_single"]) <= 1e-3
        # Empty shard on one process (donor-template padding, uint8).
        assert abs(results["ap_empty"] - results["ap_empty_single"]) <= 1e-3
    if mode == "tp":
        assert results["ckpt_param_sq_diff"] == 0.0
        assert results["fresh_param_sq_diff"] > 1.0
    if mode == "ring":
        assert results["ring_has_ppermute"] is True


def test_resume_across_process_group_generations(tmp_path):
    """Phase 1: a 2-process group trains 2 DP steps and collectively
    checkpoints. Phase 2: a brand-new process group restores and trains
    2 more. The stitched trajectory equals 4 uninterrupted single-device
    steps — crash recovery on a pod, end to end."""
    outs = {}
    for phase in (1, 2):
        # Both phases share the checkpoint dir via a common out stem.
        out = tmp_path / "mp_resume.json"
        _run_workers(["resume", str(phase)], 2, out, f"phase {phase}")
        outs[phase] = json.loads(out.read_text())

    trajectory = outs[1]["phase1"] + outs[2]["phase2"]
    np.testing.assert_allclose(trajectory, outs[2]["single4"], rtol=1e-5)


def test_multi_host_input_pipeline(tmp_path):
    """Per-host file shards (ResumableDataset shard_index/num_shards)
    assembled by parallel.data.global_batches into global batches, with
    content and row placement checked against the deterministic epoch
    order — the multi-host input pipeline end to end with real files."""
    out = tmp_path / "mp_input.json"
    _run_workers(["input"], 2, out, "input-pipeline")
    results = json.loads(out.read_text())
    assert len(results["batches"]) == 2
    for got, want in results["batches"]:
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cli_train_distributed(tmp_path):
    """The pod launch pattern end to end: two processes run the IDENTICAL
    `cli train --distributed --data-parallel 2 ...` command line; the CLI
    brings up jax.distributed, shards the input off the batch sharding,
    trains with cross-process DP, evaluates over lockstep rounds, and
    writes a collective checkpoint. Both processes must report the same
    global loss."""
    out = tmp_path / "mp_cli.json"
    _run_workers(["cli"], 2, out, "cli-distributed")
    r0 = json.loads((tmp_path / "mp_cli.json.cli0").read_text())
    r1 = json.loads((tmp_path / "mp_cli.json.cli1").read_text())
    # Same GLOBAL loss on every process: the DP collectives crossed the
    # process boundary and both saw the same assembled batches.
    assert r0["final_loss"] == pytest.approx(r1["final_loss"], rel=1e-6)
    assert np.isfinite(r0["final_loss"])
    assert 0.0 <= r0["best_ap"] <= 1.0
    assert r0["ckpt_exists"] and r1["ckpt_exists"]
    # `cli evaluate --distributed` from the collective checkpoint, run by
    # the same process group: same global mAP on every process.
    assert r0["eval_map"] == pytest.approx(r1["eval_map"], abs=1e-6)
    assert 0.0 <= r0["eval_map"] <= 1.0
