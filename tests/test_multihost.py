"""Multi-host (multi-process) SPMD path, simulated on CPU.

The reference has no distributed story at all (SURVEY §2 "Parallelism &
communication"); this framework's multi-host feeding path —
jax.distributed.initialize + jax.make_array_from_process_local_data +
core.mesh.local_batch_slice — must actually EXECUTE, not just exist.
Two local processes with gloo CPU collectives stand in for two hosts on
DCN; the loss trajectory must match the identical single-process run on
a virtual 2-device mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(**extra) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the worker must build its own (CPU) jax config from scratch
    env.pop("XLA_FLAGS", None)
    env.update(extra)
    return env


def _parse_losses(proc: subprocess.CompletedProcess) -> list:
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["losses"]
    raise AssertionError(
        f"worker produced no RESULT line:\n{proc.stdout[-3000:]}"
    )


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=_worker_env(),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    multi = [
        json.loads(line[len("RESULT "):])["losses"]
        for out in outs
        for line in out.splitlines()
        if line.startswith("RESULT ")
    ]
    assert len(multi) == 2
    # both processes observe the same replicated loss
    np.testing.assert_allclose(multi[0], multi[1], rtol=0, atol=0)

    # identical program, single process, virtual 2-device mesh
    single = subprocess.run(
        [sys.executable, _WORKER, "0", "1", "0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
        env=_worker_env(
            XLA_FLAGS="--xla_force_host_platform_device_count=2"
        ),
    )
    assert single.returncode == 0, f"single worker failed:\n{single.stdout[-3000:]}"
    ref = _parse_losses(single)

    # same mesh shape, same global batches; only the collective transport
    # (gloo cross-process vs in-process) and input-array assembly
    # (make_array_from_process_local_data vs device_put) differ. Both can
    # reorder f32 reductions at ULP scale, and two Adam steps amplify
    # that (observed worst case 2.4e-6 rel); a real feeding bug (wrong
    # rows) moves the loss at the 1e-1 scale, far above this bound.
    np.testing.assert_allclose(multi[0], ref, rtol=1e-5)
    # and training actually progressed
    assert ref[-1] < ref[0]


@pytest.mark.slow
def test_two_process_device_pipeline_matches_single_process(tiny_store_dir):
    """Round-4 mandate: the HBM-resident DevicePipeline feeds MULTI-HOST
    training too — store assembled as a global array (date dim sharded
    over data, each process contributing its addressable shards), batches
    emitted by the jitted device gather. Loss trajectory must equal the
    identical single-process DevicePipeline run."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), tiny_store_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=_worker_env(),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    multi = [_parse_losses_text(out) for out in outs]
    np.testing.assert_allclose(multi[0], multi[1], rtol=0, atol=0)

    single = subprocess.run(
        [sys.executable, _WORKER, "0", "1", "0", tiny_store_dir],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
        env=_worker_env(
            XLA_FLAGS="--xla_force_host_platform_device_count=2"
        ),
    )
    assert single.returncode == 0, (
        f"single worker failed:\n{single.stdout[-3000:]}"
    )
    ref = _parse_losses(single)
    np.testing.assert_allclose(multi[0], ref, rtol=1e-5)


def _parse_losses_text(out: str) -> list:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["losses"]
    raise AssertionError(f"worker produced no RESULT line:\n{out[-3000:]}")
