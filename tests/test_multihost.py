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


def _parse_result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"worker produced no RESULT line:\n{out[-3000:]}")


@pytest.fixture(scope="module")
def mh_trained_ckpt(tiny_store_dir, tmp_path_factory):
    """One short single-device fit whose checkpoint the multi-host
    inference workers restore (shared-filesystem contract: every host
    reads the same checkpoint directory)."""
    import dataclasses
    import os as _os

    from multimodal_outage_tpu.core.config import (
        MeshConfig,
        small_test_config,
    )
    from multimodal_outage_tpu.train.loop import fit

    tmp = tmp_path_factory.mktemp("mh_infer")
    cfg = small_test_config(
        n_counties=4, image_size=16, horizon=2, batch_size=4
    )
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, data_dir=tiny_store_dir, dataset_range=12, horizon=2
        ),
        train=dataclasses.replace(
            cfg.train, epochs=1, batch_size=4,
            checkpoint_dir=str(tmp / "logs"), job_id="mh",
        ),
        mesh=MeshConfig(data=1),
    )
    fit(cfg, test_case="michael", progress=False)
    return _os.path.join(cfg.train.checkpoint_dir, "mh", "checkpoints")


def _run_infer_workers(mode, tiny_store_dir, ckpt_dir, tmp_path):
    """2 gloo processes + the identical single-process run; returns
    (multi_results, multi_out_dir, single_result, single_out_dir)."""
    port = _free_port()
    out2 = tmp_path / "mh2"
    out1 = tmp_path / "mh1"
    out2.mkdir()
    out1.mkdir()
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port), "infer",
             mode, tiny_store_dir, ckpt_dir, str(out2)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
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
    multi = [_parse_result(out) for out in outs]

    single = subprocess.run(
        [sys.executable, _WORKER, "0", "1", "0", "infer",
         mode, tiny_store_dir, ckpt_dir, str(out1)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600,
        env=_worker_env(XLA_FLAGS="--xla_force_host_platform_device_count=2"),
    )
    assert single.returncode == 0, (
        f"single worker failed:\n{single.stdout[-3000:]}"
    )
    return multi, out2, _parse_result(single.stdout), out1


@pytest.mark.slow
def test_two_process_predict_matches_single_process(
    mh_trained_ckpt, tiny_store_dir, tmp_path
):
    """Round-5 mandate: predict() under process_count > 1 — the device
    pipeline's sharded-store global assembly, the callback weight row
    (_mesh_epoch_iter loop.py:282-290), and the process_allgather
    prediction collection — EXECUTES and matches the identical
    single-process mesh sweep (metrics and full prediction rasters)."""
    multi, out2, single, out1 = _run_infer_workers(
        "predict", tiny_store_dir, mh_trained_ckpt, tmp_path
    )
    # both processes observe the same replicated metrics and, via the
    # all-gather, the same global predictions
    assert multi[0]["metrics"] == multi[1]["metrics"]
    p0 = np.load(out2 / "preds_0.npy")
    p1 = np.load(out2 / "preds_1.npy")
    np.testing.assert_array_equal(p0, p1)

    ref_p = np.load(out1 / "preds_0.npy")
    np.testing.assert_allclose(p0, ref_p, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.load(out2 / "targets_0.npy"), np.load(out1 / "targets_0.npy"),
        rtol=0, atol=0,
    )
    for k, v in single["metrics"].items():
        np.testing.assert_allclose(multi[0]["metrics"][k], v, rtol=1e-5)


@pytest.mark.slow
def test_two_process_serve_eval_matches_single_process(
    mh_trained_ckpt, tiny_store_dir, tmp_path
):
    """Round-5 mandate: serve_eval() under process_count > 1 — the host
    feeding branch (local_batch_slice, _mesh_epoch_iter loop.py:291-310)
    through the mesh ServingModel — EXECUTES and matches the identical
    single-process mesh sweep."""
    multi, out2, single, out1 = _run_infer_workers(
        "serve", tiny_store_dir, mh_trained_ckpt, tmp_path
    )
    assert multi[0]["metrics"] == multi[1]["metrics"]
    p0 = np.load(out2 / "preds_0.npy")
    np.testing.assert_array_equal(p0, np.load(out2 / "preds_1.npy"))
    np.testing.assert_allclose(
        p0, np.load(out1 / "preds_0.npy"), rtol=1e-5, atol=1e-6
    )
    for k, v in single["metrics"].items():
        np.testing.assert_allclose(multi[0]["metrics"][k], v, rtol=1e-5)
