"""Worker for tests/test_multihost.py — one process of a simulated
multi-host (DCN) data-parallel training run on CPU.

Run as:  python multihost_worker.py <proc_id> <num_procs> <port> [store_dir]

With num_procs > 1 this process joins a jax.distributed cluster over a
local coordinator (gloo CPU collectives standing in for DCN) and owns one
of the mesh's devices; with num_procs == 1 it runs the identical program
single-process on a virtual 2-device mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=2, set by the test).
Either way it executes 3 sharded train steps of the real fusion model
through parallel.sharding.{shard_state, shard_batch, shard_local_batch,
make_sharded_train_step} — in the multi-process case the batch feeds
through jax.make_array_from_process_local_data + core.mesh.
local_batch_slice (the SURVEY §5 multi-host path), alternating the
global-batch and local-rows feeding variants so both execute — and
prints the loss trajectory as JSON for the test to compare across modes.

With a 4th argument (a packed-store directory) the run instead feeds
through data.pipeline.DevicePipeline with --shard_store semantics: the
HBM-resident store is assembled as a GLOBAL array (date dim sharded over
the data axis; each process contributes its addressable shards via
jax.make_array_from_callback) and every batch is a jitted device gather —
the round-4 multi-host HBM-resident feeding path.

Inference mode (round-5 mandate — predict/serve_eval under
process_count > 1, never executed before):

    python multihost_worker.py <proc> <nproc> <port> infer \
        <predict|serve> <store_dir> <ckpt_dir> <out_dir>

runs train.loop.predict (device pipeline + shard_store: the
make_array_from_callback weight-row branch, loop.py _mesh_epoch_iter) or
train.loop.serve_eval (host pipeline: the local_batch_slice branch)
over the held-out case on the dp=2 mesh, saves preds to
<out_dir>/preds_<proc>.npy, and prints the metrics as JSON.
"""

import json
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
infer_args = None
store_dir = None
if len(sys.argv) > 4 and sys.argv[4] == "infer":
    infer_args = sys.argv[5:9]  # (mode, store_dir, ckpt_dir, out_dir)
elif len(sys.argv) > 4:
    store_dir = sys.argv[4]

import jax

# the axon TPU plugin's sitecustomize overrides JAX_PLATFORMS via
# jax.config — forcing CPU must happen here, after import (conftest.py
# does the same for the test suite)
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", nproc, proc_id)

import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.core.mesh import make_mesh
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.core.mesh import local_batch_slice
from multimodal_outage_tpu.parallel.sharding import (
    make_sharded_train_step,
    shard_batch,
    shard_local_batch,
    shard_state,
)
from multimodal_outage_tpu.train.state import create_train_state


def global_batch(step: int, b=4, n=4, t=2, s=16):
    """Deterministic GLOBAL batch — identical on every process (each
    process keeps only its own rows inside shard_batch)."""
    rng = np.random.default_rng(1000 + step)
    return {
        "x": rng.standard_normal((b, n, t, s, s, 1)).astype(np.float32),
        "y": rng.standard_normal((b, n, t, s, s, 1)).astype(np.float32),
        "date_feats": np.tile(
            np.array([0, 0, 0, 2022, 9, 26], np.float32), (b, t, 1)
        ),
        "w": np.ones((b,), np.float32),
    }


def device_pipeline_losses(mesh, model, supports, rng):
    """3 sharded train steps fed by the HBM-resident DevicePipeline with
    the store's date dim sharded over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_outage_tpu.core.mesh import DATA_AXIS
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store

    store = load_store(store_dir)
    ds = WindowDataset(
        store=store, indices=np.arange(store.frames.shape[0]), horizon=2
    )
    pipe = DevicePipeline(
        store, mean=1.0, std=2.0, image_size=16,
        dtype=jnp.float32, mesh=mesh, shard_store=True,
    )
    w_shard = NamedSharding(mesh, P(DATA_AXIS))
    b = 4

    def with_w(batch):
        w = np.ones((b,), np.float32)
        if jax.process_count() > 1:
            batch["w"] = jax.make_array_from_callback(
                w.shape, w_shard, lambda idx: w[idx]
            )
        else:
            batch["w"] = jax.device_put(w, w_shard)
        return batch

    init_batch = pipe.batch(ds, np.zeros(b, np.int64))
    state = create_train_state(model, rng, init_batch, supports)
    state = shard_state(mesh, state)
    step = make_sharded_train_step(model, mesh, state, donate=False,
                                   weighted=True)
    lr = jnp.float32(1e-3)
    losses = []
    for i in range(3):
        sel = (np.arange(b, dtype=np.int64) + i) % len(ds)
        batch = with_w(pipe.batch(ds, sel))
        state, metrics = step(state, batch, supports, lr, rng)
        losses.append(float(metrics["loss"]))
    return losses


def run_inference(mode: str, data_dir: str, ckpt_dir: str, out_dir: str):
    """predict / serve_eval over the held-out case on the dp=2 mesh —
    the multi-host inference/serving path (train.loop._mesh_epoch_iter
    branches at process_count > 1, plus the process_allgather prediction
    collection in _host_fetch)."""
    import dataclasses
    import os

    import numpy as np

    from multimodal_outage_tpu.core.config import (
        MeshConfig,
        small_test_config,
    )
    from multimodal_outage_tpu.train.loop import predict, serve_eval

    cfg = small_test_config(
        n_counties=4, image_size=16, horizon=2, batch_size=4
    )
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data,
            data_dir=data_dir,
            dataset_range=12,
            horizon=2,
            # predict: device pipeline, store sharded over data (the
            # make_array_from_callback assembly + callback weight row);
            # serve: host pipeline (the local_batch_slice feeding branch)
            pipeline="device" if mode == "predict" else "host",
            shard_store=(mode == "predict"),
        ),
        mesh=MeshConfig(data=2),
    )
    if mode == "predict":
        preds, targets, metrics = predict(cfg, ckpt_dir, test_case="michael")
        np.save(os.path.join(out_dir, f"targets_{proc_id}.npy"), targets)
    else:
        preds, metrics, _ = serve_eval(
            cfg, ckpt_dir, test_case="michael", collect_preds=True
        )
    np.save(os.path.join(out_dir, f"preds_{proc_id}.npy"), preds)
    print("RESULT " + json.dumps({"proc": proc_id, "metrics": metrics}),
          flush=True)


def main() -> None:
    assert jax.device_count() == 2, jax.devices()
    if infer_args is not None:
        run_inference(*infer_args)
        return
    mesh = make_mesh(data=2)
    model_cfg = ModelConfig(compute_dtype="float32")
    model = build_model(model_cfg, horizon=2)
    supports = jnp.eye(4)[None]
    rng = jax.random.PRNGKey(0)

    if store_dir is not None:
        losses = device_pipeline_losses(mesh, model, supports, rng)
        print("RESULT " + json.dumps({"proc": proc_id, "losses": losses}),
              flush=True)
        return

    init_batch = {
        k: jnp.asarray(v) for k, v in global_batch(0).items() if k != "w"
    }
    state = create_train_state(model, rng, init_batch, supports)
    state = shard_state(mesh, state)
    step = make_sharded_train_step(model, mesh, state, donate=False,
                                   weighted=True)
    lr = jnp.float32(1e-3)

    losses = []
    for i in range(3):
        gb = global_batch(i)
        if i % 2 == 0:
            batch = shard_batch(mesh, gb)
        else:
            # the efficient feeding path: each process passes ONLY its
            # local rows (what train.loop._mesh_epoch_iter does multi-host)
            b = gb["x"].shape[0]
            sl = local_batch_slice(b, mesh)
            batch = shard_local_batch(
                mesh, {k: v[sl] for k, v in gb.items()}, b
            )
        state, metrics = step(state, batch, supports, lr, rng)
        losses.append(float(metrics["loss"]))
    print("RESULT " + json.dumps({"proc": proc_id, "losses": losses}),
          flush=True)


if __name__ == "__main__":
    main()
