"""Worker for tests/test_multihost.py — one process of a simulated
multi-host (DCN) data-parallel training run on CPU.

Run as:  python multihost_worker.py <proc_id> <num_procs> <port>

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
"""

import json
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

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


def main() -> None:
    assert jax.device_count() == 2, jax.devices()
    mesh = make_mesh(data=2)
    model_cfg = ModelConfig(compute_dtype="float32")
    model = build_model(model_cfg, horizon=2)
    supports = jnp.eye(4)[None]
    rng = jax.random.PRNGKey(0)

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
