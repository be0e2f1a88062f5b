"""SPMD sharding rules and the sharded train step.

The reference is strictly single-device (SURVEY §2 "Parallelism &
communication": no DP/TP/PP/SP, no comms backend). The TPU-native scaling
story, per BASELINE.json's north star (data-parallel pjit over a v5p mesh):

  data axis  — batch-dim data parallelism. Batches are sharded on their
               leading dim; XLA inserts the gradient psum over ICI.
  model axis — tensor parallelism over the bottleneck MLP hidden dims,
               Megatron-style column→row parallel pairs:
                 encoder.fc1 (4096→1024)  column-parallel (shard out dim)
                 encoder.fc2 (1024→256)   row-parallel   (shard in dim)
                 decoder.fc1 / decoder.fc2 likewise
                 st_gnn.end_conv_1 / end_conv_2 (256→512→256) likewise
               XLA emits one psum per row-parallel matmul; everything else
               is replicated (the U-Net's 4..64-channel convs are far too
               small to shard profitably — batch DP covers them).

Validated without hardware on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N, SURVEY §4.4).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_outage_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, TIME_AXIS
from multimodal_outage_tpu.train.state import TrainState, make_optimizer

# (module, param-name) → PartitionSpec, matched against the tail of the
# pytree path. Applies uniformly to params and to Adam mu/nu (same paths).
_TP_RULES: Dict[Tuple[str, ...], P] = {
    ("encoder", "fc1", "kernel"): P(None, MODEL_AXIS),
    ("encoder", "fc1", "bias"): P(MODEL_AXIS),
    ("encoder", "fc2", "kernel"): P(MODEL_AXIS, None),
    ("decoder", "fc1", "kernel"): P(None, MODEL_AXIS),
    ("decoder", "fc1", "bias"): P(MODEL_AXIS),
    ("decoder", "fc2", "kernel"): P(MODEL_AXIS, None),
    ("st_gnn", "end_conv_1", "kernel"): P(None, MODEL_AXIS),
    ("st_gnn", "end_conv_1", "bias"): P(MODEL_AXIS),
    ("st_gnn", "end_conv_2", "kernel"): P(MODEL_AXIS, None),
}


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            names.append(str(k.name))
    return tuple(names)


def _pspec_for(path, leaf) -> P:
    names = _path_names(path)
    for pattern, spec in _TP_RULES.items():
        k = len(pattern)
        if len(names) >= k and tuple(names[-k:]) == pattern:
            if getattr(leaf, "ndim", 0) == len(spec):
                return spec
    return P()


def tree_shardings(mesh: Mesh, tree) -> Any:
    """Same-shaped pytree of NamedShardings (TP rules + replication).

    Works for any params/batch_stats/TrainState pytree — the TP rules
    match on path suffixes, so training state and bare variable trees
    (serving, inference) get identical layouts."""

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _pspec_for(path, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, tree)


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """TrainState-shaped pytree of NamedShardings (TP rules + replication)."""
    return tree_shardings(mesh, state)


def _batch_pspec(name: str) -> P:
    """Batch dim over data; temporal dim over time (sequence parallelism).

    x/y are [B, N, T, H, W, C] (T at axis 2); date_feats is [B, T, 6]."""
    if name in ("x", "y"):
        return P(DATA_AXIS, None, TIME_AXIS)
    if name == "date_feats":
        return P(DATA_AXIS, TIME_AXIS)
    return P(DATA_AXIS)


def batch_shardings(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
    if TIME_AXIS not in mesh.shape:
        return {k: NamedSharding(mesh, P(DATA_AXIS)) for k in batch}
    return {k: NamedSharding(mesh, _batch_pspec(k)) for k in batch}


def global_put(x, sharding: NamedSharding):
    """device_put that also works multi-host.

    Single-process (and for leaves that are already global jax.Arrays,
    e.g. jit-init outputs) this is jax.device_put. For HOST-resident
    leaves under process_count > 1 — a checkpoint restored identically
    on every host, a replicated supports tensor — device_put would need
    a cross-host transfer (unsupported without DCN transport flags);
    instead each process contributes its addressable shards of the
    global array from its own full host copy via
    jax.make_array_from_callback (the same assembly the multi-host
    DevicePipeline uses for the frame store)."""
    if jax.process_count() > 1 and getattr(x, "is_fully_addressable", True):
        arr = np.asarray(x)
        # NB: plain asarray — ascontiguousarray would promote 0-d leaves
        # (e.g. the step counter) to shape (1,)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: np.asarray(arr[idx])
        )
    return jax.device_put(x, sharding)


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    shardings = state_shardings(mesh, state)
    return jax.tree.map(global_put, state, shardings)


def shard_batch(mesh: Mesh, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
    """Place a LOGICALLY GLOBAL batch onto the mesh (batch dim over data,
    T over time).

    Single-process: a resharding device_put. Multi-host (v5p pod slices
    over DCN): every process passes the same global batch; each keeps only
    its own row range (core.mesh.local_batch_slice) and the global array
    is assembled via jax.make_array_from_process_local_data — the
    SURVEY §5 'Distributed communication backend' feeding path
    (exercised by tests/test_multihost.py on 2 local CPU processes)."""
    shardings = batch_shardings(mesh, batch)
    if jax.process_count() > 1:
        from multimodal_outage_tpu.core.mesh import local_batch_slice

        out = {}
        for k, v in batch.items():
            v = np.asarray(v)
            sl = local_batch_slice(v.shape[0], mesh)
            out[k] = jax.make_array_from_process_local_data(
                shardings[k], np.ascontiguousarray(v[sl]), v.shape
            )
        return out
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


def shard_local_batch(
    mesh: Mesh, local: Dict[str, Any], global_batch: int
) -> Dict[str, Any]:
    """Assemble mesh-sharded GLOBAL arrays from this process's LOCAL rows.

    The efficient multi-host counterpart of shard_batch: callers gather
    and preprocess only their own local_batch_slice of the batch
    (1/n_proc of the rows — no full-batch compute or device round trip
    per process), then this assembles the global array via
    jax.make_array_from_process_local_data. Identical numerics to
    shard_batch on the same global batch (tests/test_multihost.py runs
    both paths); also works single-process, where local IS global."""
    shardings = batch_shardings(mesh, local)
    out = {}
    for k, v in local.items():
        v = np.ascontiguousarray(np.asarray(v))
        out[k] = jax.make_array_from_process_local_data(
            shardings[k], v, (global_batch,) + v.shape[1:]
        )
    return out


def pad_batch(
    batch: Dict[str, Any], batch_size: int
) -> Dict[str, Any]:
    """Pad a (possibly ragged tail) batch to `batch_size` rows and attach
    per-sample weights 'w' (1 valid, 0 pad).

    Pad rows CYCLE the valid samples (np.resize semantics) rather than
    zero-fill, so any train-mode batch statistics computed over pad rows
    stay in-distribution; the weights zero the pad rows out of loss,
    gradients, metrics (see core.metrics.weighted_regression_metrics),
    AND the BatchNorm running-stat EMAs (the sharded train step forwards
    'w' as the model's sample_weight — GroupedBatchNorm masked update).
    Keeps every SPMD step one compiled shape regardless of dataset size."""
    b = next(iter(batch.values())).shape[0]
    w = np.zeros((batch_size,), np.float32)
    w[:b] = 1.0
    if b == batch_size:
        return {**batch, "w": w}
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        reps = -(-batch_size // b)  # ceil
        out[k] = np.concatenate([v] * reps, axis=0)[:batch_size]
    out["w"] = w
    return out


def make_sharded_eval_step(model, mesh: Mesh, state: TrainState):
    """SPMD eval step: (params, batch_stats, batch, supports) → metrics.

    Batches carry a 'w' sample-weight row (see pad_batch) so padded tail
    batches reduce to exactly the reference's per-batch metric values."""
    from multimodal_outage_tpu.core import metrics as M

    def eval_step(params, batch_stats, batch, supports):
        yhat = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            batch["date_feats"],
            supports,
            train=False,
        )
        return M.weighted_regression_metrics(yhat, batch["y"], batch["w"])

    st_shard = state_shardings(mesh, state)
    repl = NamedSharding(mesh, P())
    batch_shard = batch_shardings(
        mesh, {"x": None, "y": None, "date_feats": None, "w": None}
    )
    metric_shard = {k: repl for k in ("loss", "mae", "mape", "rmse")}
    return jax.jit(
        eval_step,
        in_shardings=(st_shard.params, st_shard.batch_stats, batch_shard, repl),
        out_shardings=metric_shard,
    )


def make_sharded_predict_step(model, mesh: Mesh, state: TrainState):
    """SPMD inference step: (params, batch_stats, batch, supports) → yhat.

    Mesh-mode counterpart of steps.make_predict_step (the reference
    tlit.py:64-90 inference sweep): batch sharded B-over-data /
    T-over-time, params under the _TP_RULES layouts, predictions emitted
    batch-sharded (np.asarray on the result gathers the global array)."""

    def predict_step(params, batch_stats, batch, supports):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            batch["date_feats"],
            supports,
            train=False,
        )

    st_shard = state_shardings(mesh, state)
    repl = NamedSharding(mesh, P())
    batch_shard = batch_shardings(
        mesh, {"x": None, "y": None, "date_feats": None, "w": None}
    )
    return jax.jit(
        predict_step,
        in_shardings=(st_shard.params, st_shard.batch_stats, batch_shard, repl),
        out_shardings=batch_shardings(mesh, {"x": None})["x"],
    )


def make_sharded_train_step(
    model, mesh: Mesh, state: TrainState, donate=True, weighted=False,
    compiler_options="auto",
):
    """jit-compiled SPMD train step with explicit in/out shardings.

    The returned step has the same signature as steps.make_train_step's:
    (state, batch, supports, lr, rng) → (state, metrics).

    weighted=True: batches carry a 'w' [B] sample-weight row (pad_batch)
    and the loss/metrics mask the pad rows — mesh-mode training then sees
    exactly the reference's ragged-final-batch semantics
    (DataLoader drop_last=False, reference lit.py:164) at one fixed
    compiled shape.
    """
    from multimodal_outage_tpu.core import metrics as M
    from multimodal_outage_tpu.train.steps import (
        _teacher_kwargs,
        default_compiler_options,
    )

    if compiler_options == "auto":
        compiler_options = default_compiler_options()
    tx = make_optimizer()

    def train_step(state, batch, supports, lr, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        tf_kwargs, tf_rngs = _teacher_kwargs(model, state, batch, dropout_rng)

        def loss_fn(params):
            yhat, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"],
                batch["date_feats"],
                supports,
                train=True,
                rngs={"dropout": dropout_rng, **tf_rngs},
                mutable=["batch_stats"],
                # pad-mask the BN running-stat EMAs too (GroupedBatchNorm
                # masked serial update) so padded tail batches update
                # running stats exactly as the reference's ragged batch
                sample_weight=batch["w"] if weighted else None,
                **tf_kwargs,
            )
            if weighted:
                w = batch["w"]
                axes = tuple(range(1, batch["y"].ndim))
                loss = jnp.sum(
                    w * jnp.mean(jnp.square(yhat - batch["y"]), axis=axes)
                ) / jnp.maximum(jnp.sum(w), 1.0)
            else:
                loss = M.mse(yhat, batch["y"])
            return loss, (yhat, mutated["batch_stats"])

        (loss, (yhat, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        if weighted:
            metrics = M.weighted_regression_metrics(
                yhat, batch["y"], batch["w"]
            )
        else:
            metrics = M.regression_metrics(yhat, batch["y"])
        return (
            TrainState(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    st_shard = state_shardings(mesh, state)
    repl = NamedSharding(mesh, P())
    batch_keys = {"x": None, "y": None, "date_feats": None}
    if weighted:
        batch_keys["w"] = None
    batch_shard = batch_shardings(mesh, batch_keys)
    metric_shard = {k: repl for k in ("loss", "mae", "mape", "rmse")}
    return jax.jit(
        train_step,
        in_shardings=(st_shard, batch_shard, repl, repl, repl),
        out_shardings=(st_shard, metric_shard),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )
