"""Jitted train / eval steps.

One fused XLA program per step: forward, MSE loss, backward, Adam update,
metrics — replacing the reference's Lightning training_step + implicit
backward (reference lit.py:29-43). Donation of the train state avoids a
full parameter copy per step on HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_outage_tpu.core import metrics as M
from multimodal_outage_tpu.train.state import TrainState, make_optimizer


def default_compiler_options(vmem_limit_kib: int = 49152):
    """Measured-default XLA options for the fused train step.

    jit compiler_options are the only way to set xla_tpu_* options in
    this deployment: the axon client fatally aborts on unknown XLA_FLAGS
    env entries, but compiler_options travel inside the compile RPC to
    the remote compile service, which parses them (bogus names are
    rejected server-side — benchmarks.bench_xla_flag_sweep). Raising the
    scoped-VMEM fusion budget from the 16 MiB default to 48 MiB measured
    +1.0% train throughput, reproduced across two interleaved A/Bs
    (32/48 MiB win, 64 MiB fades, 96 MiB is rejected — BENCHMARKS.md
    "XLA compiler-options sweep"). Returns None off-TPU (other backends
    reject xla_tpu_* options) or when vmem_limit_kib is falsy."""
    if vmem_limit_kib and jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": str(int(vmem_limit_kib))}
    return None


def uses_teacher_forcing(model) -> bool:
    """True when the fusion model's DCRNN scheduled-sampling knob is on —
    train steps then pass the ground-truth future frames (batch['y'])
    through the forward as decoder targets (models/fusion.py)."""
    cfg = getattr(model, "cfg", None)
    return (
        cfg is not None
        and getattr(cfg, "st_gnn", None) == "dcrnn"
        and cfg.dcrnn.teacher_forcing > 0.0
    )


def tf_schedule(model, step) -> jnp.ndarray:
    """Scheduled-sampling probability at `step` (traced): constant
    cfg.dcrnn.teacher_forcing, or — with tf_decay_steps = τ > 0 — the
    canonical DCRNN inverse-sigmoid curriculum
    p(step) = p₀ · τ/(τ + e^{step/τ})  (Li et al. 2018 cl_decay_steps)."""
    d = model.cfg.dcrnn
    p0 = jnp.float32(d.teacher_forcing)
    if d.tf_decay_steps <= 0:
        return p0
    tau = jnp.float32(d.tf_decay_steps)
    return p0 * tau / (tau + jnp.exp(step.astype(jnp.float32) / tau))


def _teacher_kwargs(model, state, batch, dropout_rng):
    """(extra apply kwargs, extra rngs) for the scheduled-sampling path."""
    if not uses_teacher_forcing(model):
        return {}, {}
    return (
        {"targets": batch["y"], "tf_prob": tf_schedule(model, state.step)},
        {"sampling": jax.random.fold_in(dropout_rng, 0x5a)},
    )


def make_train_step(
    model, donate: bool = True, compiler_options="auto", raw: bool = False
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """compiler_options: dict of XLA options for jax.jit, None for the
    compiler defaults, or "auto" (default) for default_compiler_options().
    raw=True returns the UNJITTED step for callers that compile it
    themselves (e.g. the auto-layout bench's Format(Layout.AUTO) AOT
    compile); donate/compiler_options are then the caller's job.
    """
    if compiler_options == "auto":
        compiler_options = default_compiler_options()
    tx = make_optimizer()

    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        supports: Optional[jnp.ndarray],
        lr: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
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
                **tf_kwargs,
            )
            return M.mse(yhat, batch["y"]), (yhat, mutated["batch_stats"])

        (loss, (yhat, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = M.regression_metrics(yhat, batch["y"])
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    if raw:
        return train_step
    donate_argnums = (0,) if donate else ()
    return jax.jit(
        train_step,
        donate_argnums=donate_argnums,
        compiler_options=compiler_options,
    )


def make_accum_train_step(
    model, accum: int, donate: bool = True, compiler_options="auto"
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Gradient-accumulation train step: one compiled program consuming a
    flat batch (leaves [b, ...], b divisible by `accum`), reshaping it to
    [accum, b/accum, ...] in-program, and scanning the microbatches
    serially, so peak activation HBM is that of ONE microbatch while the
    update is the full batch's.

    This reproduces the reference's batch-16 training semantics
    (lit.py:213) EXACTLY on a chip where b=16 does not fit in one shot
    (BENCHMARKS.md: b=16 OOMs plain, with all-block remat, and with
    stem-scope remat):

    - Gradients: MSE is a mean over batch elements, so the mean of
      equal-sized microbatch gradients IS the full-batch gradient.
    - BatchNorm: train-mode normalization uses per-(sample, county)
      GROUP statistics (models/layers.py), which never cross microbatch
      boundaries; and the serial-EMA running-stat update telescopes —
      applying the closed form to microbatch 1 then microbatch 2 equals
      one serial pass over all accum·b/accum·67 groups in order, i.e.
      bit-for-the-same-math as a true batch-16 serial trajectory.
    - Dropout: each microbatch folds a distinct rng (a different random
      draw, not a semantics change).

    Metrics are equal-weight means over microbatches == full-batch means.
    """
    if compiler_options == "auto":
        compiler_options = default_compiler_options()
    tx = make_optimizer()

    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],  # leaves [b, ...], b % accum == 0
        supports: Optional[jnp.ndarray],
        lr: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # reshape to [accum, b/accum, ...] INSIDE the jit: XLA aliases it
        # for free, where an eager per-step tree.map would dispatch extra
        # programs and hold a duplicate of x+y on HBM during the step
        batch = jax.tree.map(
            lambda a: a.reshape(
                (accum, a.shape[0] // accum) + tuple(a.shape[1:])
            ),
            batch,
        )

        def micro(carry, inp):
            bs, grads_acc = carry
            mb, k = inp
            mb_rng = jax.random.fold_in(
                jax.random.fold_in(rng, state.step), k
            )
            tf_kwargs, tf_rngs = _teacher_kwargs(model, state, mb, mb_rng)

            def loss_fn(params):
                yhat, mutated = model.apply(
                    {"params": params, "batch_stats": bs},
                    mb["x"],
                    mb["date_feats"],
                    supports,
                    train=True,
                    rngs={"dropout": mb_rng, **tf_rngs},
                    mutable=["batch_stats"],
                    **tf_kwargs,
                )
                return M.mse(yhat, mb["y"]), (yhat, mutated["batch_stats"])

            (_, (yhat, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (new_bs, grads_acc), M.regression_metrics(yhat, mb["y"])

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_bs, grads_sum), metrics = jax.lax.scan(
            micro,
            (state.batch_stats, zeros),
            (batch, jnp.arange(accum)),
        )
        grads = jax.tree.map(lambda g: g / accum, grads_sum)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)
        # rmse is sqrt-of-mean, not mean-of-sqrt — recompute from the
        # exact full-batch mse so it matches the one-shot step
        metrics["rmse"] = jnp.sqrt(metrics["loss"])
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(
        train_step,
        donate_argnums=donate_argnums,
        compiler_options=compiler_options,
    )


def make_eval_step(model) -> Callable[..., Dict[str, jnp.ndarray]]:
    @jax.jit
    def eval_step(
        params,
        batch_stats,
        batch: Dict[str, jnp.ndarray],
        supports: Optional[jnp.ndarray],
    ) -> Dict[str, jnp.ndarray]:
        yhat = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            batch["date_feats"],
            supports,
            train=False,
        )
        return M.regression_metrics(yhat, batch["y"])

    return eval_step


def make_predict_step(model) -> Callable[..., jnp.ndarray]:
    @jax.jit
    def predict_step(params, batch_stats, batch, supports) -> jnp.ndarray:
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            batch["date_feats"],
            supports,
            train=False,
        )

    return predict_step
