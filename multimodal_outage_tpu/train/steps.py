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


def make_train_step(
    model, donate: bool = True
) -> Callable[..., Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    tx = make_optimizer()

    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        supports: Optional[jnp.ndarray],
        lr: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            yhat, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"],
                batch["date_feats"],
                supports,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
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

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


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
