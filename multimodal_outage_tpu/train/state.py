"""Train state and optimizer construction.

Optimizer matches the reference: Adam(lr=1e-3) with per-epoch
CosineAnnealingLR(T_max=10) (reference lit.py:59-72). The learning rate is
threaded into the jitted step as a scalar so the epoch-stepped schedule
needs no recompilation.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer() -> optax.GradientTransformation:
    """Adam moments only; the lr scale is applied inside the train step."""
    return optax.chain(optax.scale_by_adam(), optax.scale(-1.0))


def cosine_annealing_lr(epoch: int, base_lr: float, t_max: int) -> float:
    """torch.optim.lr_scheduler.CosineAnnealingLR with eta_min=0, stepped
    per epoch (reference lit.py:61,69-70):
        lr(e) = base_lr · (1 + cos(π·e / T_max)) / 2
    """
    return base_lr * (1.0 + math.cos(math.pi * epoch / t_max)) / 2.0


def create_train_state(
    model, rng: jax.Array, sample_batch: Dict[str, jnp.ndarray], supports,
    d2v_bundle: str | None = None,
) -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": rng},
        sample_batch["x"],
        sample_batch["date_feats"],
        supports,
        train=False,
    )
    params = variables["params"]
    if d2v_bundle:
        from multimodal_outage_tpu.train.date2vec_pretrain import (
            install_bundle,
            load_bundle,
        )

        params = install_bundle(params, load_bundle(d2v_bundle))
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer().init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
