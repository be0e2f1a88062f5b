"""Regression metrics as pure functions.

Matches the reference's metric formulas: MSELoss + torchmetrics
MAE/MAPE/MSE with RMSE = sqrt(MSE) (reference lit.py:24-27,36-38,50-52).
Final metrics reduce as the mean of per-batch metric values
(reference lit.py:100-106,134-140, tlit.py:83-92).

Unlike the reference, metric state is explicit — torchmetrics objects in
the reference are never .reset() so logged values silently aggregate
across epochs (SURVEY §8.8); here every computation is a pure function of
(predictions, targets) and aggregation is an explicit running mean.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

# torchmetrics MeanAbsolutePercentageError clamps |target| at this epsilon.
MAPE_EPS = 1.17e-06


def mse(yhat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(yhat - y))


def mae(yhat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(yhat - y))


def mape(yhat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(yhat - y) / jnp.clip(jnp.abs(y), MAPE_EPS, None))


def rmse(yhat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(mse(yhat, y))


def regression_metrics(yhat: jnp.ndarray, y: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """All four metrics in one fused pass (loss == mse, reference lit.py:24)."""
    err = yhat - y
    sq = jnp.mean(jnp.square(err))
    return {
        "loss": sq,
        "mae": jnp.mean(jnp.abs(err)),
        "mape": jnp.mean(jnp.abs(err) / jnp.clip(jnp.abs(y), MAPE_EPS, None)),
        "rmse": jnp.sqrt(sq),
    }


def weighted_regression_metrics(
    yhat: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """regression_metrics with per-sample weights w: [B] (1 valid, 0 pad).

    Tail batches are padded to the full batch size in mesh mode so every
    step compiles to one SPMD program shape; with w masking the pad rows,
    each metric equals the plain mean over the valid samples' elements —
    exactly what the reference computes on its ragged final batch
    (reference lit.py:33-38 on DataLoader drop_last=False)."""
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    axes = tuple(range(1, y.ndim))
    err = yhat - y
    sq = jnp.sum(w * jnp.mean(jnp.square(err), axis=axes)) / wsum
    return {
        "loss": sq,
        "mae": jnp.sum(w * jnp.mean(jnp.abs(err), axis=axes)) / wsum,
        "mape": jnp.sum(
            w
            * jnp.mean(
                jnp.abs(err) / jnp.clip(jnp.abs(y), MAPE_EPS, None), axis=axes
            )
        )
        / wsum,
        "rmse": jnp.sqrt(sq),
    }


class MeanAggregator:
    """Host-side running mean of per-batch metric dicts.

    Implements the reference's reduction: sum per-batch values / n_batches
    (reference lit.py:100-106).
    """

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._count = 0

    def update(self, metrics: Dict[str, jnp.ndarray]) -> None:
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
        self._count += 1

    @property
    def count(self) -> int:
        return self._count

    def compute(self) -> Dict[str, float]:
        if self._count == 0:
            return {}
        return {k: v / self._count for k, v in self._sums.items()}
