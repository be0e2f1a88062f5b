import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.core import metrics as M


def test_metric_values():
    y = jnp.array([1.0, 2.0, 4.0])
    yhat = jnp.array([1.5, 1.0, 5.0])
    np.testing.assert_allclose(float(M.mse(yhat, y)), (0.25 + 1 + 1) / 3, rtol=1e-6)
    np.testing.assert_allclose(float(M.mae(yhat, y)), (0.5 + 1 + 1) / 3, rtol=1e-6)
    np.testing.assert_allclose(
        float(M.rmse(yhat, y)), np.sqrt((0.25 + 1 + 1) / 3), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(M.mape(yhat, y)), (0.5 / 1 + 1 / 2 + 1 / 4) / 3, rtol=1e-6
    )


def test_mape_eps_guard():
    # torchmetrics clamps |y| at 1.17e-6 instead of dividing by zero
    y = jnp.array([0.0])
    yhat = jnp.array([1.0])
    v = float(M.mape(yhat, y))
    np.testing.assert_allclose(v, 1.0 / M.MAPE_EPS, rtol=1e-5)


def test_regression_metrics_consistent():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(4, 5)))
    yhat = jnp.asarray(rng.normal(size=(4, 5)))
    m = M.regression_metrics(yhat, y)
    np.testing.assert_allclose(float(m["loss"]), float(M.mse(yhat, y)), rtol=1e-6)
    np.testing.assert_allclose(float(m["rmse"]), float(M.rmse(yhat, y)), rtol=1e-6)
    np.testing.assert_allclose(float(m["mae"]), float(M.mae(yhat, y)), rtol=1e-6)
    np.testing.assert_allclose(float(m["mape"]), float(M.mape(yhat, y)), rtol=1e-6)


def test_mean_aggregator_matches_reference_reduction():
    # mean of per-batch metrics (reference lit.py:100-106)
    agg = M.MeanAggregator()
    agg.update({"loss": jnp.float32(1.0)})
    agg.update({"loss": jnp.float32(3.0)})
    assert agg.compute() == {"loss": 2.0}
    assert agg.count == 2
