"""SPMD inference & serving (round-4 mandate): predict / serve_eval /
ServingModel run on the mesh, not just fit.

BASELINE.json config 5 is a sharded full-state RUN — inference must scale
past one chip. On the virtual 8-device CPU mesh: mesh-mode predict and
serve_eval must reproduce the single-device metrics and predictions, and a
mesh ServingModel must match the flax eval forward.
"""

import dataclasses
import os

import numpy as np
import pytest

from multimodal_outage_tpu.core.config import MeshConfig, small_test_config


@pytest.fixture(scope="module")
def trained_ckpt(tiny_store_dir, tmp_path_factory):
    """One short single-device fit — shared across the module's tests."""
    from multimodal_outage_tpu.train.loop import fit

    tmp = tmp_path_factory.mktemp("spmd_serve")
    cfg = small_test_config(n_counties=4, image_size=16, horizon=2, batch_size=4)
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, data_dir=tiny_store_dir, dataset_range=12, horizon=2
        ),
        train=dataclasses.replace(
            cfg.train, epochs=1, batch_size=4,
            checkpoint_dir=str(tmp / "logs"), job_id="srv",
        ),
        mesh=MeshConfig(data=1),
    )
    fit(cfg, test_case="michael", progress=False)
    return cfg, os.path.join(cfg.train.checkpoint_dir, "srv", "checkpoints")


def _with_mesh(cfg, mesh):
    return cfg.replace(mesh=mesh)


@pytest.mark.slow
def test_predict_spmd_matches_single_device(trained_ckpt):
    """predict() at dp2×tp2×sp2 ≡ single device: same preds (the padded
    rows trimmed), same ragged-tail-exact metrics."""
    from multimodal_outage_tpu.train.loop import predict

    cfg, ckpt = trained_ckpt
    p1, t1, m1 = predict(cfg, ckpt, test_case="michael")
    p8, t8, m8 = predict(
        _with_mesh(cfg, MeshConfig(data=2, model=2, time=2)), ckpt,
        test_case="michael",
    )
    assert p8.shape == p1.shape and t8.shape == t1.shape
    np.testing.assert_allclose(p8, p1, atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(t8, t1)
    for k in ("loss", "mae", "mape", "rmse"):
        np.testing.assert_allclose(m8[k], m1[k], rtol=1e-4)


@pytest.mark.slow
def test_serve_eval_spmd_matches_single_device(trained_ckpt):
    """serve_eval() on the mesh ≡ single-device serve_eval: identical
    metrics and predictions; the latency harness still works on the
    padded full-size batches."""
    from multimodal_outage_tpu.train.loop import serve_eval

    cfg, ckpt = trained_ckpt
    p1, m1, _ = serve_eval(cfg, ckpt, test_case="michael", collect_preds=True)
    p8, m8, lat = serve_eval(
        _with_mesh(cfg, MeshConfig(data=2, model=2, time=2)), ckpt,
        test_case="michael", collect_preds=True, latency_stats=True,
    )
    assert p8.shape == p1.shape
    np.testing.assert_allclose(p8, p1, atol=1e-5, rtol=1e-4)
    for k in ("loss", "mae", "mape", "rmse"):
        np.testing.assert_allclose(m8[k], m1[k], rtol=1e-4)
    assert lat and np.isfinite(lat["p50_ms"])


def test_serving_model_mesh_matches_flax():
    """A mesh ServingModel (TP params, B-over-data requests) must equal
    model.apply(train=False) — same contract as the single-device engine."""
    import jax
    import jax.numpy as jnp

    from multimodal_outage_tpu.core.config import ModelConfig
    from multimodal_outage_tpu.core.mesh import make_mesh
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.serving import ServingModel

    n, t, h, b = 4, 2, 16, 4
    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg, horizon=t)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, t, h, h, 1), jnp.float32)
    feats = jnp.tile(jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (b, t, 1))
    sup = jnp.eye(n)[None]
    variables = model.init(
        {"params": key, "dropout": key}, x, feats, sup, train=False
    )
    y_flax = model.apply(variables, x, feats, sup, train=False)

    mesh = make_mesh(data=2, model=2, time=2)
    serve = ServingModel(cfg, dict(variables), sup, horizon=t, mesh=mesh)
    y_mesh = serve(x, feats)
    np.testing.assert_allclose(
        np.asarray(y_mesh), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )

    # kernel flags are single-device-only with a mesh
    with pytest.raises(ValueError, match="single-device"):
        ServingModel(
            cfg, dict(variables), sup, horizon=t, mesh=mesh, gwnet_stack=True
        )
    # request batch must divide the data axis
    with pytest.raises(ValueError, match="not divisible"):
        serve(x[:1], feats[:1])
