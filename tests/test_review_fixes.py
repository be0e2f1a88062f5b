"""Regression tests for code-review findings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.core.config import (
    Config,
    GWNetConfig,
    ModelConfig,
)


def test_date2vec_random_init_magnitudes_sane():
    """Random-init embeddings of raw dates must be O(1), not O(10³) —
    they're concatenated with O(1) image features (review finding #1)."""
    from multimodal_outage_tpu.models.date2vec import Date2Vec

    m = Date2Vec(k=64)
    x = jnp.array([[0, 0, 0, 2022.0, 9.0, 26.0]])
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x, method=m.encode)
    assert float(jnp.max(jnp.abs(out))) < 10.0


def test_d2v_bundle_wired_into_train_state(tmp_path):
    """pretrain-d2v output is consumable via ModelConfig.d2v_bundle
    (review finding #1: the bundle previously had no consumer)."""
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.train.date2vec_pretrain import (
        pretrain_date2vec,
        save_bundle,
    )
    from multimodal_outage_tpu.train.state import create_train_state

    params, _ = pretrain_date2vec(k=64, steps=3, batch_size=16)
    path = str(tmp_path / "d2v.npz")
    save_bundle(params, path)

    cfg = ModelConfig(compute_dtype="float32", d2v_bundle=path)
    model = build_model(cfg, horizon=2)
    rng = jax.random.PRNGKey(0)
    batch = {
        "x": jnp.zeros((1, 3, 2, 16, 16, 1)),
        "y": jnp.zeros((1, 3, 2, 16, 16, 1)),
        "date_feats": jnp.zeros((1, 2, 6)),
    }
    state = create_train_state(
        model, rng, batch, jnp.eye(3)[None], d2v_bundle=cfg.d2v_bundle
    )
    np.testing.assert_array_equal(
        np.asarray(state.params["date2vec"]["fc1"]["kernel"]),
        np.asarray(params["fc1"]["kernel"]),
    )


def test_serving_rejects_unknown_st_gnn():
    """ServingModel must fail fast for unsupported st-GNNs (finding #3).
    Round 2: dcrnn is now served, so only unknown names reject."""
    import dataclasses

    from multimodal_outage_tpu.serving import ServingModel

    cfg = dataclasses.replace(ModelConfig(), st_gnn="bogus")
    with pytest.raises(NotImplementedError, match="gwnet"):
        ServingModel(cfg, {"params": {}, "batch_stats": {}}, None)


def test_serving_pads_non_power_of_two(tiny_store):
    """Serving expansion must pad-to-match like training (finding #5)."""
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.serving import ServingModel

    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg, horizon=2)
    key = jax.random.PRNGKey(0)
    # 48 → 24 → 12 → 6 → 3 spatial; conv_transpose gives 3→6→12→24→48 so
    # diffs are zero here; use 50 to force odd sizes: 50→25→12→6→3
    x = jax.random.normal(key, (1, 3, 2, 48, 48, 1))
    x50 = jax.random.normal(key, (1, 3, 2, 50, 50, 1))
    feats = jnp.zeros((1, 2, 6))
    sup = jnp.eye(3)[None]
    variables = model.init(
        {"params": key, "dropout": key}, x50, feats, sup, train=False
    )
    y_flax = model.apply(variables, x50, feats, sup, train=False)
    serve = ServingModel(cfg, variables, sup, interpret=False)
    y = serve(x50, feats)
    assert y.shape == y_flax.shape
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )


def test_county_order_mismatch_raises(tiny_store):
    """Permuted store county order vs adjacency CSV must fail loudly when
    the real adjacency is used (finding #6)."""
    from multimodal_outage_tpu.data.adjacency import load_adjacency_csv
    from multimodal_outage_tpu.data.store import NTLStore
    from multimodal_outage_tpu.train.loop import build_supports

    names, _ = load_adjacency_csv()
    cfg = Config(
        model=ModelConfig(
            gwnet=GWNetConfig(adjtype="doubletransition")
        )
    )
    shuffled = sorted(names, reverse=True)
    fake_store = NTLStore(
        frames=np.zeros((1, 67, 2, 2), np.float32),
        dates=np.array([[2022, 9, 26]], np.int32),
        county_names=shuffled,
        meta={},
    )
    with pytest.raises(ValueError, match="county order"):
        build_supports(cfg, 67, fake_store)
    # identity adjtype is order-invariant → no error
    cfg_id = Config(model=ModelConfig(gwnet=GWNetConfig(adjtype="identity")))
    build_supports(cfg_id, 67, fake_store)


def test_dcrnn_filter_type_selects_supports():
    """DCRNN's filter_type (reference kwargs interface) drives support
    construction: dual_random_walk → two random-walk matrices."""
    from multimodal_outage_tpu.core.config import DCRNNConfig
    from multimodal_outage_tpu.train.loop import build_supports

    cfg = Config(model=ModelConfig(st_gnn="dcrnn"))
    sup = build_supports(cfg, 10)
    assert sup.shape == (2, 10, 10)  # dual random walk
    np.testing.assert_allclose(
        np.asarray(sup[0]).sum(1).max(), 1.0, atol=1e-5
    )

    cfg_id = Config(
        model=ModelConfig(
            st_gnn="dcrnn", dcrnn=DCRNNConfig(filter_type="identity")
        )
    )
    sup = build_supports(cfg_id, 10)
    np.testing.assert_array_equal(np.asarray(sup[0]), np.eye(10))


def test_pipeline_budget_and_dtypes(tiny_store):
    """Budget reflects the actual on-device (f32) store size; x batches
    are bf16 while the store and y stay f32 (findings #7 + MAPE fidelity)."""
    from multimodal_outage_tpu.train.loop import make_pipeline

    cfg = Config()
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=tiny_store.image_size)
    )
    pipe = make_pipeline(cfg, tiny_store)
    assert pipe is not None
    assert pipe.frames.dtype == jnp.float32
    assert pipe.mean.dtype == jnp.bfloat16  # x batches come out bf16
