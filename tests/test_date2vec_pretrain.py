import jax
import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.train.date2vec_pretrain import (
    date_vector_dataset,
    install_bundle,
    load_bundle,
    pretrain_date2vec,
    save_bundle,
)


def test_date_vector_dataset():
    data = date_vector_dataset(2020, 2020)
    assert data.shape == (366, 6)  # 2020 is a leap year
    np.testing.assert_array_equal(data[0], [0, 0, 0, 2020, 1, 1])
    np.testing.assert_array_equal(data[-1], [0, 0, 0, 2020, 12, 31])


def test_pretrain_converges_and_roundtrips(tmp_path):
    params, loss = pretrain_date2vec(k=16, steps=300, batch_size=64)
    assert np.isfinite(loss) and loss < 1.0  # normalized-scale reconstruction

    path = str(tmp_path / "d2v.npz")
    save_bundle(params, path)
    restored = load_bundle(path)
    for layer in ("fc1", "fc2", "fc3", "fc4", "fc5"):
        np.testing.assert_array_equal(
            restored[layer]["kernel"], np.asarray(params[layer]["kernel"])
        )


def test_normalization_fold_is_exact():
    """Folded fc layers on raw dates == trained layers on normalized."""
    from multimodal_outage_tpu.train.date2vec_pretrain import (
        _OFFSET,
        _SCALE,
        _fold_normalization,
    )

    rng = np.random.default_rng(0)
    params = {
        layer: {
            "kernel": rng.normal(size=(6, 8)).astype(np.float32),
            "bias": rng.normal(size=(8,)).astype(np.float32),
        }
        for layer in ("fc1", "fc2", "fc3", "fc4", "fc5")
    }
    folded = _fold_normalization(params)
    x_raw = np.array([[0, 0, 0, 2022, 9, 26]], np.float32)
    x_norm = (x_raw - _OFFSET) / _SCALE
    for layer in ("fc1", "fc2"):
        orig = x_norm @ params[layer]["kernel"] + params[layer]["bias"]
        new = x_raw @ folded[layer]["kernel"] + folded[layer]["bias"]
        np.testing.assert_allclose(new, orig, atol=1e-4)


def test_install_bundle_into_fusion(tmp_path):
    from multimodal_outage_tpu.core.config import ModelConfig
    from multimodal_outage_tpu.models.fusion import build_model

    params, _ = pretrain_date2vec(k=64, steps=5, batch_size=32)
    path = str(tmp_path / "d2v.npz")
    save_bundle(params, path)

    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg, horizon=2)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3, 2, 16, 16, 1))
    feats = jnp.zeros((1, 2, 6))
    sup = jnp.eye(3)[None]
    variables = model.init(
        {"params": key, "dropout": key}, x, feats, sup, train=False
    )
    new_params = install_bundle(variables["params"], load_bundle(path))
    np.testing.assert_array_equal(
        np.asarray(new_params["date2vec"]["fc1"]["kernel"]),
        np.asarray(params["fc1"]["kernel"]),
    )
    # model still runs with the installed bundle
    y = model.apply(
        {"params": new_params, "batch_stats": variables["batch_stats"]},
        x, feats, sup, train=False,
    )
    assert y.shape == (1, 3, 2, 16, 16, 1)
