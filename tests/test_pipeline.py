import jax
import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.data.pipeline import (
    PrefetchIterator,
    denormalize,
    preprocess_batch,
)


def _host_batch(b=2, t=3, n=4, s=16):
    rng = np.random.default_rng(0)
    return {
        "past": rng.normal(size=(b, t, n, s, s)).astype(np.float32),
        "future": rng.normal(size=(b, t, n, s, s)).astype(np.float32),
        "date_feats": np.zeros((b, t, 6), np.float32),
    }


def test_preprocess_layout_and_normalization():
    batch = _host_batch()
    out = preprocess_batch(
        jax.device_put(batch), jnp.float32(2.0), jnp.float32(4.0), 16
    )
    assert out["x"].shape == (2, 4, 3, 16, 16, 1)
    # permute [B,T,N,H,W] → [B,N,T,H,W,1] (reference lit.py:31) + normalize
    expected = (batch["past"].transpose(0, 2, 1, 3, 4) - 2.0) / 4.0
    np.testing.assert_allclose(
        np.asarray(out["x"][..., 0]), expected, atol=1e-6
    )


def test_preprocess_resize():
    batch = _host_batch(s=8)
    out = preprocess_batch(
        jax.device_put(batch), jnp.float32(0.0), jnp.float32(1.0), 16
    )
    assert out["x"].shape == (2, 4, 3, 16, 16, 1)


def test_denormalize_roundtrip():
    x = jnp.array([0.5, -1.0])
    y = denormalize((x - 3.0) / 2.0, 3.0, 2.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_prefetch_iterator_yields_all():
    batches = [_host_batch() for _ in range(3)]
    it = PrefetchIterator(iter(batches), mean=0.0, std=1.0, image_size=16)
    out = list(it)
    assert len(out) == 3
    for o in out:
        assert o["x"].shape == (2, 4, 3, 16, 16, 1)


def test_device_pipeline_matches_host_path(tiny_store):
    """HBM-resident gather produces the same batches as the host path."""
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline

    ds = WindowDataset.from_case_study(
        tiny_store, HURRICANES, dataset_range=5, horizon=2
    )
    mean, std = 2.0, 3.0
    pipe = DevicePipeline(
        tiny_store, mean, std, tiny_store.image_size, dtype=jnp.float32
    )
    idx = np.array([0, 2])
    dev = pipe.batch(ds, idx)

    host = ds.gather_batch(idx)
    host_dev = preprocess_batch(
        jax.device_put(host),
        jnp.float32(mean),
        jnp.float32(std),
        tiny_store.image_size,
    )
    for k in ("x", "y", "date_feats"):
        np.testing.assert_allclose(
            np.asarray(dev[k]), np.asarray(host_dev[k]), atol=1e-6
        )


def test_device_pipeline_bf16_default(tiny_store):
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline

    ds = WindowDataset.from_case_study(
        tiny_store, HURRICANES, dataset_range=5, horizon=2
    )
    pipe = DevicePipeline(tiny_store, 2.0, 3.0, tiny_store.image_size)
    b = pipe.batch(ds, np.array([0]))
    # model input in bf16; targets stay f32 for metric fidelity (MAPE's
    # near-zero denominators amplify target quantization)
    assert b["x"].dtype == jnp.bfloat16
    assert b["y"].dtype == jnp.float32
    host = ds.gather_batch(np.array([0]))
    expected_x = (host["past"].transpose(0, 2, 1, 3, 4) - 2.0) / 3.0
    np.testing.assert_allclose(
        np.asarray(b["x"][..., 0], np.float32), expected_x, atol=0.1, rtol=0.02
    )
    expected_y = (host["future"].transpose(0, 2, 1, 3, 4) - 2.0) / 3.0
    np.testing.assert_allclose(
        np.asarray(b["y"][..., 0]), expected_y, atol=2e-2, rtol=1e-2
    )


def test_prefetch_iterator_propagates_errors():
    def gen():
        yield _host_batch()
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), mean=0.0, std=1.0, image_size=16)
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_iterator_abandoned_consumer_shuts_down():
    """A consumer that stops early must not leave the producer thread
    blocked on a full queue (round-1 review: shutdown leak)."""
    import time

    def gen():
        for _ in range(50):
            yield _host_batch()

    it = PrefetchIterator(gen(), mean=0.0, std=1.0, image_size=16, depth=1)
    for batch in it:
        break  # abandon after one batch
    it.close()
    deadline = time.time() + 10
    while it._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not it._thread.is_alive()
