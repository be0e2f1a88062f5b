"""Injectable per-batch transform (reference BlackMarbleDataset's
`transform` parameter, utils.py:14,35-38): a pure dict→dict function
applied after the built-in resize+normalize, honored by every batch
stream (fit / evaluate / predict / serve_eval via _epoch_iter)."""

import dataclasses

import jax
import numpy as np
import pytest

from multimodal_outage_tpu.core.config import small_test_config


def _cfg(tiny_store_dir, tmp_path, job_id):
    cfg = small_test_config(n_counties=4, image_size=16, horizon=2, batch_size=4)
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, data_dir=tiny_store_dir, dataset_range=12, horizon=2
        ),
        train=dataclasses.replace(
            cfg.train, epochs=1, batch_size=4,
            checkpoint_dir=str(tmp_path / "logs"), job_id=job_id,
        ),
    )


@pytest.mark.slow
def test_transform_reaches_every_stream(tiny_store_dir, tmp_path):
    from multimodal_outage_tpu.train.loop import fit, predict

    cfg = _cfg(tiny_store_dir, tmp_path, "tr")
    fit(cfg, test_case="michael", progress=False)
    ckpt = str(tmp_path / "logs" / "tr" / "checkpoints")

    calls = []

    @jax.jit
    def zero_inputs(batch):
        return {**batch, "x": batch["x"] * 0.0}

    def spy(batch):
        calls.append(1)
        return zero_inputs(batch)

    p_plain, t_plain, m_plain = predict(cfg, ckpt, test_case="michael")
    p_zero, t_zero, m_zero = predict(
        cfg, ckpt, test_case="michael", transform=spy
    )
    assert calls  # the hook actually ran
    # zeroed inputs change predictions but not targets
    assert not np.allclose(p_zero, p_plain)
    np.testing.assert_array_equal(t_zero, t_plain)
    assert m_zero["loss"] != m_plain["loss"]


@pytest.mark.slow
def test_fit_accepts_transform(tiny_store_dir, tmp_path):
    from multimodal_outage_tpu.train.loop import fit

    cfg = _cfg(tiny_store_dir, tmp_path, "tr2")
    seen = []

    def identity(batch):
        seen.append(1)
        return batch

    results = fit(
        cfg, test_case="michael", progress=False, transform=identity
    )
    assert seen and np.isfinite(results["val_loss"])
