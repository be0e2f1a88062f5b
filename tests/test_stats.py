import numpy as np

from multimodal_outage_tpu.core.registry import HURRICANES
from multimodal_outage_tpu.data.dataset import WindowDataset
from multimodal_outage_tpu.data.stats import compute_mean_std


def test_mean_std_matches_direct(tiny_store):
    mean, std = compute_mean_std(tiny_store, dataset_range=8, chunk=7)
    # direct computation over the same future tensors at horizon=1
    ds = WindowDataset.from_case_study(
        tiny_store, HURRICANES, dataset_range=8, horizon=1
    )
    futures = ds.gather_batch(np.arange(len(ds)))["future"]
    np.testing.assert_allclose(mean, futures.mean(), rtol=1e-6)
    np.testing.assert_allclose(std, futures.std(), rtol=1e-5)
