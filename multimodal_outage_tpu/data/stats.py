"""Streaming normalization statistics.

Equivalent of the reference's find_mean_std.py script: stream every future
tensor at horizon=1 over all three hurricanes, accumulate sum and sum of
squares, report global mean / std (reference find_mean_std.py:19-43).
Here it is a library function + CLI subcommand over the packed store.
"""

from __future__ import annotations

import datetime
from typing import Dict, Tuple

import numpy as np

from multimodal_outage_tpu.core.registry import HURRICANES
from multimodal_outage_tpu.data.dataset import WindowDataset
from multimodal_outage_tpu.data.store import NTLStore


def compute_mean_std(
    store: NTLStore,
    case_study: Dict[str, datetime.date] | None = None,
    dataset_range: int = 30,
    chunk: int = 32,
) -> Tuple[float, float]:
    """Global mean/std over future tensors at horizon=1.

    Matches find_mean_std.py semantics: the dataset is built over the entire
    hurricane set (find_mean_std.py:13-15) and statistics accumulate over
    each sample's future frame (find_mean_std.py:27-32); population variance
    var = E[x²] − E[x]² (find_mean_std.py:40).
    """
    case_study = case_study or HURRICANES
    ds = WindowDataset.from_case_study(
        store, case_study, dataset_range=dataset_range, horizon=1
    )
    total = 0.0
    total_sq = 0.0
    count = 0
    n = len(ds)
    for start in range(0, n, chunk):
        idx = np.arange(start, min(start + chunk, n))
        batch = ds.gather_batch(idx)
        fut = batch["future"].astype(np.float64)
        total += fut.sum()
        total_sq += np.square(fut).sum()
        count += fut.size
    mean = total / count
    var = total_sq / count - mean**2
    return float(mean), float(np.sqrt(max(var, 0.0)))
