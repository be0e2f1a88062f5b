"""Monthly-composite risk-map baseline (reference utils.py:234-303).

Covers: the store's monthly sidecar round-trip, the 3-month per-year
average against a hand-computed oracle, percent-of-normal values, the
risk-map CLI path using it, and ingest of a monthly raw tree.
"""

import os

import numpy as np
import pytest

from multimodal_outage_tpu.core.config import NTL_FILL_SENTINEL
from multimodal_outage_tpu.core.registry import RISK_MONTHS
from multimodal_outage_tpu.data.store import load_store, save_store


def _mini_store(tmp_path, with_monthly=True, n=3, s=8):
    rng = np.random.default_rng(0)
    d = 6
    frames = rng.uniform(0, 50, size=(d, n, s, s)).astype(np.float32)
    dates = np.asarray(
        [(2022, 9, 20 + i) for i in range(d)], dtype=np.int32
    )
    monthly = monthly_months = None
    if with_monthly:
        monthly_months = np.asarray(
            [(2022, m) for m in (6, 7, 8)] + [(2023, m) for m in (4, 5, 6)],
            dtype=np.int32,
        )
        monthly = rng.uniform(0, 40, size=(6, n, s, s)).astype(np.float32)
        monthly[0, 0, 0, 0] = NTL_FILL_SENTINEL  # exercise sentinel zeroing
    save_store(
        str(tmp_path),
        frames,
        dates,
        [f"county_{i:03d}" for i in range(n)],
        monthly=monthly,
        monthly_months=monthly_months,
    )
    return load_store(str(tmp_path))


def test_monthly_sidecar_roundtrip(tmp_path):
    store = _mini_store(tmp_path / "a")
    assert store.monthly is not None
    assert store.monthly.shape == (6, 3, 8, 8)
    assert store.monthly_months.shape == (6, 2)
    # sentinel zeroed at pack time (reference utils.py:272)
    assert store.monthly[0, 0, 0, 0] == 0.0

    bare = _mini_store(tmp_path / "b", with_monthly=False)
    assert bare.monthly is None


def test_monthly_normal_matches_hand_oracle(tmp_path):
    from multimodal_outage_tpu.viz.maps import monthly_normal, ntl_to_np

    store = _mini_store(tmp_path / "m")
    county = 1
    got = monthly_normal(store, county, 2022, out_size=8)

    # hand oracle: mean over Jun/Jul/Aug 2022 composites, each oriented
    # with the reference's transpose+rot90 (no denorm, no resize at 8→8)
    months = RISK_MONTHS[2022]
    rows = [
        i
        for i, (y, m) in enumerate(np.asarray(store.monthly_months))
        if y == 2022 and m in months
    ]
    oriented = [
        ntl_to_np(np.asarray(store.monthly[r, county])[None], 0.0, 1.0,
                  denorm=False)
        for r in rows
    ]
    np.testing.assert_allclose(got, np.mean(oriented, axis=0), rtol=1e-6)

    with pytest.raises(ValueError, match="Invalid date"):
        monthly_normal(store, county, 2019, out_size=8)


def test_percent_of_normal_formula():
    from multimodal_outage_tpu.viz.maps import percent_of_normal

    ntl = np.asarray([[9.0, 0.0], [99.0, 4.0]])
    normal = np.asarray([[9.0, 0.0], [49.0, 9.0]])
    # 100 * (ntl+1)/(normal+1)  (reference utils.py:243)
    np.testing.assert_allclose(
        percent_of_normal(ntl, normal),
        [[100.0, 100.0], [200.0, 50.0]],
    )


@pytest.mark.slow
def test_risk_maps_use_monthly_baseline(tmp_path):
    from multimodal_outage_tpu.viz.maps import save_risk_maps

    store = _mini_store(tmp_path / "rm")
    s_, n, t = 2, 3, 2
    preds = np.random.default_rng(1).normal(
        size=(s_, n, t, 8, 8, 1)
    ).astype(np.float32)
    fut = np.asarray(
        [[[2022, 9, 25], [2022, 9, 26]], [[2023, 5, 2], [2023, 5, 3]]],
        dtype=np.int32,
    )
    out = str(tmp_path / "maps")
    written = save_risk_maps(
        preds, store, out, mean=3.2, std=10.4,
        county_idx=(0, 1), future_dates=fut,
    )
    assert written and all(os.path.exists(p) for p in written)
    # files named by predicted-frame date (reference utils.py:327)
    assert any(p.endswith("2022_9_25.png") for p in written)
    assert any(p.endswith("2023_5_2.png") for p in written)


def test_ingest_monthly_directory(tmp_path):
    from multimodal_outage_tpu.data.acquisition import (
        ingest_monthly_directory,
    )

    store_dir = tmp_path / "store"
    store = _mini_store(store_dir, with_monthly=False)
    raw = tmp_path / "raw"
    rng = np.random.default_rng(2)
    for c in store.county_names:
        os.makedirs(raw / c)
        for y, m in ((2022, 6), (2022, 7)):
            np.save(
                raw / c / f"monthly_{y}_{m}.npy",
                rng.uniform(0, 30, size=(8, 8)).astype(np.float32),
            )
    monthly, months = ingest_monthly_directory(
        str(raw), str(store_dir), image_size=8
    )
    assert monthly.shape == (2, 3, 8, 8)
    assert months.tolist() == [[2022, 6], [2022, 7]]
    reloaded = load_store(str(store_dir))
    assert reloaded.monthly is not None
    np.testing.assert_allclose(np.asarray(reloaded.monthly), monthly)
