import datetime

import numpy as np
import pytest

from multimodal_outage_tpu.core.config import NTL_FILL_SENTINEL
from multimodal_outage_tpu.core.registry import HURRICANES, leave_one_out
from multimodal_outage_tpu.data.dataset import (
    WindowDataset,
    batch_indices,
    date_features,
    find_case_study_indices,
    train_val_split,
)
from multimodal_outage_tpu.data.store import load_store, save_store
from multimodal_outage_tpu.data.synthetic import generate_store, synthetic_dates


def test_store_roundtrip_and_sentinel(tmp_path):
    frames = np.full((3, 2, 4, 4), 5.0, np.float32)
    frames[0, 0, 0, 0] = NTL_FILL_SENTINEL
    dates = np.array([[2022, 9, 25], [2022, 9, 26], [2022, 9, 27]], np.int32)
    save_store(str(tmp_path), frames, dates, ["a", "b"])
    store = load_store(str(tmp_path))
    assert store.frames.shape == (3, 2, 4, 4)
    # sentinel zeroed at pack time (reference zeroes on load, utils.py:60)
    assert store.frames[0, 0, 0, 0] == 0.0
    assert store.frames[0, 0, 1, 1] == 5.0
    assert store.county_names == ["a", "b"]


def test_case_study_index_math():
    # reference find_case_study_dates: [p-range, p+range) exclusive end
    dates = synthetic_dates({"x": datetime.date(2020, 6, 15)}, margin=10)
    assert dates.shape[0] == 21
    idx = find_case_study_indices(
        dates, {"x": datetime.date(2020, 6, 15)}, dataset_range=3
    )
    np.testing.assert_array_equal(idx, [7, 8, 9, 10, 11, 12])  # p=10, [7,13)


def test_case_study_union_of_overlapping_windows():
    d1, d2 = datetime.date(2020, 6, 10), datetime.date(2020, 6, 14)
    dates = synthetic_dates({"a": d1, "b": d2}, margin=10)
    idx = find_case_study_indices(dates, {"a": d1, "b": d2}, dataset_range=3)
    # windows overlap → union without duplicates, sorted
    assert list(idx) == sorted(set(idx))


def test_window_len_and_offsets(tiny_store):
    ds = WindowDataset.from_case_study(
        tiny_store, HURRICANES, dataset_range=5, horizon=2
    )
    # len = n_selected − 2·horizon (reference utils.py:64-65)
    assert len(ds) == len(ds.indices) - 4
    batch = ds.gather_batch(np.array([0, 1]))
    n, h, w = (
        tiny_store.n_counties,
        tiny_store.image_size,
        tiny_store.image_size,
    )
    assert batch["past"].shape == (2, 2, n, h, w)
    assert batch["future"].shape == (2, 2, n, h, w)
    assert batch["date_feats"].shape == (2, 2, 6)
    # future window = past window shifted by horizon (reference utils.py:80-82)
    sel = ds.indices
    np.testing.assert_array_equal(
        batch["past"][0, 0], np.asarray(tiny_store.frames[sel[0]])
    )
    np.testing.assert_array_equal(
        batch["future"][0, 0], np.asarray(tiny_store.frames[sel[2]])
    )


def test_date_features_layout():
    d = np.array([[2022, 9, 26]], np.int32)
    f = date_features(d)
    np.testing.assert_array_equal(f, [[0, 0, 0, 2022, 9, 26]])


def test_train_val_split_deterministic():
    t1, v1 = train_val_split(100, 0.3, seed=42)
    t2, v2 = train_val_split(100, 0.3, seed=42)
    np.testing.assert_array_equal(t1, t2)
    assert len(v1) == 30 and len(t1) == 70
    assert set(t1).isdisjoint(set(v1))
    t3, _ = train_val_split(100, 0.3, seed=43)
    assert not np.array_equal(t1, t3)


def test_batch_indices_cover_all():
    seen = []
    for b in batch_indices(10, 4, shuffle=True, seed=0):
        seen.extend(b.tolist())
    assert sorted(seen) == list(range(10))


def test_leave_one_out_protocol():
    train_val, test = leave_one_out("michael")
    assert set(test) == {"michael"}
    assert set(train_val) == {"ian", "idalia"}
    with pytest.raises(ValueError):
        leave_one_out("katrina")


def test_missing_case_date_raises(tiny_store):
    with pytest.raises(KeyError):
        find_case_study_indices(
            tiny_store.dates, {"x": datetime.date(1999, 1, 1)}, 3
        )
