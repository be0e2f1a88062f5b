"""Sliding-window dataset over the packed NTL store.

TPU-native equivalent of the reference BlackMarbleDataset
(reference utils.py:13-105): identical index math —
  len = n_selected_dates − 2·horizon              (utils.py:64-65)
  past   = frames[i : i+horizon]                  (utils.py:80)
  future = frames[i+horizon : i+2·horizon]        (utils.py:82)
  date features from the PAST window's dates      (utils.py:94)
— but a sample is a vectorized gather on a memmap, not 938 pickle loads.

Case-study filtering mirrors find_case_study_dates (utils.py:132-147):
for each hurricane date at position p in the sorted date list, keep
positions [p−range, p+range) (exclusive end, as the reference slices).
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from multimodal_outage_tpu.data.store import NTLStore


def find_case_study_indices(
    dates: np.ndarray,
    case_study: Dict[str, datetime.date],
    dataset_range: int,
) -> np.ndarray:
    """Positions into `dates` within ±dataset_range of each case date.

    `dates` is the store's sorted [D, 3] (y, m, d) table. Matches reference
    utils.py:139-146: start = p − range, end = p + range, python-slice
    semantics (start clamped at 0, end exclusive), union, sorted.
    """
    date_list = [datetime.date(*map(int, row)) for row in dates]
    pos = {d: i for i, d in enumerate(date_list)}
    selected: set[int] = set()
    for d in case_study.values():
        if d not in pos:
            raise KeyError(f"case-study date {d} not present in store dates")
        p = pos[d]
        start = max(p - dataset_range, 0)
        end = min(p + dataset_range, len(date_list))
        selected.update(range(start, end))
    return np.asarray(sorted(selected), dtype=np.int64)


def date_features(dates: np.ndarray) -> np.ndarray:
    """[K, 3] (y,m,d) → [K, 6] float32 Date2Vec input [0,0,0,y,m,d].

    The reference builds [00, 00, 00, year, month, day] from the filename
    (reference utils.py:124-126).
    """
    k = dates.shape[0]
    out = np.zeros((k, 6), dtype=np.float32)
    out[:, 3:] = dates.astype(np.float32)
    return out


@dataclass
class WindowDataset:
    """Index math + gather over a filtered subset of store dates.

    Samples are raw (unnormalized) — normalization happens on device in the
    jitted preprocess (see pipeline.py), fusing the reference's host-side
    torchvision Normalize (utils.py:35-38) into the TPU input path.
    """

    store: NTLStore
    indices: np.ndarray  # positions into store.frames, sorted
    horizon: int

    @classmethod
    def from_case_study(
        cls,
        store: NTLStore,
        case_study: Dict[str, datetime.date],
        dataset_range: int,
        horizon: int,
    ) -> "WindowDataset":
        idx = find_case_study_indices(store.dates, case_study, dataset_range)
        return cls(store=store, indices=idx, horizon=horizon)

    def __len__(self) -> int:
        return max(len(self.indices) - 2 * self.horizon, 0)

    def sample_dates(self, i: int) -> np.ndarray:
        """[horizon, 3] dates of the past window of sample i."""
        sel = self.indices[i : i + self.horizon]
        return self.store.dates[sel]

    def window_positions(self, batch_idx: np.ndarray) -> np.ndarray:
        """[B, 2·horizon] store-frame positions for each sample's
        past+future window (no frame data touched — feeds the
        device-resident gather path)."""
        batch_idx = np.asarray(batch_idx, dtype=np.int64)
        win = batch_idx[:, None] + np.arange(2 * self.horizon)[None, :]
        return self.indices[win]

    def future_window_dates(self, batch_idx: np.ndarray) -> np.ndarray:
        """[B, horizon, 3] (y, m, d) dates of each sample's FUTURE window —
        the predicted frames' dates (the reference derives these from the
        image filename at idx + horizon + dataset.horizon, utils.py:327)."""
        pos = self.window_positions(batch_idx)[:, self.horizon :]
        dates = self.store.dates[pos.reshape(-1)]
        return dates.reshape(len(np.atleast_1d(batch_idx)), self.horizon, 3)

    def window_date_feats(self, batch_idx: np.ndarray) -> np.ndarray:
        """[B, horizon, 6] Date2Vec inputs for each sample's past window."""
        pos = self.window_positions(batch_idx)[:, : self.horizon]
        dates = self.store.dates[pos.reshape(-1)]
        return date_features(dates).reshape(len(batch_idx), self.horizon, 6)

    def gather_batch(self, batch_idx: np.ndarray) -> Dict[str, np.ndarray]:
        """Vectorized batch assembly.

        Returns host arrays:
          past:       [B, T, N, H, W] float32 raw radiance
          future:     [B, T, N, H, W]
          date_feats: [B, T, 6] float32 (Date2Vec inputs for past dates)
        """
        h = self.horizon
        batch_idx = np.asarray(batch_idx, dtype=np.int64)
        store_pos = self.window_positions(batch_idx)  # [B, 2h]
        from multimodal_outage_tpu.data.native import gather_frames

        frames = gather_frames(self.store.frames, store_pos.reshape(-1))
        b = batch_idx.shape[0]
        n, hh, ww = frames.shape[1:]
        frames = frames.reshape(b, 2 * h, n, hh, ww)
        past, future = frames[:, :h], frames[:, h:]
        dates = self.store.dates[store_pos[:, :h].reshape(-1)]
        feats = date_features(dates).reshape(b, h, 6)
        return {"past": past, "future": future, "date_feats": feats}


def train_val_split(
    n: int, val_fraction: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic random 70/30 split (reference lit.py:161-163 uses
    torch random_split under global seed 42)."""
    n_val = int(n * val_fraction)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    return np.sort(perm[n_val:]), np.sort(perm[:n_val])


def batch_indices(
    n: int,
    batch_size: int,
    shuffle: bool,
    seed: int,
    drop_last: bool = False,
) -> Iterator[np.ndarray]:
    """Yield index batches; shuffled per-epoch when shuffle=True."""
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed).permutation(n)
    end = (n // batch_size) * batch_size if drop_last else n
    for s in range(0, end, batch_size):
        yield order[s : s + batch_size]
