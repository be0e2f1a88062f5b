"""Native C++ batch-gather library: correctness vs numpy, build, fallback."""

import numpy as np
import pytest

from multimodal_outage_tpu.data import native


def test_native_builds_and_loads():
    assert native.native_available(), "libgather.so failed to build/load"


def test_gather_matches_numpy():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(20, 3, 8, 8)).astype(np.float32)
    idx = rng.integers(0, 20, size=37)
    out = native.gather_frames(frames, idx)
    np.testing.assert_array_equal(out, frames[idx])
    assert out.flags["C_CONTIGUOUS"]


def test_gather_repeated_and_boundary_indices():
    frames = np.arange(5 * 4, dtype=np.float32).reshape(5, 4)
    idx = np.array([0, 4, 4, 0, 2])
    out = native.gather_frames(frames, idx)
    np.testing.assert_array_equal(out, frames[idx])


def test_gather_empty():
    frames = np.zeros((3, 2, 2), np.float32)
    out = native.gather_frames(frames, np.array([], dtype=np.int64))
    assert out.shape == (0, 2, 2)


def test_gather_fallback_non_f32():
    frames = np.arange(12, dtype=np.float64).reshape(3, 4)
    out = native.gather_frames(frames, np.array([2, 0]))
    np.testing.assert_array_equal(out, frames[[2, 0]].astype(np.float32))


def test_gather_memmap(tmp_path):
    path = str(tmp_path / "frames.npy")
    frames = np.random.default_rng(1).normal(size=(10, 2, 4, 4)).astype(
        np.float32
    )
    np.save(path, frames)
    mm = np.load(path, mmap_mode="r")
    idx = np.array([9, 0, 5, 5])
    out = native.gather_frames(mm, idx)
    np.testing.assert_array_equal(out, frames[idx])
