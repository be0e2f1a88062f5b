"""RunLogger: JSONL always; optional TensorBoard scalars (SURVEY §5
"optional TensorBoard scalars" — the reference's Lightning-logger
equivalent, reference lit.py:39-42)."""

import glob
import json
import sys
import warnings

import pytest

from multimodal_outage_tpu.core.run_logging import RunLogger


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(l) for l in f]


def test_jsonl_only_by_default(tmp_path):
    lg = RunLogger(str(tmp_path / "run"))
    lg.log({"phase": "train", "epoch": 0, "step": 3, "train_loss": 1.5})
    lg.close()
    rows = _read_jsonl(tmp_path / "run" / "metrics.jsonl")
    assert rows[0]["train_loss"] == 1.5
    assert not (tmp_path / "run" / "tb").exists()


def test_tensorboard_scalars_written(tmp_path):
    try:
        import tensorboardX  # noqa: F401
    except ImportError:
        try:
            from torch.utils import tensorboard  # noqa: F401
        except ImportError:
            pytest.skip("no TensorBoard writer available")
    lg = RunLogger(str(tmp_path / "run"), tensorboard=True)
    lg.log({"phase": "train", "epoch": 0, "step": 6, "train_loss": 1.25})
    lg.log({"phase": "val", "epoch": 0, "val_loss": 0.75})
    # non-numeric values are skipped, not crashed on
    lg.log({"phase": "final", "best_epoch": 2, "note": "not-a-number"})
    lg.close()
    events = glob.glob(str(tmp_path / "run" / "tb" / "events.out.tfevents*"))
    assert events, "no TensorBoard event file written"
    # JSONL unaffected by the TB fan-out
    rows = _read_jsonl(tmp_path / "run" / "metrics.jsonl")
    assert [r["phase"] for r in rows] == ["train", "val", "final"]


def test_tensorboard_degrades_to_jsonl_without_writers(tmp_path, monkeypatch):
    """With neither tensorboardX nor torch importable, tensorboard=True
    warns once and the logger keeps writing JSONL."""
    monkeypatch.setitem(sys.modules, "tensorboardX", None)
    monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", None)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lg = RunLogger(str(tmp_path / "run"), tensorboard=True)
    assert any("scalars disabled" in str(x.message) for x in w)
    lg.log({"phase": "train", "epoch": 0, "train_loss": 2.0})
    lg.close()
    rows = _read_jsonl(tmp_path / "run" / "metrics.jsonl")
    assert rows[0]["train_loss"] == 2.0


def test_cli_tensorboard_flag_maps_to_config():
    import argparse

    from multimodal_outage_tpu.cli import _build_config

    base = dict(
        st_gnn="gwnet", input_channels=1, output_channels=1,
        compute_dtype="float32", batch_size=2, data_dir="/tmp/x",
        dataset_range=4, horizon=2, image_size=16, n_counties=4,
    )
    on = _build_config(argparse.Namespace(**base, tensorboard=True))
    off = _build_config(argparse.Namespace(**base))
    assert on.train.tensorboard is True
    assert off.train.tensorboard is False
