"""CLI smoke tests (in-process main(), CPU)."""

import json
import os

import numpy as np
import pytest

from multimodal_outage_tpu.cli import main


def test_synth_and_stats(tmp_path, capsys):
    out = str(tmp_path / "store")
    rc = main(
        [
            "synth", "--out_dir", out, "--n_counties", "3",
            "--image_size", "8", "--margin", "6", "--seed", "1",
        ]
    )
    assert rc == 0
    assert "wrote" in capsys.readouterr().out

    rc = main(["stats", "--data_dir", out, "--dataset_range", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["std"] > 0


def test_ingest_cli(tmp_path, capsys):
    raw = tmp_path / "raw"
    for county in ("a", "b"):
        (raw / county).mkdir(parents=True)
        for d in ("2022_9_25", "2022_9_26"):
            np.save(raw / county / f"{d}.npy", np.ones((8, 8), np.float32))
    rc = main(
        [
            "ingest", "--raw_dir", str(raw), "--out_dir",
            str(tmp_path / "packed"), "--image_size", "8",
        ]
    )
    assert rc == 0
    assert "packed" in capsys.readouterr().out


def test_pretrain_d2v_cli(tmp_path, capsys):
    out = str(tmp_path / "d2v.npz")
    rc = main(["pretrain-d2v", "--out", out, "--k", "8", "--steps", "3"])
    assert rc == 0
    assert os.path.exists(out)
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_loss"])


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_bench_lists_unknown_config():
    with pytest.raises(ValueError, match="unknown benchmark"):
        main(["bench", "--config", "nope"])
