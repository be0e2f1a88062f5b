"""CLI dress rehearsal (round-4 mandate): the full real-data operational
story chained end-to-end through cli.main — synthetic raw tree → ingest →
ingest-monthly → train → evaluate (preds + metrics JSON + risk + raster
maps) → serve → import-torch of an exported reference-style checkpoint —
asserting every artifact exists and evaluate/serve metrics agree.

Each piece is covered individually elsewhere (test_cli, test_train,
test_viz, test_torch_import); this pins the CHAIN — flag plumbing, store
layout compatibility, checkpoint hand-off between subcommands (matching
the reference's lit.py:208-224 train → tlit.py:96-132 test/viz story).
"""

import json
import os

import numpy as np
import pytest

from multimodal_outage_tpu.cli import main

# one raw .npy per county/date, covering ±(range+horizon) days around all
# three hurricanes (leave-one-out needs train cases too)
_HURRICANES = [(2018, 10, 10), (2022, 9, 26), (2023, 8, 30)]
N, SIZE, HORIZON, RANGE = 4, 16, 2, 6


def _write_raw_tree(raw_dir):
    import datetime

    rng = np.random.default_rng(0)
    counties = [f"county_{i}" for i in range(N)]
    for county in counties:
        os.makedirs(os.path.join(raw_dir, county), exist_ok=True)
    for y, m, d in _HURRICANES:
        center = datetime.date(y, m, d)
        for off in range(-(RANGE + 2 * HORIZON), RANGE + 2 * HORIZON + 1):
            day = center + datetime.timedelta(days=off)
            for county in counties:
                arr = rng.gamma(2.0, 2.0, (SIZE, SIZE)).astype(np.float32)
                np.save(
                    os.path.join(
                        raw_dir, county, f"{day.year}_{day.month}_{day.day}.npy"
                    ),
                    arr,
                )
    return counties


def _write_monthly_tree(raw_dir, counties):
    from multimodal_outage_tpu.core.registry import RISK_MONTHS

    rng = np.random.default_rng(1)
    for county in counties:
        os.makedirs(os.path.join(raw_dir, county), exist_ok=True)
        for y, m, _ in _HURRICANES:
            # each event year's hardcoded "normal" months (reference
            # calculate_average_month_ntl, utils.py:247-283)
            for mm in RISK_MONTHS[y]:
                np.save(
                    os.path.join(raw_dir, county, f"monthly_{y}_{mm}.npy"),
                    rng.gamma(2.0, 2.0, (SIZE, SIZE)).astype(np.float32),
                )


def _flags(store, extra=()):
    return [
        "--data_dir", store, "--n_counties", str(N), "--image_size",
        str(SIZE), "--horizon", str(HORIZON), "--dataset_range", str(RANGE),
        "--batch_size", "4", "--compute_dtype", "float32", *extra,
    ]


# single-chip operational story for train/evaluate/serve: pin the mesh so
# the 8-virtual-device test env doesn't auto-resolve a dp=8 mesh that
# batch 4 can't divide (SPMD evaluate/serve has its own test,
# test_serve_spmd.py). import-torch takes no mesh flags, so this stays
# out of _flags.
_MESH1 = ("--mesh_data", "1")


@pytest.mark.slow
def test_cli_dress_rehearsal(tmp_path, capsys):
    raw = str(tmp_path / "raw")
    raw_monthly = str(tmp_path / "raw_monthly")
    store = str(tmp_path / "store")
    logs = str(tmp_path / "logs")

    counties = _write_raw_tree(raw)
    _write_monthly_tree(raw_monthly, counties)

    # 1. ingest the raw tree into a packed store
    assert main(
        ["ingest", "--raw_dir", raw, "--out_dir", store,
         "--image_size", str(SIZE)]
    ) == 0
    assert os.path.exists(os.path.join(store, "ntl.npy"))

    # 2. attach monthly composites (risk-map baseline sidecar)
    assert main(
        ["ingest-monthly", "--raw_dir", raw_monthly, "--store_dir", store,
         "--image_size", str(SIZE)]
    ) == 0
    capsys.readouterr()

    # 3. stats on the packed store
    assert main(["stats", "--data_dir", store, "--dataset_range",
                 str(RANGE)]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["std"] > 0

    # 4. train one epoch (leave michael out)
    os.makedirs(logs, exist_ok=True)
    cwd = os.getcwd()
    os.chdir(tmp_path)  # train writes logs/<job_id> under the cwd
    try:
        assert main(
            ["train", "--case", "michael", "--epochs", "1", "--job_id",
             "dress", *_flags(store, _MESH1)]
        ) == 0
        train_out = capsys.readouterr().out
        results = json.loads(train_out.strip().splitlines()[-1])
        assert np.isfinite(results["test_loss"])
        ckpt = os.path.join("logs", "dress", "checkpoints")
        assert os.listdir(ckpt)

        # 5. evaluate: preds, metrics JSON, risk maps, raster maps
        assert main(
            ["evaluate", "--checkpoint_path", ckpt, "--case", "michael",
             "--save_preds", "preds", "--metrics_json", "m.json",
             "--risk_maps", "risk", "--raster_maps", "raster",
             *_flags(store, _MESH1)]
        ) == 0
        capsys.readouterr()
        assert os.path.exists(os.path.join("preds", "preds.npy"))
        assert os.path.exists(os.path.join("preds", "targets.npy"))
        eval_metrics = json.load(open("m.json"))
        # train's end-of-fit test sweep == evaluate on the best ckpt
        # (checkpoint round-trip)
        np.testing.assert_allclose(
            eval_metrics["loss"], results["test_loss"], rtol=1e-5
        )
        assert any(f.endswith(".png") for _, _, fs in os.walk("risk")
                   for f in fs)
        assert any(f.endswith(".png") for _, _, fs in os.walk("raster")
                   for f in fs)

        # 6. serve the same checkpoint; metrics must agree with evaluate
        assert main(
            ["serve", "--checkpoint_path", ckpt, "--case", "michael",
             "--latency_stats", *_flags(store, _MESH1)]
        ) == 0
        serve_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        for k in ("loss", "mae", "rmse"):
            np.testing.assert_allclose(
                serve_out["metrics"][k], eval_metrics[k], rtol=1e-3
            )
        assert np.isfinite(serve_out["latency"]["p50_ms"])

        # 7. migration round trip: export the trained model as a
        # reference-style Lightning checkpoint, import-torch it, and
        # evaluate the imported checkpoint — same metrics
        torch = pytest.importorskip("torch")
        from multimodal_outage_tpu.core.checkpoint import CheckpointManager
        from multimodal_outage_tpu.parity.torch_import import (
            export_state_dict,
        )

        mgr = CheckpointManager(ckpt)
        restored = mgr.restore()
        mgr.close()
        sd = {
            f"model.{k}": torch.from_numpy(np.ascontiguousarray(v))
            for k, v in export_state_dict(
                {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
            ).items()
        }
        torch.save({"state_dict": sd}, "ref_style.ckpt")
        # the reference ships Date2Vec as a separate whole-module pickle
        # (utils.py:108-109) — export ours the same way so the migration
        # round trip is EXACT
        from multimodal_outage_tpu.parity.torch_import import (
            _register_date2vec_shim,
        )
        import sys as _sys

        _register_date2vec_shim()
        d2v_params = restored["params"]["date2vec"]
        d2v = _sys.modules["date2vec"].Date2Vec(k=64)
        with torch.no_grad():
            for fc in ("fc1", "fc2"):
                getattr(d2v, fc).weight.copy_(
                    torch.from_numpy(np.asarray(d2v_params[fc]["kernel"]).T)
                )
                getattr(d2v, fc).bias.copy_(
                    torch.from_numpy(np.asarray(d2v_params[fc]["bias"]))
                )
        torch.save(d2v, "d2v.pth")
        assert main(
            ["import-torch", "--checkpoint", "ref_style.ckpt",
             "--d2v_pth", "d2v.pth", "--out", "imported_ckpt",
             *_flags(store)]
        ) == 0
        capsys.readouterr()
        assert main(
            ["evaluate", "--checkpoint_path", "imported_ckpt", "--case",
             "michael", "--metrics_json", "m_imported.json",
             *_flags(store, _MESH1)]
        ) == 0
        capsys.readouterr()
        imported_metrics = json.load(open("m_imported.json"))
        # export → torch layout → import is numerically lossless (incl.
        # the ConvTranspose spatial flip): the migrated checkpoint must
        # reproduce the original evaluation
        np.testing.assert_allclose(
            imported_metrics["loss"], eval_metrics["loss"], rtol=1e-5
        )
    finally:
        os.chdir(cwd)
