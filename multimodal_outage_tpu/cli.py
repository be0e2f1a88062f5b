"""Command-line interface.

Subcommands mirroring the reference entry points (SURVEY §1 L6):
  train     — lit.py equivalent (flags: --st_gnn --epochs --case
              --batch_size --horizon --dataset_range --job_id, lit.py:208-219)
  evaluate  — tlit.py equivalent (--checkpoint_path --case --horizon ...)
  stats     — find_mean_std.py equivalent
  synth     — synthetic fixture generator (the dataset is cluster-only)
  bench     — benchmark suite driver
  import-torch — reference Lightning/torch checkpoint → framework ckpt
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _grad_accum_arg(v: str) -> int:
    """--grad_accum value: a positive int, or 'auto' (= 0 internally,
    TrainConfig.grad_accum) for OOM-driven microbatch halving."""
    if v.strip().lower() == "auto":
        return 0
    try:
        return int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an integer or 'auto', got {v!r}"
        ) from None


def _add_common_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--st_gnn", type=str, default="gwnet", help="gwnet|dcrnn")
    p.add_argument("--horizon", type=int, default=7)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--data_dir", type=str, default="data/synthetic")
    p.add_argument("--dataset_range", type=int, default=30)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--n_counties", type=int, default=67)
    p.add_argument("--input_channels", type=int, default=1)
    p.add_argument("--output_channels", type=int, default=1)
    p.add_argument(
        "--compute_dtype", type=str, default="bfloat16", help="bfloat16|float32"
    )
    p.add_argument(
        "--d2v_bundle", type=str, default=None,
        help=".npz Date2Vec bundle from pretrain-d2v",
    )
    p.add_argument(
        "--adjacency", type=str, default=None,
        help="adjacency CSV path (default: packaged Florida asset, "
        "reference data/graph/adj_mx_fl.csv)",
    )
    p.add_argument(
        "--adjtype", type=str, default=None,
        help="identity|transition|doubletransition (gwnet support set; "
        "reference models/graph_wavenet.py:13-32). Default: identity, "
        "matching the reference's degenerate doubletransition.",
    )
    p.add_argument(
        "--no_gcn", action="store_true",
        help="disable graph convolution entirely "
        "(reference gcn_bool=False, graph_wavenet.py:100,240)",
    )
    p.add_argument(
        "--no_addaptadj", action="store_true",
        help="disable the learned adaptive adjacency (reference addaptadj)",
    )
    p.add_argument(
        "--svd_aptinit", action="store_true",
        help="SVD-init the adaptive-adjacency node embeddings from the "
        "first static support (reference randomadj=False/aptinit path)",
    )
    p.add_argument(
        "--gwnet_kernel_size", type=int, default=None,
        help="temporal conv kernel size (reference default 1 ⇒ "
        "receptive field 1; >1 enables the dilated causal path)",
    )
    p.add_argument(
        "--teacher_forcing", type=float, default=0.0,
        help="DCRNN scheduled sampling: initial probability of feeding "
        "the decoder the encoded ground-truth future frame instead of "
        "its own output during training (canonical DCRNN curriculum; "
        "eval/serving always self-feed). 0 disables.",
    )
    p.add_argument(
        "--tf_decay_steps", type=int, default=0,
        help="with --teacher_forcing: inverse-sigmoid decay constant τ "
        "(p(step) = p0·τ/(τ+e^{step/τ}), the DCRNN cl_decay_steps "
        "curriculum). 0 keeps the probability constant.",
    )
    p.add_argument(
        "--bn_two_pass", action="store_true",
        help="use the two-pass BatchNorm statistics (bit-closest torch"
        " arithmetic) instead of the default single fused sweep"
        " (+4.7%% train throughput, BENCHMARKS.md)",
    )
    p.add_argument(
        "--remat", action="store_true",
        help="rematerialize U-Net conv blocks in backward (jax.checkpoint):"
        " ~⅓ more conv FLOPs for much less activation HBM — enables"
        " batch 16+ on a single v5e chip",
    )
    p.add_argument(
        "--remat_scope", choices=["all", "stem", "conv"], default="all",
        help="with --remat: 'stem' checkpoints only the top-two-"
        "resolution blocks (inc/down1/up3/up4) — cheaper than 'all' "
        "(−24%% vs −42%% throughput at b=8) while freeing the "
        "activations that dominate HBM; 'all' checkpoints every block; "
        "'conv' checkpoints every block but keeps conv/convT outputs "
        "saved (save_only_these_names policy) so only the cheap "
        "BN/ReLU/pool/concat tails recompute",
    )
    p.add_argument(
        "--grad_accum", type=_grad_accum_arg, default=1,
        help="split each batch into N serially-scanned microbatches in one "
        "compiled step: peak activation HBM of one microbatch, exact "
        "full-batch gradients and serial-EMA BatchNorm running stats — "
        "trains the reference's default batch 16 on a 16 GB chip "
        "(--batch_size 16 --grad_accum 2). 'auto' (or 0) starts one-shot "
        "and halves the microbatch on device OOM until the step fits",
    )
    p.add_argument(
        "--xla_vmem_limit_kib", type=int, default=49152,
        help="scoped-VMEM fusion budget (KiB) passed to the TPU compiler "
        "for the train step (49152 measured +1.0%% over the 16 MiB "
        "default — BENCHMARKS.md); 0 keeps the compiler default",
    )
    p.add_argument(
        "--pool", choices=["reduce_window", "pairwise", "pallas"],
        default="reduce_window",
        help="2×2 max-pool lowering (reduce_window: flax nn.max_pool, "
        "measured fastest e2e; pairwise: strided-slice maximums, "
        "measured 23%% slower at b=8; pallas: layout-stable fused "
        "fwd/bwd kernel pair, ops/pool_pallas.py — see BENCHMARKS.md "
        "layout matrix)",
    )


def _add_mesh_flags(p):
    """SPMD mesh axes — accepted by train, evaluate, and serve (inference
    and serving run on the mesh too, not just fit)."""
    p.add_argument(
        "--mesh_data", type=int, default=-1,
        help="data-parallel mesh axis size (-1: all devices left over "
        "after model*time; 1 with one chip ⇒ plain single-device)",
    )
    p.add_argument(
        "--mesh_model", type=int, default=1,
        help="tensor-parallel axis (bottleneck MLP hidden dims)",
    )
    p.add_argument(
        "--mesh_time", type=int, default=1,
        help="sequence-parallel axis (temporal window T)",
    )


def _build_config(args):
    from multimodal_outage_tpu.core.config import (
        Config,
        DataConfig,
        DCRNNConfig,
        GWNetConfig,
        MeshConfig,
        ModelConfig,
        TrainConfig,
    )

    data = DataConfig(
        data_dir=args.data_dir,
        horizon=args.horizon,
        dataset_range=args.dataset_range,
        image_size=args.image_size,
        n_counties=args.n_counties,
        shard_store=getattr(args, "shard_store", False),
    )
    gwnet_kw = {}
    if getattr(args, "adjtype", None):
        gwnet_kw["adjtype"] = args.adjtype
    if getattr(args, "no_gcn", False):
        gwnet_kw["gcn_bool"] = False
    if getattr(args, "no_addaptadj", False):
        gwnet_kw["addaptadj"] = False
    if getattr(args, "svd_aptinit", False):
        gwnet_kw["randomadj"] = False
    if getattr(args, "gwnet_kernel_size", None):
        gwnet_kw["kernel_size"] = args.gwnet_kernel_size
    model = ModelConfig(
        st_gnn=args.st_gnn,
        input_channels=args.input_channels,
        output_channels=args.output_channels,
        compute_dtype=args.compute_dtype,
        d2v_bundle=getattr(args, "d2v_bundle", None),
        remat=getattr(args, "remat", False),
        remat_scope=getattr(args, "remat_scope", "all"),
        pool=getattr(args, "pool", "reduce_window"),
        bn_single_pass=not getattr(args, "bn_two_pass", False),
        gwnet=GWNetConfig(**gwnet_kw),
        dcrnn=DCRNNConfig(
            teacher_forcing=getattr(args, "teacher_forcing", 0.0),
            tf_decay_steps=getattr(args, "tf_decay_steps", 0),
        ),
    )
    train = TrainConfig(
        epochs=getattr(args, "epochs", 5),
        batch_size=args.batch_size,
        grad_accum=getattr(args, "grad_accum", 1),
        xla_vmem_limit_kib=getattr(args, "xla_vmem_limit_kib", 49152),
        job_id=getattr(args, "job_id", "test"),
        seed=getattr(args, "seed", 42),
        resume=getattr(args, "resume", False),
        tensorboard=getattr(args, "tensorboard", False),
        profile_dir=getattr(args, "profile_dir", None),
        debug_nans=getattr(args, "debug_nans", False),
    )
    mesh = MeshConfig(
        data=getattr(args, "mesh_data", -1),
        model=getattr(args, "mesh_model", 1),
        time=getattr(args, "mesh_time", 1),
    )
    return Config(
        data=data, model=model, train=train, mesh=mesh,
        adjacency_csv=getattr(args, "adjacency", None),
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="multimodal_outage_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="Train the fusion model")
    _add_common_model_flags(p_train)
    p_train.add_argument("--epochs", type=int, default=5)
    p_train.add_argument("--case", type=str, default="michael")
    p_train.add_argument("--job_id", type=str, default="test")
    p_train.add_argument("--seed", type=int, default=42)
    p_train.add_argument(
        "--num_runs", type=int, default=1, help="Repeat the experiment N times"
    )
    p_train.add_argument(
        "--resume", action="store_true", help="Continue from latest checkpoint"
    )
    p_train.add_argument(
        "--tensorboard", action="store_true",
        help="Also write TensorBoard scalars to <run_dir>/tb "
        "(needs tensorboardX or torch; metrics.jsonl always written)",
    )
    p_train.add_argument(
        "--profile_dir", type=str, default=None,
        help="Capture a jax.profiler trace of a few train steps here",
    )
    p_train.add_argument(
        "--debug_nans", action="store_true", help="Enable jax_debug_nans"
    )
    _add_mesh_flags(p_train)
    p_train.add_argument(
        "--shard_store", action="store_true",
        help="partition the HBM frame store over the data mesh axis "
        "(each chip holds D/dp frames) instead of replicating it",
    )
    p_train.add_argument(
        "--coordinator_address", type=str, default=None,
        help="multi-host: jax.distributed coordinator host:port",
    )
    p_train.add_argument("--num_processes", type=int, default=None)
    p_train.add_argument("--process_id", type=int, default=None)

    p_eval = sub.add_parser("evaluate", help="Evaluate a checkpoint")
    _add_common_model_flags(p_eval)
    _add_mesh_flags(p_eval)
    p_eval.add_argument("--checkpoint_path", type=str, required=True)
    p_eval.add_argument("--case", type=str, default="idalia")
    p_eval.add_argument("--save_preds", type=str, default=None)
    p_eval.add_argument(
        "--risk_maps", type=str, default=None,
        help="write percent-of-normal risk-map PNGs here (reference "
        "visualize_risk_map, monthly-composite baseline when available)",
    )
    p_eval.add_argument(
        "--raster_maps", type=str, default=None,
        help="write prediction raster PNGs here (reference "
        "visualize_results_raster, utils.py:194-231)",
    )
    p_eval.add_argument(
        "--metrics_json", type=str, default=None,
        help="Write the test metrics to this JSON file",
    )

    p_stats = sub.add_parser("stats", help="Dataset mean/std")
    p_stats.add_argument("--data_dir", type=str, default="data/synthetic")
    p_stats.add_argument("--dataset_range", type=int, default=30)

    p_synth = sub.add_parser("synth", help="Generate synthetic fixture store")
    p_synth.add_argument("--out_dir", type=str, default="data/synthetic")
    p_synth.add_argument("--n_counties", type=int, default=67)
    p_synth.add_argument("--image_size", type=int, default=128)
    p_synth.add_argument("--margin", type=int, default=45)
    p_synth.add_argument("--seed", type=int, default=42)
    p_synth.add_argument(
        "--pixel_noise", type=float, default=0.0,
        help="stddev of extra per-pixel multiplicative noise (0 = the "
        "spatially smooth default; >0 for curriculum/robustness studies)",
    )

    p_serve = sub.add_parser(
        "serve", help="Load a checkpoint into the optimized serving engine"
    )
    _add_common_model_flags(p_serve)
    _add_mesh_flags(p_serve)
    p_serve.add_argument("--checkpoint_path", type=str, required=True)
    p_serve.add_argument("--case", type=str, default="michael")
    p_serve.add_argument("--save_preds", type=str, default=None)
    p_serve.add_argument(
        "--latency_stats", action="store_true",
        help="Also report per-batch p50/p90 forward latency",
    )

    p_d2v = sub.add_parser(
        "pretrain-d2v", help="Pre-train a Date2Vec replacement checkpoint"
    )
    p_d2v.add_argument("--out", type=str, default="d2v_model/d2v.npz")
    p_d2v.add_argument("--k", type=int, default=64)
    p_d2v.add_argument("--steps", type=int, default=2000)

    p_ingest = sub.add_parser(
        "ingest", help="Pack per-county/day raw files into the store layout"
    )
    p_ingest.add_argument("--raw_dir", type=str, required=True)
    p_ingest.add_argument("--out_dir", type=str, required=True)
    p_ingest.add_argument("--image_size", type=int, default=128)

    p_ingest_m = sub.add_parser(
        "ingest-monthly",
        help="Attach {county}/monthly_Y_M.npy composites to an existing "
        "store as the risk-map baseline sidecar",
    )
    p_ingest_m.add_argument("--raw_dir", type=str, required=True)
    p_ingest_m.add_argument("--store_dir", type=str, required=True)
    p_ingest_m.add_argument("--image_size", type=int, default=128)

    p_gaps = sub.add_parser(
        "download-missing",
        help="Re-fetch only the dates each county directory is missing "
        "(reference eda/util.py:216-234) — recovery after a partial "
        "download run. Needs NASA_BEARER_TOKEN + acquisition extras.",
    )
    p_gaps.add_argument("--out_dir", type=str, required=True)
    p_gaps.add_argument("--margin_days", type=int, default=90)

    p_imp = sub.add_parser(
        "import-torch",
        help="Convert a reference PyTorch/Lightning checkpoint "
        "(lit.py:187-196 .ckpt, or a bare Modified_UNET state_dict) into "
        "a framework checkpoint directory usable by evaluate/serve/"
        "train --resume",
    )
    _add_common_model_flags(p_imp)
    p_imp.add_argument(
        "--checkpoint", type=str, required=True,
        help="reference .ckpt/.pth path",
    )
    p_imp.add_argument(
        "--d2v_pth", type=str, default=None,
        help="reference Date2Vec *.pth (whole-module pickle or "
        "state_dict, reference date2vec.py:6) — fills the fused "
        "date2vec/fc1,fc2 encode weights",
    )
    p_imp.add_argument("--out", type=str, required=True)
    p_imp.add_argument(
        "--no_strict", action="store_true",
        help="tolerate missing/extra reference keys instead of raising",
    )

    p_bench = sub.add_parser("bench", help="Run benchmark suite")
    p_bench.add_argument("--config", type=str, default="unet_train")
    p_bench.add_argument("--steps", type=int, default=20)

    args = parser.parse_args(argv)

    if args.command == "synth":
        from multimodal_outage_tpu.data.synthetic import generate_store

        frames, dates = generate_store(
            args.out_dir,
            n_counties=args.n_counties,
            image_size=args.image_size,
            margin=args.margin,
            seed=args.seed,
            pixel_noise=args.pixel_noise,
        )
        print(
            f"wrote {args.out_dir}: frames {frames.shape}, "
            f"{dates.shape[0]} dates"
        )
        return 0

    if args.command == "stats":
        from multimodal_outage_tpu.data.stats import compute_mean_std
        from multimodal_outage_tpu.data.store import load_store

        mean, std = compute_mean_std(
            load_store(args.data_dir), dataset_range=args.dataset_range
        )
        print(json.dumps({"mean": mean, "std": std}))
        return 0

    if args.command == "train":
        from multimodal_outage_tpu.train.loop import fit

        if getattr(args, "coordinator_address", None):
            from multimodal_outage_tpu.core.mesh import initialize_distributed

            n = initialize_distributed(
                args.coordinator_address, args.num_processes, args.process_id
            )
            print(f"distributed: {n} global devices")
        cfg = _build_config(args)
        for run in range(args.num_runs):
            run_cfg = cfg if args.num_runs == 1 else dataclasses.replace(
                cfg,
                train=dataclasses.replace(
                    cfg.train, job_id=f"{cfg.train.job_id}_r{run}", seed=cfg.train.seed + run
                ),
            )
            results = fit(run_cfg, test_case=args.case)
            print(json.dumps(results))
        return 0

    if args.command == "import-torch":
        from multimodal_outage_tpu.parity.torch_import import (
            convert_checkpoint,
        )

        cfg = _build_config(args)
        info = convert_checkpoint(
            cfg,
            args.checkpoint,
            args.out,
            d2v_pth=args.d2v_pth,
            strict=not args.no_strict,
        )
        print(
            f"imported {info['torch_keys']} reference tensors -> "
            f"{info['leaves']} framework leaves at {args.out}"
        )
        return 0

    if args.command == "evaluate":
        from multimodal_outage_tpu.train.loop import predict

        cfg = _build_config(args)
        preds, targets, metrics = predict(
            cfg, args.checkpoint_path, test_case=args.case
        )
        print(
            "Test Metrics:\n"
            f"Test Loss: {metrics['loss']}\nTest MAE: {metrics['mae']}\n"
            f"Test MAPE: {metrics['mape']}\nTest RMSE: {metrics['rmse']}"
        )
        if args.metrics_json:
            os.makedirs(
                os.path.dirname(args.metrics_json) or ".", exist_ok=True
            )
            with open(args.metrics_json, "w") as f:
                json.dump(metrics, f, indent=2)
        if args.save_preds:
            os.makedirs(args.save_preds, exist_ok=True)
            import numpy as np

            np.save(os.path.join(args.save_preds, "preds.npy"), preds)
            np.save(os.path.join(args.save_preds, "targets.npy"), targets)
            print(f"Saved preds and targets to {args.save_preds}")
        if args.risk_maps or args.raster_maps:
            import numpy as np

            from multimodal_outage_tpu.core.registry import leave_one_out
            from multimodal_outage_tpu.data.dataset import WindowDataset
            from multimodal_outage_tpu.data.store import load_store

            store = load_store(cfg.data.data_dir)
            _, test_cases = leave_one_out(args.case)
            test_ds = WindowDataset.from_case_study(
                store, test_cases, cfg.data.dataset_range, cfg.data.horizon
            )
            fut_dates = test_ds.future_window_dates(np.arange(len(test_ds)))
            if args.risk_maps:
                from multimodal_outage_tpu.viz.maps import save_risk_maps

                save_risk_maps(
                    preds,
                    store,
                    args.risk_maps,
                    mean=cfg.data.mean,
                    std=cfg.data.std,
                    future_dates=fut_dates,
                )
                print(f"Saved risk maps to {args.risk_maps}")
            if args.raster_maps:
                from multimodal_outage_tpu.viz.maps import (
                    save_prediction_rasters,
                )

                save_prediction_rasters(
                    preds,
                    args.raster_maps,
                    mean=cfg.data.mean,
                    std=cfg.data.std,
                    county_names=store.county_names,
                    max_samples=4,
                )
                print(f"Saved prediction rasters to {args.raster_maps}")
        return 0

    if args.command == "serve":
        from multimodal_outage_tpu.train.loop import serve_eval

        cfg = _build_config(args)
        preds, metrics, latency = serve_eval(
            cfg,
            args.checkpoint_path,
            test_case=args.case,
            latency_stats=args.latency_stats,
            collect_preds=args.save_preds is not None,
        )
        out = {"metrics": metrics}
        if latency:
            out["latency"] = latency
        print(json.dumps(out))
        if args.save_preds:
            os.makedirs(args.save_preds, exist_ok=True)
            import numpy as np

            np.save(os.path.join(args.save_preds, "preds.npy"), preds)
        return 0

    if args.command == "pretrain-d2v":
        from multimodal_outage_tpu.train.date2vec_pretrain import (
            pretrain_date2vec,
            save_bundle,
        )

        params, loss = pretrain_date2vec(k=args.k, steps=args.steps)
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        save_bundle(params, args.out)
        print(json.dumps({"out": args.out, "final_loss": loss}))
        return 0

    if args.command == "ingest":
        from multimodal_outage_tpu.data.acquisition import ingest_directory

        frames, dates = ingest_directory(
            args.raw_dir, args.out_dir, image_size=args.image_size
        )
        print(f"packed {args.out_dir}: frames {frames.shape}, {dates.shape[0]} dates")
        return 0

    if args.command == "ingest-monthly":
        from multimodal_outage_tpu.data.acquisition import (
            ingest_monthly_directory,
        )

        monthly, months = ingest_monthly_directory(
            args.raw_dir, args.store_dir, image_size=args.image_size
        )
        print(
            f"attached monthly sidecar to {args.store_dir}: "
            f"{monthly.shape} over months {months.tolist()}"
        )
        return 0

    if args.command == "download-missing":
        from multimodal_outage_tpu.data.acquisition import (
            download_missing_dates,
        )

        fetched = download_missing_dates(
            args.out_dir, margin_days=args.margin_days
        )
        total = sum(len(v) for v in fetched.values())
        print(
            json.dumps(
                {
                    "counties": len(fetched),
                    "dates_fetched": total,
                    "per_county": {k: len(v) for k, v in fetched.items()},
                }
            )
        )
        return 0

    if args.command == "bench":
        from multimodal_outage_tpu.benchmarks import run_benchmark

        result = run_benchmark(args.config, steps=args.steps)
        print(json.dumps(result))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
