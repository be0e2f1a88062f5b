"""Benchmark suite.

The reference publishes no numbers (BASELINE.md); this suite establishes
them for the five BASELINE.json configs plus the flagship headline metric:
128×128 tiles/sec/chip for fusion-model training (north star ≥5k on v5p).

Timing discipline: jit-compile first, block_until_ready-bracketed steps,
median over repeats.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.core.config import Config, DataConfig, ModelConfig
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.train.state import create_train_state
from multimodal_outage_tpu.train.steps import make_eval_step, make_train_step

NORTH_STAR_TILES_PER_SEC = 5000.0  # BASELINE.json:5 target


def _device_batch(b, n, t, s, c=1, seed=0):
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    return {
        "x": jax.random.normal(k1, (b, n, t, s, s, c)),
        "y": jax.random.normal(k2, (b, n, t, s, s, c)),
        "date_feats": jnp.tile(
            jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (b, t, 1)
        ),
    }


def _time_steps(fn: Callable[[], None], steps: int, warmup: int = 3):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return times


def _train_throughput(
    b=4, n=67, t=7, s=128, c=1, steps=20, dtype="bfloat16", st_gnn="gwnet"
) -> Dict:
    model_cfg = ModelConfig(
        st_gnn=st_gnn, input_channels=c, output_channels=c, compute_dtype=dtype
    )
    model = build_model(model_cfg, horizon=t)
    batch = _device_batch(b, n, t, s, c)
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, batch, supports)
    step = make_train_step(model, donate=False)
    lr = jnp.float32(1e-3)

    def run():
        nonlocal state
        state, m = step(state, batch, supports, lr, rng)
        jax.block_until_ready(m["loss"])

    times = _time_steps(run, steps)
    med = statistics.median(times)
    tiles = b * n * t
    return {
        "step_seconds_median": med,
        "tiles_per_step": tiles,
        "tiles_per_sec": tiles / med,
        "batch": b,
        "image_size": s,
    }


def bench_unet_train(steps=20) -> Dict:
    """Flagship: fusion-model training throughput, 128×128 tiles/sec/chip."""
    r = _train_throughput(steps=steps)
    return {
        "metric": "unet_train_tiles_per_sec_per_chip",
        "value": round(r["tiles_per_sec"], 1),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(r["tiles_per_sec"] / NORTH_STAR_TILES_PER_SEC, 3),
        "detail": r,
    }


def bench_unet_cpu_b4(steps=10) -> Dict:
    """BASELINE config 1: U-Net outage segmentation, 128×128, batch 4."""
    r = _train_throughput(b=4, n=1, t=4, s=128, steps=steps, dtype="float32")
    return {
        "metric": "unet_seg_b4_tiles_per_sec",
        "value": round(r["tiles_per_sec"], 1),
        "unit": "tiles/sec",
        "vs_baseline": None,
        "detail": r,
    }


def bench_gwnet_forecast(steps=50) -> Dict:
    """BASELINE config 2: Graph WaveNet 12-step forecast on the 67-node
    county graph — p50 forward latency."""
    from multimodal_outage_tpu.models.gwnet import GraphWaveNet

    n, t, c_in = 67, 12, 320
    m = GraphWaveNet(out_dim=256)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, n, t, c_in))
    sup = jnp.eye(n)[None]
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x, sup, train=False,
    )

    # NB: supports passed as an argument — embedded jit constants take a
    # pathological slow path on the tunneled TPU backend.
    @jax.jit
    def fwd(v, x, sup):
        return m.apply(v, x, sup, train=False)

    def run():
        jax.block_until_ready(fwd(variables, x, sup))

    times = _time_steps(run, steps)
    p50 = statistics.median(times) * 1e3
    return {
        "metric": "gwnet_12step_forecast_p50_latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": None,
        "detail": {"n_nodes": n, "horizon": t},
    }


def bench_fused_stack(steps=10) -> Dict:
    """BASELINE config 3: Date2Vec + U-Net fused stack, 8-frame window."""
    r = _train_throughput(b=2, n=16, t=8, s=128, steps=steps)
    return {
        "metric": "fused_stack_t8_tiles_per_sec",
        "value": round(r["tiles_per_sec"], 1),
        "unit": "tiles/sec",
        "vs_baseline": None,
        "detail": r,
    }


def bench_multimodal_fusion(steps=10) -> Dict:
    """BASELINE config 4: satellite + weather channels U-Net with Graph
    WaveNet head (4 input channels)."""
    r = _train_throughput(b=2, n=67, t=7, s=128, c=4, steps=steps)
    return {
        "metric": "multimodal_fusion_tiles_per_sec",
        "value": round(r["tiles_per_sec"], 1),
        "unit": "tiles/sec",
        "vs_baseline": None,
        "detail": r,
    }


def bench_sharded_pipeline(steps=10) -> Dict:
    """BASELINE config 5: sharded tile pipeline, data-parallel pjit over the
    available device mesh."""
    from multimodal_outage_tpu.core.mesh import make_mesh
    from multimodal_outage_tpu.parallel.sharding import (
        make_sharded_train_step,
        shard_batch,
        shard_state,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1)
    b = 2 * n_dev
    n, t, s = 67, 7, 128
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    model = build_model(model_cfg, horizon=t)
    batch = _device_batch(b, n, t, s)
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, batch, supports)
    state = shard_state(mesh, state)
    batch = shard_batch(mesh, batch)
    step = make_sharded_train_step(model, mesh, state, donate=False)
    lr = jnp.float32(1e-3)

    def run():
        nonlocal state
        state, m = step(state, batch, supports, lr, rng)
        jax.block_until_ready(m["loss"])

    times = _time_steps(run, steps)
    med = statistics.median(times)
    tiles = b * n * t
    return {
        "metric": "sharded_pipeline_tiles_per_sec",
        "value": round(tiles / med, 1),
        "unit": f"tiles/sec ({n_dev} devices)",
        "vs_baseline": None,
        "detail": {"devices": n_dev, "batch": b},
    }


def bench_e2e_train(steps=20) -> Dict:
    """End-to-end training throughput INCLUDING the input pipeline: a
    synthetic packed store held HBM-resident, per-step device window
    gather + normalize + train step (the framework's real training path)."""
    import tempfile

    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store
    from multimodal_outage_tpu.data.synthetic import generate_store

    b, t, s = 4, 7, 128
    with tempfile.TemporaryDirectory() as tmp:
        generate_store(tmp, n_counties=67, image_size=s, margin=20, seed=0)
        store = load_store(tmp)
        ds = WindowDataset.from_case_study(
            store, HURRICANES, dataset_range=15, horizon=t
        )
        pipe = DevicePipeline(store, 3.2, 10.4, s)
        n = store.n_counties

        model_cfg = ModelConfig(compute_dtype="bfloat16")
        model = build_model(model_cfg, horizon=t)
        supports = jnp.eye(n)[None]
        rng = jax.random.PRNGKey(0)
        batch0 = pipe.batch(ds, np.arange(b))
        state = create_train_state(model, rng, batch0, supports)
        step = make_train_step(model, donate=False)
        lr = jnp.float32(1e-3)
        n_samples = len(ds)

        i = 0

        def run():
            nonlocal state, i
            batch = pipe.batch(ds, (np.arange(b) + i) % (n_samples - b))
            i += 1
            state, m = step(state, batch, supports, lr, rng)
            jax.block_until_ready(m["loss"])

        times = _time_steps(run, steps)
        med = statistics.median(times)
        tiles = b * n * t
        return {
            "metric": "e2e_train_tiles_per_sec_per_chip",
            "value": round(tiles / med, 1),
            "unit": "tiles/sec/chip (incl. input pipeline)",
            "vs_baseline": round(tiles / med / NORTH_STAR_TILES_PER_SEC, 3),
            "detail": {"step_seconds_median": med, "tiles_per_step": tiles},
        }


def bench_fusion_inference(steps=50) -> Dict:
    """Serving-path latency: full fusion-model forward (B=1, 67 counties,
    horizon 7, 128² tiles) — p50 ms on one chip."""
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    t = 7
    model = build_model(model_cfg, horizon=t)
    batch = _device_batch(1, 67, t, 128)
    supports = jnp.eye(67)[None]
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["x"], batch["date_feats"], supports, train=False,
    )

    @jax.jit
    def fwd(v, x, feats, sup):
        return model.apply(v, x, feats, sup, train=False)

    def run():
        jax.block_until_ready(
            fwd(variables, batch["x"], batch["date_feats"], supports)
        )

    times = _time_steps(run, steps)
    p50 = statistics.median(times) * 1e3
    return {
        "metric": "fusion_inference_p50_latency",
        "value": round(p50, 3),
        "unit": "ms (B=1, 67 counties, horizon 7)",
        "vs_baseline": None,
        "detail": {"p90_ms": round(sorted(times)[int(0.9 * len(times))] * 1e3, 3)},
    }


_BENCHMARKS = {
    "e2e_train": bench_e2e_train,
    "fusion_inference": bench_fusion_inference,
    "unet_train": bench_unet_train,
    "unet_cpu_b4": bench_unet_cpu_b4,
    "gwnet_forecast": bench_gwnet_forecast,
    "fused_stack": bench_fused_stack,
    "multimodal_fusion": bench_multimodal_fusion,
    "sharded_pipeline": bench_sharded_pipeline,
}


def run_benchmark(name: str, steps: int = 20) -> Dict:
    if name not in _BENCHMARKS:
        raise ValueError(f"unknown benchmark {name!r}: {sorted(_BENCHMARKS)}")
    return _BENCHMARKS[name](steps=steps)
