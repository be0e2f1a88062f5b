"""Benchmark suite.

The reference publishes no numbers (BASELINE.md); this suite establishes
them for the five BASELINE.json configs plus the flagship headline metric:
128×128 tiles/sec/chip for fusion-model training (north star ≥5k on v5p).

Timing discipline — IMPORTANT: on tunneled TPU backends
`block_until_ready` can return before device execution completes, making
naive per-step timing wildly optimistic. Every measurement here therefore
brackets K in-order device dispatches between host *fetches* of a scalar
that depends on the last dispatch (TPU streams execute in order, so the
fetch completing proves all K executed). Reported value = wall / K,
median over windows.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.train.state import create_train_state
from multimodal_outage_tpu.train.steps import make_train_step

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


def _fetch(x) -> float:
    """True device sync: pull a scalar element to the host. Indexes
    element zero directly — `jnp.ravel(x)[0]` compiles a full 1-D
    relayout of x first, which RESOURCE_EXHAUSTs on the axon backend
    for large 4-D arrays (observed on the pool-kernel cotangent)."""
    return float(x[(0,) * getattr(x, "ndim", 0)])


def _latency_windows(
    step_fn: Callable[[], object], k: int, windows: int = 3
) -> list:
    """Seconds-per-dispatch of `windows` fetch-synced runs of k chained
    dispatches, each window closed by a host fetch on the last result
    (the only trustworthy sync on this backend — see module docstring).
    Callers wanting percentiles (serve --latency_stats) use the raw list;
    _timed_window takes the median."""
    out = step_fn()  # compile + warm
    _fetch(out)
    per = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(k):
            out = step_fn()
        _fetch(out)
        per.append((time.perf_counter() - t0) / k)
    return per


def _timed_window(step_fn: Callable[[], object], k: int, windows: int = 3):
    """Median seconds-per-dispatch over `windows` runs of k chained
    dispatches, each window closed by a host fetch on the last result."""
    return statistics.median(_latency_windows(step_fn, k, windows))


def _train_throughput(
    b=4, n=67, t=7, s=128, c=1, steps=15, dtype="bfloat16", st_gnn="gwnet"
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

    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], batch, supports, lr, rng)
        return m["loss"]

    sec = _timed_window(run, steps)
    tiles = b * n * t
    return {
        "step_seconds": sec,
        "tiles_per_step": tiles,
        "tiles_per_sec": tiles / sec,
        "batch": b,
        "image_size": s,
    }


def bench_unet_train(steps=15) -> Dict:
    """Fusion-model train step throughput (data pre-staged on device)."""
    r = _train_throughput(steps=steps)
    return {
        "metric": "unet_train_tiles_per_sec_per_chip",
        "value": round(r["tiles_per_sec"], 1),
        "unit": "tiles/sec/chip",
        "vs_baseline": round(r["tiles_per_sec"] / NORTH_STAR_TILES_PER_SEC, 3),
        "detail": r,
    }


class BenchOOM(RuntimeError):
    """A benchmark config exhausted device memory."""


# shared with the trainer's --grad_accum auto fallback (core/oom.py)
from multimodal_outage_tpu.core.oom import (  # noqa: E402
    OOM_MARKERS as _OOM_MARKERS,
    is_oom_error as _is_oom,
)


_E2E_STORE: dict = {}


def _e2e_store_dir() -> str:
    """Synthetic 67×128² packed store, generated once per process."""
    import atexit
    import shutil
    import tempfile

    from multimodal_outage_tpu.data.synthetic import generate_store

    if "dir" not in _E2E_STORE:
        tmp = tempfile.mkdtemp(prefix="bench_store_")
        generate_store(tmp, n_counties=67, image_size=128, margin=20, seed=0)
        _E2E_STORE["dir"] = tmp
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return _E2E_STORE["dir"]


def make_e2e_setup(
    b: int, donate: bool = True, remat: bool = False,
    bn_single_pass: bool = True, remat_scope: str = "all",
    pool: str = "reduce_window",
):
    """The REAL e2e training program, exactly as the headline bench
    configures it: synthetic 67×128² store, HBM-resident DevicePipeline,
    bf16 fusion model, fused train step. Single source of truth shared by
    _e2e_train_seconds and the receipts generators (tools/dump_hlo.py,
    tools/profile_step.py) so they can never drift onto different
    programs. Returns a dict with store/ds/pipe/model/state/step/
    supports/lr/rng/batch0/n_samples."""
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store

    t, s = 7, 128
    store = load_store(_e2e_store_dir())
    ds = WindowDataset.from_case_study(
        store, HURRICANES, dataset_range=15, horizon=t
    )
    n = store.n_counties
    model_cfg = ModelConfig(
        compute_dtype="bfloat16", remat=remat, bn_single_pass=bn_single_pass,
        remat_scope=remat_scope, pool=pool,
    )
    model = build_model(model_cfg, horizon=t)
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    pipe = DevicePipeline(store, 3.2, 10.4, s)
    batch0 = pipe.batch(ds, np.arange(b))
    state = create_train_state(model, rng, batch0, supports)
    step = make_train_step(model, donate=donate)
    return {
        "store": store, "ds": ds, "pipe": pipe, "model": model,
        "state": state, "step": step, "supports": supports,
        "lr": jnp.float32(1e-3), "rng": rng, "batch0": batch0,
        "n_samples": len(ds),
    }


def _e2e_train_seconds(
    b: int, steps: int, donate: bool = True, remat: bool = False,
    bn_single_pass: bool = True, remat_scope: str = "all",
    pool: str = "reduce_window",
) -> float:
    """Seconds/step of the REAL training path (HBM-resident store, device
    window gather + normalize + fused train step) at batch size b.
    Raises BenchOOM when the config does not fit the chip's HBM."""
    try:
        su = make_e2e_setup(
            b, donate=donate, remat=remat, bn_single_pass=bn_single_pass,
            remat_scope=remat_scope, pool=pool,
        )
        ds, pipe, step = su["ds"], su["pipe"], su["step"]
        supports, lr, rng = su["supports"], su["lr"], su["rng"]
        n_samples = su["n_samples"]
        holder = {"state": su["state"], "i": 0}

        def run():
            batch = pipe.batch(
                ds, (np.arange(b) + holder["i"]) % (n_samples - b)
            )
            holder["i"] += 1
            holder["state"], m = step(
                holder["state"], batch, supports, lr, rng
            )
            return m["loss"]

        return _timed_window(run, steps)
    except Exception as e:  # noqa: BLE001 - classify OOM vs real failure
        if _is_oom(e):
            raise BenchOOM(f"b={b} remat={remat} OOM") from None
        raise


def _e2e_cell_subprocess(
    b: int, steps: int, remat: bool, timeout_s: int = 900, retries: int = 2,
    bn_single_pass: bool = True, remat_scope: str = "all",
    pool: str = "reduce_window",
) -> float:
    """Run one e2e-train measurement in a FRESH python process.

    Device memory from an OOM'd attempt outlives the attempt in-process
    (the raised exception's traceback pins the dead buffers' frames, and
    allocator state carries over), which cascades OOM into every later
    config. A process per cell guarantees each measurement sees a clean
    chip. TPU access is exclusive, so cells run strictly sequentially.

    Tunneled TPU backends occasionally wedge a fresh client during init
    (observed: main thread on a futex, IO thread in epoll, zero progress
    for 15+ min) — each attempt gets a hard timeout, then a pause for the
    tunnel to settle and a retry. Raises BenchOOM when the cell does not
    fit."""
    import os
    import subprocess
    import sys
    import time as _t

    import multimodal_outage_tpu as pkg

    code = (
        "from multimodal_outage_tpu import benchmarks as B;"
        f"B._E2E_STORE['dir'] = {_e2e_store_dir()!r};"
        f"print('SEC', B._e2e_train_seconds({b}, {steps}, remat={remat}, "
        f"bn_single_pass={bn_single_pass}, remat_scope={remat_scope!r}, "
        f"pool={pool!r}))"
    )
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(pkg.__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # persistent XLA compile cache: cells re-running a seen (b, remat)
    # program skip its multi-minute compile
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")
    # NOTE: no XLA_FLAGS injection here — the axon client's local flag
    # parser fatally aborts on any xla_tpu_* entry; TPU compiler options
    # travel via jax.jit(compiler_options=...) instead (see
    # bench_xla_flag_sweep / train.steps.default_compiler_options).
    for attempt in range(retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                timeout=timeout_s,
            )
        except subprocess.TimeoutExpired:
            print(
                f"[bench] cell b={b} remat={remat} wedged "
                f"(attempt {attempt + 1}), retrying",
                file=sys.stderr,
            )
            _t.sleep(60)  # let the TPU tunnel settle before reconnecting
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("SEC "):
                return float(line.split()[1])
        if "BenchOOM" in proc.stdout or any(
            m in proc.stdout for m in _OOM_MARKERS
        ):
            raise BenchOOM(f"b={b} remat={remat} OOM")
        raise RuntimeError(
            f"e2e bench cell b={b} remat={remat} failed:\n"
            f"{proc.stdout[-2000:]}"
        )
    raise RuntimeError(
        f"e2e bench cell b={b} remat={remat}: TPU client wedged on all "
        f"{retries + 1} attempts"
    )


def bench_e2e_train(steps=15, b=8, remat=False) -> Dict:
    """End-to-end training throughput INCLUDING the input pipeline.

    The default configuration (b=8, no remat) is the fastest cell of the
    measured b×remat grid on a 16 GB v5e (see bench_batch_scaling /
    BENCHMARKS.md); b=16 (the reference's default batch, lit.py:213) OOMs
    a 16 GB chip plain AND with remat (all or stem scope) — it trains
    only via --grad_accum (see the batch_scaling grid), at the b=8
    per-tile rate.
    Falls back by halving b on OOM (down to b=1) rather than crash — the
    driver needs ONE json line on whatever chip it runs."""
    tried = []
    sec = None
    while sec is None:
        try:
            if tried:
                # retry in a clean subprocess: the failed attempt's buffers
                # outlive it in this process and would re-OOM the smaller b
                sec = _e2e_cell_subprocess(b, steps, remat)
            else:
                sec = _e2e_train_seconds(b, steps, remat=remat)
        except BenchOOM:
            tried.append(b)
            if b <= 1:
                raise  # nothing fits — a real failure the driver must see
            b //= 2
    tiles = b * 67 * 7
    return {
        "metric": "e2e_train_tiles_per_sec_per_chip",
        "value": round(tiles / sec, 1),
        "unit": "tiles/sec/chip (incl. input pipeline)",
        "vs_baseline": round(tiles / sec / NORTH_STAR_TILES_PER_SEC, 3),
        "detail": {
            "step_seconds": sec,
            "tiles_per_step": tiles,
            "batch": b,
            "remat": remat,
            "oom_batches": tried,
        },
    }


def bench_batch_scaling(steps=10) -> Dict:
    """e2e train throughput over the b∈{4,8,16,32} ×
    remat{off, all, stem} grid — the headline configuration is whichever
    cell the hardware sustains fastest per tile. remat_scope="stem"
    (checkpoint only inc/down1/up3/up4, the activation-HBM hogs) is the
    r3 cell aimed at the reference's default batch 16 (lit.py:213),
    which OOMs a 16 GB v5e both plain and with all-block remat. Each
    cell runs in a fresh subprocess (OOM isolation, see
    _e2e_cell_subprocess); OOM cells are reported as \"oom\", not
    skipped silently."""
    import sys

    import time as _t

    curve: Dict[str, object] = {}
    best = (0.0, None)
    _e2e_store_dir()  # generate once; subprocesses reuse it
    first = True
    for remat, scope, tag in (
        (False, "all", ""),
        (True, "all", "_remat"),
        (True, "stem", "_stem"),
    ):
        for b in (4, 8, 16, 32):
            key = f"b{b}{tag}"
            if not first:
                _t.sleep(15)  # give the TPU tunnel a beat between clients
            first = False
            try:
                sec = _e2e_cell_subprocess(b, steps, remat, remat_scope=scope)
            except BenchOOM:
                curve[key] = "oom"
                print(f"[batch_scaling] {key}: oom", file=sys.stderr)
                continue
            tps = round(b * 67 * 7 / sec, 1)
            curve[key] = tps
            print(f"[batch_scaling] {key}: {tps} tiles/s", file=sys.stderr)
            if tps > best[0]:
                best = (tps, key)
    return {
        "metric": "e2e_train_batch_scaling_best",
        "value": best[0],
        "unit": f"tiles/sec/chip (best {best[1]})",
        "vs_baseline": round(best[0] / NORTH_STAR_TILES_PER_SEC, 3),
        "detail": curve,
    }


def bench_xla_flag_sweep(steps=10, b=8) -> Dict:
    """VERDICT r2 #1 lever (e): candidate xla_tpu_* compiler options vs
    the default compilation on the REAL e2e train path.

    This deployment cannot use XLA_FLAGS for TPU options (the axon
    client's local flag parser fatally aborts on any xla_tpu_* entry),
    but jax.jit(compiler_options=...) travels INSIDE the compile RPC to
    the remote compile service, which parses and applies it (verified:
    bogus option names are rejected server-side with HTTP 500, so
    accepted options are genuinely in effect). Candidates: scoped-VMEM
    limits steer fusion depth (more VMEM per fusion = deeper fusions,
    fewer HBM round-trips — or spills); the latency-hiding scheduler
    reorders for async overlap and could plausibly hurt a single-chip
    program; the layout-opt / rwb-fusion toggles target the measured
    23% relayout-copy share. All candidates run interleaved in ONE
    process (donate=False so states coexist) — the same-noise protocol
    of bench_layout_matrix. Options the compile service rejects are
    reported "rejected", not crashed on."""
    import sys

    candidates: Dict[str, Optional[Dict[str, str]]] = {
        "baseline": None,
        "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
        "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
        "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
        "aggr_fusion_layout": {
            "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"
        },
        "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
        "no_dot_strength": {
            "xla_tpu_enable_dot_strength_reduction": "false"
        },
    }
    # the single source of truth for the headline program — candidate
    # steps are rebuilt below with per-candidate compiler options, but
    # the model/data/state MUST be make_e2e_setup's so the sweep can
    # never drift onto a different program than the headline it tunes
    su = make_e2e_setup(b, donate=False)
    model, ds, pipe = su["model"], su["ds"], su["pipe"]
    supports, lr, rng = su["supports"], su["lr"], su["rng"]
    n_samples, base_state = su["n_samples"], su["state"]

    detail: Dict[str, object] = {}
    fns: Dict[str, Callable[[], object]] = {}
    for name, opts in candidates.items():
        try:
            step = make_train_step(model, donate=False, compiler_options=opts)
            holder = {"state": base_state, "i": 0}

            def run(step=step, holder=holder):
                batch = pipe.batch(
                    ds, (np.arange(b) + holder["i"]) % (n_samples - b)
                )
                holder["i"] += 1
                holder["state"], m = step(
                    holder["state"], batch, supports, lr, rng
                )
                return m["loss"]

            _fetch(run())  # compile now — rejection surfaces here
            fns[name] = run
        except Exception as e:  # noqa: BLE001 - record per-candidate
            # classify OOM FIRST: a tunneled compile-time OOM also says
            # "remote_compile", and with 7 candidate states coexisting
            # in one process it is a live possibility — reporting it as
            # "rejected" (= compile service refused the option name)
            # would put a wrong diagnosis in the receipt
            if _is_oom(e):
                detail[name] = "oom"
            elif "remote_compile" in str(e) or "Unknown" in str(e):
                detail[name] = "rejected"
            else:
                detail[name] = f"failed: {str(e)[:80]}"
            print(f"[xla_flag_sweep] {name}: {detail[name]}", file=sys.stderr)
    res = _interleaved_ab(fns, steps)
    tiles = b * 67 * 7
    for name, sec in res.items():
        detail[name] = round(tiles / sec, 1)
        print(f"[xla_flag_sweep] {name}: {detail[name]}", file=sys.stderr)
    numeric = {k: v for k, v in detail.items() if isinstance(v, float)}
    best = max(numeric, key=numeric.get) if numeric else "none"
    return {
        "metric": "xla_flag_sweep_best_tiles_per_sec",
        "value": numeric.get(best),
        "unit": f"tiles/sec/chip (best {best}, interleaved, donate=False)",
        "vs_baseline": (
            round(numeric[best] / numeric["baseline"], 3)
            if "baseline" in numeric and numeric.get(best) else None
        ),
        "detail": detail,
    }


def bench_layout_matrix(steps=10, b=8) -> Dict:
    """The r3 copy-stall experiment matrix (VERDICT r2 #1), interleaved.

    The committed b=8 profile pins 57 ms/step (23.3%) in SYNC layout-
    conversion copies; HLO forensics (tools/dump_hlo.py) locate them at
    (a) the Expansion backward weight-grad convs re-laying the forward-
    saved concat activations, (b) the maxpool select-and-scatter path,
    and the 1-channel stem the profile suspected of lane-hostile layout
    churn. This bench A/Bs the structural levers in ONE process with
    interleaved fetch-synced windows (same-noise comparison):

      base          pool=reduce_window, no remat   (the r2 headline step)
      pool          pairwise strided-slice max-pool (lever b)
      stem          stem-scope remat                (lever a)
      pool_stem     both
      stem8         input padded 1→8 zero channels (lane-friendly stem
                    convs; measurement-only shape probe — same FLOPs
                    up to the widened first conv)

    Measured r3 (BENCHMARKS.md): base WINS — every lever loses or ties,
    so the defaults stay at base; the bench stays as the receipts.

    Each variant is the REAL e2e path (device window gather + train
    step). donate=False so all variants' states coexist; the winning
    combination's honest donate=True number is bench e2e_train."""
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store

    t, s = 7, 128
    store = load_store(_e2e_store_dir())
    ds = WindowDataset.from_case_study(
        store, HURRICANES, dataset_range=15, horizon=t
    )
    n = store.n_counties
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    n_samples = len(ds)
    pipe = DevicePipeline(store, 3.2, 10.4, s)

    variants = {
        "base": dict(pool="reduce_window", remat=False),
        "pool": dict(pool="pairwise", remat=False),
        "stem": dict(pool="reduce_window", remat=True, remat_scope="stem"),
        "pool_stem": dict(pool="pairwise", remat=True, remat_scope="stem"),
    }

    def _pad_channels(x, c):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, c - x.shape[-1])])

    def _make_run(kw, pad_c=0):
        """Build the per-variant step closure: real e2e path (device
        window gather + train step), optional input channel padding."""
        model = build_model(
            ModelConfig(compute_dtype="bfloat16", **kw), horizon=t
        )
        batch0 = pipe.batch(ds, np.arange(b))
        if pad_c:
            batch0 = dict(batch0, x=_pad_channels(batch0["x"], pad_c))
        state = create_train_state(model, rng, batch0, supports)
        step = make_train_step(model, donate=False)
        holder = {"state": state, "i": 0}

        def run():
            batch = pipe.batch(
                ds, (np.arange(b) + holder["i"]) % (n_samples - b)
            )
            if pad_c:
                batch = dict(batch, x=_pad_channels(batch["x"], pad_c))
            holder["i"] += 1
            holder["state"], m = step(
                holder["state"], batch, supports, lr, rng
            )
            return m["loss"]

        return run

    fns = {name: _make_run(kw) for name, kw in variants.items()}

    res = _interleaved_ab(fns, steps)
    tiles = b * n * t
    detail = {
        name: round(tiles / sec, 1) for name, sec in res.items()
    }

    # stem8 shape probe, in its own OOM-guarded pair vs base: padding the
    # input 1→8 channels multiplies the stem input HBM ~8× (≈1 GB at
    # b=8), so a failure here must not take down the matrix above.
    try:
        run8 = _make_run(dict(pool="reduce_window", remat=False), pad_c=8)
        res8 = _interleaved_ab({"base2": fns["base"], "stem8": run8}, steps)
        detail.update(
            {name: round(tiles / sec, 1) for name, sec in res8.items()}
        )
    except Exception as e:  # RESOURCE_EXHAUSTED and kin
        detail["stem8"] = f"failed: {type(e).__name__}"

    best = max(
        (k for k, v in detail.items() if isinstance(v, float)),
        key=lambda k: detail[k],
    )
    return {
        "metric": "layout_matrix_best_tiles_per_sec",
        "value": detail[best],
        "unit": f"tiles/sec/chip (best {best}, interleaved, donate=False)",
        "vs_baseline": round(
            detail[best] / max(detail["base"], 1e-9), 3
        ),
        "detail": detail,
    }


def bench_pool_pallas(steps=10, b=8) -> Dict:
    """Round-4 lever (f→g): the Pallas 2×2 max-pool fwd/bwd kernel pair
    (ops/pool_pallas.py) vs the reduce_window lowering, interleaved on
    the REAL e2e train path — the one copy-stall lever the r3 matrix
    never tried (all its pool variants were XLA relowerings; this one
    keeps the standard tiling and does every shuffle on the MXU).
    Also reports the ISOLATED pool fwd+bwd time at the b=8 stem shape,
    so a win/loss decomposes into kernel-time vs boundary-relayout."""
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store
    from multimodal_outage_tpu.ops.pool_pallas import max_pool_2x2_pallas

    t, s = 7, 128
    store = load_store(_e2e_store_dir())
    ds = WindowDataset.from_case_study(
        store, HURRICANES, dataset_range=15, horizon=t
    )
    n = store.n_counties
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    n_samples = len(ds)

    # isolated pool fwd+bwd at the stem shape FIRST (the e2e phase keeps
    # two donate=False train states alive — running the probe after them
    # OOMs a 16 GB chip)
    x = jax.random.normal(
        jax.random.PRNGKey(1), (b * n * t, s, s, 4), jnp.bfloat16
    )
    g = jax.random.normal(
        jax.random.PRNGKey(2), (b * n * t, s // 2, s // 2, 4), jnp.bfloat16
    )
    import flax.linen as _fnn

    ref_pool = lambda u: _fnn.max_pool(  # noqa: E731
        u, window_shape=(2, 2), strides=(2, 2)
    )

    def _iso(fn):
        vjp = jax.jit(lambda u, c: jax.vjp(fn, u)[1](c)[0])
        holder = {}

        def run():
            holder["out"] = vjp(x, g)
            return holder["out"]

        return run

    iso = _interleaved_ab(
        {
            "iso_reduce_window": _iso(ref_pool),
            "iso_pallas": _iso(
                lambda u: max_pool_2x2_pallas(u, False)
            ),
        },
        steps,
    )
    detail = {name: round(1e3 * sec, 3) for name, sec in iso.items()}
    del x, g
    pipe = DevicePipeline(store, 3.2, 10.4, s)

    def _make_run(pool):
        model = build_model(
            ModelConfig(compute_dtype="bfloat16", pool=pool), horizon=t
        )
        batch0 = pipe.batch(ds, np.arange(b))
        state = create_train_state(model, rng, batch0, supports)
        step = make_train_step(model, donate=False)
        holder = {"state": state, "i": 0}

        def run():
            batch = pipe.batch(
                ds, (np.arange(b) + holder["i"]) % (n_samples - b)
            )
            holder["i"] += 1
            holder["state"], m = step(
                holder["state"], batch, supports, lr, rng
            )
            return m["loss"]

        return run

    fns = {
        "reduce_window": _make_run("reduce_window"),
        "pallas": _make_run("pallas"),
    }
    res = _interleaved_ab(fns, steps)
    tiles = b * n * t
    detail.update({name: round(tiles / sec, 1) for name, sec in res.items()})

    return {
        "metric": "pool_pallas_tiles_per_sec",
        "value": detail["pallas"],
        "unit": "tiles/sec/chip (e2e train step, interleaved, "
        "donate=False; iso_* in ms fwd+bwd at the stem shape)",
        "vs_baseline": round(
            detail["pallas"] / max(detail["reduce_window"], 1e-9), 3
        ),
        "detail": detail,
    }


def bench_remat_conv(steps=10, b=8) -> Dict:
    """Round-4 lever (h): remat_scope="conv" — every U-Net block under
    jax.checkpoint with the save_only_these_names("conv_out") policy, so
    conv/convT outputs stay saved and only the BN-normalize/ReLU/pool/
    concat tails recompute in the backward. Unlike levers (a)/(a'), this
    trades HBM *stores* of the elementwise-tail activations for cheap
    VPU recompute without re-running any conv. Interleaved on the REAL
    e2e train path vs the no-remat base."""
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store

    t, s = 7, 128
    store = load_store(_e2e_store_dir())
    ds = WindowDataset.from_case_study(
        store, HURRICANES, dataset_range=15, horizon=t
    )
    n = store.n_counties
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    n_samples = len(ds)
    pipe = DevicePipeline(store, 3.2, 10.4, s)

    def _make_run(kw):
        model = build_model(
            ModelConfig(compute_dtype="bfloat16", **kw), horizon=t
        )
        batch0 = pipe.batch(ds, np.arange(b))
        state = create_train_state(model, rng, batch0, supports)
        step = make_train_step(model, donate=False)
        holder = {"state": state, "i": 0}

        def run():
            batch = pipe.batch(
                ds, (np.arange(b) + holder["i"]) % (n_samples - b)
            )
            holder["i"] += 1
            holder["state"], m = step(
                holder["state"], batch, supports, lr, rng
            )
            return m["loss"]

        return run

    fns = {
        "base": _make_run(dict(remat=False)),
        "remat_conv": _make_run(dict(remat=True, remat_scope="conv")),
    }
    res = _interleaved_ab(fns, steps)
    tiles = b * n * t
    detail = {name: round(tiles / sec, 1) for name, sec in res.items()}
    return {
        "metric": "remat_conv_tiles_per_sec",
        "value": detail["remat_conv"],
        "unit": "tiles/sec/chip (e2e train step, interleaved, "
        "donate=False)",
        "vs_baseline": round(
            detail["remat_conv"] / max(detail["base"], 1e-9), 3
        ),
        "detail": detail,
    }


def bench_dcrnn(steps=10) -> Dict:
    """DCRNN fusion training throughput + 67-node module forecast latency
    (the second st-GNN, reference models/unet.py:16-27 interface)."""
    from multimodal_outage_tpu.models.dcrnn import DCRNN

    r = _train_throughput(b=2, steps=steps, st_gnn="dcrnn")

    n, t, c_in = 67, 7, 320
    x = jax.random.normal(jax.random.PRNGKey(0), (1, n, t, c_in))
    sup = jnp.eye(n)[None]
    m = DCRNN(output_dim=256, horizon=t)
    variables = m.init(jax.random.PRNGKey(0), x, sup, train=False)
    fwd = jax.jit(lambda v, x, s: m.apply(v, x, s, train=False))
    sec = _timed_window(lambda: fwd(variables, x, sup), steps * 2)
    return {
        "metric": "dcrnn_train_tiles_per_sec",
        "value": round(r["tiles_per_sec"], 1),
        "unit": "tiles/sec",
        "vs_baseline": None,
        "detail": {
            **r,
            "forecast_latency_ms": round(sec * 1e3, 3),
        },
    }


def bench_dcrnn_stack(steps=50) -> Dict:
    """Whole-stack fused DCRNN kernel vs the XLA scan module, eval mode —
    the same op-latency-bound structure the gwnet stack kernel beat 2.4×
    (BENCHMARKS.md): the full encoder+decoder seq2seq in ONE Pallas
    program with VMEM-resident weights (ops/dcrnn_stack_pallas.py).

    Reports interleaved dispatch-inclusive latency AND chained-
    composition device compute for B=1 and B=16."""
    from multimodal_outage_tpu.models.dcrnn import DCRNN
    from multimodal_outage_tpu.ops.dcrnn_stack_pallas import (
        dcrnn_stack_forward,
        dcrnn_stack_params,
    )

    n, t, c_in, c_out = 67, 7, 320, 256
    sup = jnp.stack([jnp.eye(n), jnp.eye(n)])  # dual-random-walk shape
    interpret = jax.default_backend() != "tpu"
    m = DCRNN(output_dim=c_out, horizon=t)
    detail = {}
    reps = 20
    for b in (1, 16):
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, t, c_in))
        variables = m.init(jax.random.PRNGKey(0), x, sup, train=False)
        sp = dcrnn_stack_params(
            variables["params"],
            n_supports=int(sup.shape[0]),
            input_dim=c_in,
            output_dim=c_out,
        )
        xla_fwd = jax.jit(lambda v, x, s: m.apply(v, x, s, train=False))
        stack_fwd = jax.jit(
            lambda x, s, sp: dcrnn_stack_forward(
                x, s, sp, horizon=t, interpret=interpret
            )
        )
        fns = {
            "xla": lambda: xla_fwd(variables, x, sup),
            "stack": lambda: stack_fwd(x, sup, sp),
        }
        res = _interleaved_ab(fns, steps)
        for name, sec in res.items():
            detail[f"b{b}_{name}_ms"] = round(sec * 1e3, 3)

        # chained composition: REPS dependent forwards in ONE program
        def chain(fwd_core, x0):
            def body(i, acc):
                y = fwd_core(acc)
                return jnp.pad(y, [(0, 0)] * 3 + [(0, c_in - y.shape[-1])])

            return jax.lax.fori_loop(0, reps, body, x0)

        xla_chain = jax.jit(
            lambda v, x0, s: chain(
                lambda a: m.apply(v, a * 0 + x, s, train=False), x0
            )
        )
        stack_chain = jax.jit(
            lambda x0, s, sp: chain(
                lambda a: dcrnn_stack_forward(
                    a * 0 + x, s, sp, horizon=t, interpret=interpret
                ),
                x0,
            )
        )
        fns_c = {
            "xla": lambda: xla_chain(variables, jnp.zeros_like(x), sup),
            "stack": lambda: stack_chain(jnp.zeros_like(x), sup, sp),
        }
        res_c = _interleaved_ab(fns_c, max(steps // 10, 3))
        for name, sec in res_c.items():
            detail[f"b{b}_{name}_device_us"] = round(sec / reps * 1e6, 1)
    return {
        "metric": "dcrnn_stack_forecast_latency",
        "value": detail.get("b1_stack_ms"),
        "unit": "ms (amortized, B=1, whole-stack kernel)",
        "vs_baseline": None,
        "detail": detail,
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


def _interleaved_ab(fns: Dict[str, Callable[[], object]], k: int, rounds: int = 4):
    """Order-bias-free A/B: alternate k-dispatch fetch-synced windows
    between the candidates and take each one's median seconds/dispatch.
    Back-to-back single measurements on the tunneled backend swing 2-3×
    run to run; interleaving puts all candidates in the same noise."""
    for fn in fns.values():  # compile + warm every candidate first
        _fetch(fn())
    per: Dict[str, list] = {name: [] for name in fns}
    for _ in range(rounds):
        for name, fn in fns.items():
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn()
            _fetch(out)
            per[name].append((time.perf_counter() - t0) / k)
    return {name: statistics.median(v) for name, v in per.items()}


def bench_gwnet_forecast(steps=30) -> Dict:
    """BASELINE config 2: Graph WaveNet 12-step forecast on the 67-node
    county graph — amortized forward latency, Pallas vs XLA A/B at B=1
    (latency) and B=16 (batched serving, where the blocked kernel's
    (b,t)-tiling actually has work to amortize over)."""
    from multimodal_outage_tpu.models.gwnet import GraphWaveNet

    n, t, c_in = 67, 12, 320
    sup = jnp.eye(n)[None]
    detail = {}
    for b in (1, 16):
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, t, c_in))
        fns = {}
        for pallas in (
            (False, True) if jax.default_backend() == "tpu" else (False,)
        ):
            m = GraphWaveNet(out_dim=256, use_pallas=pallas)
            variables = m.init(
                {
                    "params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0),
                },
                x, sup, train=False,
            )
            fwd = jax.jit(lambda v, x, s, m=m: m.apply(v, x, s, train=False))
            fns["pallas" if pallas else "xla"] = (
                lambda v=variables, x=x, f=fwd: f(v, x, sup)
            )
        res = _interleaved_ab(fns, steps)
        for name, sec in res.items():
            detail[f"b{b}_{name}"] = round(sec * 1e3, 3)
    best = min(v for k, v in detail.items() if k.startswith("b1_"))
    return {
        "metric": "gwnet_12step_forecast_latency",
        "value": round(best, 3),
        "unit": "ms (amortized, B=1)",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_gwnet_stack(steps=50) -> Dict:
    """Whole-stack fused gwnet kernel vs the XLA module, eval mode —
    the op-latency-bound case per-layer fusion cannot win
    (BENCHMARKS.md): one Pallas program holding the entire serial chain.

    Reports interleaved dispatch-inclusive latency AND chained-
    composition device compute (REPS serially-dependent forwards inside
    one jit) for B=1 and B=16."""
    from multimodal_outage_tpu.models.gwnet import GraphWaveNet
    from multimodal_outage_tpu.ops.gwnet_stack_pallas import (
        adaptive_supports,
        gwnet_stack_forward,
        stack_params_from_module,
    )

    n, t, c_in = 67, 12, 320
    sup = jnp.eye(n)[None]
    interpret = jax.default_backend() != "tpu"
    detail = {}
    reps = 20
    for b in (1, 16):
        x = jax.random.normal(jax.random.PRNGKey(0), (b, n, t, c_in))
        m = GraphWaveNet(out_dim=256)
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            x, sup, train=False,
        )
        p = variables["params"]
        sp = stack_params_from_module(
            p, variables["batch_stats"], n_layers=m.blocks * m.layers
        )
        all_sup = adaptive_supports(sup, p.get("nodevec1"), p.get("nodevec2"))

        xla_fwd = jax.jit(lambda v, x, s: m.apply(v, x, s, train=False))
        stack_fwd = jax.jit(
            lambda x, a, sp: gwnet_stack_forward(
                x, a, sp, order=m.order, interpret=interpret
            )
        )
        fns = {
            "xla": lambda: xla_fwd(variables, x, sup),
            "stack": lambda: stack_fwd(x, all_sup, sp),
        }
        res = _interleaved_ab(fns, steps)
        for name, sec in res.items():
            detail[f"b{b}_{name}_ms"] = round(sec * 1e3, 3)

        # chained composition: REPS dependent forwards in ONE program
        def chain(fwd_core, x0):
            def body(i, acc):
                y = fwd_core(acc)
                return jnp.pad(
                    y, [(0, 0)] * 3 + [(0, c_in - y.shape[-1])]
                )
            return jax.lax.fori_loop(0, reps, body, x0)

        xla_chain = jax.jit(
            lambda v, x0, s: chain(
                lambda a: m.apply(v, a[..., :c_in] * 0 + x, s, train=False),
                x0,
            )
        )
        stack_chain = jax.jit(
            lambda x0, a, sp: chain(
                lambda acc: gwnet_stack_forward(
                    acc[..., :c_in] * 0 + x, a, sp,
                    order=m.order, interpret=interpret,
                ),
                x0,
            )
        )
        fns_c = {
            "xla": lambda: xla_chain(variables, jnp.zeros_like(x), sup),
            "stack": lambda: stack_chain(jnp.zeros_like(x), all_sup, sp),
        }
        res_c = _interleaved_ab(fns_c, max(steps // 10, 3))
        for name, sec in res_c.items():
            detail[f"b{b}_{name}_device_us"] = round(sec / reps * 1e6, 1)
    return {
        "metric": "gwnet_stack_forecast_latency",
        "value": detail.get("b1_stack_ms"),
        "unit": "ms (amortized, B=1, whole-stack kernel)",
        "vs_baseline": None,
        "detail": detail,
    }


def bench_fusion_inference(steps=20) -> Dict:
    """Full fusion forward latency, B=1, 67 counties, horizon 7."""
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

    fwd = jax.jit(lambda v, x, f, s: model.apply(v, x, f, s, train=False))
    sec = _timed_window(
        lambda: fwd(variables, batch["x"], batch["date_feats"], supports),
        steps,
    )
    return {
        "metric": "fusion_inference_latency",
        "value": round(sec * 1e3, 3),
        "unit": "ms (amortized, B=1, 67 counties, horizon 7)",
        "vs_baseline": None,
        "detail": {},
    }


def bench_serving(steps=20) -> Dict:
    """ServingModel (BN-folded, dropout-elided engine) vs the plain flax
    eval forward; plus batch-16 serving throughput."""
    from multimodal_outage_tpu.serving import ServingModel

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

    flax_fwd = jax.jit(lambda v, x, f, s: model.apply(v, x, f, s, train=False))
    serve = ServingModel(model_cfg, variables, supports)
    res = _interleaved_ab(
        {
            "flax": lambda: flax_fwd(
                variables, batch["x"], batch["date_feats"], supports
            ),
            "serve": lambda: serve(batch["x"], batch["date_feats"]),
        },
        steps,
    )
    sec_flax, sec_serve = res["flax"], res["serve"]

    big = _device_batch(16, 67, t, 128)
    sec_big = _timed_window(
        lambda: serve(big["x"], big["date_feats"]), max(steps // 3, 5)
    )
    return {
        "metric": "serving_engine_latency",
        "value": round(sec_serve * 1e3, 3),
        "unit": "ms (amortized, B=1, 67 counties, horizon 7)",
        "vs_baseline": None,
        "detail": {
            "flax_eval_ms": round(sec_flax * 1e3, 3),
            "speedup_vs_flax": round(sec_flax / sec_serve, 3),
            "b16_throughput_tiles_per_sec": round(16 * 67 * t / sec_big, 0),
        },
    }


def bench_conv_layout(steps=12) -> Dict:
    """VERDICT r2 #1 lever (b): conv dimension_numbers / input layout,
    isolated on the exact stem shapes where the profile's relayout
    copies live ([3752,128,128,1→4→4] DoubleConv + 2×2 maxpool, fwd+bwd
    at the headline's conv batch). The full model is NHWC (flax);
    re-plumbing it per layout is only worth doing if some layout wins in
    isolation, so this is the go/no-go receipt. Variants (interleaved,
    same-noise):

      nhwc        ('NHWC','HWIO','NHWC') — what the model does today
      nchw        ('NCHW','OIHW','NCHW'), input pre-transposed OUTSIDE
                  the timed region (upper bound for a channels-first
                  re-plumb of the whole model)
      nchw_xpose  same, but transposing at the jit boundary (the honest
                  cost if only the stem switched layouts)
    """
    from functools import partial

    m, s = 3752, 128
    key = jax.random.PRNGKey(0)
    x_nhwc = jax.random.normal(key, (m, s, s, 1), jnp.bfloat16)
    x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    k1 = jax.random.normal(key, (3, 3, 1, 4), jnp.bfloat16) * 0.2
    k2 = jax.random.normal(key, (3, 3, 4, 4), jnp.bfloat16) * 0.2

    def stem(x, w1, w2, dn, kfmt):
        if kfmt == "OIHW":
            w1t, w2t = (jnp.transpose(w, (3, 2, 0, 1)) for w in (w1, w2))
        else:
            w1t, w2t = w1, w2
        y = jax.lax.conv_general_dilated(
            x, w1t, (1, 1), "SAME", dimension_numbers=dn
        )
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, w2t, (1, 1), "SAME", dimension_numbers=dn
        )
        y = jax.nn.relu(y)
        if dn[0] == "NHWC":
            win, st = (1, 2, 2, 1), (1, 2, 2, 1)
        else:
            win, st = (1, 1, 2, 2), (1, 1, 2, 2)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, win, st, "VALID"
        )
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    def loss_fn(x, w1, w2, dn, kfmt):
        return stem(x, w1, w2, dn, kfmt)

    nhwc_dn = ("NHWC", "HWIO", "NHWC")
    nchw_dn = ("NCHW", "OIHW", "NCHW")
    g_nhwc = jax.jit(jax.grad(
        partial(loss_fn, dn=nhwc_dn, kfmt="HWIO"), argnums=(1, 2)
    ))
    g_nchw = jax.jit(jax.grad(
        partial(loss_fn, dn=nchw_dn, kfmt="OIHW"), argnums=(1, 2)
    ))

    def loss_xpose(x, w1, w2):
        return loss_fn(
            jnp.transpose(x, (0, 3, 1, 2)), w1, w2, nchw_dn, "OIHW"
        )

    g_xpose = jax.jit(jax.grad(loss_xpose, argnums=(1, 2)))

    fns = {
        "nhwc": lambda: g_nhwc(x_nhwc, k1, k2)[0],
        "nchw": lambda: g_nchw(x_nchw, k1, k2)[0],
        "nchw_xpose": lambda: g_xpose(x_nhwc, k1, k2)[0],
    }
    res = _interleaved_ab(fns, steps)
    detail = {name: round(1e3 * sec, 3) for name, sec in res.items()}
    best = min(detail, key=detail.get)
    return {
        "metric": "stem_conv_layout_ms",
        "value": detail["nhwc"],
        "unit": f"ms fwd+bwd, stem DoubleConv+pool (best {best})",
        "vs_baseline": round(detail["nhwc"] / detail[best], 3),
        "detail": detail,
    }


# Peak hardware rates for the speed-of-light floor, by device_kind
# substring. Public numbers: bf16 matmul TFLOP/s and HBM GB/s.
_PEAKS = {
    "v5 lite": (197e12, 819e9),  # TPU v5e
    "v5p": (459e12, 2765e9),
    "v4": (275e12, 1228e9),
    "v6": (918e12, 1640e9),  # Trillium
}


def _device_peaks():
    kind = jax.devices()[0].device_kind.lower()
    for sub, peaks in _PEAKS.items():
        if sub in kind:
            return kind, peaks
    return kind, (None, None)


def _compiled_cost(compiled):
    """(flops, bytes accessed) from an AOT-compiled executable's XLA cost
    analysis. Bytes are the compiler's post-fusion HBM-traffic estimate
    (operands + outputs of fused computations) — the right numerator for
    a bandwidth floor; flops count MACs as 2."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _roofline_report(flops: float, byts: float, sec: float):
    """(detail dict, fraction-of-speed-of-light) against this device's
    peak MXU rate and HBM bandwidth: floor = max(flops/peak_mxu,
    bytes/peak_bw); fraction = floor / measured."""
    kind, (peak_flops, peak_bw) = _device_peaks()
    detail = {
        "device_kind": kind,
        "gflops_per_step": round(flops / 1e9, 1),
        "gbytes_per_step": round(byts / 1e9, 3),
        "measured_ms": round(sec * 1e3, 2),
    }
    if peak_flops and flops and byts:
        t_mxu = flops / peak_flops
        t_hbm = byts / peak_bw
        floor = max(t_mxu, t_hbm)
        detail.update(
            mxu_floor_ms=round(t_mxu * 1e3, 2),
            hbm_floor_ms=round(t_hbm * 1e3, 2),
            bound="hbm" if t_hbm >= t_mxu else "mxu",
            arithmetic_intensity=round(flops / byts, 1),
        )
        frac = floor / sec
    else:
        frac = float("nan")
    return detail, frac


def bench_roofline(steps=12) -> Dict:
    """Speed-of-light receipt for the headline train step.

    Compiles the EXACT headline program (make_e2e_setup b=8) and asks
    XLA's cost analysis for its FLOPs and bytes accessed, then compares
    the fetch-synced measured step time against the hardware floor
    max(flops/peak_mxu, bytes/peak_hbm_bw). The achieved fraction
    quantifies how much headroom any further optimization could buy:
    the step is memory-bound (MXU work is ~18% of the profile), so the
    bytes/bandwidth term is the binding floor, and the gap between it
    and the measured time is the relayout/fusion overhead measured in
    the layout matrix (BENCHMARKS.md) plus dispatch.

    Note cost_analysis bytes are the compiler's post-fusion estimate of
    HBM traffic (operands + outputs of fused computations), which is the
    right numerator for a bandwidth floor; flops count MACs as 2.

    donate=True deliberately: the headline step donates its train state,
    and aliasing changes the compiled program's allocation/copy behavior
    — a donate=False roofline would characterize a program nobody ships.
    The timed loop executes the SAME AOT-compiled executable the cost
    analysis came from (lower().compile() does not populate the jit
    dispatch cache, so calling `step` would pay a second full compile —
    tens of minutes on a cold remote compile service).
    """
    su = make_e2e_setup(8, donate=True)
    step, batch0 = su["step"], su["batch0"]
    supports, lr, rng = su["supports"], su["lr"], su["rng"]
    state = su["state"]

    compiled = step.lower(state, batch0, supports, lr, rng).compile()
    flops, byts = _compiled_cost(compiled)

    holder = {"state": state}

    def run():
        holder["state"], m = compiled(
            holder["state"], batch0, supports, lr, rng
        )
        return m["loss"]

    sec = _timed_window(run, steps)
    detail, frac = _roofline_report(flops, byts, sec)
    return {
        "metric": "train_step_fraction_of_speed_of_light",
        "value": round(frac, 3),
        "unit": "floor/measured (1.0 = at hardware floor)",
        "vs_baseline": round(frac, 3),
        "detail": detail,
    }


def bench_serving_roofline(steps=20) -> Dict:
    """Speed-of-light receipt for the serving engine's batched forward.

    Same method as bench_roofline, applied to the EXACT ServingModel
    program (BN-folded, dropout-elided, whole-stack st-GNN kernel per
    the engine's own default policy) at the B=16 throughput shape. B=1
    serving is dispatch-floor-bound on this tunneled backend (~1.3 ms
    of the wall is dispatch; see the chained-composition analysis in
    BENCHMARKS.md), so a B=1 roofline would measure the tunnel, not the
    program — the throughput shape is where the device-compute fraction
    is an actionable number. The timed loop executes the SAME
    AOT-compiled executable the cost analysis came from (same reasoning
    as bench_roofline: lower().compile() does not populate the jit
    dispatch cache).

    Serving contract: serving.py:ServingModel.__call__; eval forward
    parity with the reference harness tlit.py:64-90.
    """
    from multimodal_outage_tpu.serving import ServingModel

    model_cfg = ModelConfig(compute_dtype="bfloat16")
    t, b = 7, 16
    model = build_model(model_cfg, horizon=t)
    batch = _device_batch(b, 67, t, 128)
    supports = jnp.eye(67)[None]
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["x"][:1], batch["date_feats"][:1], supports, train=False,
    )
    serve = ServingModel(model_cfg, variables, supports)
    args = (
        serve.params, serve.batch_stats, batch["x"], batch["date_feats"],
        serve.supports, getattr(serve, "_stack_sp", None),
        getattr(serve, "_stack_supports", None),
    )
    compiled = serve._jitted.lower(*args).compile()
    flops, byts = _compiled_cost(compiled)

    sec = _timed_window(lambda: compiled(*args), steps)
    detail, frac = _roofline_report(flops, byts, sec)
    tiles = b * 67 * t
    detail["tiles_per_sec"] = round(tiles / sec, 0)
    return {
        "metric": "serving_b16_fraction_of_speed_of_light",
        "value": round(frac, 3),
        "unit": "floor/measured (1.0 = at hardware floor)",
        "vs_baseline": round(frac, 3),
        "detail": detail,
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
    holder = {"state": state}

    def run():
        holder["state"], m = step(holder["state"], batch, supports, lr, rng)
        return m["loss"]

    sec = _timed_window(run, steps)
    tiles = b * n * t
    return {
        "metric": "sharded_pipeline_tiles_per_sec",
        "value": round(tiles / sec, 1),
        "unit": f"tiles/sec ({n_dev} devices)",
        "vs_baseline": None,
        "detail": {"devices": n_dev, "batch": b},
    }


def bench_grad_accum_sync(steps=12) -> Dict:
    """The auto-grad-accum OOM-guard's per-step host fetch, isolated
    (VERDICT r3 weak #4): interleaved A/B at the reference batch 16
    (--grad_accum 2 program, the only way b=16 fits a 16 GB chip) of
      pipelined — dispatch the accum step and return the device metric
                  handle (what explicit --grad_accum K does, and what
                  auto does after _AUTO_ACCUM_SETTLE successes)
      synced    — dispatch + jax.device_get of the loss each step (what
                  auto used to do every step, r3)
    The ratio is the tax the settle fix removes. Run on the real e2e
    path (HBM store gather + fused accum train step)."""
    from multimodal_outage_tpu.core.registry import HURRICANES
    from multimodal_outage_tpu.data.dataset import WindowDataset
    from multimodal_outage_tpu.data.pipeline import DevicePipeline
    from multimodal_outage_tpu.data.store import load_store
    from multimodal_outage_tpu.train.steps import make_accum_train_step

    b, t, s = 16, 7, 128
    store = load_store(_e2e_store_dir())
    ds = WindowDataset.from_case_study(
        store, HURRICANES, dataset_range=15, horizon=t
    )
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    model = build_model(model_cfg, horizon=t)
    supports = jnp.eye(store.n_counties)[None]
    rng = jax.random.PRNGKey(0)
    pipe = DevicePipeline(store, 3.2, 10.4, s)
    batch0 = pipe.batch(ds, np.arange(b))
    state = create_train_state(model, rng, batch0, supports)
    step = make_accum_train_step(model, 2, donate=False)
    lr = jnp.float32(1e-3)
    holder = {"state": state, "i": 0}
    n_samples = len(ds)

    def dispatch():
        batch = pipe.batch(ds, (np.arange(b) + holder["i"]) % (n_samples - b))
        holder["i"] += 1
        holder["state"], m = step(holder["state"], batch, supports, lr, rng)
        return m["loss"]

    def synced():
        loss = dispatch()
        jax.device_get(loss)  # the r3 auto-mode per-step OOM guard
        return loss

    res = _interleaved_ab({"pipelined": dispatch, "synced": synced}, steps)
    tiles = b * store.n_counties * t
    return {
        "metric": "grad_accum_sync_tax",
        "value": round(res["synced"] / res["pipelined"], 4),
        "unit": "synced/pipelined step-time ratio (b=16, accum 2)",
        "vs_baseline": None,
        "detail": {
            "pipelined_tiles_per_sec": round(tiles / res["pipelined"], 1),
            "synced_tiles_per_sec": round(tiles / res["synced"], 1),
            "pipelined_step_ms": round(res["pipelined"] * 1e3, 2),
            "synced_step_ms": round(res["synced"] * 1e3, 2),
        },
    }


def bench_serving_sharded(steps=10) -> Dict:
    """SPMD batched serving (BASELINE config 5 is a full-state RUN, not
    just a sharded train step): a mesh ServingModel over all attached
    devices, requests sharded B-over-data, params under the TP layouts.
    On 1 chip this is mesh (1,1,1) — it records that the sharded serving
    path exists and what it costs vs the single-device engine (the GSPMD
    program on a 1-device mesh is the same computation, so the delta is
    partitioning overhead, expected ~0)."""
    from multimodal_outage_tpu.core.mesh import make_mesh
    from multimodal_outage_tpu.parallel.sharding import shard_batch
    from multimodal_outage_tpu.serving import ServingModel

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1)
    b = 16 * n_dev
    n, t, s = 67, 7, 128
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    model = build_model(model_cfg, horizon=t)
    batch = _device_batch(b, n, t, s)
    supports = jnp.eye(n)[None]
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        batch["x"], batch["date_feats"], supports, train=False,
    )
    serve = ServingModel(model_cfg, variables, supports, mesh=mesh)
    sharded = shard_batch(
        mesh, {"x": batch["x"], "date_feats": batch["date_feats"]}
    )
    sec = _timed_window(
        lambda: serve(sharded["x"], sharded["date_feats"]), steps
    )
    tiles = b * n * t
    return {
        "metric": "serving_sharded_tiles_per_sec",
        "value": round(tiles / sec, 1),
        "unit": f"tiles/sec ({n_dev} devices, B={b})",
        "vs_baseline": None,
        "detail": {"devices": n_dev, "batch": b},
    }


def bench_auto_layout(steps=12) -> Dict:
    """XLA auto layout assignment for the headline train step's
    arguments (jax.experimental.layout Format(Layout.AUTO), AOT compile):
    default jit pins JAX's default layouts on every entry/exit buffer,
    and the r3 profile's 26.7% copy bucket includes whatever relayouts
    XLA must insert to get from those to its preferred internal layouts.
    Letting layout assignment choose the boundary layouts (state donated,
    so its in/out layouts unify and persist across steps) removes the
    state-side relayouts entirely; per-batch feeds are device_put into
    the chosen layout (counted in the measured window — that transfer is
    exactly the cost the default path pays as an in-program relayout).

    Interleaved A/B against the stock jitted step on the REAL e2e path.
    """
    from jax.experimental.layout import Format, Layout

    from multimodal_outage_tpu.train.steps import (
        default_compiler_options,
        make_train_step,
    )

    b = 8
    su = make_e2e_setup(b)  # donate=True: the headline config
    ds, pipe = su["ds"], su["pipe"]
    model, supports = su["model"], su["supports"]
    lr, rng = su["lr"], su["rng"]
    n_samples = len(ds)
    base_step = su["step"]

    # two independent state chains — both candidates donate theirs
    state_a = su["state"]
    state_b = jax.tree.map(jnp.array, state_a)

    # candidate B: the same step, AOT-compiled with AUTO layouts
    raw = make_train_step(model, donate=True, raw=True)
    auto_jit = jax.jit(
        raw,
        in_shardings=Format(Layout.AUTO),
        out_shardings=Format(Layout.AUTO),
        donate_argnums=(0,),
        compiler_options=default_compiler_options(),
    )
    batch0 = pipe.batch(ds, np.arange(b))
    compiled = auto_jit.lower(
        state_b, batch0, supports, lr, rng
    ).compile()
    state_fmt, batch_fmt, sup_fmt, lr_fmt, rng_fmt = compiled.input_formats[0]
    # how many entry buffers got a non-default layout (0 ⇒ the compiler
    # already liked the defaults and any measured delta is noise)
    changed = sum(
        int(repr(want.layout) != repr(have.format.layout))
        for want, have in zip(
            jax.tree.leaves((state_fmt, batch_fmt, sup_fmt)),
            jax.tree.leaves((state_b, batch0, supports)),
        )
    )
    state_auto = jax.device_put(state_b, state_fmt)
    sup_auto = jax.device_put(supports, sup_fmt)
    lr_auto = jax.device_put(lr, lr_fmt)
    rng_auto = jax.device_put(rng, rng_fmt)
    holder = {"base": state_a, "auto": state_auto, "i": 0}

    def next_batch():
        batch = pipe.batch(ds, (np.arange(b) + holder["i"]) % (n_samples - b))
        holder["i"] += 1
        return batch

    def run_base():
        holder["base"], m = base_step(
            holder["base"], next_batch(), supports, lr, rng
        )
        return m["loss"]

    def run_auto():
        batch = jax.device_put(next_batch(), batch_fmt)
        holder["auto"], m = compiled(
            holder["auto"], batch, sup_auto, lr_auto, rng_auto
        )
        return m["loss"]

    res = _interleaved_ab({"default": run_base, "auto": run_auto}, steps)
    tiles = b * su["store"].n_counties * 7
    return {
        "metric": "auto_layout_speedup",
        "value": round(res["default"] / res["auto"], 4),
        "unit": "default/auto step-time ratio (b=8 e2e, >1 ⇒ auto wins)",
        "vs_baseline": None,
        "detail": {
            "default_tiles_per_sec": round(tiles / res["default"], 1),
            "auto_tiles_per_sec": round(tiles / res["auto"], 1),
            "default_step_ms": round(res["default"] * 1e3, 2),
            "auto_step_ms": round(res["auto"] * 1e3, 2),
            "args_with_non_default_layout": changed,
        },
    }


_BENCHMARKS = {
    "e2e_train": bench_e2e_train,
    "batch_scaling": bench_batch_scaling,
    "dcrnn": bench_dcrnn,
    "unet_train": bench_unet_train,
    "serving": bench_serving,
    "fusion_inference": bench_fusion_inference,
    "unet_cpu_b4": bench_unet_cpu_b4,
    "gwnet_forecast": bench_gwnet_forecast,
    "gwnet_stack": bench_gwnet_stack,
    "dcrnn_stack": bench_dcrnn_stack,
    "layout_matrix": bench_layout_matrix,
    "pool_pallas": bench_pool_pallas,
    "remat_conv": bench_remat_conv,
    "conv_layout": bench_conv_layout,
    "roofline": bench_roofline,
    "serving_roofline": bench_serving_roofline,
    "xla_flag_sweep": bench_xla_flag_sweep,
    "fused_stack": bench_fused_stack,
    "multimodal_fusion": bench_multimodal_fusion,
    "sharded_pipeline": bench_sharded_pipeline,
    "serving_sharded": bench_serving_sharded,
    "grad_accum_sync": bench_grad_accum_sync,
    "auto_layout": bench_auto_layout,
}


def run_benchmark(name: str, steps: int = 15) -> Dict:
    if name not in _BENCHMARKS:
        raise ValueError(f"unknown benchmark {name!r}: {sorted(_BENCHMARKS)}")
    return _BENCHMARKS[name](steps=steps)
