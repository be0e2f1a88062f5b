"""Roofline receipt plumbing (bench --config roofline).

The full bench compiles the b=8 headline program and runs on the TPU;
these tests pin the two API assumptions it rests on, cheaply, on CPU:
the compiled-executable cost_analysis shape (dict or [dict] across jax
versions) and the device-kind → peak-rates lookup.
"""

import jax
import jax.numpy as jnp

from multimodal_outage_tpu.benchmarks import _PEAKS, _device_peaks


def test_device_peaks_unknown_backend_returns_none():
    # CPU's device_kind matches no TPU generation: the bench must report
    # raw flops/bytes with a NaN fraction instead of crashing
    kind, (pf, pb) = _device_peaks()
    assert isinstance(kind, str)
    if not any(sub in kind for sub in _PEAKS):
        assert pf is None and pb is None


def test_cost_analysis_exposes_flops_and_bytes():
    @jax.jit
    def f(a, b):
        return a @ b

    x = jnp.ones((128, 128), jnp.float32)
    compiled = f.lower(x, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    # a 128^3 matmul is 2*128^3 = 4.19 MFLOPs; any backend's analysis
    # must report at least the MACs
    assert float(ca.get("flops", 0.0)) >= 128**3
    # bytes accessed must cover reading both operands once
    assert float(ca.get("bytes accessed", 0.0)) >= 2 * x.size * 4


def test_peaks_table_is_sane():
    for kind, (pf, pb) in _PEAKS.items():
        assert pf > 1e13 and pb > 1e11, kind


def test_roofline_report_math(monkeypatch):
    """Shared floor math for bench_roofline / bench_serving_roofline:
    floor = max(mxu, hbm) and fraction = floor/measured on a known-peaks
    device; NaN (not a crash) when the device kind is unknown."""
    import math

    from multimodal_outage_tpu import benchmarks as B

    monkeypatch.setattr(
        B, "_device_peaks", lambda: ("fake v5e", (200e12, 800e9))
    )
    # 100 GFLOP, 80 GB → mxu 0.5 ms, hbm 100 ms → hbm-bound floor 100 ms
    detail, frac = B._roofline_report(100e9, 80e9, 0.2)
    assert detail["bound"] == "hbm"
    assert detail["hbm_floor_ms"] == 100.0
    assert abs(frac - 0.5) < 1e-9

    monkeypatch.setattr(B, "_device_peaks", lambda: ("mystery", (None, None)))
    detail, frac = B._roofline_report(100e9, 80e9, 0.2)
    assert math.isnan(frac) and "bound" not in detail


def test_compiled_cost_helper():
    from multimodal_outage_tpu.benchmarks import _compiled_cost

    @jax.jit
    def f(a, b):
        return a @ b

    x = jnp.ones((128, 128), jnp.float32)
    flops, byts = _compiled_cost(f.lower(x, x).compile())
    assert flops >= 128**3 and byts >= 2 * x.size * 4


def test_aot_compiled_donated_step_is_recallable():
    """bench_roofline times the SAME AOT executable its cost analysis
    came from (lower().compile() does not populate the jit dispatch
    cache, so calling the jitted fn would pay a second compile), with
    the headline's donate_argnums=(0,) and the state threaded through.
    Pin that mechanic: repeated calls, one trace, right numerics."""
    import numpy as np

    traces = {"n": 0}

    def f(state, x):
        traces["n"] += 1  # increments at trace time only
        return state + x, (state * x).sum()

    jf = jax.jit(f, donate_argnums=(0,))
    state = jnp.ones((8, 8), jnp.float32)
    x = jnp.full((8, 8), 2.0, jnp.float32)
    compiled = jf.lower(state, x).compile()
    for _ in range(3):
        state, _loss = compiled(state, x)
    assert traces["n"] == 1
    np.testing.assert_allclose(np.asarray(state), np.full((8, 8), 7.0))
