"""Probe: does the train step's winning scoped-VMEM compiler option
(48 MiB, BENCHMARKS.md "XLA compiler-options sweep") also buy anything
on the SERVING engine's batched forward?

Motivated by bench --config serving_roofline measuring the B=16 serving
program at 0.566 of its HBM floor — more headroom than the train step's
0.70 — with no compiler options applied to the serving jit at all.
Interleaved same-noise A/B across VMEM budgets; a winner becomes the
ServingModel default, a tie becomes a BENCHMARKS.md receipt.

Run standalone on the real chip (one TPU process at a time):
    python tools/probe_serving_vmem.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from multimodal_outage_tpu.benchmarks import (
    _device_batch,
    _interleaved_ab,
)
from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.serving import ServingModel


def main(steps=16):
    print(f"devices: {jax.devices()}")
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

    budgets = {"base": None, "vmem32": 32768, "vmem48": 49152,
               "vmem64": 65536}
    fns = {}
    for name, kib in budgets.items():
        opts = (
            {"xla_tpu_scoped_vmem_limit_kib": str(kib)} if kib else None
        )
        jf = jax.jit(serve._forward, compiler_options=opts)
        try:
            out = jf(*args)
            float(jnp.ravel(out)[0])  # compile + sync now
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"{name}: failed {str(e)[:100]}")
            continue
        fns[name] = (lambda f=jf: f(*args))
    res = _interleaved_ab(fns, steps)
    tiles = b * 67 * t
    base = res.get("base")
    for name, sec in sorted(res.items(), key=lambda kv: kv[1]):
        rel = f" ({base / sec:.3f}x vs base)" if base else ""
        print(
            f"{name}: {1e3 * sec:.3f} ms  "
            f"{tiles / sec:,.0f} tiles/s{rel}"
        )


if __name__ == "__main__":
    main()
