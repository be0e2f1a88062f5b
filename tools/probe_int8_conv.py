#!/usr/bin/env python
"""Probe: do int8 MXU convolutions beat bf16 on this chip?

Go/no-go experiment for a quantized serving path. Times the serving
engine's dominant conv shapes (BN-folded U-Net at eval, conv batch
M = B*67*7 images) in bf16 vs int8 (+f32 rescale epilogue), fwd only,
interleaved same-noise (benchmarks._interleaved_ab discipline).

If int8 does not win here it cannot win inside the full engine, and
the receipt goes to BENCHMARKS.md instead of a feature.

Run standalone on the real chip (one TPU process at a time):
    python tools/probe_int8_conv.py
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from multimodal_outage_tpu.benchmarks import _interleaved_ab

# (name, H, Cin, Cout): the serving UNet's conv ladder at eval.
# Stem levels are bandwidth-bound; deep levels are MXU-bound.
CASES = [
    ("stem_128_4_4", 128, 4, 4),
    ("down2_32_16_16", 32, 16, 16),
    ("down4_8_64_64", 8, 64, 64),
]


def bench_case(name, h, cin, cout, m, steps=30):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, h, h, cin), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.2
    xi = (x * 16).astype(jnp.int8)
    wi = (w * 64).astype(jnp.int8)
    scale = jnp.float32(1.0 / (16 * 64))

    @jax.jit
    def conv_bf16(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y)

    @jax.jit
    def conv_int8(xi, wi):
        y = jax.lax.conv_general_dilated(
            xi, wi, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return jax.nn.relu(y.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    fns = {
        "bf16": lambda: conv_bf16(x, w),
        "int8": lambda: conv_int8(xi, wi),
    }
    res = _interleaved_ab(fns, steps)
    r = {k: 1e3 * v for k, v in res.items()}
    print(
        f"{name:18s} M={m}: bf16 {r['bf16']:.3f} ms  int8 {r['int8']:.3f} ms"
        f"  ratio {r['bf16'] / r['int8']:.2f}x"
    )
    return r


def main():
    m = 16 * 67 * 7  # serving B=16 conv batch
    print(f"devices: {jax.devices()}")
    for case in CASES:
        try:
            bench_case(*case, m)
        except Exception as e:  # compile rejection is a result too
            print(f"{case[0]}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
