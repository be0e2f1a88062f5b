"""Pallas TPU kernel: fused U-Net DoubleConv (inference path).

Fuses the reference's (Conv3×3 → BN → ReLU) × 2 block
(reference models/unet.py:40-53) into ONE kernel per image tile:
both convolutions, the (eval-mode, weight-folded) batch norms, and both
ReLUs execute with the intermediate activation resident in VMEM — the
inter-conv HBM round-trip XLA's conv fusion cannot eliminate disappears.

Design (see /opt/skills/guides/pallas_guide.md):
  * Grid over the folded (B·N·T) image-batch axis; each program owns one
    [H, W, C] tile (≤ 128·128·64·4B = 4 MB — fits VMEM with headroom).
  * A 3×3 SAME conv is computed as Σ_{dy,dx} shift(x)·W[dy,dx]: nine
    statically-shifted [H·W, C_in] × [C_in, C_out] MXU matmuls accumulated
    in float32 — no im2col materialization.
  * Eval-mode BN is algebraically folded into per-channel scale/bias
    applied in the same kernel (fold_batchnorm below).
  * Gradients: jax.custom_vjp rematerializing the jnp reference — the
    kernel is usable under jax.grad (e.g. eval-mode parity tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_batchnorm(scale, bias, mean, var, eps: float = 1e-5):
    """Eval BN y = (x−μ)·γ/√(σ²+ε) + β  →  per-channel (s, b): y = x·s + b."""
    s = scale * jax.lax.rsqrt(var + eps)
    return s, bias - mean * s


def _conv3x3_same(x2d, h, w, c_in, wk):
    """x2d: [H·W, C_in] view of an [H, W, C_in] tile; wk: [3, 3, C_in, C_out].

    SAME padding via shifted accumulation with zero boundary masking."""
    x = x2d.reshape(h, w, c_in)
    xp = jnp.pad(x, [(1, 1), (1, 1), (0, 0)])
    acc = None
    for dy in range(3):
        for dx in range(3):
            shifted = xp[dy : dy + h, dx : dx + w, :].reshape(h * w, c_in)
            term = jnp.dot(
                shifted, wk[dy, dx], preferred_element_type=jnp.float32
            )
            acc = term if acc is None else acc + term
    return acc  # [H·W, C_out] float32


def _double_conv_kernel(
    x_ref,  # [1, H, W, Cin]
    w1_ref,  # [3, 3, Cin, C]
    s1_ref,  # [1, C] folded BN scale
    b1_ref,  # [1, C] folded BN bias
    w2_ref,  # [3, 3, C, C]
    s2_ref,  # [1, C]
    b2_ref,  # [1, C]
    out_ref,  # [1, H, W, C]
):
    _, h, w, c_in = x_ref.shape
    c = w1_ref.shape[3]
    x2d = x_ref[0].reshape(h * w, c_in)

    y = _conv3x3_same(x2d, h, w, c_in, w1_ref[:])
    y = jnp.maximum(y * s1_ref[:] + b1_ref[:], 0.0).astype(x_ref.dtype)

    y = _conv3x3_same(y, h, w, c, w2_ref[:])
    y = jnp.maximum(y * s2_ref[:] + b2_ref[:], 0.0).astype(out_ref.dtype)
    out_ref[0] = y.reshape(h, w, c)


def _forward_pallas(x, w1, s1, b1, w2, s2, b2, *, interpret: bool):
    """x: [M, H, W, Cin] (M = folded B·N·T) → [M, H, W, C]."""
    m, h, w, c_in = x.shape
    c = w1.shape[3]
    tile = lambda ch: pl.BlockSpec(
        (1, h, w, ch), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _double_conv_kernel,
        grid=(m,),
        out_shape=jax.ShapeDtypeStruct((m, h, w, c), x.dtype),
        in_specs=[tile(c_in)] + [full()] * 6,
        out_specs=tile(c),
        interpret=interpret,
    )(
        x,
        w1.astype(x.dtype),
        s1.reshape(1, -1).astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        w2.astype(x.dtype),
        s2.reshape(1, -1).astype(jnp.float32),
        b2.reshape(1, -1).astype(jnp.float32),
    )


def forward_reference(x, w1, s1, b1, w2, s2, b2):
    """Pure-jnp equivalent (also the backward remat path)."""

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    y = jnp.maximum(conv(x, w1) * s1 + b1, 0.0).astype(x.dtype)
    y = jnp.maximum(conv(y, w2) * s2 + b2, 0.0).astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_double_conv(x, w1, s1, b1, w2, s2, b2, interpret: bool = False):
    """Fused (conv3×3 + foldedBN + ReLU)×2 — Pallas forward, exact grads."""
    return _forward_pallas(x, w1, s1, b1, w2, s2, b2, interpret=interpret)


def _fwd(x, w1, s1, b1, w2, s2, b2, interpret):
    out = _forward_pallas(x, w1, s1, b1, w2, s2, b2, interpret=interpret)
    return out, (x, w1, s1, b1, w2, s2, b2)


def _bwd(interpret, residuals, g):
    _, vjp_fn = jax.vjp(forward_reference, *residuals)
    return vjp_fn(g)


fused_double_conv.defvjp(_fwd, _bwd)
