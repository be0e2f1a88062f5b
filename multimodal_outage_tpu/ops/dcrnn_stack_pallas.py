"""Whole-stack fused DCRNN forward (eval mode) in one Pallas kernel.

Why: the DCRNN seq2seq (models/dcrnn.py — re-derived from the reference's
gitignored models/dcrnn.py interface, reference models/unet.py:16-27) is
the same op-LATENCY-bound shape the whole-stack gwnet kernel
(ops/gwnet_stack_pallas.py) already beat 2.4×: (T encoder + horizon
decoder) steps × num_rnn_layers DCGRU cells, each cell two diffusion
convolutions of a few tiny matmuls on a 67-node graph. At B=1 that is
~300 serially-dependent sub-millisecond XLA ops, so forecast latency is
set by inter-op dispatch, not FLOPs (measured 5.23 ms vs ~1 ms of
device compute, BENCHMARKS.md). This kernel runs the ENTIRE encoder +
decoder recurrence inside ONE Pallas program with every weight
VMEM-resident (~1.8 MB bf16 at rnn_units=64 — far under the ~16 MB
budget).

Layout: one grid step per batch sample, everything node-major
[NP=round_up(N,128), C] — the time recurrence is serial regardless, so
rows are nodes (padded to the 128-lane tile) and no cross-position
batching (or the lane-crossing relayouts it needs, see
gwnet_stack_pallas) is required. The DCGRU input concat([x, h]) and the
diffusion-term concat are never materialized: concatenation into a
Dense is algebraically a sum of per-slice matmuls, and the Chebyshev
diffusion T_k(concat(x, h)) = concat(T_k(x), T_k(h)) since node mixing
is feature-wise — so the packer splits each projection kernel into
per-term × per-part blocks and the kernel accumulates plain 2-D dots
(the only ones Mosaic lowers cleanly on this chip). The gates' x-part
diffusion chains are reused for the candidate conv (its input differs
only in the h-part, r·h).

Eval-mode only by design: no dropout/teacher forcing — exactly the
ServingModel contract (serving.py). Training keeps the flax scan path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_outage_tpu.ops.common import LANES, round_up as _round_up  # noqa: E501


def _dcrnn_stack_kernel(
    x_ref,  # [1, T, NP, Dx0]
    at_ref,  # [S, NP, NP] supports, transposed (Aᵀ) & padded
    *refs,  # 2·layers cells × (gx, gh, gb, cx, ch, cb), proj_w, proj_b, y_ref
    layers: int,
    horizon: int,
    order: int,
    units: int,
):
    y_ref = refs[-1]
    wr = refs[:-1]
    s_count = at_ref.shape[0]
    np_ = at_ref.shape[1]
    t_in = x_ref.shape[1]
    f32 = jnp.float32
    dtype = x_ref.dtype

    def cell_w(idx: int):
        gx, gh, gb, cx, ch, cb = wr[idx * 6 : idx * 6 + 6]
        return gx, gh, gb, cx, ch, cb

    proj_w, proj_b = wr[2 * layers * 6], wr[2 * layers * 6 + 1]

    def mix(s: int, v):
        # out[w] = Σ_v A[v, w]·x[v]  (DiffusionConv einsum 'vw,bvd->bwd')
        return jnp.dot(at_ref[s], v, preferred_element_type=f32).astype(dtype)

    def chains(v):
        """Chebyshev diffusion terms [v, (per support: T_1..T_K)]."""
        out = [v]
        for s in range(s_count):
            prev, cur = v, mix(s, v)
            out.append(cur)
            for _ in range(2, order + 1):
                nxt = (2.0 * mix(s, cur).astype(f32) - prev.astype(f32)).astype(
                    dtype
                )
                out.append(nxt)
                prev, cur = cur, nxt
        return out

    def proj_sum(terms: List, w_ref, acc):
        for j, tm in enumerate(terms):
            acc = acc + jnp.dot(tm, w_ref[j], preferred_element_type=f32)
        return acc

    def dcgru(idx: int, x_in, h):
        """One DCGRU cell (models/dcrnn.py DCGRUCell), concat-free."""
        gx, gh, gb, cx, ch, cb = cell_w(idx)
        cx_terms = chains(x_in)  # shared by gates and candidate
        ru = proj_sum(cx_terms, gx, gb[:].astype(f32))
        ru = proj_sum(chains(h), gh, ru)
        ru = jax.nn.sigmoid(ru)
        r = ru[:, :units].astype(dtype)
        u = ru[:, units:]
        c = proj_sum(cx_terms, cx, cb[:].astype(f32))
        c = jnp.tanh(proj_sum(chains((r * h.astype(dtype))), ch, c))
        return (u * h.astype(f32) + (1.0 - u) * c).astype(dtype)

    states = [jnp.zeros((np_, units), dtype) for _ in range(layers)]
    for t in range(t_in):  # encoder (models/dcrnn.py _StackedStep scan)
        inp = x_ref[0, t]
        for l in range(layers):
            states[l] = dcgru(l, inp, states[l])
            inp = states[l]

    prev = jnp.zeros((np_, proj_w.shape[1]), dtype)  # GO symbol
    for t in range(horizon):  # decoder (models/dcrnn.py _DecoderStep scan)
        inp = prev
        for l in range(layers):
            states[l] = dcgru(layers + l, inp, states[l])
            inp = states[l]
        out = (
            jnp.dot(inp, proj_w[:], preferred_element_type=f32) + proj_b[:]
        ).astype(dtype)
        y_ref[0, t] = out
        prev = out


def dcrnn_stack_params(
    params: Dict[str, Any],
    *,
    num_rnn_layers: int = 2,
    max_diffusion_step: int = 2,
    n_supports: int,
    input_dim: int,
    output_dim: int,
    rnn_units: int = 64,
) -> Dict[str, Any]:
    """Split a flax DCRNN param tree (models/dcrnn.py naming:
    encoder/decoder → cell{l} → gates|candidate → proj) into the
    per-term × per-part weight blocks the kernel consumes.

    DiffusionConv projects concat(terms) where each term is
    concat(x_part, h_part); rows of its [n_terms·(Dx+U), F] kernel are
    sliced accordingly into kx [n_terms, Dx, F] and kh [n_terms, U, F].
    """
    nt = 1 + n_supports * max_diffusion_step

    def split(conv_p, dx: int):
        k = conv_p["proj"]["kernel"]
        din = dx + rnn_units
        kx = jnp.stack([k[j * din : j * din + dx] for j in range(nt)])
        kh = jnp.stack([k[j * din + dx : (j + 1) * din] for j in range(nt)])
        return kx, kh, conv_p["proj"]["bias"].reshape(1, -1)

    cells = []
    for prefix, d0 in (("encoder", input_dim), ("decoder", output_dim)):
        dx = d0
        for l in range(num_rnn_layers):
            cp = params[prefix][f"cell{l}"]
            gx, gh, gb = split(cp["gates"], dx)
            cx, ch, cb = split(cp["candidate"], dx)
            cells.append((gx, gh, gb, cx, ch, cb))
            dx = rnn_units
    return {
        "cells": cells,
        "proj_w": params["decoder"]["proj"]["kernel"],
        "proj_b": params["decoder"]["proj"]["bias"].reshape(1, -1),
    }


def dcrnn_stack_forward(
    x: jnp.ndarray,  # [B, N, T, Dx0]
    supports: jnp.ndarray,  # [S, N, N]
    sp: Dict[str, Any],
    *,
    horizon: int,
    num_rnn_layers: int = 2,
    max_diffusion_step: int = 2,
    rnn_units: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-kernel eval forward of the full seq2seq → [B, N, horizon, Dout]."""
    b, n, t, dx0 = x.shape
    dout = sp["proj_w"].shape[1]
    np_ = _round_up(n, LANES)

    xn = jnp.pad(
        jnp.transpose(x, (0, 2, 1, 3)), [(0, 0), (0, 0), (0, np_ - n), (0, 0)]
    )  # [B, T, NP, Dx0]
    at = jnp.pad(
        jnp.transpose(supports, (0, 2, 1)),
        [(0, 0), (0, np_ - n), (0, np_ - n)],
    ).astype(x.dtype)

    flat_w = []
    for cell in sp["cells"]:
        flat_w.extend(w.astype(x.dtype) for w in cell)
    flat_w.append(sp["proj_w"].astype(x.dtype))
    flat_w.append(sp["proj_b"].astype(x.dtype))

    kernel = functools.partial(
        _dcrnn_stack_kernel,
        layers=num_rnn_layers,
        horizon=horizon,
        order=max_diffusion_step,
        units=rnn_units,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, horizon, np_, dout), x.dtype),
        in_specs=[
            pl.BlockSpec(
                (1, t, np_, dx0), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [full()] * (1 + len(flat_w)),
        out_specs=pl.BlockSpec(
            (1, horizon, np_, dout), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xn, at, *flat_w)
    return jnp.transpose(y[:, :, :n], (0, 2, 1, 3))


def stack_forward_reference(
    x: jnp.ndarray,
    supports: jnp.ndarray,
    sp: Dict[str, Any],
    *,
    horizon: int,
    num_rnn_layers: int = 2,
    max_diffusion_step: int = 2,
    rnn_units: int = 64,
) -> jnp.ndarray:
    """Plain-jnp mirror of the kernel math (tests; non-TPU fallback)."""
    b, n, t, _ = x.shape
    s_count = supports.shape[0]

    def chains(v):  # v [B, N, D]
        out = [v]
        for s in range(s_count):
            a = supports[s]
            prev, cur = v, jnp.einsum("vw,bvd->bwd", a, v)
            out.append(cur)
            for _ in range(2, max_diffusion_step + 1):
                nxt = 2.0 * jnp.einsum("vw,bvd->bwd", a, cur) - prev
                out.append(nxt)
                prev, cur = cur, nxt
        return out

    def proj_sum(terms, w, acc):
        for j, tm in enumerate(terms):
            acc = acc + tm @ w[j]
        return acc

    def dcgru(cell, x_in, h):
        gx, gh, gb, cx, ch, cb = cell
        cx_terms = chains(x_in)
        ru = jax.nn.sigmoid(proj_sum(chains(h), gh, proj_sum(cx_terms, gx, gb)))
        r, u = ru[..., :rnn_units], ru[..., rnn_units:]
        c = jnp.tanh(
            proj_sum(chains(r * h), ch, proj_sum(cx_terms, cx, cb))
        )
        return u * h + (1.0 - u) * c

    states = [jnp.zeros((b, n, rnn_units), x.dtype)] * num_rnn_layers
    for ti in range(t):
        inp = x[:, :, ti]
        for l in range(num_rnn_layers):
            states[l] = dcgru(sp["cells"][l], inp, states[l])
            inp = states[l]

    prev = jnp.zeros((b, n, sp["proj_w"].shape[1]), x.dtype)
    outs = []
    for _ in range(horizon):
        inp = prev
        for l in range(num_rnn_layers):
            states[l] = dcgru(sp["cells"][num_rnn_layers + l], inp, states[l])
            inp = states[l]
        prev = inp @ sp["proj_w"] + sp["proj_b"]
        outs.append(prev)
    return jnp.stack(outs, axis=2)
