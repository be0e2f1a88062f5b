"""Whole-stack fused Graph WaveNet forward (eval mode) in one Pallas kernel.

Why this exists — measured motivation (BENCHMARKS.md "Pallas kernel
A/Bs"): the 67-node Graph WaveNet (reference models/graph_wavenet.py:
188-256) is op-LATENCY-bound, not FLOPs-bound. Its forward is a serial
chain of ~30 tiny matmuls (67 nodes pad to one 128-lane tile; channels
32-512), and both XLA and a per-layer fused kernel take ~1.6 ms at B=1
— 16× more work at B=16 costs XLA the same 1.6 ms. No per-op or
per-layer improvement can beat a floor set by inter-op latency, so this
kernel removes the ops: the ENTIRE stack — start projection, all
blocks·layers of (gated unit → skip accumulation → order-K diffusion
GCN → residual → folded BatchNorm affine) and the two end projections —
runs inside ONE Pallas program with every weight VMEM-resident
(~1 MB total, far under the ~16 MB budget).

Eval-mode only by design: BatchNorm folds to a per-channel affine
(running stats), dropout is elided — exactly the ServingModel contract
(serving.py). Training keeps the flax/XLA path, whose backward XLA
already handles well.

Layout: positions-major rows [BLK·NP, C] for channel matmuls. The
node-mixing diffusion runs node-major as A_sᵀ [NP,NP] @ G_n [NP,
BLK·Cd] — ONE MXU op covering every (b,t) position per support per
order (supports are shared across positions). Mosaic rejects the
lane-crossing shape casts that would express the [BLK·NP, Cd] ↔
[NP, BLK·Cd] relayout directly (reshape/transpose/3D dot_general all
fail "infer-vector-layout: unsupported shape cast"), so the relayout
is staged through VMEM scratch with static per-position block copies —
only 2D dots and static slices, which Mosaic lowers cleanly. All
diffusion terms land in one [BLK·NP, terms·Cd] scratch so each layer's
graph-conv projection is a single matmul. Grid blocks over (b·t)
positions when B·T exceeds block_bt; weights stay resident.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_outage_tpu.ops.common import LANES, round_up as _round_up  # noqa: E501

# Eval-mode BatchNorm as y = x·A + B (per channel) — the one folding
# definition, shared with the U-Net serving path.
from multimodal_outage_tpu.ops.unet_pallas import (
    fold_batchnorm as fold_bn_affine,
)


def _stack_kernel(
    x_ref,  # [BLK, NP, Cin]
    at_ref,  # [S, NP, NP] supports, transposed (Aᵀ) & padded
    sw_ref,  # [Cin, C] start_conv
    sb_ref,  # [1, C]
    wf_ref,  # [L, C, Cd]
    bf_ref,  # [L, 1, Cd]
    wg_ref,  # [L, C, Cd]
    bg_ref,  # [L, 1, Cd]
    ws_ref,  # [L, Cd, Cs]
    bs_ref,  # [L, 1, Cs]
    wc_ref,  # [L, (S·order+1)·Cd, C]
    bc_ref,  # [L, 1, C]
    aa_ref,  # [L, 1, C] folded-BN scale  (post-residual affine)
    ab_ref,  # [L, 1, C] folded-BN bias
    e1w_ref,  # [Cs, Ce]
    e1b_ref,  # [1, Ce]
    e2w_ref,  # [Ce, Cout]
    e2b_ref,  # [1, Cout]
    y_ref,  # out [BLK, NP, Cout]
    gn_ref,  # VMEM scratch [NP, BLK·Cd] — node-major staging
    terms_ref,  # VMEM scratch [BLK·NP, (S·order+1)·Cd] — diffusion terms
    *,
    order: int,
):
    blk, np_, cin = x_ref.shape
    n_layers = wf_ref.shape[0]
    cd = wf_ref.shape[2]
    cs = ws_ref.shape[2]
    s_count = at_ref.shape[0]
    f32 = jnp.float32

    x2 = x_ref[:].reshape(blk * np_, cin)
    h = (
        jnp.dot(x2, sw_ref[:], preferred_element_type=f32) + sb_ref[:]
    ).astype(x2.dtype)  # [R, C]

    skip = jnp.zeros((blk * np_, cs), f32)
    for i in range(n_layers):  # static unroll — the whole serial chain
        filt = jnp.tanh(
            jnp.dot(h, wf_ref[i], preferred_element_type=f32) + bf_ref[i]
        )
        gate = jax.nn.sigmoid(
            jnp.dot(h, wg_ref[i], preferred_element_type=f32) + bg_ref[i]
        )
        g = (filt * gate).astype(h.dtype)  # [R, Cd]

        skip += jnp.dot(g, ws_ref[i], preferred_element_type=f32) + bs_ref[i]

        # stage g node-major: gn[:, p·Cd:(p+1)·Cd] = g rows of position p
        terms_ref[:, 0:cd] = g  # order-0 term
        g3 = g.reshape(blk, np_, cd)
        for p in range(blk):
            gn_ref[:, p * cd : (p + 1) * cd] = g3[p]
        j = 1
        for s in range(s_count):
            cur = gn_ref[:]
            for _ in range(order):
                # one MXU op mixes nodes for EVERY position
                cur = jnp.dot(
                    at_ref[s], cur, preferred_element_type=f32
                ).astype(g.dtype)  # [NP, BLK·Cd]
                for p in range(blk):  # stage back positions-major
                    terms_ref[
                        p * np_ : (p + 1) * np_, j * cd : (j + 1) * cd
                    ] = cur[:, p * cd : (p + 1) * cd]
                j += 1
        # all diffusion terms → one graph-conv projection matmul
        acc = jnp.dot(terms_ref[:], wc_ref[i], preferred_element_type=f32)

        h_new = acc + bc_ref[i] + h.astype(f32)  # gconv bias + residual
        h = (h_new * aa_ref[i] + ab_ref[i]).astype(h.dtype)  # folded BN

    out = jnp.maximum(skip, 0.0).astype(h.dtype)
    out = jnp.maximum(
        jnp.dot(out, e1w_ref[:], preferred_element_type=f32) + e1b_ref[:],
        0.0,
    ).astype(h.dtype)
    out = jnp.dot(out, e2w_ref[:], preferred_element_type=f32) + e2b_ref[:]
    y_ref[:] = out.reshape(blk, np_, -1).astype(y_ref.dtype)


def stack_params_from_module(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    n_layers: int,
    eps: float = 1e-5,
) -> Dict[str, jnp.ndarray]:
    """Flatten a GraphWaveNet fused-path param tree (models/gwnet.py
    naming: filter_conv{i}_kernel …, bn{i}, start_conv, end_conv_1/2)
    into the stacked arrays the kernel consumes, with BatchNorm folded."""
    sp = {
        "start_w": params["start_conv"]["kernel"],
        "start_b": params["start_conv"]["bias"],
        "e1w": params["end_conv_1"]["kernel"],
        "e1b": params["end_conv_1"]["bias"],
        "e2w": params["end_conv_2"]["kernel"],
        "e2b": params["end_conv_2"]["bias"],
    }
    stacks: Dict[str, list] = {
        k: [] for k in ("wf", "bf", "wg", "bg", "ws", "bs", "wc", "bc", "aa", "ab")
    }
    for i in range(n_layers):
        stacks["wf"].append(params[f"filter_conv{i}_kernel"])
        stacks["bf"].append(params[f"filter_conv{i}_bias"])
        stacks["wg"].append(params[f"gate_conv{i}_kernel"])
        stacks["bg"].append(params[f"gate_conv{i}_bias"])
        stacks["ws"].append(params[f"skip_conv{i}_kernel"])
        stacks["bs"].append(params[f"skip_conv{i}_bias"])
        stacks["wc"].append(params[f"gconv{i}_kernel"])
        stacks["bc"].append(params[f"gconv{i}_bias"])
        a, b = fold_bn_affine(
            params[f"bn{i}"]["scale"],
            params[f"bn{i}"]["bias"],
            batch_stats[f"bn{i}"]["mean"],
            batch_stats[f"bn{i}"]["var"],
            eps,
        )
        stacks["aa"].append(a)
        stacks["ab"].append(b)
    for k, v in stacks.items():
        sp[k] = jnp.stack(v)
    return sp


def adaptive_supports(
    supports: jnp.ndarray | None,
    nodevec1: jnp.ndarray | None,
    nodevec2: jnp.ndarray | None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Static supports + the learned adaptive adjacency
    (reference graph_wavenet.py:199-203). The formula itself lives in
    models/gwnet.py:adaptive_adjacency — one definition for the flax
    forward and this serving-side support baking."""
    from multimodal_outage_tpu.models.gwnet import adaptive_adjacency

    parts = []
    if supports is not None:
        parts.append(supports.astype(dtype))
    if nodevec1 is not None:
        parts.append(adaptive_adjacency(nodevec1, nodevec2, dtype)[None])
    return jnp.concatenate(parts, axis=0)


def gwnet_stack_forward(
    x: jnp.ndarray,  # [B, N, T, Cin]
    all_supports: jnp.ndarray,  # [S, N, N] static + adaptive
    sp: Dict[str, jnp.ndarray],
    *,
    order: int = 2,
    interpret: bool = False,
    block_bt: int = 16,
) -> jnp.ndarray:
    """One-kernel eval forward of the full stack → [B, N, T, Cout]."""
    b, n, t, cin = x.shape
    cout = sp["e2w"].shape[1]
    np_ = _round_up(n, LANES)
    bt = b * t
    blk = min(block_bt, bt)
    btp = _round_up(bt, blk)

    xn = jnp.transpose(x, (0, 2, 1, 3)).reshape(bt, n, cin)
    xn = jnp.pad(xn, [(0, btp - bt), (0, np_ - n), (0, 0)])
    at = jnp.pad(
        jnp.transpose(all_supports, (0, 2, 1)),
        [(0, 0), (0, np_ - n), (0, np_ - n)],
    ).astype(x.dtype)

    row2 = lambda w: w.reshape(1, -1)
    l_row2 = lambda w: w.reshape(w.shape[0], 1, -1)
    args = (
        xn,
        at,
        sp["start_w"].astype(x.dtype),
        row2(sp["start_b"]).astype(x.dtype),
        sp["wf"].astype(x.dtype),
        l_row2(sp["bf"]).astype(x.dtype),
        sp["wg"].astype(x.dtype),
        l_row2(sp["bg"]).astype(x.dtype),
        sp["ws"].astype(x.dtype),
        l_row2(sp["bs"]).astype(x.dtype),
        sp["wc"].astype(x.dtype),
        l_row2(sp["bc"]).astype(jnp.float32),
        l_row2(sp["aa"]).astype(jnp.float32),
        l_row2(sp["ab"]).astype(jnp.float32),
        sp["e1w"].astype(x.dtype),
        row2(sp["e1b"]).astype(x.dtype),
        sp["e2w"].astype(x.dtype),
        row2(sp["e2b"]).astype(x.dtype),
    )
    cd = sp["wf"].shape[2]
    n_terms = sp["wc"].shape[1] // cd
    kernel = functools.partial(_stack_kernel, order=order)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sliced = lambda ch: pl.BlockSpec(
        (blk, np_, ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    y = pl.pallas_call(
        kernel,
        grid=(btp // blk,),
        out_shape=jax.ShapeDtypeStruct((btp, np_, cout), x.dtype),
        in_specs=[sliced(cin)] + [full()] * 17,
        out_specs=sliced(cout),
        scratch_shapes=[
            pltpu.VMEM((np_, blk * cd), x.dtype),
            pltpu.VMEM((blk * np_, n_terms * cd), x.dtype),
        ],
        interpret=interpret,
    )(*args)
    return jnp.transpose(y[:bt, :n].reshape(b, t, n, cout), (0, 2, 1, 3))


def stack_forward_reference(
    x: jnp.ndarray,
    all_supports: jnp.ndarray,
    sp: Dict[str, jnp.ndarray],
    *,
    order: int = 2,
) -> jnp.ndarray:
    """Plain-jnp mirror of the kernel math (tests; non-TPU fallback)."""
    n_layers = sp["wf"].shape[0]
    cd = sp["wf"].shape[2]
    h = x @ sp["start_w"] + sp["start_b"]
    skip = None
    for i in range(n_layers):
        filt = jnp.tanh(h @ sp["wf"][i] + sp["bf"][i])
        gate = jax.nn.sigmoid(h @ sp["wg"][i] + sp["bg"][i])
        g = filt * gate
        s = g @ sp["ws"][i] + sp["bs"][i]
        skip = s if skip is None else skip + s
        terms = [g]
        for si in range(all_supports.shape[0]):
            t1 = g
            for _ in range(order):
                t1 = jnp.einsum("bvtc,vw->bwtc", t1, all_supports[si])
                terms.append(t1)
        acc = jnp.concatenate(terms, -1) @ sp["wc"][i] + sp["bc"][i]
        h = (acc + h) * sp["aa"][i] + sp["ab"][i]
    out = jax.nn.relu(skip)
    out = jax.nn.relu(out @ sp["e1w"] + sp["e1b"])
    return out @ sp["e2w"] + sp["e2b"]
