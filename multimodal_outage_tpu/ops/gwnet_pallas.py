"""Pallas TPU kernel: fused Graph WaveNet layer.

Fuses one WaveNet block layer (reference models/graph_wavenet.py:206-250,
kernel_size=1 — the reference default) into a single kernel:

    gated unit   g = tanh(x·Wf + bf) ⊙ sigmoid(x·Wg + bg)
    skip proj    s = g·Ws + bs
    diffusion    h = concat[g, A₁g, A₁²g, …]·Wc + bc   (order-k recursion)

returning (h, s). The residual add, BatchNorm, dropout, and skip
accumulation stay outside (cheap elementwise; XLA fuses them into the
surrounding program).

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Grid over the B·T time-batch positions; each program computes one
    [N_pad, C] node slice with pure 2-D MXU matmuls — no in-kernel
    reshapes (Mosaic's vector-layout inference rejects minor-dim shape
    casts at these sizes).
  * The node axis N=67 is zero-padded to 128 lanes so the A·g diffusion
    matmuls tile exactly onto the MXU; padded nodes flow zeros.
  * The concat-then-matmul of the diffusion terms is algebraically
    replaced by per-term matmuls against static row-slices of Wc,
    accumulated in float32 — same result, no lane-axis concat.
  * Weights live unblocked in VMEM and are fetched once.
  * Training: jax.custom_vjp whose backward rematerializes the jnp
    reference implementation — Pallas forward everywhere, exact gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_outage_tpu.ops.common import LANES, round_up as _round_up  # noqa: E501


def _gated_diffusion_kernel(
    x_ref,  # [BLK, NP, C]   a block of (b, t) node slices
    a_ref,  # [S, NP, NP]    supports, transposed & padded (Aᵀ)
    wf_ref,  # [C, Cd]
    bf_ref,  # [1, Cd]
    wg_ref,  # [C, Cd]
    bg_ref,  # [1, Cd]
    ws_ref,  # [Cd, Cs]
    bs_ref,  # [1, Cs]
    wc_ref,  # [(S·order+1)·Cd, C]
    bc_ref,  # [1, C]
    h_ref,  # out [BLK, NP, C]
    s_ref,  # out [BLK, NP, Cs]
    *,
    order: int,
):
    """One program handles BLK (b,t) positions: the gated/skip matmuls run
    batched as a single [BLK·NP, C] MXU op (M = BLK·128 rows instead of
    128 — round-2 rework); only the node-mixing diffusion matmuls, which
    are inherently per-position, loop over the block. Weights are fetched
    into VMEM registers once per program, amortized over the block."""
    blk = x_ref.shape[0]
    cd = wf_ref.shape[1]
    c = x_ref.shape[2]
    np_ = x_ref.shape[1]
    s_count = a_ref.shape[0]

    x2 = x_ref[:].reshape(blk * np_, c)  # leading-dim merge (lane dim intact)
    filt = jnp.tanh(
        jnp.dot(x2, wf_ref[:], preferred_element_type=jnp.float32) + bf_ref[:]
    )
    gate = jax.nn.sigmoid(
        jnp.dot(x2, wg_ref[:], preferred_element_type=jnp.float32) + bg_ref[:]
    )
    g2 = (filt * gate).astype(x2.dtype)  # [BLK·NP, Cd]

    s_ref[:] = (
        jnp.dot(g2, ws_ref[:], preferred_element_type=jnp.float32) + bs_ref[:]
    ).astype(s_ref.dtype).reshape(blk, np_, -1)

    # order-0 term: concat(terms)·Wc ≡ Σ_j term_j · Wc[jCd:(j+1)Cd]
    h2 = jnp.dot(g2, wc_ref[0:cd, :], preferred_element_type=jnp.float32)
    h2 += bc_ref[:]
    g3 = g2.reshape(blk, np_, cd)
    h3 = h2.reshape(blk, np_, c)
    for p in range(blk):  # node-mixing terms are per (b, t) position
        g = g3[p]
        h = h3[p]
        j = 1
        for s in range(s_count):
            at = a_ref[s]  # [NP, NP]
            t1 = jnp.dot(at, g, preferred_element_type=jnp.float32).astype(
                g.dtype
            )
            h += jnp.dot(
                t1, wc_ref[j * cd : (j + 1) * cd, :],
                preferred_element_type=jnp.float32,
            )
            j += 1
            for _ in range(2, order + 1):
                t1 = jnp.dot(
                    at, t1, preferred_element_type=jnp.float32
                ).astype(g.dtype)
                h += jnp.dot(
                    t1, wc_ref[j * cd : (j + 1) * cd, :],
                    preferred_element_type=jnp.float32,
                )
                j += 1
        h_ref[p] = h.astype(h_ref.dtype)


def _forward_pallas(
    x, supports, wf, bf, wg, bg, ws, bs, wc, bc, *, order: int,
    interpret: bool, block: int = 8,
):
    """x: [B, N, T, C]; supports: [S, N, N] → (h [B,N,T,C], s [B,N,T,Cs])."""
    b, n, t, c = x.shape
    cs = ws.shape[1]
    np_ = _round_up(n, LANES)
    bt = b * t
    blk = min(block, bt)
    btp = _round_up(bt, blk)

    # (b, t)-major node slices, lane-padded: [BTP, NP, C]
    xn = jnp.transpose(x, (0, 2, 1, 3)).reshape(bt, n, c)
    xn = jnp.pad(xn, [(0, btp - bt), (0, np_ - n), (0, 0)])
    # out[w] = Σ_v A[v,w]·g[v] ⇒ kernel multiplies by Aᵀ
    at = jnp.pad(
        jnp.transpose(supports, (0, 2, 1)),
        [(0, 0), (0, np_ - n), (0, np_ - n)],
    ).astype(x.dtype)

    kernel = functools.partial(_gated_diffusion_kernel, order=order)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sliced = lambda ch: pl.BlockSpec(
        (blk, np_, ch), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    h, s = pl.pallas_call(
        kernel,
        grid=(btp // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((btp, np_, c), x.dtype),
            jax.ShapeDtypeStruct((btp, np_, cs), x.dtype),
        ),
        in_specs=[sliced(c)] + [full()] * 9,
        out_specs=(sliced(c), sliced(cs)),
        interpret=interpret,
    )(
        xn,
        at,
        wf.astype(x.dtype),
        bf.reshape(1, -1).astype(x.dtype),
        wg.astype(x.dtype),
        bg.reshape(1, -1).astype(x.dtype),
        ws.astype(x.dtype),
        bs.reshape(1, -1).astype(x.dtype),
        wc.astype(x.dtype),
        bc.reshape(1, -1).astype(x.dtype),
    )
    h = jnp.transpose(h[:bt, :n].reshape(b, t, n, c), (0, 2, 1, 3))
    s = jnp.transpose(s[:bt, :n].reshape(b, t, n, cs), (0, 2, 1, 3))
    return h, s


def forward_reference(
    x, supports, wf, bf, wg, bg, ws, bs, wc, bc, *, order: int
):
    """Pure-jnp equivalent (also the rematerialized backward path)."""
    filt = jnp.tanh(jnp.einsum("bntc,cd->bntd", x, wf) + bf)
    gate = jax.nn.sigmoid(jnp.einsum("bntc,cd->bntd", x, wg) + bg)
    g = filt * gate
    s = jnp.einsum("bntc,cd->bntd", g, ws) + bs
    terms = [g]
    for i in range(supports.shape[0]):
        a = supports[i].astype(x.dtype)
        t1 = jnp.einsum("bvtc,vw->bwtc", g, a)
        terms.append(t1)
        for _ in range(2, order + 1):
            t1 = jnp.einsum("bvtc,vw->bwtc", t1, a)
            terms.append(t1)
    h = jnp.einsum("bntc,cd->bntd", jnp.concatenate(terms, -1), wc) + bc
    return h, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_gwnet_layer(
    x, supports, wf, bf, wg, bg, ws, bs, wc, bc, order: int = 2,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused gated-TCN + diffusion-GCN layer (Pallas forward, exact grads)."""
    return _forward_pallas(
        x, supports, wf, bf, wg, bg, ws, bs, wc, bc,
        order=order, interpret=interpret,
    )


def _fwd(x, supports, wf, bf, wg, bg, ws, bs, wc, bc, order, interpret):
    out = _forward_pallas(
        x, supports, wf, bf, wg, bg, ws, bs, wc, bc,
        order=order, interpret=interpret,
    )
    return out, (x, supports, wf, bf, wg, bg, ws, bs, wc, bc)


def _bwd(order, interpret, residuals, cotangents):
    _, vjp_fn = jax.vjp(
        functools.partial(forward_reference, order=order), *residuals
    )
    return vjp_fn(cotangents)


fused_gwnet_layer.defvjp(_fwd, _bwd)
