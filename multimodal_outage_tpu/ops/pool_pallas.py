"""Pallas TPU kernel: 2×2 max-pool forward + backward (train path).

Round-3 HLO forensics attributed real train-step time to the pool's
select-and-scatter backward plus the operand relayouts XLA introduces
around the pool/BN/conv boundary (BENCHMARKS.md "Layout/copy-stall
experiment matrix"), and every XLA-level relowering measured SLOWER.
This kernel is the one untried lever: a layout-stable Pallas pair that
never leaves the standard (8,128)/(16,128) tiling.

Design (see /opt/skills/guides/pallas_guide.md):
  * The [..., H, W, C] activation is viewed as a 2D [M·H, W·C] array —
    rows are image scanlines, lanes are the W-major/C-minor flattening.
    At every U-Net level W·C is the same 512 (W halves as C doubles:
    128·4, 64·8, 32·16, 16·32), so one kernel configuration serves all
    four pools.
  * ALL data movement is constant 0/1 selection matmuls on the MXU
    (Mosaic rejects stride-2 sublane slices — `vector.
    extract_strided_slice` is confined to stride 1 — so shuffles go
    through the systolic array instead, where selection is free and
    exact: one 1 per output, f32 accumulation of copies):
      - window row pairs:    xe = RE·x, xo = RO·x   (RE[i, 2i] = 1)
      - window column pairs: e = rm·SE, o = rm·SO   (SE[2k·C+c, k·C+c] = 1)
      - backward interleave: dx = REᵀ·gxe + ROᵀ·gxo
  * Ragged-tail blocks are zero-masked BEFORE any row-contraction —
    Pallas block padding is undefined and 0·NaN = NaN would otherwise
    poison every output row of the tail block.
  * Backward (custom VJP) recomputes the two winner masks from the saved
    input (row winner: even row on ties; column winner: even column on
    ties — deterministic single-winner subgradient, no gradient
    duplication) and scatters the cotangent back through the transposed
    selection matmuls. Tie ROUTING can differ from XLA's
    select-and-scatter scan order only on exact cross-position ties
    (same caveat as the documented "pairwise" impl, models/layers.py).

Reference behavior matched: MaxPool2d(2) inside Down
(/root/reference/models/unet.py:55-65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Input rows per grid step (divisible by the f32 AND bf16 sublane tiles).
_ROWS_IN = 512
_ROWS_OUT = _ROWS_IN // 2


def _selection_mats(wc: int, c: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """SE/SO ∈ {0,1}^(W·C × W·C/2): SE[2k·C+c, k·C+c] = 1 (even columns),
    SO[(2k+1)·C+c, k·C+c] = 1 (odd columns). rm @ SE compacts the even
    window-columns of a scanline-max row, exactly (one 1 per output)."""
    half = wc // 2
    se = np.zeros((wc, half), dtype)
    so = np.zeros((wc, half), dtype)
    k = np.arange(half)  # output lane index = k·C+c flattened
    w2, cc = np.divmod(k, c)
    se[2 * w2 * c + cc, k] = 1
    so[(2 * w2 + 1) * c + cc, k] = 1
    return se, so


def _row_select_mats(dtype) -> tuple[np.ndarray, np.ndarray]:
    """RE/RO ∈ {0,1}^(_ROWS_OUT × _ROWS_IN): RE[i, 2i] = 1 (even input
    scanlines), RO[i, 2i+1] = 1 (odd). RE @ x compacts even scanlines."""
    re = np.zeros((_ROWS_OUT, _ROWS_IN), dtype)
    ro = np.zeros((_ROWS_OUT, _ROWS_IN), dtype)
    i = np.arange(_ROWS_OUT)
    re[i, 2 * i] = 1
    ro[i, 2 * i + 1] = 1
    return re, ro


def _sanitize_rows(arr, rows_per_block: int, rows_total: int):
    """Zero rows past the ragged tail (block padding is undefined; any
    later row-contraction would propagate 0·NaN)."""
    ridx = (
        jax.lax.broadcasted_iota(jnp.int32, (rows_per_block, 1), 0)
        + pl.program_id(0) * rows_per_block
    )
    return jnp.where(ridx < rows_total, arr, jnp.zeros_like(arr))


def _precision(dtype):
    """Selection matmuls must COPY exactly. bf16 operands are MXU-native
    (default precision is exact); f32 operands are truncated to bf16 at
    default precision, so the f32 path needs the 3-pass HIGHEST mode."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _dot(a, b, prec):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _row_pair_max(x_ref, re_ref, ro_ref, in_rows_total: int, prec):
    """(sanitized even-row/odd-row compactions, their max) — shared by
    forward and backward."""
    x = _sanitize_rows(x_ref[...], _ROWS_IN, in_rows_total)
    xe = _dot(re_ref[...], x, prec)
    xo = _dot(ro_ref[...], x, prec)
    return xe, xo


def _fwd_kernel(x_ref, re_ref, ro_ref, se_ref, so_ref, out_ref, *,
                in_rows_total):
    prec = _precision(x_ref.dtype)
    xe, xo = _row_pair_max(x_ref, re_ref, ro_ref, in_rows_total, prec)
    # values are exact copies of the input dtype — cast back losslessly
    # so the column matmul runs at the input precision
    rm = jnp.maximum(xe, xo).astype(x_ref.dtype)
    e = _dot(rm, se_ref[...], prec)
    o = _dot(rm, so_ref[...], prec)
    out_ref[...] = jnp.maximum(e, o).astype(out_ref.dtype)


def _bwd_kernel(
    x_ref, g_ref, re_ref, ro_ref, se_ref, so_ref, set_ref, sot_ref,
    ret_ref, rot_ref, dx_ref, *, in_rows_total, out_rows_total,
):
    prec = _precision(x_ref.dtype)
    xe, xo = _row_pair_max(x_ref, re_ref, ro_ref, in_rows_total, prec)
    we = xe >= xo  # row winner (even row on ties)
    rm = jnp.maximum(xe, xo).astype(x_ref.dtype)
    e = _dot(rm, se_ref[...], prec)
    o = _dot(rm, so_ref[...], prec)
    ce = e >= o  # column winner (even column on ties)
    g = _sanitize_rows(g_ref[...], _ROWS_OUT, out_rows_total)
    g = g.astype(jnp.float32)
    # cotangent values stay input-dtype-representable (g was cast to the
    # input dtype in _bwd), so the f32 scatter matmuls copy exactly at
    # bf16-operand precision too; f32 inputs still take HIGHEST
    ge = jnp.where(ce, g, 0.0)
    go = jnp.where(ce, 0.0, g)
    # scatter compact cotangents back to the W·C lanes (transposed mats)
    grm = _dot(ge, set_ref[...], prec)
    grm = grm + _dot(go, sot_ref[...], prec)
    gxe = jnp.where(we, grm, 0.0)
    gxo = jnp.where(we, 0.0, grm)
    # interleave rows back on the MXU: RET[2i, i] = ROT[2i+1, i] = 1
    dx = _dot(ret_ref[...], gxe, prec)
    dx = dx + _dot(rot_ref[...], gxo, prec)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)


def _pool2d(x2, wc: int, c: int, interpret: bool):
    rows = x2.shape[0]
    se, so = _selection_mats(wc, c, x2.dtype)
    re, ro = _row_select_mats(x2.dtype)
    grid = (pl.cdiv(rows, _ROWS_IN),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, in_rows_total=rows),
        out_shape=jax.ShapeDtypeStruct((rows // 2, wc // 2), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS_IN, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec((_ROWS_OUT, _ROWS_IN)),
            _const_spec((_ROWS_OUT, _ROWS_IN)),
            _const_spec((wc, wc // 2)),
            _const_spec((wc, wc // 2)),
        ],
        out_specs=pl.BlockSpec((_ROWS_OUT, wc // 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, jnp.asarray(re), jnp.asarray(ro), jnp.asarray(se),
      jnp.asarray(so))


def _pool2d_bwd(x2, g2, wc: int, c: int, interpret: bool):
    rows = x2.shape[0]
    se, so = _selection_mats(wc, c, x2.dtype)
    re, ro = _row_select_mats(x2.dtype)
    # f32 transposed mats: the scatter matmuls run on f32 cotangents
    set_, sot = _selection_mats(wc, c, np.float32)
    ret, rot = _row_select_mats(np.float32)
    grid = (pl.cdiv(rows, _ROWS_IN),)
    half = wc // 2
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, in_rows_total=rows, out_rows_total=rows // 2
        ),
        out_shape=jax.ShapeDtypeStruct((rows, wc), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS_IN, wc), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS_OUT, half), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _const_spec((_ROWS_OUT, _ROWS_IN)),
            _const_spec((_ROWS_OUT, _ROWS_IN)),
            _const_spec((wc, half)),
            _const_spec((wc, half)),
            _const_spec((half, wc)),
            _const_spec((half, wc)),
            _const_spec((_ROWS_IN, _ROWS_OUT)),
            _const_spec((_ROWS_IN, _ROWS_OUT)),
        ],
        out_specs=pl.BlockSpec((_ROWS_IN, wc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, g2, jnp.asarray(re), jnp.asarray(ro), jnp.asarray(se),
      jnp.asarray(so), jnp.asarray(set_.T.copy()), jnp.asarray(sot.T.copy()),
      jnp.asarray(ret.T.copy()), jnp.asarray(rot.T.copy()))


def supports_shape(x) -> bool:
    """Kernel preconditions: even H/W and an exact lane count (W·C a
    multiple of 128 — contraction over padded lanes would read garbage).

    Numerical precondition (NOT checkable from the shape): activations
    must be FINITE. The 0/1 selection matmuls contract sel·x over all
    W·C lanes, so a single ±inf anywhere in a scanline contributes
    0·inf = NaN to EVERY pooled output of that row — unlike
    reduce_window, which propagates inf per-window. Only pathological
    (overflowed) activations trigger this; the train path's BN keeps
    values finite, and --debug_nans catches the blow-up either way."""
    h, w, cc = x.shape[-3], x.shape[-2], x.shape[-1]
    return h % 2 == 0 and w % 2 == 0 and (w * cc) % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2_pallas(x, interpret: bool = False):
    """[..., H, W, C] → [..., H/2, W/2, C]; see module docstring."""
    y, _ = _fwd(x, interpret)
    return y


def _fwd(x, interpret):
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    lead = x.shape[:-3]
    x2 = x.reshape(-1, w * c)  # [M·H, W·C]
    y2 = _pool2d(x2, w * c, c, interpret)
    return y2.reshape(*lead, h // 2, w // 2, c), x


def _bwd(interpret, x, g):
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    x2 = x.reshape(-1, w * c)
    g2 = g.astype(x.dtype).reshape(-1, (w * c) // 2)
    dx2 = _pool2d_bwd(x2, g2, w * c, c, interpret)
    return (dx2.reshape(x.shape),)


max_pool_2x2_pallas.defvjp(_fwd, _bwd)
