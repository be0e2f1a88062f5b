"""Shared neural blocks: torch-semantics BatchNorm and U-Net conv blocks.

All blocks are pure flax modules over channels-last tensors with arbitrary
leading batch dims — the reference's per-county Python loops
(reference models/unet.py:110,141,165,188) become batched dims here.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


class GroupedBatchNorm(nn.Module):
    """BatchNorm with torch semantics and per-group train-mode statistics.

    The reference pushes the 67 counties *serially* through shared
    nn.BatchNorm2d modules with T as the conv batch dim
    (reference models/unet.py:110-120), so each call computes batch
    statistics per county over (T, H, W). A naive batched BN would change
    training dynamics (SURVEY §7 "hard parts"); here train-mode statistics
    are computed independently per leading `num_group_axes` axes
    (e.g. (batch, county)) over the remaining non-channel axes, matching
    the reference's per-call behavior exactly.

    Running statistics follow torch's EMA (momentum 0.1, unbiased batch
    variance). serial_ema=True (default) reproduces the reference's
    SERIAL per-group update exactly, without serializing: applying
    r ← (1−m)·r + m·s_k for groups k = 0..G−1 in order telescopes to the
    closed form r ← (1−m)^G·r + Σ_k m·(1−m)^(G−1−k)·s_k — one weighted
    reduction over the group axes (flattened C-order = the reference's
    batch-outer/county-inner loop order, models/unet.py:221,110). Note
    the reference semantics weight late-alphabet counties exponentially
    more; serial_ema=False gives the uniform group-mean EMA instead.

    Pad-masked updates: mesh-mode tail batches are padded to the compiled
    batch size by cycling valid samples (train/loop.py:_mesh_epoch_iter).
    Loss/metrics mask the pad rows via the batch's 'w' row, and passing
    that row here as `sample_weight` masks the running-stat EMA too: a
    group whose weight is 0 contributes nothing and the decay shrinks to
    (1−m)^(number of VALID groups) — exactly the update the reference
    computes on the ragged final batch. The closed form generalizes: with
    validity v_k ∈ {0,1}, w_k = v_k·m·(1−m)^(Σ_{j>k} v_j) and
    decay = (1−m)^(Σ v) — the reversed-cumsum count replaces the arange,
    so masked groups are skipped in-order, whatever their positions.
    sample_weight=None (single-device ragged batches) keeps the static
    arange path.
    """

    num_group_axes: int
    momentum: float = 0.1
    eps: float = 1e-5
    serial_ema: bool = True
    # single_pass: one fused sweep computing E[x−m₀] and E[(x−m₀)²]
    # (shifted by the running mean m₀, clamped at 0) instead of the
    # two-pass mean-then-E[(x−μ)²]. Profiling shows the BN statistic
    # reductions cost ~19% of the b=8 train step on a v5e; the shift
    # bounds the classic E[x²]−μ² cancellation (worst case: an outlier
    # near-constant group loses variance precision; the clamp keeps
    # rsqrt finite, and (x−μ)≈0 there makes the output benign).
    single_pass: bool = False
    # No dtype knob: statistics/normalization are computed in f32
    # unconditionally (bf16 moments would cost accuracy, not bandwidth —
    # BENCHMARKS.md lever (c)) and the output is cast back to x.dtype.

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool,
        sample_weight: Any = None,
    ) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        reduce_axes = tuple(range(self.num_group_axes, x.ndim - 1))
        out_dtype = x.dtype
        if train:
            xf = x.astype(jnp.float32)
            if self.single_pass:
                # one fused sweep: shift by the running mean so the
                # E[x²]−μ² cancellation stays bounded, clamp at 0 so
                # rsqrt never sees a negative (the raw unshifted form
                # NaN'd on large near-constant planes)
                m0 = ra_mean.value
                xs = xf - m0
                s1 = jnp.mean(xs, axis=reduce_axes, keepdims=True)
                s2 = jnp.mean(
                    jnp.square(xs), axis=reduce_axes, keepdims=True
                )
                mean = s1 + m0
                var = jnp.maximum(s2 - jnp.square(s1), 0.0)
            else:
                mean = jnp.mean(xf, axis=reduce_axes, keepdims=True)
                # two-pass variance: E[(x−μ)²], NOT E[x²]−μ² — the latter
                # goes (catastrophically) negative under f32 accumulation
                # on large near-constant planes and NaNs the rsqrt
                var = jnp.mean(
                    jnp.square(xf - mean), axis=reduce_axes, keepdims=True
                )
            if not self.is_initializing():
                m = math.prod(x.shape[a] for a in reduce_axes)
                unbiased = var * (m / max(m - 1, 1))
                group_axes = tuple(range(self.num_group_axes))
                mom = self.momentum
                g = math.prod(x.shape[a] for a in group_axes)
                v = None
                if sample_weight is not None:
                    # validity per group: broadcast the per-sample row over
                    # the group axes (e.g. (B,) → (B, N)), flatten C-order
                    # to match the serial group order
                    gshape = tuple(x.shape[a] for a in group_axes)
                    v = jnp.broadcast_to(
                        jnp.asarray(sample_weight, jnp.float32).reshape(
                            sample_weight.shape
                            + (1,) * (len(gshape) - sample_weight.ndim)
                        ),
                        gshape,
                    ).reshape(g)
                if self.serial_ema:
                    s_mean = mean.reshape(g, c)
                    s_var = unbiased.reshape(g, c)
                    if v is None:
                        # w_k = m·(1−m)^(G−1−k); decay·r + w @ s == the
                        # serial per-group torch update applied G times
                        # in order
                        w = mom * (1 - mom) ** jnp.arange(
                            g - 1, -1, -1, dtype=jnp.float32
                        )
                        decay = (1 - mom) ** g
                    else:
                        # masked serial update: skip invalid groups
                        # in-order — count of valid groups AFTER k
                        # replaces the arange (docstring closed form)
                        cnt_after = jnp.cumsum(v[::-1])[::-1] - v
                        w = v * mom * (1 - mom) ** cnt_after
                        decay = (1 - mom) ** jnp.sum(v)
                    ra_mean.value = decay * ra_mean.value + w @ s_mean
                    ra_var.value = decay * ra_var.value + w @ s_var
                else:
                    if v is None:
                        batch_mean = jnp.mean(mean, axis=group_axes)
                        batch_var = jnp.mean(unbiased, axis=group_axes)
                    else:
                        denom = jnp.maximum(jnp.sum(v), 1.0)
                        batch_mean = (
                            v @ mean.reshape(g, c)
                        ) / denom
                        batch_var = (v @ unbiased.reshape(g, c)) / denom
                    batch_mean = batch_mean.reshape(c)
                    batch_var = batch_var.reshape(c)
                    ra_mean.value = (
                        (1 - mom) * ra_mean.value + mom * batch_mean
                    )
                    ra_var.value = (1 - mom) * ra_var.value + mom * batch_var
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(out_dtype)


class DoubleConv(nn.Module):
    """(Conv3x3 → BN → ReLU) × 2, no conv bias (reference models/unet.py:40-53).

    Conv outputs carry a checkpoint_name("conv_out") tag — identity
    outside remat; under remat_scope="conv" (models/unet.py) the
    save_only_these_names policy keeps exactly these buffers and
    recomputes the cheap BN-normalize/ReLU tail in the backward."""

    features: int
    num_group_axes: int = 2  # (batch, county) groups for BN stats
    dtype: Any = jnp.float32
    bn_single_pass: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, sample_weight: Any = None
    ) -> jnp.ndarray:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name=f"conv{i+1}",
            )(x)
            x = checkpoint_name(x, "conv_out")
            x = GroupedBatchNorm(
                num_group_axes=self.num_group_axes,
                single_pass=self.bn_single_pass,
                name=f"bn{i+1}",
            )(x, train, sample_weight)
            x = nn.relu(x)
        return x


def max_pool_2x2(x: jnp.ndarray, impl: str = "reduce_window") -> jnp.ndarray:
    """2×2 max pool over the last two spatial dims, any leading batch dims.

    impl="reduce_window" (default): flax nn.max_pool. The b=8 HLO
    profile attributes real step time to its select-and-scatter backward
    plus the operand relayouts it forces, which motivated the
    alternatives below — but the interleaved e2e A/B (bench
    layout_matrix, BENCHMARKS.md r3) measured reduce_window FASTEST, so
    it stays the default.
    impl="pairwise": non-overlapping 2×2 pooling as two elementwise
    maximums of strided slices (even vs odd rows, then even vs odd
    columns); backward is pad-interior + compare-mask. Measured 23%
    SLOWER end-to-end at b=8 — the stride-2 slices on second/third-minor
    dims cost more in relayouts than select-and-scatter does. A third
    variant (reshape-split to 6D) OOM'd compilation outright on a
    2.4 GB materialized relayout and was dropped. Forward numerics are
    identical across impls; gradients differ only on exact intra-window
    ties (jnp.maximum routes ties to one operand, select-and-scatter to
    the first scan-order element). Odd spatial dims always fall back to
    reduce_window.
    impl="pallas": layout-stable fused forward/backward kernel pair
    (ops/pool_pallas.py — scanline-pair max + MXU selection matmuls,
    deterministic single-winner VJP); requires even H/W and W·C a
    multiple of 128, else falls back to reduce_window; interpreted off
    TPU so CPU tests exercise the same code path."""
    h, w = x.shape[-3], x.shape[-2]
    if impl == "pairwise" and h % 2 == 0 and w % 2 == 0:
        x = jnp.maximum(x[..., 0::2, :, :], x[..., 1::2, :, :])
        return jnp.maximum(x[..., 0::2, :], x[..., 1::2, :])
    if impl == "pallas":
        from multimodal_outage_tpu.ops.pool_pallas import (
            max_pool_2x2_pallas,
            supports_shape,
        )

        if supports_shape(x):
            import jax as _jax

            return max_pool_2x2_pallas(
                x, _jax.default_backend() != "tpu"
            )
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class Down(nn.Module):
    """MaxPool(2) → DoubleConv (reference models/unet.py:55-65)."""

    features: int
    num_group_axes: int = 2
    dtype: Any = jnp.float32
    bn_single_pass: bool = False
    pool: str = "reduce_window"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, sample_weight: Any = None
    ) -> jnp.ndarray:
        return DoubleConv(
            self.features, self.num_group_axes, self.dtype,
            bn_single_pass=self.bn_single_pass, name="conv",
        )(max_pool_2x2(x, self.pool), train, sample_weight)


class Up(nn.Module):
    """ConvTranspose(k=2, s=2) ↑2 → pad-to-match → concat skip → DoubleConv
    (reference models/unet.py:67-84). Skip maps are passed explicitly, not
    stashed as instance state (reference models/unet.py:104,227)."""

    features: int
    num_group_axes: int = 2
    dtype: Any = jnp.float32
    bn_single_pass: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: jnp.ndarray,
        train: bool,
        sample_weight: Any = None,
    ) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.ConvTranspose(
            in_ch // 2,
            kernel_size=(2, 2),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            name="up",
        )(x)
        x = checkpoint_name(x, "conv_out")
        # Static pad-to-match (shapes are static under jit; diff is 0 for
        # power-of-two image sizes, nonzero only for odd intermediate sizes).
        dh = skip.shape[-3] - x.shape[-3]
        dw = skip.shape[-2] - x.shape[-2]
        if dh or dw:
            pad = [(0, 0)] * (x.ndim - 3) + [
                (dh // 2, dh - dh // 2),
                (dw // 2, dw - dw // 2),
                (0, 0),
            ]
            x = jnp.pad(x, pad)
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(
            self.features, self.num_group_axes, self.dtype,
            bn_single_pass=self.bn_single_pass, name="conv",
        )(x, train, sample_weight)


class OutConv(nn.Module):
    """1×1 projection head (reference models/unet.py:86-92)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features, kernel_size=(1, 1), dtype=self.dtype, name="conv"
        )(x)
