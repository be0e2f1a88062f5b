"""U-Net image autoencoder: Contraction / bottleneck MLPs / Expansion.

TPU-native redesign of reference models/unet.py:95-199. The reference loops
Python-serially over 67 counties per stage, stashing skip maps as module
state; here every stage is one batched XLA op over [B, N, T, H, W, C] and
skip maps flow functionally from Contraction to Expansion.

Channel schedule (reference models/unet.py:99-103,178-182):
  Contraction: C_in →4 →8 →16 →32 →64, spatial H → H/16
  Expansion:   64 →32 →16 →8 →4 → C_out, spatial H/16 → H
Bottleneck MLPs (reference models/unet.py:128-173):
  Encoder: flat(64·(H/16)²=4096) →1024 →256, ReLU + Dropout(0.3)
  Decoder: 256 →1024 →4096 → reshape [H/16, H/16, 64]
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodal_outage_tpu.models.layers import DoubleConv, Down, Up, OutConv


def _save_conv_outputs():
    """Remat policy for remat_scope="conv": keep only the tagged conv/
    convT outputs (layers.py checkpoint_name "conv_out") as residuals."""
    import jax

    return jax.checkpoint_policies.save_only_these_names("conv_out")


class Contraction(nn.Module):
    """4-stage U-Net encoder → (bottleneck, skip pyramid).

    remat: wrap conv blocks in jax.checkpoint so the backward pass
    recomputes their activations instead of holding them in HBM — the
    skip pyramid (needed by Expansion regardless) becomes the only
    stored encoder state. Param paths are unchanged (blocks keep their
    explicit names), so checkpoints are interchangeable across the
    toggle.

    remat_scope="all" wraps every block; "stem" wraps only the blocks at
    the top two resolution levels (inc, down1 — whose intra-block
    activations dominate HBM while their DoubleConvs are the cheapest to
    recompute), leaving the deep blocks stored. The r2 grid measured
    all-block remat at −42% throughput because it recomputes the
    HBM-bandwidth-bound deep chains for little memory back
    (BENCHMARKS.md).

    remat_scope="conv" wraps every block with the save_only_these_names
    ("conv_out") policy: conv/convT outputs (the tagged majority of each
    block's FLOPs) stay saved, and only the cheap BN-normalize/ReLU/pool/
    concat tails are recomputed in the backward — a traffic-for-VPU-work
    trade rather than "stem"/"all"'s traffic-for-conv-recompute trade."""

    base_channels: int = 4
    depth: int = 4
    remat: bool = False
    remat_scope: str = "all"
    bn_single_pass: bool = False
    pool: str = "reduce_window"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, sample_weight=None
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        def wrap(cls, block_level: int):
            # block_level: 0 = full resolution (inc), i+1 for down{i+1}
            if not self.remat:
                return cls
            if self.remat_scope == "conv":
                return nn.remat(
                    cls, static_argnums=(2,), policy=_save_conv_outputs()
                )
            if self.remat_scope == "all" or block_level <= 1:
                # both DoubleConv and Down take train as positional arg 2
                # (sample_weight at 3 is traced data, not static)
                return nn.remat(cls, static_argnums=(2,))
            return cls

        sp = self.bn_single_pass
        ch = self.base_channels
        x = wrap(DoubleConv, 0)(
            ch, dtype=self.dtype, bn_single_pass=sp, name="inc"
        )(x, train, sample_weight)
        skips = [x]
        for i in range(self.depth):
            ch *= 2
            x = wrap(Down, i + 1)(
                ch, dtype=self.dtype, bn_single_pass=sp, pool=self.pool,
                name=f"down{i+1}",
            )(x, train, sample_weight)
            if i < self.depth - 1:
                skips.append(x)
        return x, tuple(skips)


class BottleneckEncoder(nn.Module):
    """Flattened bottleneck → feature vector (reference models/unet.py:128-149).

    Order matches the reference: relu(fc1) → dropout → relu(fc2)."""

    feature_vector_size: int = 256
    compression_factor: int = 4
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        flat = x.reshape(*x.shape[:-3], -1)  # [B, N, T, h·w·c]
        hidden = flat.shape[-1] // self.compression_factor
        x = nn.relu(nn.Dense(hidden, dtype=self.dtype, name="fc1")(flat))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.relu(
            nn.Dense(self.feature_vector_size, dtype=self.dtype, name="fc2")(x)
        )


class BottleneckDecoder(nn.Module):
    """Feature vector → bottleneck grid (reference models/unet.py:151-173)."""

    grid_size: int  # H/16
    grid_channels: int  # 64
    compression_factor: int = 4
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        feat = x.shape[-1]
        out_size = self.grid_size * self.grid_size * self.grid_channels
        x = nn.relu(
            nn.Dense(
                feat * self.compression_factor, dtype=self.dtype, name="fc1"
            )(x)
        )
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(out_size, dtype=self.dtype, name="fc2")(x))
        return x.reshape(
            *x.shape[:-1], self.grid_size, self.grid_size, self.grid_channels
        )


class Expansion(nn.Module):
    """4-stage U-Net decoder consuming the skip pyramid in reverse
    (reference models/unet.py:175-199)."""

    output_channels: int = 1
    base_channels: int = 4
    depth: int = 4
    remat: bool = False
    remat_scope: str = "all"  # "stem" ⇒ only the top-two-level Ups
    bn_single_pass: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Tuple[jnp.ndarray, ...],
        train: bool,
        sample_weight=None,
    ) -> jnp.ndarray:
        ch = self.base_channels * (2 ** (self.depth - 1))  # 32 at depth 4
        for i in range(self.depth):
            # Up.__call__(self, x, skip, train) → train is positional arg 3.
            # "stem" scope = the last two Ups (up3/up4 at depth 4), whose
            # saved concat activations at the top two resolutions are both
            # the HBM hogs and the source of the backward's largest
            # layout-conversion copies (HLO profile, BENCHMARKS.md r3).
            if self.remat and self.remat_scope == "conv":
                U = nn.remat(
                    Up, static_argnums=(3,), policy=_save_conv_outputs()
                )
            elif self.remat and (
                self.remat_scope == "all" or i >= self.depth - 2
            ):
                U = nn.remat(Up, static_argnums=(3,))
            else:
                U = Up
            x = U(
                ch, dtype=self.dtype, bn_single_pass=self.bn_single_pass,
                name=f"up{i+1}",
            )(x, skips[-(i + 1)], train, sample_weight)
            ch //= 2
        return OutConv(self.output_channels, dtype=self.dtype, name="outc")(x)
