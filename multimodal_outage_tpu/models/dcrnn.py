"""DCRNN — Diffusion-Convolutional Recurrent Neural Network (st-GNN #2).

The reference's models/dcrnn.py is gitignored and absent from the snapshot
(reference .gitignore:17); only the constructor interface survives
(reference models/unet.py:16-27: batch_size, filter_type='dual_random_walk',
horizon, input_dim, max_diffusion_step=2, num_nodes, num_rnn_layers=2,
output_dim, rnn_units=64, seq_len). This module re-derives the model from
the public DCRNN design (Li et al., ICLR 2018: encoder-decoder seq2seq of
diffusion-convolutional GRU cells with Chebyshev-style recursion) as a
second registry entry honoring those kwargs.

TPU-native: the time recurrence is a single lax.scan (via nn.scan) — no
Python time loops — and the diffusion matmuls are dense einsums batched
over (B, T) on the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


class DiffusionConv(nn.Module):
    """Graph diffusion convolution with Chebyshev-like recursion.

    out = Σ_{s,k} x T_k(A_s) W_{s,k},  T_0 = x, T_1 = A x,
    T_k = 2 A T_{k-1} − T_{k-2}   (k ≤ max_diffusion_step)
    """

    features: int
    max_diffusion_step: int = 2
    bias_init: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, supports: jnp.ndarray) -> jnp.ndarray:
        # x: [B, N, D]; supports: [S, N, N]
        terms = [x]
        for s in range(supports.shape[0]):
            a = supports[s].astype(x.dtype)
            x1 = jnp.einsum("vw,bvd->bwd", a, x)
            terms.append(x1)
            x0 = x
            for _ in range(2, self.max_diffusion_step + 1):
                x2 = 2.0 * jnp.einsum("vw,bvd->bwd", a, x1) - x0
                terms.append(x2)
                x0, x1 = x1, x2
        h = jnp.concatenate(terms, axis=-1)
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            bias_init=nn.initializers.constant(self.bias_init),
            name="proj",
        )(h)


class DCGRUCell(nn.Module):
    """GRU cell whose matmuls are diffusion convolutions."""

    rnn_units: int
    max_diffusion_step: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, h: jnp.ndarray, x: jnp.ndarray, supports: jnp.ndarray
    ) -> jnp.ndarray:
        # h: [B, N, units]; x: [B, N, D_in]
        inp = jnp.concatenate([x, h], axis=-1)
        ru = nn.sigmoid(
            DiffusionConv(
                2 * self.rnn_units,
                self.max_diffusion_step,
                bias_init=1.0,  # standard DCRNN gate-bias init
                dtype=self.dtype,
                name="gates",
            )(inp, supports)
        )
        r, u = jnp.split(ru, 2, axis=-1)
        c = jnp.tanh(
            DiffusionConv(
                self.rnn_units,
                self.max_diffusion_step,
                dtype=self.dtype,
                name="candidate",
            )(jnp.concatenate([x, r * h], axis=-1), supports)
        )
        return u * h + (1.0 - u) * c


class _StackedStep(nn.Module):
    """One time step through the stacked DCGRU layers (scanned over T)."""

    rnn_units: int
    num_rnn_layers: int
    max_diffusion_step: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, states, x, supports):
        new_states = []
        inp = x
        for layer in range(self.num_rnn_layers):
            h = DCGRUCell(
                self.rnn_units,
                self.max_diffusion_step,
                dtype=self.dtype,
                name=f"cell{layer}",
            )(states[layer], inp, supports)
            new_states.append(h)
            inp = h
        return tuple(new_states), inp


class DCRNN(nn.Module):
    """Encoder-decoder seq2seq over the temporal axis.

    Input  [B, N, T, input_dim] → Output [B, N, horizon, output_dim].
    At the fusion call site input_dim = 320, output_dim = 256,
    horizon = seq_len = T (reference models/unet.py:207-212 wiring).
    """

    output_dim: int = 256
    horizon: int = 7
    rnn_units: int = 64
    num_rnn_layers: int = 2
    max_diffusion_step: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, supports: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        b, n, t, _ = x.shape
        init_states = tuple(
            jnp.zeros((b, n, self.rnn_units), self.dtype)
            for _ in range(self.num_rnn_layers)
        )

        encoder = nn.scan(
            _StackedStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(2, nn.broadcast),  # scan x over T; broadcast supports
            out_axes=2,
        )(
            self.rnn_units,
            self.num_rnn_layers,
            self.max_diffusion_step,
            dtype=self.dtype,
            name="encoder",
        )
        states, _ = encoder(init_states, x, supports)

        # Decoder: feed back the projected output (GO symbol = zeros).
        decoder_step = _StackedStep(
            self.rnn_units,
            self.num_rnn_layers,
            self.max_diffusion_step,
            dtype=self.dtype,
            name="decoder",
        )
        proj = nn.Dense(self.output_dim, dtype=self.dtype, name="proj")

        outputs = []
        prev = jnp.zeros((b, n, self.output_dim), self.dtype)
        for _ in range(self.horizon):
            states, h = decoder_step(states, prev, supports)
            prev = proj(h)
            outputs.append(prev)
        return jnp.stack(outputs, axis=2)
