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

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
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


class _DecoderStep(nn.Module):
    """One decoder step (scanned over the horizon): stacked DCGRU cells +
    output projection + next-input selection (self-feed or, with scheduled
    sampling during training, the ground-truth target — the canonical
    DCRNN decoder design the reference's missing source implemented)."""

    rnn_units: int
    num_rnn_layers: int
    max_diffusion_step: int
    output_dim: int
    use_teacher: bool = False  # static: targets provided AND training
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, target_t, supports, tf_prob):
        states, prev = carry
        new_states = []
        inp = prev
        for layer in range(self.num_rnn_layers):
            h = DCGRUCell(
                self.rnn_units,
                self.max_diffusion_step,
                dtype=self.dtype,
                name=f"cell{layer}",
            )(states[layer], inp, supports)
            new_states.append(h)
            inp = h
        out = nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(inp)
        nxt = out
        if self.use_teacher:
            # one batch-wide coin per decoder step (canonical DCRNN
            # sampling granularity); tf_prob is a TRACED scalar so the
            # trainer can anneal it without retracing
            use_tf = jax.random.bernoulli(self.make_rng("sampling"), tf_prob)
            nxt = jnp.where(use_tf, target_t.astype(out.dtype), out)
        return (tuple(new_states), nxt), out


class DCRNN(nn.Module):
    """Encoder-decoder seq2seq over the temporal axis.

    Input  [B, N, T, input_dim] → Output [B, N, horizon, output_dim].
    At the fusion call site input_dim = 320, output_dim = 256,
    horizon = seq_len = T (reference models/unet.py:207-212 wiring).

    Both the encoder recurrence and the decoder rollout are single
    lax.scans (via nn.scan) — no Python time loops, so the horizon is a
    compile-time-static but arbitrarily long sequence axis.

    Teacher forcing: pass `targets` [B, N, horizon, output_dim] while
    training with teacher_forcing > 0 (and an rng named "sampling") and
    each decoder step feeds the ground truth with that probability —
    scheduled sampling, per the public DCRNN design (Li et al. 2018).
    `tf_prob` optionally overrides the static probability with a traced
    scalar (the trainer's inverse-sigmoid curriculum — steps.tf_schedule).
    At the fusion call site the trainer encodes ground-truth future
    frames into latent space and passes them through
    (models/fusion.py); eval/serving never pass targets and self-feed.
    """

    output_dim: int = 256
    horizon: int = 7
    rnn_units: int = 64
    num_rnn_layers: int = 2
    max_diffusion_step: int = 2
    teacher_forcing: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        supports: jnp.ndarray,
        train: bool,
        targets: Optional[jnp.ndarray] = None,
        tf_prob: Optional[jnp.ndarray] = None,
        sample_weight: Optional[jnp.ndarray] = None,  # no BN — unused,
        # accepted for st-GNN interface uniformity (fusion passes it)
    ) -> jnp.ndarray:
        del sample_weight
        if supports is None:
            # fail at the model boundary, not as an AttributeError deep
            # inside the scan trace — DCRNN has no graph-free mode (the
            # dual-random-walk diffusion IS the model; pass identity
            # supports to disable mixing)
            raise ValueError(
                "DCRNN requires a supports array [S, N, N]; got None"
            )
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

        use_teacher = (
            targets is not None and train and self.teacher_forcing > 0.0
        )
        decoder = nn.scan(
            _DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "sampling": True},
            # targets over T; broadcast supports and the sampling prob
            in_axes=(2, nn.broadcast, nn.broadcast),
            out_axes=2,
        )(
            self.rnn_units,
            self.num_rnn_layers,
            self.max_diffusion_step,
            self.output_dim,
            use_teacher=use_teacher,
            dtype=self.dtype,
            name="decoder",
        )
        if targets is None:
            targets = jnp.zeros(
                (b, n, self.horizon, self.output_dim), self.dtype
            )
        if tf_prob is None:
            tf_prob = jnp.float32(self.teacher_forcing)
        # GO symbol = zeros (canonical DCRNN decoder start token)
        go = jnp.zeros((b, n, self.output_dim), self.dtype)
        _, outputs = decoder((states, go), targets, supports, tf_prob)
        return outputs
