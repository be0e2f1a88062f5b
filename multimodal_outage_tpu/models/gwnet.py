"""Graph WaveNet spatiotemporal GNN.

TPU-native redesign of reference models/graph_wavenet.py:100-256: gated
(dilated) temporal convolutions + order-2 diffusion graph convolution with
a learned adaptive adjacency, skip-connection accumulation, and a 2-layer
1×1 head.

Design notes vs the reference:
  * Layout is [B, N, T, C] throughout; every reference Conv2d(1,1) is a
    Dense over C; temporal convs (kernel_size>1) are 1-D convs over T.
    The reference hardcodes batch 1 and loops batches in Python
    (models/graph_wavenet.py:189, models/unet.py:221); here B is batched.
  * No import-time side effects: supports are passed in as an [S, N, N]
    array (the reference loads a hardcoded CSV path and .to('cuda')s at
    import, models/graph_wavenet.py:47-51).
  * `reference_view_quirk`: the reference's `input.view(1, C, N, T)` and
    final `x.view(67, T, C)` (models/graph_wavenet.py:189,255) are raw
    memory reinterprets of [N, T, C] tensors — a fixed axis-scrambling
    permutation, not a transpose. Default False applies the semantically
    intended transpose; True reproduces the exact reinterpret for
    numerical-parity testing against the reference.
  * BatchNorm2d over [1, C, N, T] (models/graph_wavenet.py:250) normalizes
    over (N, T) per sample — GroupedBatchNorm(num_group_axes=1) matches.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_outage_tpu.models.layers import GroupedBatchNorm


def adaptive_adjacency(nodevec1, nodevec2, dtype=jnp.float32):
    """Learned adaptive adjacency softmax(relu(E1·E2), axis=1)
    (reference graph_wavenet.py:199-203). The single definition shared by
    the flax forward below and the serving stack kernel's support baking
    (ops/gwnet_stack_pallas.adaptive_supports) — keep them from drifting."""
    return jax.nn.softmax(
        jax.nn.relu(nodevec1 @ nodevec2).astype(jnp.float32), axis=1
    ).astype(dtype)


def svd_aptinit(adj: np.ndarray, node_embed_dim: int):
    """SVD initialization of the adaptive-adjacency node embeddings
    (reference models/graph_wavenet.py:136-141, the randomadj=False path):
      U, S, Vᵀ = svd(aptinit);  E1 = U[:, :d]·√S[:d];  E2 = √S[:d]·Vᵀ[:d]
    """
    u, s, vt = np.linalg.svd(np.asarray(adj, np.float64))
    d = node_embed_dim
    root = np.sqrt(s[:d])
    init1 = (u[:, :d] * root[None, :]).astype(np.float32)
    init2 = (root[:, None] * vt[:d, :]).astype(np.float32)
    return init1, init2


def install_aptinit(params, adj: np.ndarray, node_embed_dim: int):
    """Replace random nodevec1/nodevec2 in an initialized params tree with
    the SVD factorization of `adj` — the reference's aptinit wiring
    (graph_wavenet.py:46 sets aptinit = supports[0] when randomadj=False).
    No-op when the st-GNN has no adaptive adjacency."""
    st = params.get("st_gnn", {})
    if "nodevec1" not in st:
        return params
    e1, e2 = svd_aptinit(adj, node_embed_dim)
    new_st = dict(st)
    new_st["nodevec1"] = jnp.asarray(e1, st["nodevec1"].dtype)
    new_st["nodevec2"] = jnp.asarray(e2, st["nodevec2"].dtype)
    out = dict(params)
    out["st_gnn"] = new_st
    return out


def nconv(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Diffusion step: mix node axis with support A.

    Reference einsum 'ncvl,vw->ncwl' (models/graph_wavenet.py:64-66) in
    [B, N, T, C] layout: out[b,w,t,c] = Σ_v x[b,v,t,c]·A[v,w]."""
    return jnp.einsum("bvtc,vw->bwtc", x, a)


class DiffusionGCN(nn.Module):
    """Order-k diffusion over each support, concat, 1×1 mix, dropout
    (reference models/graph_wavenet.py:76-98)."""

    features: int
    order: int = 2
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, supports: jnp.ndarray, train: bool
    ) -> jnp.ndarray:
        out = [x]
        for s in range(supports.shape[0]):
            a = supports[s]
            x1 = nconv(x, a)
            out.append(x1)
            for _ in range(2, self.order + 1):
                x1 = nconv(x1, a)
                out.append(x1)
        h = jnp.concatenate(out, axis=-1)
        h = nn.Dense(self.features, dtype=self.dtype, name="mlp")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class GraphWaveNet(nn.Module):
    """Forecasting head over fused (image-feature ‖ time-embed) sequences.

    Input  [B, N, T, in_dim]  (in_dim = 256 + 64 at the reference call site,
                               models/unet.py:207-210)
    Output [B, N, T, out_dim] (out_dim = 256).
    """

    out_dim: int = 256
    residual_channels: int = 32
    dilation_channels: int = 32
    skip_channels: int = 256
    end_channels: int = 512
    kernel_size: int = 1
    blocks: int = 4
    layers: int = 2
    dropout: float = 0.3
    order: int = 2
    gcn_bool: bool = True  # reference graph_wavenet.py:100 — False ⇒ no
    # graph mixing at all: residual_conv 1×1s replace the GCNs (:240-243)
    addaptadj: bool = True
    node_embed_dim: int = 10
    reference_view_quirk: bool = False
    use_pallas: bool = False  # fused Pallas layer (TPU; kernel_size=1 path)
    pallas_interpret: bool = False  # interpreter mode for CPU testing
    bn_single_pass: bool = False  # fused one-sweep BN statistics (layers.py)
    dtype: Any = jnp.float32

    @property
    def receptive_field(self) -> int:
        """Reference computation (models/graph_wavenet.py:122,145-170)."""
        rf = 1
        for _ in range(self.blocks):
            scope = self.kernel_size - 1
            for _ in range(self.layers):
                rf += scope
                scope *= 2
        return rf

    def _fused_layer(self, i: int, x: jnp.ndarray, supports: jnp.ndarray):
        """Explicit params + fused gated-TCN/diffusion op for layer i.

        Params are shared between the Pallas and jnp paths so checkpoints
        are interchangeable across backends."""
        from multimodal_outage_tpu.ops.gwnet_pallas import (
            forward_reference,
            fused_gwnet_layer,
        )

        c_in = x.shape[-1]
        cd, cs = self.dilation_channels, self.skip_channels
        n_terms = int(supports.shape[0]) * self.order + 1
        kinit = nn.initializers.lecun_normal()
        zinit = nn.initializers.zeros
        p = [
            self.param(f"filter_conv{i}_kernel", kinit, (c_in, cd)),
            self.param(f"filter_conv{i}_bias", zinit, (cd,)),
            self.param(f"gate_conv{i}_kernel", kinit, (c_in, cd)),
            self.param(f"gate_conv{i}_bias", zinit, (cd,)),
            self.param(f"skip_conv{i}_kernel", kinit, (cd, cs)),
            self.param(f"skip_conv{i}_bias", zinit, (cs,)),
            self.param(f"gconv{i}_kernel", kinit, (n_terms * cd, c_in)),
            self.param(f"gconv{i}_bias", zinit, (c_in,)),
        ]
        p = [w.astype(self.dtype) for w in p]
        if self.use_pallas:
            return fused_gwnet_layer(
                x, supports, *p, self.order, self.pallas_interpret
            )
        return forward_reference(x, supports, *p, order=self.order)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        supports: Optional[jnp.ndarray],
        train: bool,
        sample_weight: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, n, t, c_in = x.shape
        if self.reference_view_quirk:
            # torch .view(1, C, N, T) memory reinterpret of [N, T, C]
            x = x.reshape(b, c_in, n, t).transpose(0, 2, 3, 1)

        rf = self.receptive_field
        if rf > 1:
            # Causal left-pad so output length == t. With the reference's
            # default kernel_size=1 this is a no-op (rf=1), matching it
            # exactly. For kernel_size>1 the reference only pads when
            # t < rf (graph_wavenet.py:191-193) and then its final
            # .view(67, horizon, C) breaks on the shrunken T — a latent
            # bug we fix rather than replicate (SURVEY §8.5).
            x = jnp.pad(x, [(0, 0), (0, 0), (rf - 1, 0), (0, 0)])

        x = nn.Dense(self.residual_channels, dtype=self.dtype, name="start_conv")(x)

        # adaptive adjacency: softmax(relu(E1·E2), axis=1)
        # (reference models/graph_wavenet.py:199-203). gcn_bool=False
        # disables ALL graph mixing (reference :128 `if gcn_bool`).
        # Branch semantics follow the reference exactly (graph_wavenet.py
        # :239-245): graph diffusion runs iff gcn_bool AND some support
        # exists (static or adaptive); otherwise 1×1 residual convs.
        # NOTE this makes the flax param structure depend on whether
        # `supports` is passed (gconv{i} vs residual_conv{i}) — init and
        # apply must agree on support availability, or flax raises a
        # missing-parameter error naming the absent branch.
        if not self.gcn_bool:
            supports = None
        all_supports = None
        if self.addaptadj and self.gcn_bool:
            nodevec1 = self.param(
                "nodevec1", nn.initializers.normal(1.0), (n, self.node_embed_dim)
            )
            nodevec2 = self.param(
                "nodevec2", nn.initializers.normal(1.0), (self.node_embed_dim, n)
            )
            adp = adaptive_adjacency(nodevec1, nodevec2, x.dtype)
            parts = [adp[None]]
            if supports is not None:
                parts = [supports.astype(x.dtype), adp[None]]
            all_supports = jnp.concatenate(parts, axis=0)
        elif supports is not None:
            all_supports = supports.astype(x.dtype)

        skip = None
        dilation = 1
        fused_path = self.kernel_size == 1 and all_supports is not None
        for i in range(self.blocks * self.layers):
            if i % self.layers == 0:
                dilation = 1
            residual = x

            if fused_path:
                # Every op in the layer is channel-dim matmuls (the 1×1
                # reference default, SURVEY §8.5) ⇒ one fused kernel:
                # gated unit + skip projection + diffusion GCN
                # (ops/gwnet_pallas.py), Pallas on TPU, jnp elsewhere.
                x, s = self._fused_layer(i, residual, all_supports)
                t_cur = s.shape[2]
                skip = s if skip is None else s + skip[:, :, -t_cur:, :]
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            else:
                conv_kw = dict(
                    features=self.dilation_channels,
                    kernel_size=(self.kernel_size,),
                    kernel_dilation=(dilation,),
                    padding="VALID",
                    dtype=self.dtype,
                )
                filt = jnp.tanh(
                    nn.Conv(**conv_kw, name=f"filter_conv{i}")(residual)
                )
                gate = nn.sigmoid(
                    nn.Conv(**conv_kw, name=f"gate_conv{i}")(residual)
                )
                x = filt * gate

                s = nn.Dense(
                    self.skip_channels, dtype=self.dtype, name=f"skip_conv{i}"
                )(x)
                t_cur = s.shape[2]
                skip = s if skip is None else s + skip[:, :, -t_cur:, :]

                if all_supports is not None:
                    x = DiffusionGCN(
                        self.residual_channels,
                        order=self.order,
                        dropout=self.dropout,
                        dtype=self.dtype,
                        name=f"gconv{i}",
                    )(x, all_supports, train)
                else:
                    x = nn.Dense(
                        self.residual_channels,
                        dtype=self.dtype,
                        name=f"residual_conv{i}",
                    )(x)
            dilation *= 2

            x = x + residual[:, :, -x.shape[2] :, :]
            x = GroupedBatchNorm(
                num_group_axes=1,
                single_pass=self.bn_single_pass,
                name=f"bn{i}",
            )(x, train, sample_weight)

        out = nn.relu(skip)
        out = nn.relu(
            nn.Dense(self.end_channels, dtype=self.dtype, name="end_conv_1")(out)
        )
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="end_conv_2")(out)

        if self.reference_view_quirk:
            # torch .view(N, T, C) memory reinterpret of [1, C, N, T]
            bo, no, to, co = out.shape
            out = out.transpose(0, 3, 1, 2).reshape(bo, no, to, co)
        return out
