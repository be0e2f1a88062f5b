"""ModifiedUNet — the flagship fusion model.

TPU-native redesign of reference models/unet.py:201-231: U-Net contraction
→ bottleneck encoder → (‖ Date2Vec time embedding) → st-GNN → bottleneck
decoder → U-Net expansion with skip connections.

One pure function over [B, N, T, H, W, C]: the reference's per-batch and
per-county Python loops (models/unet.py:221,110,141,165,188) are batched
dims, the st-GNN choice is a registry lookup instead of a hardcoded-CUDA
if/else (models/unet.py:209-214), skip maps flow functionally, and the
Date2Vec embedding is computed inside the forward from raw (y, m, d) date
features (fused per BASELINE.json) instead of per-sample in the data
loader (reference utils.py:94).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.core.registry import register_st_gnn
from multimodal_outage_tpu.models.date2vec import Date2Vec
from multimodal_outage_tpu.models.dcrnn import DCRNN
from multimodal_outage_tpu.models.gwnet import GraphWaveNet
from multimodal_outage_tpu.models.unet import (
    BottleneckDecoder,
    BottleneckEncoder,
    Contraction,
    Expansion,
)


@register_st_gnn("gwnet")
def _build_gwnet(cfg: ModelConfig, horizon: int, dtype) -> nn.Module:
    g = cfg.gwnet
    use_pallas = g.use_pallas and jax.default_backend() == "tpu"
    return GraphWaveNet(
        use_pallas=use_pallas,
        reference_view_quirk=g.reference_view_quirk,
        out_dim=cfg.feature_vector_size,
        residual_channels=g.residual_channels,
        dilation_channels=g.dilation_channels,
        skip_channels=g.skip_channels,
        end_channels=g.end_channels,
        kernel_size=g.kernel_size,
        blocks=g.blocks,
        layers=g.layers,
        dropout=g.dropout,
        order=g.order,
        gcn_bool=g.gcn_bool,
        addaptadj=g.addaptadj,
        node_embed_dim=g.node_embed_dim,
        bn_single_pass=cfg.bn_single_pass,
        dtype=dtype,
        name="st_gnn",
    )


@register_st_gnn("dcrnn")
def _build_dcrnn(cfg: ModelConfig, horizon: int, dtype) -> nn.Module:
    d = cfg.dcrnn
    return DCRNN(
        output_dim=cfg.feature_vector_size,
        horizon=horizon,
        rnn_units=d.rnn_units,
        num_rnn_layers=d.num_rnn_layers,
        max_diffusion_step=d.max_diffusion_step,
        teacher_forcing=d.teacher_forcing,
        dtype=dtype,
        name="st_gnn",
    )


class ModifiedUNet(nn.Module):
    cfg: ModelConfig
    horizon: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, N, T, H, W, C_in] normalized NTL
        date_feats: jnp.ndarray,  # [B, T, 6] raw (0,0,0,y,m,d)
        supports: Optional[jnp.ndarray],  # [S, N, N] static GCN supports
        train: bool = False,
        targets: Optional[jnp.ndarray] = None,  # [B, N, T, H, W, C] future
        tf_prob: Optional[jnp.ndarray] = None,  # traced sampling prob
        sample_weight: Optional[jnp.ndarray] = None,  # [B] 1=valid 0=pad;
        # mesh-mode padded tail batches pass the batch's 'w' row so BN
        # running-stat EMAs skip the pad rows (layers.GroupedBatchNorm)
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        b, n, t = x.shape[:3]
        grid = x.shape[3] // (2**cfg.depth)

        x = x.astype(dtype)
        contraction = Contraction(
            base_channels=cfg.base_channels,
            depth=cfg.depth,
            remat=cfg.remat,
            remat_scope=cfg.remat_scope,
            bn_single_pass=cfg.bn_single_pass,
            pool=cfg.pool,
            dtype=dtype,
            name="contraction",
        )
        encoder = BottleneckEncoder(
            feature_vector_size=cfg.feature_vector_size,
            compression_factor=cfg.compression_factor,
            dropout=cfg.encoder_dropout,
            dtype=dtype,
            name="encoder",
        )
        bottleneck, skips = contraction(x, train, sample_weight)
        z = encoder(bottleneck, train)

        # DCRNN scheduled sampling (canonical design, Li et al. 2018;
        # the reference's gitignored dcrnn.py implemented it): encode the
        # ground-truth future frames into the decoder's latent space
        # through the SAME contraction/encoder — in eval mode, so BN
        # running stats are neither mutated nor contaminated by target
        # frames and dropout stays off — and let the decoder feed them
        # with probability tf_prob. stop_gradient: teacher inputs are
        # data, not a gradient path into the encoder.
        latent_targets = None
        if (
            targets is not None
            and train
            and cfg.st_gnn == "dcrnn"
            and cfg.dcrnn.teacher_forcing > 0.0
        ):
            tgt_bottleneck, _ = contraction(targets.astype(dtype), False)
            latent_targets = jax.lax.stop_gradient(
                encoder(tgt_bottleneck, False)
            )

        # Date2Vec fused into the forward: one embedding per date,
        # broadcast over counties (reference utils.py:94,103 semantics).
        # Computed in f32 regardless of compute_dtype: the raw year
        # feature (~2022) would quantize to multiples of 8 in bf16
        # (2017..2027 collapse onto 2016/2024), destroying year
        # resolution before the embedding; the reference computes it in
        # f32 in the data loader (utils.py:111-129). Only the O(1)
        # embedding output joins the compute-dtype stream, and the
        # 6->k matmul is negligible FLOPs either way.
        te = Date2Vec(
            k=cfg.time_embed_size, dtype=jnp.float32, name="date2vec"
        ).encode(date_feats.astype(jnp.float32))
        if not cfg.train_date2vec:
            te = jax.lax.stop_gradient(te)
        te = te.astype(dtype)
        te = jnp.broadcast_to(te[:, None], (b, n, t, cfg.time_embed_size))
        z = jnp.concatenate([z, te], axis=-1)  # [B, N, T, 320]

        from multimodal_outage_tpu.core.registry import get_st_gnn

        st_gnn = get_st_gnn(cfg.st_gnn)(cfg, self.horizon, dtype)
        if latent_targets is not None:
            z = st_gnn(
                z, supports, train, targets=latent_targets, tf_prob=tf_prob,
                sample_weight=sample_weight,
            )
        else:
            z = st_gnn(z, supports, train, sample_weight=sample_weight)

        d = BottleneckDecoder(
            grid_size=grid,
            grid_channels=cfg.base_channels * (2**cfg.depth),
            compression_factor=cfg.compression_factor,
            dropout=cfg.encoder_dropout,
            dtype=dtype,
            name="decoder",
        )(z, train)

        y = Expansion(
            output_channels=cfg.output_channels,
            base_channels=cfg.base_channels,
            depth=cfg.depth,
            remat=cfg.remat,
            remat_scope=cfg.remat_scope,
            bn_single_pass=cfg.bn_single_pass,
            dtype=dtype,
            name="expansion",
        )(d, skips, train, sample_weight)
        return y.astype(jnp.float32)


def build_model(cfg: ModelConfig, horizon: int) -> ModifiedUNet:
    from multimodal_outage_tpu.core.registry import get_st_gnn

    get_st_gnn(cfg.st_gnn)  # fail fast on unknown st-GNN names
    return ModifiedUNet(cfg=cfg, horizon=horizon)
