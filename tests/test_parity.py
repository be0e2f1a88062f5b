"""Numerical parity vs the PyTorch oracle (BASELINE: ≤1e-5, eval mode,
shared weights — SURVEY §4.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.parity.oracle_torch import FlaxParams, TorchOracle

B, N, T, H = 1, 5, 3, 32
KEY = jax.random.PRNGKey(3)


def _randomize_batch_stats(batch_stats, key):
    """Parity must hold for non-trivial running stats, not just (0, 1)."""
    leaves, treedef = jax.tree.flatten(batch_stats)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        r = jax.random.uniform(k, leaf.shape, minval=0.5, maxval=1.5)
        out.append(r.astype(leaf.dtype))
    return jax.tree.unflatten(treedef, out)


@pytest.mark.slow
@pytest.mark.parametrize("view_quirk", [False, True])
def test_fusion_matches_torch_oracle(view_quirk):
    import dataclasses

    from multimodal_outage_tpu.core.config import GWNetConfig

    cfg = ModelConfig(
        compute_dtype="float32",
        gwnet=GWNetConfig(reference_view_quirk=view_quirk),
    )
    model = build_model(cfg, horizon=T)
    x = jax.random.normal(KEY, (B, N, T, H, H, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (B, T, 1)
    )
    sup = jnp.eye(N)[None]
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    batch_stats = _randomize_batch_stats(
        variables["batch_stats"], jax.random.PRNGKey(9)
    )

    y_jax = model.apply(
        {"params": variables["params"], "batch_stats": batch_stats},
        x, feats, sup, train=False,
    )

    params_np = jax.tree.map(np.asarray, variables["params"])
    bs_np = jax.tree.map(np.asarray, batch_stats)
    oracle = TorchOracle(FlaxParams(params_np, bs_np), view_quirk=view_quirk)
    y_torch = oracle.forward(np.asarray(x), np.asarray(feats), np.asarray(sup))

    np.testing.assert_allclose(
        np.asarray(y_jax), y_torch, atol=1e-5, rtol=1e-4
    )


@pytest.fixture()
def highest_precision():
    """f32 matmuls accumulate at full precision (TPU MXU would otherwise
    round inputs to bf16; on CPU this is a no-op but documents the
    requirement for the ≤1e-5 bar)."""
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", None)


@pytest.mark.slow
def test_full_scale_parity(highest_precision):
    """ROUND-2 mandate: parity at the REAL problem shape — B=1, N=67,
    T=7, 128×128, gwnet identity supports, f32, atol=1e-5 with rtol=0."""
    cfg = ModelConfig(compute_dtype="float32")
    n, t, h = 67, 7, 128
    model = build_model(cfg, horizon=t)
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (1, n, t, h, h, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (1, t, 1)
    )
    sup = jnp.eye(n)[None]
    variables = model.init(
        {"params": key, "dropout": key}, x, feats, sup, train=False
    )
    batch_stats = _randomize_batch_stats(
        variables["batch_stats"], jax.random.PRNGKey(12)
    )
    y_jax = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": batch_stats},
            x, feats, sup, train=False,
        )
    )
    params_np = jax.tree.map(np.asarray, variables["params"])
    bs_np = jax.tree.map(np.asarray, batch_stats)
    oracle = TorchOracle(FlaxParams(params_np, bs_np))
    y_torch = oracle.forward(np.asarray(x), np.asarray(feats), np.asarray(sup))
    max_abs = float(np.max(np.abs(y_jax - y_torch)))
    print(f"full-scale parity max|Δ| = {max_abs:.3e}")
    np.testing.assert_allclose(y_jax, y_torch, atol=1e-5, rtol=0)


@pytest.mark.slow
def test_dcrnn_matches_torch_oracle(highest_precision):
    """DCRNN parity (round-1 gap): full fusion model with the DCGRU
    seq2seq head vs the torch oracle, atol=1e-5 rtol=0."""
    cfg = ModelConfig(st_gnn="dcrnn", compute_dtype="float32")
    model = build_model(cfg, horizon=T)
    x = jax.random.normal(KEY, (B, N, T, H, H, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2023, 8, 30], jnp.float32), (B, T, 1)
    )
    sup = jnp.stack([jnp.eye(N), jnp.eye(N)])  # dual random walk
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    batch_stats = _randomize_batch_stats(
        variables["batch_stats"], jax.random.PRNGKey(9)
    )
    y_jax = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": batch_stats},
            x, feats, sup, train=False,
        )
    )
    params_np = jax.tree.map(np.asarray, variables["params"])
    bs_np = jax.tree.map(np.asarray, batch_stats)
    oracle = TorchOracle(
        FlaxParams(params_np, bs_np), st_gnn="dcrnn", horizon=T,
        output_dim=cfg.feature_vector_size,
        num_rnn_layers=cfg.dcrnn.num_rnn_layers,
        max_diffusion_step=cfg.dcrnn.max_diffusion_step,
    )
    y_torch = oracle.forward(np.asarray(x), np.asarray(feats), np.asarray(sup))
    np.testing.assert_allclose(y_jax, y_torch, atol=1e-5, rtol=0)


@pytest.mark.slow
def test_gwnet_kernel2_matches_torch_oracle(highest_precision):
    """Dilated temporal-conv path (kernel_size=2, round-1 gap): the
    reference's gated TCN with doubling dilation
    (reference models/graph_wavenet.py:145-170) vs the torch oracle."""
    import dataclasses

    from multimodal_outage_tpu.core.config import GWNetConfig

    g = GWNetConfig(kernel_size=2, blocks=2, layers=2)
    cfg = ModelConfig(compute_dtype="float32", gwnet=g)
    t = 4
    model = build_model(cfg, horizon=t)
    x = jax.random.normal(KEY, (B, N, t, H, H, 1))
    feats = jnp.zeros((B, t, 6))
    sup = jnp.eye(N)[None]
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    batch_stats = _randomize_batch_stats(
        variables["batch_stats"], jax.random.PRNGKey(10)
    )
    y_jax = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": batch_stats},
            x, feats, sup, train=False,
        )
    )
    params_np = jax.tree.map(np.asarray, variables["params"])
    bs_np = jax.tree.map(np.asarray, batch_stats)
    oracle = TorchOracle(
        FlaxParams(params_np, bs_np), kernel_size=2, blocks=2, layers=2
    )
    y_torch = oracle.forward(np.asarray(x), np.asarray(feats), np.asarray(sup))
    np.testing.assert_allclose(y_jax, y_torch, atol=1e-5, rtol=0)
