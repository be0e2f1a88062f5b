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
