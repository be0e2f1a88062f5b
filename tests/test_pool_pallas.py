"""Pallas 2×2 max-pool kernel pair (ops/pool_pallas.py) vs the XLA
reduce_window lowering: forward equality, backward equivalence (exact
away from intra-window ties; deterministic single-winner routing on
ties), shape gating, and the model-level pool="pallas" path.

Runs in interpreter mode on CPU (same code path the TPU compiles).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_outage_tpu.ops.pool_pallas import (
    max_pool_2x2_pallas,
    supports_shape,
)

INTERPRET = jax.default_backend() != "tpu"


def _ref_pool(x):
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


@pytest.mark.parametrize(
    "shape",
    [
        (3, 32, 32, 4),  # stem-like: W·C = 128
        (2, 2, 16, 64, 2),  # extra leading dim, W·C = 128
        (5, 8, 64, 4),  # rows not a multiple of the 512-row block
    ],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reduce_window(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
    assert supports_shape(x)
    y = max_pool_2x2_pallas(x, INTERPRET)
    np.testing.assert_array_equal(
        np.asarray(y, np.float32), np.asarray(_ref_pool(x), np.float32)
    )


def test_backward_matches_on_unique_maxima():
    """Away from ties the subgradient is unique — kernel VJP must equal
    the reduce_window VJP exactly."""
    key = jax.random.PRNGKey(1)
    # continuous random values: tie probability ~0
    x = jax.random.normal(key, (4, 16, 32, 4), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 16, 4), jnp.float32)

    _, vjp_k = jax.vjp(lambda t: max_pool_2x2_pallas(t, INTERPRET), x)
    _, vjp_r = jax.vjp(_ref_pool, x)
    np.testing.assert_allclose(vjp_k(g)[0], vjp_r(g)[0], atol=1e-6)


def test_backward_tie_routing_single_winner():
    """On an all-equal window the kernel routes the FULL cotangent to
    exactly one position (even row, even column) — no duplication, so
    the gradient sum is conserved."""
    x = jnp.ones((1, 2, 64, 2), jnp.float32)  # W·C = 128, one window row
    g = jnp.full((1, 1, 32, 2), 3.0, jnp.float32)
    _, vjp_k = jax.vjp(lambda t: max_pool_2x2_pallas(t, INTERPRET), x)
    dx = np.asarray(vjp_k(g)[0])
    np.testing.assert_allclose(dx.sum(), float(np.asarray(g).sum()))
    np.testing.assert_allclose(dx[0, 0, 0::2, :], np.asarray(g)[0, 0])
    assert np.all(dx[0, 1] == 0) and np.all(dx[0, 0, 1::2, :] == 0)


def test_backward_divergence_only_on_ties_bf16():
    """bf16's 8-bit mantissa makes exact intra-window ties common on
    random data, and the kernel's row-then-column tie routing can pick a
    different (equally valid) winner than select-and-scatter's scan
    order — e.g. window [[0,5],[5,0]]: XLA routes to (0,1), the kernel
    to (1,0). Every dx disagreement must sit inside a window whose max
    is attained at >1 position, and per-window cotangent sums must agree
    exactly (no gradient lost or duplicated either way)."""
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 16, 32, 4), jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 16, 4), jnp.bfloat16)
    _, vjp_k = jax.vjp(lambda t: max_pool_2x2_pallas(t, INTERPRET), x)
    _, vjp_r = jax.vjp(_ref_pool, x)
    dk = np.asarray(vjp_k(g)[0], np.float32)
    dr = np.asarray(vjp_r(g)[0], np.float32)
    xw = np.asarray(x, np.float32)

    def windows(a):  # [B,H,W,C] → [B,H/2,W/2,C,4]
        b, h, w, c = a.shape
        return a.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 5, 2, 4
        ).reshape(b, h // 2, w // 2, c, 4)

    xv, kv, rv = windows(xw), windows(dk), windows(dr)
    # conservation: both backwards scatter the full cotangent per window
    np.testing.assert_allclose(kv.sum(-1), rv.sum(-1), atol=1e-6)
    tied = (xv == xv.max(-1, keepdims=True)).sum(-1) > 1
    disagree = np.abs(kv - rv).max(-1) > 0
    assert disagree.any()  # bf16 random data does produce ties
    assert not (disagree & ~tied).any()  # …and ONLY ties disagree


def test_shape_gate_falls_back():
    from multimodal_outage_tpu.models.layers import max_pool_2x2

    # W·C = 64 < 128: supports_shape False; model path must fall back
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 4))
    assert not supports_shape(x)
    y = max_pool_2x2(x, impl="pallas")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(_ref_pool(x)))


def test_model_forward_with_pallas_pool():
    """pool='pallas' end-to-end through the fusion model at 32² images —
    W·C = 128 at EVERY level (32·4, 16·8, 8·16, 4·32), so all four pools
    take the kernel path — must match reduce_window's loss exactly in
    f32 eval mode, and train gradients on the same batch must be finite
    and close (ties are measure-zero on random data)."""
    from multimodal_outage_tpu.core.config import small_test_config
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.train.state import create_train_state
    from multimodal_outage_tpu.train.steps import make_eval_step, make_train_step

    n, t, s = 3, 2, 32
    cfg = small_test_config(n_counties=n, image_size=s, horizon=t)
    rng = jax.random.PRNGKey(0)
    batch = {
        "x": jax.random.normal(rng, (2, n, t, s, s, 1)),
        "y": jax.random.normal(rng, (2, n, t, s, s, 1)),
        "date_feats": jnp.zeros((2, t, 6)),
    }
    sup = jnp.eye(n)[None]
    outs, grads = {}, {}
    for pool in ("reduce_window", "pallas"):
        model = build_model(
            dataclasses.replace(
                cfg.model, pool=pool, compute_dtype="float32"
            ),
            t,
        )
        state = create_train_state(model, rng, batch, sup)
        outs[pool] = make_eval_step(model)(
            state.params, state.batch_stats, batch, sup
        )
        new_state, m = make_train_step(model, donate=False)(
            state, batch, sup, jnp.float32(1e-3), rng
        )
        assert np.isfinite(float(m["loss"]))
        grads[pool] = jax.tree.leaves(new_state.params)
    np.testing.assert_allclose(
        float(outs["pallas"]["loss"]),
        float(outs["reduce_window"]["loss"]),
        rtol=1e-6,
    )
    for a, b in zip(grads["pallas"], grads["reduce_window"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        )
