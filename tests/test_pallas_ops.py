"""Fused Graph WaveNet layer kernel: Pallas (interpret mode on CPU) must
match the jnp reference bit-closely, and gradients must flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.ops.gwnet_pallas import (
    forward_reference,
    fused_gwnet_layer,
)

B, N, T, C, CD, CS = 2, 7, 3, 8, 8, 16
ORDER = 2
KEY = jax.random.PRNGKey(0)


def _inputs(s_count=2):
    ks = jax.random.split(KEY, 12)
    x = jax.random.normal(ks[0], (B, N, T, C))
    sup = jax.nn.softmax(jax.random.normal(ks[1], (s_count, N, N)), -1)
    n_terms = s_count * ORDER + 1
    params = (
        jax.random.normal(ks[2], (C, CD)) * 0.3,
        jax.random.normal(ks[3], (CD,)) * 0.1,
        jax.random.normal(ks[4], (C, CD)) * 0.3,
        jax.random.normal(ks[5], (CD,)) * 0.1,
        jax.random.normal(ks[6], (CD, CS)) * 0.3,
        jax.random.normal(ks[7], (CS,)) * 0.1,
        jax.random.normal(ks[8], (n_terms * CD, C)) * 0.3,
        jax.random.normal(ks[9], (C,)) * 0.1,
    )
    return x, sup, params


@pytest.mark.parametrize("s_count", [1, 2])
def test_fused_matches_reference(s_count):
    x, sup, params = _inputs(s_count)
    h_ref, s_ref = forward_reference(x, sup, *params, order=ORDER)
    h, s = fused_gwnet_layer(x, sup, *params, ORDER, True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-5)


def test_fused_grads_match_reference():
    x, sup, params = _inputs()

    def loss_pallas(x, *params):
        h, s = fused_gwnet_layer(x, sup, *params, ORDER, True)
        return jnp.sum(h**2) + jnp.sum(s**2)

    def loss_ref(x, *params):
        h, s = forward_reference(x, sup, *params, order=ORDER)
        return jnp.sum(h**2) + jnp.sum(s**2)

    g_pallas = jax.grad(loss_pallas, argnums=tuple(range(9)))(x, *params)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(9)))(x, *params)
    for a, b in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-4)


def test_gwnet_pallas_path_matches_module():
    """GraphWaveNet(use_pallas) == GraphWaveNet(jnp) with shared params."""
    from multimodal_outage_tpu.models.gwnet import GraphWaveNet

    kw = dict(
        out_dim=12,
        residual_channels=8,
        dilation_channels=8,
        skip_channels=16,
        end_channels=16,
        blocks=2,
        layers=1,
    )
    m_ref = GraphWaveNet(**kw)
    m_pl = GraphWaveNet(**kw, use_pallas=True, pallas_interpret=True)
    x = jax.random.normal(KEY, (B, N, T, 20))
    sup = jnp.eye(N)[None]
    variables = m_ref.init({"params": KEY, "dropout": KEY}, x, sup, train=False)
    out_ref = m_ref.apply(variables, x, sup, train=False)
    out_pl = m_pl.apply(variables, x, sup, train=False)
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_ref), atol=2e-5
    )


def test_fused_blocked_grid_with_padding():
    """bt not divisible by the (b,t) block: multi-program grid with padded
    tail rows must still match the reference (round-2 blocked kernel)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    b, t = 3, 3  # bt=9 → blk=8, grid=2, 7 pad rows
    x = jax.random.normal(ks[0], (b, N, t, C))
    sup = jax.nn.softmax(jax.random.normal(ks[1], (2, N, N)), -1)
    n_terms = 2 * ORDER + 1
    params = (
        jax.random.normal(ks[2], (C, CD)) * 0.3,
        jax.random.normal(ks[3], (CD,)) * 0.1,
        jax.random.normal(ks[4], (C, CD)) * 0.3,
        jax.random.normal(ks[5], (CD,)) * 0.1,
        jax.random.normal(ks[6], (CD, CS)) * 0.3,
        jax.random.normal(ks[7], (CS,)) * 0.1,
        jax.random.normal(ks[8], (n_terms * CD, C)) * 0.3,
        jax.random.normal(ks[9], (C,)) * 0.1,
    )
    h_ref, s_ref = forward_reference(x, sup, *params, order=ORDER)
    h, s = fused_gwnet_layer(x, sup, *params, ORDER, True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-5)
