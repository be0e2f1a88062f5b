"""Whole-stack fused gwnet kernel (ops/gwnet_stack_pallas.py):
interpret-mode Pallas must match the jnp reference, and both must match
the real GraphWaveNet module's eval forward with the same weights
(BatchNorm folded from its running stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.models.gwnet import GraphWaveNet
from multimodal_outage_tpu.ops.gwnet_stack_pallas import (
    adaptive_supports,
    gwnet_stack_forward,
    stack_forward_reference,
    stack_params_from_module,
)

N, T, CIN = 7, 5, 24
KEY = jax.random.PRNGKey(0)


def _module_and_params(addaptadj=True, b=2):
    m = GraphWaveNet(
        out_dim=20,
        residual_channels=8,
        dilation_channels=8,
        skip_channels=16,
        end_channels=32,
        blocks=2,
        layers=2,
        dropout=0.0,
        order=2,
        addaptadj=addaptadj,
        node_embed_dim=4,
        dtype=jnp.float32,
    )
    x = jax.random.normal(KEY, (b, N, T, CIN))
    sup = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (1, N, N)), -1)
    variables = m.init({"params": KEY, "dropout": KEY}, x, sup, train=False)
    # randomize running stats so BN folding is actually exercised
    rng = np.random.default_rng(3)
    bs = jax.tree.map(
        lambda v: jnp.asarray(
            rng.normal(0.1, 0.3, v.shape).astype(np.float32) ** 2 + 0.5
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    return m, variables, x, sup


def _stack_inputs(m, variables, sup):
    p = variables["params"]
    sp = stack_params_from_module(
        p, variables["batch_stats"], n_layers=m.blocks * m.layers
    )
    all_sup = adaptive_supports(
        sup, p.get("nodevec1"), p.get("nodevec2")
    )
    return sp, all_sup


@pytest.mark.parametrize("addaptadj", [True, False])
def test_reference_matches_module(addaptadj):
    m, variables, x, sup = _module_and_params(addaptadj)
    y_mod = m.apply(variables, x, sup, train=False)
    sp, all_sup = _stack_inputs(m, variables, sup)
    y_ref = stack_forward_reference(x, all_sup, sp, order=m.order)
    np.testing.assert_allclose(
        np.asarray(y_ref), np.asarray(y_mod), atol=3e-5, rtol=1e-4
    )


def test_kernel_matches_reference_interpret():
    m, variables, x, sup = _module_and_params()
    sp, all_sup = _stack_inputs(m, variables, sup)
    y_ref = stack_forward_reference(x, all_sup, sp, order=m.order)
    y_ker = gwnet_stack_forward(
        x, all_sup, sp, order=m.order, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(y_ker), np.asarray(y_ref), atol=3e-5, rtol=1e-4
    )


def test_kernel_blocked_grid_interpret():
    """b·t above block_bt: multi-program grid with padded tail."""
    m, variables, x, sup = _module_and_params(b=3)  # bt = 15
    sp, all_sup = _stack_inputs(m, variables, sup)
    y_ref = stack_forward_reference(x, all_sup, sp, order=m.order)
    y_ker = gwnet_stack_forward(
        x, all_sup, sp, order=m.order, interpret=True, block_bt=4
    )
    np.testing.assert_allclose(
        np.asarray(y_ker), np.asarray(y_ref), atol=3e-5, rtol=1e-4
    )
