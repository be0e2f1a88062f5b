"""Whole-stack fused DCRNN kernel (ops/dcrnn_stack_pallas.py):
interpret-mode Pallas must match the jnp reference, and both must match
the real DCRNN module's eval forward with the same weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.models.dcrnn import DCRNN
from multimodal_outage_tpu.ops.dcrnn_stack_pallas import (
    dcrnn_stack_forward,
    dcrnn_stack_params,
    stack_forward_reference,
)

N, T, DIN, DOUT, UNITS = 6, 4, 12, 10, 8
KEY = jax.random.PRNGKey(0)


def _module_and_params(b=2, n_supports=2, layers=2, k=2):
    m = DCRNN(
        output_dim=DOUT,
        horizon=T,
        rnn_units=UNITS,
        num_rnn_layers=layers,
        max_diffusion_step=k,
        dtype=jnp.float32,
    )
    x = jax.random.normal(KEY, (b, N, T, DIN))
    sup = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (n_supports, N, N)), -1
    )
    variables = m.init(KEY, x, sup, train=False)
    return m, variables, x, sup


def _stack_inputs(variables, sup, layers=2, k=2):
    return dcrnn_stack_params(
        variables["params"],
        num_rnn_layers=layers,
        max_diffusion_step=k,
        n_supports=sup.shape[0],
        input_dim=DIN,
        output_dim=DOUT,
        rnn_units=UNITS,
    )


@pytest.mark.parametrize("n_supports", [1, 2])
def test_reference_matches_module(n_supports):
    m, variables, x, sup = _module_and_params(n_supports=n_supports)
    want = m.apply(variables, x, sup, train=False)
    sp = _stack_inputs(variables, sup)
    got = stack_forward_reference(
        x, sup, sp, horizon=T, rnn_units=UNITS
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("b", [1, 3])
def test_kernel_interpret_matches_module(b):
    m, variables, x, sup = _module_and_params(b=b)
    want = m.apply(variables, x, sup, train=False)
    sp = _stack_inputs(variables, sup)
    got = dcrnn_stack_forward(
        x, sup, sp, horizon=T, rnn_units=UNITS, interpret=True
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_interpret_matches_module_3layers_k1():
    m, variables, x, sup = _module_and_params(layers=3, k=1)
    want = m.apply(variables, x, sup, train=False)
    sp = _stack_inputs(variables, sup, layers=3, k=1)
    got = dcrnn_stack_forward(
        x, sup, sp, horizon=T, rnn_units=UNITS, num_rnn_layers=3,
        max_diffusion_step=1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fusion_shapes_serving_config():
    """The serving-site configuration (input 320 → output 256) at small N."""
    m = DCRNN(output_dim=16, horizon=3, rnn_units=8, dtype=jnp.float32)
    x = jax.random.normal(KEY, (1, N, 3, 20))
    sup = jnp.eye(N)[None]
    variables = m.init(KEY, x, sup, train=False)
    want = m.apply(variables, x, sup, train=False)
    sp = dcrnn_stack_params(
        variables["params"],
        n_supports=1,
        input_dim=20,
        output_dim=16,
        rnn_units=8,
    )
    got = dcrnn_stack_forward(
        x, sup, sp, horizon=3, rnn_units=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
