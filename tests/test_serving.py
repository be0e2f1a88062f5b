"""Serving engine: fused inference path must match the flax eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.core.config import ModelConfig
from multimodal_outage_tpu.models.fusion import build_model
from multimodal_outage_tpu.ops.unet_pallas import (
    fold_batchnorm,
    forward_reference,
    fused_double_conv,
)
from multimodal_outage_tpu.serving import ServingModel

KEY = jax.random.PRNGKey(5)


def test_fused_double_conv_matches_reference():
    m, h, w, cin, cout = 3, 16, 16, 4, 8
    ks = jax.random.split(KEY, 7)
    x = jax.random.normal(ks[0], (m, h, w, cin))
    w1 = jax.random.normal(ks[1], (3, 3, cin, cout)) * 0.2
    w2 = jax.random.normal(ks[2], (3, 3, cout, cout)) * 0.2
    s1 = jax.random.uniform(ks[3], (cout,), minval=0.5, maxval=1.5)
    b1 = jax.random.normal(ks[4], (cout,)) * 0.1
    s2 = jax.random.uniform(ks[5], (cout,), minval=0.5, maxval=1.5)
    b2 = jax.random.normal(ks[6], (cout,)) * 0.1

    ref = forward_reference(x, w1, s1, b1, w2, s2, b2)
    out = fused_double_conv(x, w1, s1, b1, w2, s2, b2, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_double_conv_grads():
    m, h, w, c = 2, 8, 8, 4
    ks = jax.random.split(KEY, 3)
    x = jax.random.normal(ks[0], (m, h, w, c))
    w1 = jax.random.normal(ks[1], (3, 3, c, c)) * 0.2
    w2 = jax.random.normal(ks[2], (3, 3, c, c)) * 0.2
    ones = jnp.ones((c,))
    zeros = jnp.zeros((c,))

    def loss_pl(x, w1, w2):
        return jnp.sum(
            fused_double_conv(x, w1, ones, zeros, w2, ones, zeros, True) ** 2
        )

    def loss_ref(x, w1, w2):
        return jnp.sum(
            forward_reference(x, w1, ones, zeros, w2, ones, zeros) ** 2
        )

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w1, w2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4
        )


def test_fold_batchnorm():
    c = 4
    ks = jax.random.split(KEY, 5)
    x = jax.random.normal(ks[0], (10, c))
    scale = jax.random.uniform(ks[1], (c,), minval=0.5, maxval=2.0)
    bias = jax.random.normal(ks[2], (c,))
    mean = jax.random.normal(ks[3], (c,))
    var = jax.random.uniform(ks[4], (c,), minval=0.1, maxval=2.0)
    s, b = fold_batchnorm(scale, bias, mean, var)
    expected = (x - mean) * scale * jax.lax.rsqrt(var + 1e-5) + bias
    np.testing.assert_allclose(
        np.asarray(x * s + b), np.asarray(expected), atol=1e-5
    )


def test_serving_stack_requires_supports():
    """Explicitly requesting a fused stack kernel without the supports it
    must bake raises a descriptive error, not an AttributeError deep in
    the engine build."""
    from dataclasses import replace

    dummy = {"params": {}, "batch_stats": {}}
    cfg = ModelConfig(st_gnn="dcrnn", compute_dtype="float32")
    with pytest.raises(ValueError, match="supports"):
        ServingModel(cfg, dummy, None, horizon=2, dcrnn_stack=True)
    gcfg = ModelConfig(compute_dtype="float32")
    gcfg = replace(gcfg, gwnet=replace(gcfg.gwnet, addaptadj=False))
    with pytest.raises(ValueError, match="supports"):
        ServingModel(gcfg, dummy, None, horizon=2, gwnet_stack=True)


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [False, True])
def test_serving_matches_flax_eval(use_pallas):
    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg, horizon=2)
    b, n, t, h = 1, 4, 2, 32
    x = jax.random.normal(KEY, (b, n, t, h, h, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (b, t, 1)
    )
    sup = jnp.eye(n)[None]
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    # non-trivial batch stats so BN folding is actually exercised
    bs = jax.tree.map(
        lambda v: v + 0.3 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape) / v.size,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}

    y_flax = model.apply(variables, x, feats, sup, train=False)
    serve = ServingModel(
        cfg, variables, sup, use_pallas=use_pallas, interpret=True
    )
    y_serve = serve(x, feats)
    np.testing.assert_allclose(
        np.asarray(y_serve), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_serving_dcrnn_matches_flax_eval():
    """Round-2: ServingModel must serve the DCRNN st-GNN too (the round-1
    engine rejected it outright)."""
    cfg = ModelConfig(st_gnn="dcrnn", compute_dtype="float32")
    model = build_model(cfg, horizon=2)
    b, n, t, h = 1, 4, 2, 32
    x = jax.random.normal(KEY, (b, n, t, h, h, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (b, t, 1)
    )
    sup = jnp.stack([jnp.eye(n), jnp.eye(n)])  # dual random walk
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    y_flax = model.apply(variables, x, feats, sup, train=False)
    serve = ServingModel(cfg, variables, sup, horizon=2)
    y_serve = serve(x, feats)
    np.testing.assert_allclose(
        np.asarray(y_serve), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )


def test_serving_gwnet_gcn_bool_false():
    """gcn_bool=False (reference graph_wavenet.py:100): no graph mixing,
    serving still agrees with the flax eval forward."""
    from multimodal_outage_tpu.core.config import GWNetConfig

    cfg = ModelConfig(
        compute_dtype="float32", gwnet=GWNetConfig(gcn_bool=False)
    )
    model = build_model(cfg, horizon=2)
    b, n, t, h = 1, 4, 2, 16
    x = jax.random.normal(KEY, (b, n, t, h, h, 1))
    feats = jnp.zeros((b, t, 6))
    sup = jnp.eye(n)[None]
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    # no adaptive adjacency and no diffusion params with gcn off
    assert "nodevec1" not in variables["params"]["st_gnn"]
    assert any(
        k.startswith("residual_conv") for k in variables["params"]["st_gnn"]
    )
    y_flax = model.apply(variables, x, feats, sup, train=False)
    serve = ServingModel(cfg, variables, sup)
    y_serve = serve(x, feats)
    np.testing.assert_allclose(
        np.asarray(y_serve), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )


def test_serving_gwnet_stack_matches_flax_eval():
    """Whole-stack fused gwnet kernel (interpret mode): the serving
    engine's default-on TPU path must agree with the flax eval forward."""
    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg, horizon=2)
    b, n, t, h = 1, 4, 2, 16
    x = jax.random.normal(KEY, (b, n, t, h, h, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (b, t, 1)
    )
    sup = jnp.eye(n)[None]
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    y_flax = model.apply(variables, x, feats, sup, train=False)
    serve = ServingModel(cfg, variables, sup, interpret=True)
    assert serve.gwnet_stack  # interpret ⇒ auto-on, like on TPU
    y_serve = serve(x, feats)
    np.testing.assert_allclose(
        np.asarray(y_serve), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_serving_dcrnn_stack_kernel_matches_flax_eval():
    """Round-3: the whole-stack fused DCRNN kernel
    (ops/dcrnn_stack_pallas.py) engaged inside the serving engine
    (interpret mode on CPU) must reproduce the flax eval forward.
    B=1: the kernel only engages for single-sample requests (the
    measured policy — see ServingModel docstring); a B=2 request on the
    same engine must route to the XLA-scan branch and still match."""
    cfg = ModelConfig(st_gnn="dcrnn", compute_dtype="float32")
    model = build_model(cfg, horizon=2)
    b, n, t, h = 1, 4, 2, 32
    x = jax.random.normal(KEY, (b, n, t, h, h, 1))
    feats = jnp.tile(
        jnp.array([0, 0, 0, 2022, 9, 26], jnp.float32), (b, t, 1)
    )
    sup = jnp.stack([jnp.eye(n), jnp.eye(n)])  # dual random walk
    variables = model.init(
        {"params": KEY, "dropout": KEY}, x, feats, sup, train=False
    )
    y_flax = model.apply(variables, x, feats, sup, train=False)
    serve = ServingModel(cfg, variables, sup, horizon=2, interpret=True)
    assert serve.dcrnn_stack  # the kernel path is actually engaged
    y_serve = serve(x, feats)
    np.testing.assert_allclose(
        np.asarray(y_serve), np.asarray(y_flax), atol=5e-5, rtol=1e-4
    )
    # batched request on the SAME engine: trace-time gate routes to the
    # XLA scan (the kernel loses from B=16, BENCHMARKS.md r3)
    x2 = jnp.concatenate([x, x * 0.5])
    feats2 = jnp.concatenate([feats, feats])
    y2_flax = model.apply(variables, x2, feats2, sup, train=False)
    y2_serve = serve(x2, feats2)
    np.testing.assert_allclose(
        np.asarray(y2_serve), np.asarray(y2_flax), atol=5e-5, rtol=1e-4
    )
