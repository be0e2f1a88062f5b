"""GroupedBatchNorm vs torch.nn.BatchNorm2d oracle.

The reference pushes 67 counties serially through shared BatchNorm2d
modules with T as the conv batch (reference models/unet.py:110-120), so
train-mode statistics are per-county over (T, H, W). GroupedBatchNorm
claims to reproduce that per-call behavior in one batched op (SURVEY §7
"hard parts") — these tests prove it against torch directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_outage_tpu.models.layers import GroupedBatchNorm


def _apply_torch_serial(x_np, scale, bias, momentum=0.1, eps=1e-5):
    """torch BatchNorm2d applied per-county serially (reference semantics).

    x_np: [N_counties, T, H, W, C] channels-last; returns (out, running
    mean/var after the serial sweep)."""
    n, t, h, w, c = x_np.shape
    bn = torch.nn.BatchNorm2d(c, momentum=momentum, eps=eps)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
    bn.train()
    outs = []
    for county in range(n):
        xc = torch.from_numpy(x_np[county]).permute(0, 3, 1, 2)  # [T,C,H,W]
        with torch.no_grad():
            y = bn(xc)
        outs.append(y.permute(0, 2, 3, 1).numpy())
    return (
        np.stack(outs),
        bn.running_mean.numpy(),
        bn.running_var.numpy(),
    )


def test_train_mode_output_matches_torch_serial_bn():
    rng = np.random.default_rng(0)
    n, t, h, w, c = 5, 3, 8, 8, 4
    x = rng.normal(size=(n, t, h, w, c)).astype(np.float32) * 2 + 1
    scale = rng.uniform(0.5, 1.5, c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)

    torch_out, _, _ = _apply_torch_serial(x, scale, bias)

    m = GroupedBatchNorm(num_group_axes=1)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    jax_out, _ = m.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(jax_out), torch_out, atol=2e-5)


def test_eval_mode_matches_torch():
    rng = np.random.default_rng(1)
    n, t, h, w, c = 3, 2, 4, 4, 6
    x = rng.normal(size=(n, t, h, w, c)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, c).astype(np.float32)
    bias = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.3, 2.0, c).astype(np.float32)

    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.eval()
    xt = torch.from_numpy(x.reshape(n * t, h, w, c)).permute(0, 3, 1, 2)
    with torch.no_grad():
        torch_out = (
            bn(xt).permute(0, 2, 3, 1).numpy().reshape(n, t, h, w, c)
        )

    m = GroupedBatchNorm(num_group_axes=1)
    out = m.apply(
        {
            "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
            "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        },
        jnp.asarray(x),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), torch_out, atol=2e-5)


def test_running_stats_match_torch_serial_ema_exactly():
    """serial_ema (default): the closed-form update must track torch's
    serial per-county EMA — the reference's running-stat trajectory —
    over multiple training sweeps, not just one step."""
    rng = np.random.default_rng(2)
    n, t, h, w, c = 7, 3, 6, 6, 2
    scale = np.ones(c, np.float32)
    bias = np.zeros(c, np.float32)

    m = GroupedBatchNorm(num_group_axes=1, momentum=0.1)
    bn = torch.nn.BatchNorm2d(c, momentum=0.1)
    bn.train()

    variables = None
    for sweep in range(3):
        x = (
            rng.normal(size=(n, t, h, w, c)).astype(np.float32)
            * (1 + sweep)
            + sweep  # distinct per-sweep distributions
        )
        for county in range(n):  # torch: serial county loop
            with torch.no_grad():
                bn(torch.from_numpy(x[county]).permute(0, 3, 1, 2))
        if variables is None:
            variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
            variables = {
                "params": {
                    "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)
                },
                "batch_stats": variables["batch_stats"],
            }
        _, mutated = m.apply(
            variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        variables = {
            "params": variables["params"],
            "batch_stats": mutated["batch_stats"],
        }

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        bn.running_mean.numpy(),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        bn.running_var.numpy(),
        atol=1e-5, rtol=1e-5,
    )


def test_running_stats_group_mean_option():
    """serial_ema=False: uniform group-mean EMA (one torch-style update
    with the mean of per-county batch stats)."""
    rng = np.random.default_rng(3)
    n, t, h, w, c = 4, 3, 6, 6, 2
    x = rng.normal(size=(n, t, h, w, c)).astype(np.float32)

    m = GroupedBatchNorm(num_group_axes=1, momentum=0.1, serial_ema=False)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    _, mutated = m.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    new_mean = np.asarray(mutated["batch_stats"]["mean"])
    new_var = np.asarray(mutated["batch_stats"]["var"])

    per_group_mean = x.mean(axis=(1, 2, 3))  # [N, C]
    mcount = t * h * w
    per_group_var = x.var(axis=(1, 2, 3)) * mcount / (mcount - 1)
    np.testing.assert_allclose(
        new_mean, 0.9 * 0.0 + 0.1 * per_group_mean.mean(0), atol=1e-5
    )
    np.testing.assert_allclose(
        new_var, 0.9 * 1.0 + 0.1 * per_group_var.mean(0), atol=1e-5
    )


def test_single_pass_stats_match_two_pass():
    """single_pass (shifted one-sweep variance) must agree with the
    two-pass statistics on well-conditioned data — outputs, running
    stats, and gradients — and stay finite on a near-constant plane
    (where the unshifted E[x²]−μ² form NaN'd)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n, t, h, w, c = 4, 3, 8, 8, 4
    x = (rng.normal(size=(n, t, h, w, c)) * 2 + 1).astype(np.float32)

    m2 = GroupedBatchNorm(num_group_axes=1, single_pass=False)
    m1 = GroupedBatchNorm(num_group_axes=1, single_pass=True)
    v = m2.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y2, mut2 = m2.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    y1, mut1 = m1.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5,
                               rtol=1e-4)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut1["batch_stats"][k]),
            np.asarray(mut2["batch_stats"][k]), atol=1e-5, rtol=1e-4,
        )

    def loss(m, params):
        y, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            jnp.asarray(x), train=True, mutable=["batch_stats"],
        )
        return jnp.mean(y**2)

    g2 = jax.grad(lambda p: loss(m2, p))(v["params"])
    g1 = jax.grad(lambda p: loss(m1, p))(v["params"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3
        ),
        g1, g2,
    )

    # near-constant plane: finite output, clamped variance
    xc = np.full((2, 3, 16, 16, 4), 7.25, np.float32)
    xc += rng.normal(size=xc.shape).astype(np.float32) * 1e-4
    yc, mutc = m1.apply(v, jnp.asarray(xc), train=True, mutable=["batch_stats"])
    assert np.all(np.isfinite(np.asarray(yc)))
    assert np.all(np.asarray(mutc["batch_stats"]["var"]) >= 0.0)


def _bn_shift_run(x, single_pass):
    m = GroupedBatchNorm(num_group_axes=2, single_pass=single_pass)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    # running stats at init: mean 0, var 1 ⇒ m0 = 0, the worst case
    y, upd = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    return np.asarray(y), jax.tree.map(np.asarray, upd["batch_stats"])


def test_single_pass_distribution_shift_worst_case():
    """ADVICE r2: pin the single-pass variance error when the running
    mean m0 is far from a group's mean (early training / strong shift).

    With data ~ N(shift, 1) and m0 = 0, the shifted-moment cancellation
    s2 − s1² subtracts ~shift² quantities whose f32 rounding (a few ULPs
    of shift² after the mean accumulation) lands as absolute variance
    error. Measured at shift=1e3: variance off by ≲0.5 on a true
    variance of 1, i.e. normalized outputs off by up to ~25% — finite
    and benign-shaped but numerically degraded. This is the documented
    pathological regime for bn_single_pass (default ON for the +4.7%
    throughput win on CONDITIONED data, where m0 tracks group means);
    --bn_two_pass is the escape hatch."""
    rng = np.random.default_rng(0)
    shift = 1e3
    x = (rng.normal(size=(2, 3, 8, 8, 4)) + shift).astype(np.float32)
    y1, st1 = _bn_shift_run(x, True)
    y2, st2 = _bn_shift_run(x, False)
    assert np.isfinite(y1).all()
    np.testing.assert_allclose(st1["mean"], st2["mean"], atol=1e-3)
    # pinned worst case: a few ULPs of shift² of absolute variance error
    assert np.max(np.abs(st1["var"] - st2["var"])) < shift**2 * 2**-23 * 8
    assert np.max(np.abs(y1 - y2)) < 2.0  # outputs degraded, not broken


def test_single_pass_moderate_shift_is_tight():
    """The cancellation error scales with shift²·2⁻²³: at shift=10 (m0
    merely stale, the realistic early-training case) single-pass and
    two-pass agree to f32 noise."""
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 3, 8, 8, 4)) + 10.0).astype(np.float32)
    y1, st1 = _bn_shift_run(x, True)
    y2, st2 = _bn_shift_run(x, False)
    np.testing.assert_allclose(st1["var"], st2["var"], atol=1e-3)
    np.testing.assert_allclose(y1, y2, atol=1e-3)


def test_masked_serial_ema_matches_torch_on_valid_groups_only():
    """sample_weight masks pad groups out of the serial EMA: the masked
    closed-form update on a padded tensor must equal torch's serial sweep
    over ONLY the valid groups — the update the reference computes on a
    ragged final batch (mesh pad_batch semantics, w = 1 valid / 0 pad)."""
    rng = np.random.default_rng(4)
    n_valid, n_pad, t, h, w, c = 5, 3, 3, 6, 6, 2
    n = n_valid + n_pad
    scale = np.ones(c, np.float32)
    bias = np.zeros(c, np.float32)

    m = GroupedBatchNorm(num_group_axes=1, momentum=0.1)
    bn = torch.nn.BatchNorm2d(c, momentum=0.1)
    bn.train()

    variables = None
    for sweep in range(3):
        xv = (
            rng.normal(size=(n_valid, t, h, w, c)).astype(np.float32)
            * (1 + sweep)
            + sweep
        )
        # pad rows cycle the valid samples (np.resize), mask zeros them
        x = np.resize(xv, (n, t, h, w, c))
        sw = np.zeros((n,), np.float32)
        sw[:n_valid] = 1.0
        for g in range(n_valid):  # torch: serial sweep, valid groups only
            with torch.no_grad():
                bn(torch.from_numpy(xv[g]).permute(0, 3, 1, 2))
        if variables is None:
            variables = m.init(
                jax.random.PRNGKey(0), jnp.asarray(x), train=True
            )
            variables = {
                "params": {
                    "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)
                },
                "batch_stats": variables["batch_stats"],
            }
        _, mutated = m.apply(
            variables,
            jnp.asarray(x),
            train=True,
            sample_weight=jnp.asarray(sw),
            mutable=["batch_stats"],
        )
        variables = {
            "params": variables["params"],
            "batch_stats": mutated["batch_stats"],
        }

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        bn.running_mean.numpy(),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        bn.running_var.numpy(),
        atol=1e-5, rtol=1e-5,
    )


def test_masked_serial_ema_interleaved_positions():
    """The reversed-cumsum closed form skips masked groups wherever they
    sit, not just a trailing pad block: an interleaved mask must equal
    the unmasked update on the compacted valid-only tensor."""
    rng = np.random.default_rng(5)
    n, t, h, w, c = 6, 2, 4, 4, 3
    x = rng.normal(size=(n, t, h, w, c)).astype(np.float32)
    sw = np.array([1, 0, 1, 1, 0, 1], np.float32)

    m = GroupedBatchNorm(num_group_axes=1, momentum=0.1)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    _, masked = m.apply(
        variables, jnp.asarray(x), train=True,
        sample_weight=jnp.asarray(sw), mutable=["batch_stats"],
    )
    _, compact = m.apply(
        variables, jnp.asarray(x[sw.astype(bool)]), train=True,
        mutable=["batch_stats"],
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(masked["batch_stats"][k]),
            np.asarray(compact["batch_stats"][k]),
            atol=1e-6, rtol=1e-6,
        )


def test_masked_group_mean_option():
    """serial_ema=False with sample_weight: the uniform group-mean EMA
    averages ONLY the valid groups."""
    rng = np.random.default_rng(6)
    n, t, h, w, c = 4, 2, 4, 4, 2
    x = rng.normal(size=(n, t, h, w, c)).astype(np.float32)
    sw = np.array([1, 1, 0, 0], np.float32)

    m = GroupedBatchNorm(num_group_axes=1, momentum=0.1, serial_ema=False)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    _, masked = m.apply(
        variables, jnp.asarray(x), train=True,
        sample_weight=jnp.asarray(sw), mutable=["batch_stats"],
    )
    _, compact = m.apply(
        variables, jnp.asarray(x[:2]), train=True, mutable=["batch_stats"]
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(masked["batch_stats"][k]),
            np.asarray(compact["batch_stats"][k]),
            atol=1e-6,
        )


def test_masked_ema_broadcasts_batch_row_over_counties():
    """num_group_axes=2 (batch, county) with a per-BATCH (B,) weight row —
    the mesh trainer's actual call shape: mask broadcasts over counties
    and the update equals the unmasked update on the valid rows."""
    rng = np.random.default_rng(7)
    b, n, t, h, w, c = 4, 3, 2, 4, 4, 2
    xv = rng.normal(size=(3, n, t, h, w, c)).astype(np.float32)
    x = np.resize(xv, (b, n, t, h, w, c))  # pad row cycles sample 0
    sw = np.array([1, 1, 1, 0], np.float32)

    m = GroupedBatchNorm(num_group_axes=2, momentum=0.1)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    out, masked = m.apply(
        variables, jnp.asarray(x), train=True,
        sample_weight=jnp.asarray(sw), mutable=["batch_stats"],
    )
    out_v, compact = m.apply(
        variables, jnp.asarray(xv), train=True, mutable=["batch_stats"]
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(masked["batch_stats"][k]),
            np.asarray(compact["batch_stats"][k]),
            atol=1e-6, rtol=1e-6,
        )
    # per-group statistics are independent, so valid-row outputs are
    # untouched by the mask/pads
    np.testing.assert_allclose(
        np.asarray(out)[:3], np.asarray(out_v), atol=1e-6
    )
