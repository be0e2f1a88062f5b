import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.train.state import cosine_annealing_lr


def test_cosine_annealing_matches_torch_formula():
    # torch CosineAnnealingLR(T_max=10), eta_min=0: epoch 0 → lr0,
    # epoch 10 → 0, epoch 5 → lr0/2
    lr0 = 1e-3
    np.testing.assert_allclose(cosine_annealing_lr(0, lr0, 10), lr0)
    np.testing.assert_allclose(cosine_annealing_lr(5, lr0, 10), lr0 / 2)
    np.testing.assert_allclose(cosine_annealing_lr(10, lr0, 10), 0.0, atol=1e-12)


@pytest.mark.slow
def test_fit_end_to_end(tiny_cfg, tmp_path):
    """Minimum end-to-end slice (SURVEY §7 stage 4): loss decreases over
    epochs on synthetic data, checkpoint round-trips, metrics emitted."""
    from multimodal_outage_tpu.train.loop import fit, predict

    cfg = tiny_cfg.replace(
        train=dataclasses.replace(
            tiny_cfg.train,
            epochs=3,
            batch_size=2,
            checkpoint_dir=str(tmp_path / "logs"),
            job_id="t1",
        )
    )
    results = fit(cfg, test_case="michael", progress=False)
    for k in (
        "val_loss",
        "val_mae",
        "val_mape",
        "val_rmse",
        "test_loss",
        "test_mae",
        "test_mape",
        "test_rmse",
    ):
        assert k in results and np.isfinite(results[k])

    # metrics.jsonl written with train + val + final records
    run_dir = os.path.join(cfg.train.checkpoint_dir, "t1")
    lines = [
        json.loads(l)
        for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    phases = {l["phase"] for l in lines}
    assert {"val", "final"} <= phases
    val_losses = [l["val_loss"] for l in lines if l["phase"] == "val"]
    # training reduces loss on this easy synthetic task
    assert val_losses[-1] < val_losses[0] * 1.5

    # predict from the saved best checkpoint
    preds, targets, metrics = predict(
        cfg,
        os.path.join(run_dir, "checkpoints"),
        test_case="michael",
    )
    assert preds.shape == targets.shape
    assert preds.shape[1:] == (
        cfg.data.n_counties,
        cfg.data.horizon,
        cfg.data.image_size,
        cfg.data.image_size,
        1,
    )
    assert np.isfinite(metrics["loss"])

    # serving engine on the same checkpoint agrees with predict()
    from multimodal_outage_tpu.train.loop import serve_eval

    _, serve_metrics, _ = serve_eval(
        cfg, os.path.join(run_dir, "checkpoints"), test_case="michael"
    )
    np.testing.assert_allclose(
        serve_metrics["loss"], metrics["loss"], rtol=1e-3
    )


@pytest.mark.slow
def test_resume_continues_from_checkpoint(tiny_cfg, tmp_path):
    """Fault injection (SURVEY §5): train 1 epoch, 'crash', resume with
    epochs=2 — the resumed run continues from the checkpoint instead of
    restarting, and early-stopping state survives."""
    from multimodal_outage_tpu.train.loop import fit

    base = tiny_cfg.replace(
        train=dataclasses.replace(
            tiny_cfg.train,
            epochs=1,
            batch_size=2,
            checkpoint_dir=str(tmp_path / "logs"),
            job_id="resume_t",
        )
    )
    fit(base, test_case="michael", progress=False)
    run_dir = os.path.join(base.train.checkpoint_dir, "resume_t")
    lines1 = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    epochs1 = {l["epoch"] for l in lines1 if l["phase"] == "val"}
    assert epochs1 == {0}

    resumed = base.replace(
        train=dataclasses.replace(base.train, epochs=2, resume=True)
    )
    fit(resumed, test_case="michael", progress=False)
    lines2 = [
        json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    epochs2 = [l["epoch"] for l in lines2 if l["phase"] == "val"]
    # epoch 0 ran once (before the crash), epoch 1 only in the resumed run
    assert epochs2 == [0, 1]


def test_donated_step_matches_undonated(tiny_cfg):
    """Buffer donation must not change numerics (SURVEY §5 'sanitizers':
    donate-buffer correctness)."""
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.train.state import create_train_state
    from multimodal_outage_tpu.train.steps import make_train_step

    cfg = tiny_cfg
    n, t, s = cfg.data.n_counties, cfg.data.horizon, cfg.data.image_size
    model = build_model(cfg.model, t)
    rng = jax.random.PRNGKey(3)
    batch = {
        "x": jax.random.normal(rng, (2, n, t, s, s, 1)),
        "y": jax.random.normal(rng, (2, n, t, s, s, 1)),
        "date_feats": jnp.zeros((2, t, 6)),
    }
    supports = jnp.eye(n)[None]
    state_a = create_train_state(model, rng, batch, supports)
    state_b = jax.tree.map(lambda x: x.copy(), state_a)

    sa, ma = make_train_step(model, donate=False)(
        state_a, batch, supports, jnp.float32(1e-3), rng
    )
    sb, mb = make_train_step(model, donate=True)(
        state_b, batch, supports, jnp.float32(1e-3), rng
    )
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_step_updates_params(tiny_cfg):
    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.train.state import create_train_state
    from multimodal_outage_tpu.train.steps import make_train_step

    cfg = tiny_cfg
    n, t, s = cfg.data.n_counties, cfg.data.horizon, cfg.data.image_size
    model = build_model(cfg.model, t)
    rng = jax.random.PRNGKey(0)
    batch = {
        "x": jax.random.normal(rng, (2, n, t, s, s, 1)),
        "y": jax.random.normal(rng, (2, n, t, s, s, 1)),
        "date_feats": jnp.zeros((2, t, 6)),
    }
    supports = jnp.eye(n)[None]
    state = create_train_state(model, rng, batch, supports)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    state2, metrics = make_train_step(model, donate=False)(
        state, batch, supports, jnp.float32(1e-3), rng
    )
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), p0, state2.params
    )
    # most parameters should move (date2vec is frozen)
    flat = jax.tree.leaves(changed)
    assert sum(flat) > len(flat) // 2


def test_grad_accum_step_matches_one_shot(tiny_cfg):
    """make_accum_train_step (r3, the reference-batch-16 enabler on a
    16 GB chip) must reproduce the one-shot step EXACTLY: the mean of
    equal-microbatch MSE gradients is the full-batch gradient, and the
    serial-EMA BatchNorm running-stat closed form telescopes across
    microbatches. The one documented deviation is the per-microbatch
    dropout rng (a different random draw), so this test isolates the
    accumulation math with a dropout-free config."""
    import dataclasses as _dc

    from multimodal_outage_tpu.models.fusion import build_model
    from multimodal_outage_tpu.train.state import create_train_state
    from multimodal_outage_tpu.train.steps import (
        make_accum_train_step,
        make_train_step,
    )

    cfg = tiny_cfg
    model_cfg = _dc.replace(
        cfg.model,
        encoder_dropout=0.0,
        compute_dtype="float32",
        # two-pass BN: the single-pass shift uses the CURRENT running
        # mean, which microbatch 2 sees post-update — an f32-rounding-
        # level wobble this exactness test excludes
        bn_single_pass=False,
        gwnet=_dc.replace(cfg.model.gwnet, dropout=0.0),
    )
    n, t, s = cfg.data.n_counties, cfg.data.horizon, cfg.data.image_size
    model = build_model(model_cfg, t)
    rng = jax.random.PRNGKey(3)
    b = 4
    batch = {
        "x": jax.random.normal(rng, (b, n, t, s, s, 1)),
        "y": jax.random.normal(rng, (b, n, t, s, s, 1)),
        "date_feats": jnp.zeros((b, t, 6)),
    }
    supports = jnp.eye(n)[None]
    state_a = create_train_state(model, rng, batch, supports)
    state_b = jax.tree.map(lambda x: x.copy(), state_a)

    sa, ma = make_train_step(model, donate=False)(
        state_a, batch, supports, jnp.float32(1e-3), rng
    )
    # the accum step takes the FLAT batch and reshapes in-program
    sb, mmb = make_accum_train_step(model, 2, donate=False)(
        state_b, batch, supports, jnp.float32(1e-3), rng
    )
    # metrics: equal-weight means over equal microbatches == full-batch
    for k in ("loss", "mae", "rmse"):
        np.testing.assert_allclose(
            float(ma[k]), float(mmb[k]), rtol=1e-5
        )
    # serial-EMA running stats telescope across microbatches exactly —
    # the sharp semantic invariant (a wrong update order would show up
    # here at O(momentum)=1e-1, not rounding level)
    jax.tree.map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=1e-5, rtol=1e-5
        ),
        sa.batch_stats, sb.batch_stats,
    )
    # params after ONE Adam step: mean-of-microbatch grads equals the
    # full-batch grad only to f32 summation-order noise (~1e-7), and
    # Adam amplifies that noise on zero-init biases (grad≈1e-6 ⇒
    # v̂≈1e-12 ⇒ m̂/√v̂ is noise-sensitive) to a few % of one lr=1e-3
    # update. atol 1e-4 tolerates that amplification while still
    # catching any semantic averaging bug, which would differ at the
    # full O(lr)=1e-3 update scale.
    for a, bb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=1e-4
        )


def test_grad_accum_ragged_tail_never_exceeds_microbatch():
    """Ragged tails must NOT fall back to a near-full one-shot step (it
    would OOM on exactly the configs grad_accum exists for); they split
    into the smallest number of EQUAL microbatches that fit."""
    from multimodal_outage_tpu.train.loop import (
        _accum_split_count as split_count,
    )

    # batch 16, grad_accum 2 => microbatch budget 8
    assert split_count(16, 8) == 2
    assert split_count(8, 8) == 1  # fits one-shot
    assert split_count(15, 8) == 3  # 3x5, never a b=15 one-shot
    assert split_count(13, 8) == 13  # prime tail: 13x1
    for b in range(1, 33):
        k = split_count(b, 8)
        assert b % k == 0 and b // k <= 8


def test_fit_with_grad_accum(tiny_cfg, tmp_path):
    """--grad_accum 2 through the real fit loop (incl. the ragged-tail
    equal-split path) trains and returns finite metrics."""
    import dataclasses as _dc

    from multimodal_outage_tpu.train.loop import fit

    cfg = tiny_cfg.replace(
        train=_dc.replace(
            tiny_cfg.train,
            epochs=1,
            grad_accum=2,
            checkpoint_dir=str(tmp_path),
            job_id="ga",
        )
    )
    out = fit(cfg, progress=False)
    assert np.isfinite(out["val_loss"])


def test_fit_auto_grad_accum_falls_back_on_oom(
    tiny_cfg, tmp_path, monkeypatch, capsys
):
    """--grad_accum auto (config 0): the one-shot step OOMs (simulated
    with the real backend error message shape), the loop halves the
    microbatch budget and finishes the epoch through the accumulating
    step — any batch size trains without hand-tuning."""
    import dataclasses as _dc

    from multimodal_outage_tpu.train import loop as L
    from multimodal_outage_tpu.train.steps import make_train_step as real_make

    oom_raises = {"n": 0}

    def oom_make(model, donate=True, compiler_options="auto"):
        real = real_make(
            model, donate=donate, compiler_options=compiler_options
        )

        def step(state, batch, supports, lr, rng):
            # full batches "exceed HBM"; the halved microbatches fit
            if batch["x"].shape[0] >= 4:
                oom_raises["n"] += 1
                raise RuntimeError(
                    "INTERNAL: remote_compile: HTTP 500 ... Ran out of "
                    "memory in memory space hbm (simulated)"
                )
            return real(state, batch, supports, lr, rng)

        return step

    monkeypatch.setattr(L, "make_train_step", oom_make)
    cfg = tiny_cfg.replace(
        train=_dc.replace(
            tiny_cfg.train,
            epochs=1,
            batch_size=4,
            grad_accum=0,  # auto
            checkpoint_dir=str(tmp_path),
            job_id="auto",
        )
    )
    out = L.fit(cfg, progress=False)
    assert np.isfinite(out["val_loss"])
    assert oom_raises["n"] >= 1  # the fallback actually engaged
    assert "[auto grad_accum]" in capsys.readouterr().err


def test_fit_auto_grad_accum_donated_state_aborts(
    tiny_cfg, tmp_path, monkeypatch
):
    """A RUNTIME OOM that already consumed the donated train state must
    abort with a restart hint, not retry on deleted buffers (which would
    crash with an opaque 'array has been deleted' error mid-retry)."""
    import dataclasses as _dc

    import jax

    from multimodal_outage_tpu.train import loop as L

    def consuming_make(model, donate=True, compiler_options="auto"):
        def step(state, batch, supports, lr, rng):
            # simulate donation: the failing execution consumed its inputs
            for leaf in jax.tree_util.tree_leaves(state.params):
                leaf.delete()
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: out of memory allocating (simulated)"
            )

        return step

    monkeypatch.setattr(L, "make_train_step", consuming_make)
    cfg = tiny_cfg.replace(
        train=_dc.replace(
            tiny_cfg.train,
            epochs=1,
            batch_size=4,
            grad_accum=0,
            checkpoint_dir=str(tmp_path),
            job_id="auto3",
        )
    )
    with pytest.raises(RuntimeError, match="cannot retry"):
        L.fit(cfg, progress=False)


def test_fit_auto_grad_accum_reraises_non_oom(tiny_cfg, tmp_path, monkeypatch):
    """auto mode must not swallow non-OOM step failures."""
    import dataclasses as _dc

    from multimodal_outage_tpu.train import loop as L

    def broken_make(model, donate=True, compiler_options="auto"):
        def step(state, batch, supports, lr, rng):
            raise RuntimeError("INVALID_ARGUMENT: shapes are wrong")

        return step

    monkeypatch.setattr(L, "make_train_step", broken_make)
    cfg = tiny_cfg.replace(
        train=_dc.replace(
            tiny_cfg.train,
            epochs=1,
            batch_size=2,
            grad_accum=0,
            checkpoint_dir=str(tmp_path),
            job_id="auto2",
        )
    )
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        L.fit(cfg, progress=False)


def test_next_split_count_steps_every_divisor():
    """The auto-OOM fallback walks SPLIT COUNTS, not byte budgets:
    budget-halving can re-dispatch the identical failing program (same
    k) or skip a split that fits (b=6: budgets 6→3→1 give k=1→2→6,
    never trying k=3 / microbatch 2)."""
    from multimodal_outage_tpu.train.loop import _next_split_count

    assert _next_split_count(6, 1) == 2
    assert _next_split_count(6, 2) == 3
    assert _next_split_count(6, 3) == 6
    assert _next_split_count(16, 1) == 2
    assert _next_split_count(16, 2) == 4
    assert _next_split_count(16, 4) == 8
    assert _next_split_count(16, 8) == 16


def test_fit_auto_grad_accum_walks_splits_without_skipping(
    tiny_cfg, tmp_path, monkeypatch, capsys
):
    """batch 6 with microbatches >= 3 'exceeding HBM': the fallback must
    land on 3 microbatches of 2 (k=1 → 2 → 3), not re-run a k or jump
    to microbatch 1."""
    import dataclasses as _dc

    from multimodal_outage_tpu.train import loop as L
    from multimodal_outage_tpu.train.steps import (
        make_accum_train_step as real_accum,
        make_train_step as real_make,
    )

    def oom_if_big(rows):
        if rows >= 3:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: out of memory in memory space hbm "
                "(simulated)"
            )

    def fake_make(model, donate=True, compiler_options="auto"):
        real = real_make(model, donate=donate, compiler_options=compiler_options)

        def step(state, batch, supports, lr, rng):
            oom_if_big(batch["x"].shape[0])
            return real(state, batch, supports, lr, rng)

        return step

    accum_ks = []

    def fake_accum(model, accum, donate=True, compiler_options="auto"):
        accum_ks.append(accum)
        real = real_accum(
            model, accum, donate=donate, compiler_options=compiler_options
        )

        def step(state, batch, supports, lr, rng):
            oom_if_big(batch["x"].shape[0] // accum)
            return real(state, batch, supports, lr, rng)

        return step

    monkeypatch.setattr(L, "make_train_step", fake_make)
    monkeypatch.setattr(L, "make_accum_train_step", fake_accum)
    cfg = tiny_cfg.replace(
        train=_dc.replace(
            tiny_cfg.train,
            epochs=1,
            batch_size=6,
            grad_accum=0,
            checkpoint_dir=str(tmp_path),
            job_id="auto_walk",
        )
    )
    out = L.fit(cfg, progress=False)
    assert np.isfinite(out["val_loss"])
    # k=2 tried (mb 3, OOM), then k=3 engaged (mb 2, fits); k=6 never
    # needed, no k re-built — budget-halving would have skipped k=3
    assert accum_ks == [2, 3]
    assert "[auto grad_accum]" in capsys.readouterr().err


class _PoisonLoss:
    """Simulates a buffer poisoned by an ASYNC runtime OOM: the step
    call returned normally and the error surfaces only at the first
    host fetch of the result."""

    def __array__(self, dtype=None, copy=None):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: out of memory allocating result buffer "
            "(simulated async runtime OOM)"
        )


def test_fit_auto_grad_accum_catches_async_runtime_oom(
    tiny_cfg, tmp_path, monkeypatch, capsys
):
    """JAX dispatch is async: a runtime OOM raises at the next host
    fetch, not at the step call. The auto wrapper fetches a metric
    scalar inside its try so the fallback still engages instead of a
    raw XlaRuntimeError escaping from the epoch loop's metric read."""
    import dataclasses as _dc

    from multimodal_outage_tpu.train import loop as L
    from multimodal_outage_tpu.train.steps import make_train_step as real_make

    def fake_make(model, donate=True, compiler_options="auto"):
        real = real_make(model, donate=donate, compiler_options=compiler_options)

        def step(state, batch, supports, lr, rng):
            if batch["x"].shape[0] >= 4:
                # call "succeeds"; the OOM is latent in the result
                return state, {"loss": _PoisonLoss()}
            return real(state, batch, supports, lr, rng)

        return step

    monkeypatch.setattr(L, "make_train_step", fake_make)
    cfg = tiny_cfg.replace(
        train=_dc.replace(
            tiny_cfg.train,
            epochs=1,
            batch_size=4,
            grad_accum=0,
            checkpoint_dir=str(tmp_path),
            job_id="auto_async",
        )
    )
    out = L.fit(cfg, progress=False)
    assert np.isfinite(out["val_loss"])
    assert "[auto grad_accum]" in capsys.readouterr().err


def test_grad_accum_flag_parsing():
    """CLI 'auto' maps to config 0; negatives rejected at config level."""
    import argparse

    from multimodal_outage_tpu.cli import _grad_accum_arg
    from multimodal_outage_tpu.core.config import TrainConfig

    assert _grad_accum_arg("auto") == 0
    assert _grad_accum_arg("AUTO") == 0
    assert _grad_accum_arg("2") == 2
    with pytest.raises(argparse.ArgumentTypeError):
        _grad_accum_arg("fast")
    assert TrainConfig(grad_accum=0).grad_accum == 0  # auto is valid
    with pytest.raises(ValueError):
        TrainConfig(grad_accum=-1)


def test_default_compiler_options_gating():
    """The scoped-VMEM jit option applies on TPU only (other backends
    reject xla_tpu_* options) and 0 restores the compiler default."""
    from unittest import mock

    from multimodal_outage_tpu.core.config import TrainConfig
    from multimodal_outage_tpu.train.steps import default_compiler_options

    # this suite runs CPU-forced: must resolve to None
    assert default_compiler_options() is None
    assert default_compiler_options(0) is None
    with mock.patch("jax.default_backend", return_value="tpu"):
        assert default_compiler_options() == {
            "xla_tpu_scoped_vmem_limit_kib": "49152"
        }
        assert default_compiler_options(32768) == {
            "xla_tpu_scoped_vmem_limit_kib": "32768"
        }
        assert default_compiler_options(0) is None
    assert TrainConfig().xla_vmem_limit_kib == 49152
