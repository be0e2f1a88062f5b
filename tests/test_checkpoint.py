"""CheckpointManager: best-k retention + latest-epoch resume store."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_outage_tpu.core.checkpoint import CheckpointManager


def _tree(v):
    return {"w": jnp.full((4,), float(v)), "step": jnp.int32(v)}


def test_best_and_latest_are_tracked_separately(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_top_k=1)
    # val_loss improves at epoch 1, then degrades — best stays at 1,
    # latest advances to 3 (a best-only policy would delete epochs 2-3
    # and silently roll a resume back to the best epoch)
    for epoch, loss in [(0, 1.0), (1, 0.5), (2, 0.8), (3, 0.9)]:
        mgr.save(epoch, _tree(epoch), metrics={"val_loss": loss})
    assert mgr.best_step == 1
    assert mgr.latest_step() == 3

    best = mgr.restore(template=_tree(0))
    np.testing.assert_array_equal(np.asarray(best["w"]), np.full(4, 1.0))

    latest = mgr.restore_latest(template=_tree(0))
    np.testing.assert_array_equal(np.asarray(latest["w"]), np.full(4, 3.0))
    mgr.close()


def test_restore_empty_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        mgr.restore(template=_tree(0))
    with pytest.raises(FileNotFoundError):
        mgr.restore_latest(template=_tree(0))
    mgr.close()


def test_keep_top_k_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep_top_k=2)
    for epoch, loss in [(0, 3.0), (1, 1.0), (2, 2.0), (3, 5.0)]:
        mgr.save(epoch, _tree(epoch), metrics={"val_loss": loss})
    mgr.wait()
    assert mgr.best_step == 1
    mgr.close()
