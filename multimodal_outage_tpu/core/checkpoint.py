"""Orbax checkpointing: (params, batch_stats, opt_state, step, meta).

Equivalent of the reference's Lightning ModelCheckpoint (top-1 by min
val_loss, reference lit.py:187-196) plus what it lacks: optimizer-state
resume and early-stopping state (SURVEY §5 "Checkpoint / resume").

Two stores under the checkpoint directory:
  best/    — top-k by val_loss (min), for end-of-fit sweeps & inference
  latest/  — most recent epoch, for crash/resume. Without it, a best-only
             retention policy silently rolls a resumed run back to the
             best epoch, discarding later progress and the patience
             counter.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _shape_template(template: Any) -> Any:
    return jax.tree.map(
        lambda x: ocp.utils.to_shape_dtype_struct(x)
        if hasattr(x, "shape")
        else x,
        template,
    )


class CheckpointManager:
    """Best-k retention keyed on val_loss (min) + a latest-epoch store."""

    def __init__(self, directory: str, keep_top_k: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._best = ocp.CheckpointManager(
            os.path.join(self._dir, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_top_k,
                best_fn=lambda metrics: metrics["val_loss"],
                best_mode="min",
                enable_async_checkpointing=True,
            ),
        )
        self._latest = ocp.CheckpointManager(
            os.path.join(self._dir, "latest"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, tree: Any, metrics: dict) -> None:
        self._best.save(
            step,
            args=ocp.args.StandardSave(tree),
            metrics={k: float(v) for k, v in metrics.items()},
        )
        self._latest.save(step, args=ocp.args.StandardSave(tree))

    def wait(self) -> None:
        self._best.wait_until_finished()
        self._latest.wait_until_finished()

    @property
    def best_step(self) -> Optional[int]:
        self.wait()
        return self._best.best_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        """Restore the best checkpoint (or an explicit step from either
        store)."""
        self.wait()
        mgr = self._best
        if step is None:
            step = self._best.best_step()
            if step is None and self._latest.latest_step() is not None:
                mgr = self._latest
                step = self._latest.latest_step()
        elif step not in self._best.all_steps():
            mgr = self._latest
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        if template is not None:
            return mgr.restore(
                step, args=ocp.args.StandardRestore(_shape_template(template))
            )
        return mgr.restore(step)

    def restore_latest(self, template: Any = None) -> Any:
        """Restore the most recent epoch (crash/resume path)."""
        self.wait()
        step = self._latest.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        if template is not None:
            return self._latest.restore(
                step, args=ocp.args.StandardRestore(_shape_template(template))
            )
        return self._latest.restore(step)

    def latest_step(self) -> Optional[int]:
        self.wait()
        return self._latest.latest_step()

    def close(self) -> None:
        self._best.close()
        self._latest.close()
