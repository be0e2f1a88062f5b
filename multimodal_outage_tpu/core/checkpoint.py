"""Orbax checkpointing: (params, batch_stats, opt_state, step, best metric).

Equivalent of the reference's Lightning ModelCheckpoint (top-1 by min
val_loss, reference lit.py:187-196) plus what it lacks: optimizer-state
resume and PRNG-key capture (SURVEY §5 "Checkpoint / resume").
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Best-k retention keyed on val_loss (min), async-capable."""

    def __init__(self, directory: str, keep_top_k: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep_top_k,
            best_fn=lambda metrics: metrics["val_loss"],
            best_mode="min",
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, tree: Any, metrics: dict) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(tree),
            metrics={k: float(v) for k, v in metrics.items()},
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def best_step(self) -> Optional[int]:
        self.wait()
        return self._mgr.best_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        self.wait()
        step = step if step is not None else self._mgr.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        if template is not None:
            template = jax.tree.map(
                lambda x: ocp.utils.to_shape_dtype_struct(x)
                if hasattr(x, "shape")
                else x,
                template,
            )
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        self.wait()
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
