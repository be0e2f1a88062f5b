"""Structured run logging: JSONL metrics + config/seed stamping.

The reference's observability is Lightning self.log + print()
(reference lit.py:39-42, SURVEY §5 "Metrics / logging"); here every run
directory gets a config.json stamp and an append-only metrics.jsonl,
plus optional TensorBoard scalars (the Lightning-logger equivalent) when
a SummaryWriter implementation is importable.
"""

from __future__ import annotations

import json
import os
import time
import warnings
from typing import Any, Dict


def _make_summary_writer(log_dir: str):
    """Best-available SummaryWriter, or None (with a warning) if no
    TensorBoard backend is importable. tensorboardX first — it has no
    heavyweight framework dependency — then torch's writer."""
    try:
        from tensorboardX import SummaryWriter  # type: ignore
    except ImportError:
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
        except ImportError:
            warnings.warn(
                "tensorboard=True but neither tensorboardX nor "
                "torch.utils.tensorboard is importable; scalars disabled "
                "(metrics.jsonl is unaffected)",
                stacklevel=3,
            )
            return None
    return SummaryWriter(log_dir)


class RunLogger:
    """JSONL always; TensorBoard scalars opt-in via tensorboard=True.

    Scalars are tagged "<phase>/<key>" and stepped by the record's
    "step" (falling back to "epoch", then a monotonic record counter),
    so train curves step per optimizer step while val/final curves step
    per epoch — matching how the JSONL rows are emitted by fit().
    """

    def __init__(
        self,
        run_dir: str,
        config: Dict[str, Any] | None = None,
        tensorboard: bool = False,
    ):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._f = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        self._tb = (
            _make_summary_writer(os.path.join(self.run_dir, "tb"))
            if tensorboard
            else None
        )
        self._n_records = 0
        if config is not None:
            with open(os.path.join(self.run_dir, "config.json"), "w") as cf:
                json.dump(config, cf, indent=2, default=str)

    def log(self, record: Dict[str, Any]) -> None:
        record = {"time": time.time(), **record}
        self._f.write(json.dumps(record, default=float) + "\n")
        self._f.flush()
        if self._tb is not None:
            phase = record.get("phase", "run")
            step = record.get("step", record.get("epoch", self._n_records))
            for k, v in record.items():
                if k in ("time", "phase", "step", "epoch"):
                    continue
                try:
                    v = float(v)
                except (TypeError, ValueError):
                    continue
                self._tb.add_scalar(f"{phase}/{k}", v, int(step))
        self._n_records += 1

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def device_memory_stats() -> Dict[str, float]:
    """HBM probe — the jax equivalent of the reference's
    print_memory_usage() (reference utils.py:341-343)."""
    import jax

    dev = jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "bytes_in_use": float(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
    }
