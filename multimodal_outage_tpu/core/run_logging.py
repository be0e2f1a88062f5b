"""Structured run logging: JSONL metrics + config/seed stamping.

The reference's observability is Lightning self.log + print()
(reference lit.py:39-42, SURVEY §5 "Metrics / logging"); here every run
directory gets a config.json stamp and an append-only metrics.jsonl.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict


class RunLogger:
    def __init__(self, run_dir: str, config: Dict[str, Any] | None = None):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._f = open(os.path.join(self.run_dir, "metrics.jsonl"), "a")
        if config is not None:
            with open(os.path.join(self.run_dir, "config.json"), "w") as cf:
                json.dump(config, cf, indent=2, default=str)

    def log(self, record: Dict[str, Any]) -> None:
        record = {"time": time.time(), **record}
        self._f.write(json.dumps(record, default=float) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


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
