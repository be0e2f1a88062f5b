"""Device-feeding input pipeline.

Host gather (memmap fancy-indexing, dataset.py) → background-thread
prefetch → async device_put → jitted on-device preprocess that fuses the
reference's per-image host transforms (Resize + Normalize,
reference utils.py:35-38) and the [B,T,N,…]→[B,N,T,…] permute
(reference lit.py:31) into the XLA program.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial


@partial(jax.jit, static_argnames=("image_size",))
def preprocess_batch(
    batch: Dict[str, jnp.ndarray],
    mean: jnp.ndarray,
    std: jnp.ndarray,
    image_size: int,
) -> Dict[str, jnp.ndarray]:
    """[B,T,N,H,W] raw → model inputs.

    Returns:
      x: [B, N, T, H, W, 1] normalized past frames
      y: [B, N, T, H, W, 1] normalized future frames
      date_feats: [B, T, 6]
    """

    def to_model_layout(v):
        v = jnp.transpose(v, (0, 2, 1, 3, 4))  # [B, N, T, H, W]
        if v.shape[-1] != image_size:
            b, n, t = v.shape[:3]
            v = jax.image.resize(
                v, (b, n, t, image_size, image_size), method="bilinear"
            )
        return v[..., None]

    x = (to_model_layout(batch["past"]) - mean) / std
    y = (to_model_layout(batch["future"]) - mean) / std
    return {"x": x, "y": y, "date_feats": batch["date_feats"]}


def denormalize(x: jnp.ndarray, mean: float, std: float) -> jnp.ndarray:
    """Inverse of normalization (reference utils.py:40-44, sans .cuda())."""
    return x * std + mean


class PrefetchIterator:
    """Background-thread batch producer with device transfer overlap.

    Double-buffered by default (depth=2): while the device crunches step k,
    the host gathers and transfers step k+1 — the TPU-native replacement for
    the reference's DataLoader(num_workers=2) (reference lit.py:164).
    """

    def __init__(
        self,
        host_batches: Iterable[Dict[str, np.ndarray]],
        mean: float,
        std: float,
        image_size: int,
        device: Optional[jax.Device] = None,
        depth: int = 2,
    ):
        self._it = iter(host_batches)
        self._mean = jnp.float32(mean)
        self._std = jnp.float32(std)
        self._image_size = image_size
        self._device = device
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for host_batch in self._it:
                dev = {
                    k: jax.device_put(v, self._device)
                    for k, v in host_batch.items()
                }
                batch = preprocess_batch(
                    dev, self._mean, self._std, self._image_size
                )
                self._q.put(batch)
        except Exception as e:  # surface producer errors to the consumer
            self._q.put(e)
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
