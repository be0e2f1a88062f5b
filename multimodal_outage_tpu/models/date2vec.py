"""Date2Vec periodic time embedding (Time2Vec family).

Re-implements the reference date2vec.py as a pure flax module:
  encode(x) = concat([fc1(x), sin(fc2(x))], -1)      (date2vec.py:49-53)
with fc1, fc2: Linear(6 → k/2). The shipped (absent) checkpoint had k=64 —
its 64-dim output is consumed at reference utils.py:128 / models/unet.py:36.

The reference loads a pickled pretrained torch module at import time
(reference utils.py:108-109, .gitignore'd *.pth); here the embedding is an
ordinary param bundle, deterministically initialized, optionally trainable
end-to-end (fused into the model forward per BASELINE.json), and the full
autoencoder head (fc3..fc5, date2vec.py:40-47) is available for
pre-training a replacement checkpoint.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


# Typical magnitudes of the raw [0,0,0,y,m,d] input features; the encoder
# kernels are initialized inversely so random-init embeddings are O(1)
# (a plain lecun init on a year≈2022 input yields |embeddings| ≈ 10³,
# drowning the O(1) image features it gets concatenated with).
_FEATURE_SCALE = (1.0, 1.0, 1.0, 2000.0, 6.5, 15.5)


def _feature_scaled_init():
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        k = base(key, shape, dtype)
        return k / jnp.asarray(_FEATURE_SCALE, dtype)[:, None]

    return init


class Date2Vec(nn.Module):
    k: int = 64
    act: str = "sin"
    dtype: Any = jnp.float32

    def setup(self):
        k1 = self.k // 2
        k2 = self.k // 2 + (self.k % 2)
        self.fc1 = nn.Dense(
            k1, dtype=self.dtype, kernel_init=_feature_scaled_init(), name="fc1"
        )
        self.fc2 = nn.Dense(
            k2, dtype=self.dtype, kernel_init=_feature_scaled_init(), name="fc2"
        )
        # Autoencoder head used only for pre-training (date2vec.py:33-38).
        self.fc3 = nn.Dense(self.k // 2, dtype=self.dtype, name="fc3")
        self.fc4 = nn.Dense(6, dtype=self.dtype, name="fc4")
        self.fc5 = nn.Dense(6, dtype=self.dtype, name="fc5")
        self.d2 = nn.Dropout(0.3)
        self.d3 = nn.Dropout(0.3)

    def _activation(self, x):
        return jnp.sin(x) if self.act == "sin" else jnp.cos(x)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """[..., 6] date features → [..., k] embedding (date2vec.py:49-53)."""
        out1 = self.fc1(x)
        out2 = self._activation(self.fc2(x))
        return jnp.concatenate([out1, out2], axis=-1)

    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Full autoencoder forward (date2vec.py:40-47) for pre-training."""
        out = self.encode_with_dropout(x, train)
        out = self.fc4(out)
        return self.fc5(out)

    def encode_with_dropout(self, x, train: bool):
        out1 = self.fc1(x)
        out2 = self._activation(self.fc2(x))
        out2 = self.d2(out2, deterministic=not train)
        out = jnp.concatenate([out1, out2], axis=-1)
        out = self.d3(self.fc3(out), deterministic=not train)
        return out
