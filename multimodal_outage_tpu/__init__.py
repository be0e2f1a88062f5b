"""multimodal_outage_tpu — TPU-native multimodal power-outage prediction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `aaparcedo/multimodal_outage` (PyTorch/Lightning, single GPU):
satellite nighttime-lights (NTL) forecasting over the 67 Florida counties
with a U-Net image autoencoder fused with a spatiotemporal graph neural
network (Graph WaveNet / DCRNN) and Date2Vec time embeddings.

Design stance (TPU-first, not a port):
  * Pure functions over arrays shaped [B, N, T, H, W, C] — the reference's
    six nested Python loops (reference models/unet.py:110,141,165,188,221;
    models/graph_wavenet.py:206) become vmapped/batched dims inside one
    jitted XLA program.
  * SPMD via jax.sharding.Mesh + NamedSharding: batch-dim data parallelism,
    optional tensor parallelism over bottleneck hidden dims.
  * Pallas TPU kernels for the hot fused ops (gated TCN + diffusion GCN).
  * No import-time side effects (the reference loads an adjacency CSV and a
    Date2Vec checkpoint at import: reference models/graph_wavenet.py:50-51,
    utils.py:108-109).
"""

__version__ = "0.1.0"

from multimodal_outage_tpu.core import config as config  # noqa: F401
from multimodal_outage_tpu.core.registry import HURRICANES  # noqa: F401
