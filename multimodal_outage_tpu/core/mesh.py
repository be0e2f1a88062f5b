"""Device mesh construction for SPMD training.

The reference is single-device (SURVEY §2, "Parallelism & communication").
Here the distributed story is native: a jax.sharding.Mesh with axes
  data  — batch-dim data parallelism (gradient psum over ICI)
  model — tensor parallelism over the bottleneck MLP hidden dims

Multi-chip configs are validated on a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=N (SURVEY §4.4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
TIME_AXIS = "time"


def make_mesh(data: int = -1, model: int = 1, time: int = 1, devices=None) -> Mesh:
    """3-axis mesh: data (batch DP) × model (bottleneck TP) × time (SP).

    The time axis shards the temporal window T — the framework's sequence
    parallelism (SURVEY §5 "long-context"): U-Net and the kernel_size=1
    Graph WaveNet treat T pointwise, so sharding T is communication-free
    except the BN (N, T) reductions, which GSPMD turns into psums over ICI.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % (model * time) != 0:
            raise ValueError(
                f"{n} devices not divisible by model*time={model * time}"
            )
        data = n // (model * time)
    if data * model * time > n:
        raise ValueError(
            f"mesh {data}x{model}x{time} needs {data * model * time} devices, "
            f"have {n}"
        )
    dev_array = np.asarray(devices[: data * model * time]).reshape(
        data, model, time
    )
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, TIME_AXIS))


def mesh_from_config(mesh_cfg) -> Mesh | None:
    """Build the training mesh from config (core.config.MeshConfig).

    Returns None when the resolved mesh is a single device — callers then
    take the plain single-chip path (no sharding machinery, same numerics).
    data == -1 means "all devices not taken by model×time", so the default
    config transparently scales to however many chips are attached."""
    n = jax.device_count()
    model, time = mesh_cfg.model, mesh_cfg.time
    if mesh_cfg.data == -1:
        if n % (model * time) != 0:
            raise ValueError(
                f"{n} devices not divisible by model*time={model * time}"
            )
        data = n // (model * time)
    else:
        data = mesh_cfg.data
    if data * model * time <= 1:
        return None
    return make_mesh(data=data, model=model, time=time)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Multi-host setup (DCN): jax.distributed.initialize + global device
    count. On a v5p pod slice each host contributes its local chips; the
    mesh axes then span the global device list, with DP laid out so its
    collectives ride ICI within a slice (SURVEY §5 "Distributed
    communication backend"). No-op for single-process runs.

    Returns the global device count."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.device_count()


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """This process's row range of a [global_batch, ...] array for
    jax.make_array_from_process_local_data-style feeding."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
