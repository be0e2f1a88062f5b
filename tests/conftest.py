"""Test environment: CPU platform with 8 virtual devices (SURVEY §4.4).

Must run before any jax import, hence module-level env mutation here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu" via jax.config (overriding the env var), so we
# must re-force CPU through jax.config before any backend initialization.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache shared across test processes and
# re-runs: most of the suite's wall time is CPU-XLA compiles of the same
# model shapes, and the cache survives them (measured: test_sharding.py
# 385 s cold → 57 s warm on this host; xdist workers share the
# directory).
# Opt out with MULTIMODAL_TEST_NO_CACHE=1 (e.g. when bisecting a
# suspected stale-cache issue — keys include the compiler version, so
# this should never be needed routinely).
import tempfile

if not os.environ.get("MULTIMODAL_TEST_NO_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(tempfile.gettempdir(), "jax_pytest_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import dataclasses

import pytest


@pytest.fixture(scope="session")
def tiny_store_dir(tmp_path_factory):
    """Small synthetic packed store (4 counties, 16×16) shared across tests."""
    from multimodal_outage_tpu.data.synthetic import generate_store

    out = str(tmp_path_factory.mktemp("store"))
    generate_store(out, n_counties=4, image_size=16, margin=12, seed=0)
    return out


@pytest.fixture(scope="session")
def tiny_store(tiny_store_dir):
    from multimodal_outage_tpu.data.store import load_store

    return load_store(tiny_store_dir)


@pytest.fixture()
def tiny_cfg(tiny_store_dir):
    from multimodal_outage_tpu.core.config import small_test_config

    cfg = small_test_config(
        n_counties=4, image_size=16, horizon=3, batch_size=2
    )
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, data_dir=tiny_store_dir, dataset_range=12
        )
    )
