"""Driver-invocation-path tests for __graft_entry__.dryrun_multichip.

Unlike tests/test_sharding.py::test_graft_entry_dryrun (which inherits the
conftest's pre-forced 8-device CPU env), these spawn FRESH python
processes with the test env scrubbed, exercising exactly what the driver
does: import __graft_entry__ cold and call dryrun_multichip(8) on a
machine with fewer real chips.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _scrubbed_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_scrubbed_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_dryrun_fresh_process():
    """The driver's exact path: cold process, no env prepared."""
    proc = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stdout
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout


@pytest.mark.slow
def test_dryrun_after_backend_already_initialized():
    """Caller touched jax (1-device backend) before calling us: the
    subprocess fallback must still deliver the 8-device dryrun.

    The pre-initialized backend is forced to CPU through jax.config (the
    sitecustomize pins jax_platforms, so the env var alone is too late) —
    initializing the real TPU backend here would make the test hang
    whenever the TPU tunnel is unavailable, and which backend got
    initialized is irrelevant to the fallback being exercised."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() >= 1\n"
        "import __graft_entry__ as g; g.dryrun_multichip(8)\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stdout
    assert "OK" in proc.stdout
