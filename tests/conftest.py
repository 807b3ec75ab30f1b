"""Test harness: force JAX onto the CPU backend with 8 virtual devices so
mesh/data-parallel paths are testable without a TPU pod (SURVEY.md §4).

Note: this environment preloads jax via sitecustomize (JAX_PLATFORMS=axon),
so the platform must be overridden through jax.config before any backend
initialization rather than via environment variables alone."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Raise the (configurable) collective-call rendezvous timeouts.  NOTE:
# the in-process communicator's own 20 s/40 s rendezvous is HARDCODED and
# abort()s the whole interpreter when a virtual partition stalls past it
# on this bursty single-core host — which is why every collective-
# executing test runs in a retryable subprocess (run_mesh_case below /
# tests/_mesh_cases.py) instead of in pytest's process.
from sba_gan_tpu.utils.platform import patch_cpu_collective_timeouts

patch_cpu_collective_timeouts()

import numpy as np
import pytest


def run_mesh_case(case: str, retries: int = 2, timeout: int = 1500) -> str:
    """Run tests/_mesh_cases.py::<case> in a fresh interpreter; return its
    stdout (marker lines like ``GAN_SHARDED_EQUIV_OK``).

    The in-process-communicator rendezvous abort (hardcoded 40 s — see
    _mesh_cases.py docstring) is NOT fixable in-process: it would kill
    pytest itself.  A fresh subprocess per case turns it into a retryable
    failure; genuine assertion failures are not retried.
    """
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "_mesh_cases.py")
    last = None
    for _ in range(retries + 1):
        r = subprocess.run(
            [sys.executable, script, case],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
        if r.returncode == 0:
            return r.stdout
        last = r
        if "Termination timeout" not in r.stderr and r.returncode != -6:
            break  # real failure — don't retry
    raise AssertionError(
        "mesh case %s failed (rc=%s)\nstdout:\n%s\nstderr:\n%s"
        % (case, last.returncode, last.stdout[-3000:], last.stderr[-3000:])
    )


@pytest.fixture(scope="session")
def mesh_case():
    """Session handle to the subprocess-isolated mesh-collective runner."""
    return run_mesh_case


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
