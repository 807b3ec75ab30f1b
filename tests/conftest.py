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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
