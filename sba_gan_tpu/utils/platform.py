"""JAX platform selection for the CLIs.

The environment may preload an accelerator plugin (here: the axon TPU
backend via sitecustomize), and JAX_PLATFORMS env vars alone do not
override a preloaded plugin — the switch must go through ``jax.config``
*after* importing jax and *before* the first backend use (the pattern
tests/conftest.py uses).  Every CLI exposes ``--platform`` and the
``JAX.PLATFORM`` config key through this helper so e.g.
``--platform cpu`` runs the documented commands without a TPU.

The reference hard-codes CUDA device selection via ``--gpu``/
``CUDA_VISIBLE_DEVICES`` (AttnGAN2/code/main.py:35-38); here backend
choice is a config concern, not an env-var concern.
"""

from __future__ import annotations

import os


def select_platform(name: str, virtual_cpu_devices: int = 0) -> None:
    """Switch the JAX platform; ``''`` keeps the preloaded default.

    ``virtual_cpu_devices > 0`` additionally requests that many
    host-platform devices (only honored if set before backend init).
    """
    if not name and not virtual_cpu_devices:
        return
    if virtual_cpu_devices:
        import re

        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "",
            os.environ.get("XLA_FLAGS", ""),
        )
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={virtual_cpu_devices}"
        ).strip()
    if name:
        os.environ["JAX_PLATFORMS"] = name
        import jax

        jax.config.update("jax_platforms", name)
