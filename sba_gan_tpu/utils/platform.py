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


def patch_cpu_collective_timeouts(
    warn_seconds: int = 300, terminate_seconds: int = 1800
) -> None:
    """Raise XLA-CPU's *collective-call* rendezvous timeouts per compile.

    XLA-CPU rendezvouses partition threads around collectives and calls a
    hard ``abort()`` when a participant arrives too late ("Termination
    timeout ... Exiting to ensure a consistent program state").  On a
    single-core, throttled host running an 8-device virtual mesh the
    partitions execute serially, so one thread can stall past the limit
    (observed killing the test suite and the multichip dryrun).

    Two distinct rendezvous exist:
    * the CollectiveThunk collective-call rendezvous — timeouts come from
      the ``xla_cpu_collective_call_{warn_stuck,terminate_timeout}_seconds``
      DebugOptions.  They are not registered XLA_FLAGS in this jaxlib, so
      this helper injects them into every compile via
      ``env_options_overrides`` (wrapping
      ``jax._src.compiler.get_compile_options``).
    * the in-process communicator's rendezvous (InProcessCommunicator →
      AwaitAndLogIfStuck) — 20 s warn / 40 s terminate are HARDCODED and
      ignore these options.  That abort cannot be configured away, which
      is why collective-executing tests and the multichip dryrun run in
      retryable subprocesses (tests/_mesh_cases.py, __graft_entry__).

    Call this only in processes pinned to the CPU backend (tests,
    dryruns, ``--platform cpu`` CLI runs).
    """
    import jax._src.compiler as _compiler

    if getattr(_compiler, "_sba_collective_timeout_patch", None):
        return
    orig = _compiler.get_compile_options

    def wrapped(*args, **kwargs):
        overrides = dict(kwargs.get("env_options_overrides") or {})
        overrides.setdefault(
            "xla_cpu_collective_call_warn_stuck_seconds", str(warn_seconds)
        )
        overrides.setdefault(
            "xla_cpu_collective_call_terminate_timeout_seconds",
            str(terminate_seconds),
        )
        kwargs["env_options_overrides"] = overrides
        return orig(*args, **kwargs)

    _compiler.get_compile_options = wrapped
    _compiler._sba_collective_timeout_patch = orig


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
    if name == "cpu" or virtual_cpu_devices:
        patch_cpu_collective_timeouts()
