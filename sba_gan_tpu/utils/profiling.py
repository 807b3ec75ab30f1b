"""Tracing / profiling hooks.

The reference's observability is wall-clock prints — epoch timing
(AttnGAN2/code/trainer.py:234,316-322), ms/batch in DAMSM pretraining
(pretrain_DAMSM.py:109-116) — with no profiler (a Flask ProfilerMiddleware
exists but is commented out, eval/main.py:10,87-88).  TPU-native upgrade:

* :class:`StepTimer` — the same "ms/batch + loss string" UX, plus rolling
  images/sec.
* :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile (XLA ops, HBM, MXU utilization) to a directory.
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so host-side
  phases (data loading, checkpointing) show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Rolling step timing: ms/batch and images/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self._start: Optional[float] = None
        self._count = 0.0
        self._images = 0.0
        self._elapsed = 0.0

    def tick(self, batch_size: int = 0, n_batches: int = 1) -> None:
        """Record one dispatch covering ``n_batches`` train steps and
        ``batch_size`` total images (a fused K-step dispatch under
        JAX.TRAIN_UNROLL passes n_batches=K so ms/batch stays per-step)."""
        now = time.perf_counter()
        if self._start is not None:
            self._elapsed += now - self._start
            self._count += n_batches
            self._images += batch_size
            if self._count > self.window:
                # decay toward the window (rolling average)
                scale = self.window / self._count
                self._elapsed *= scale
                self._images *= scale
                self._count = self.window
        self._start = now

    @property
    def ms_per_batch(self) -> float:
        if self._count == 0:
            return float("nan")
        return 1000.0 * self._elapsed / self._count

    def images_per_sec(self, batch_size: Optional[int] = None) -> float:
        """Throughput; with no argument, uses the image counts passed to
        tick() (correct under multi-step dispatch)."""
        if self._elapsed == 0:
            return float("nan")
        if batch_size is None:
            return self._images / self._elapsed
        return batch_size * self._count / self._elapsed

    def loss_line(self, step: int, logs: Dict[str, float],
                  batch_size: int = 0) -> str:
        """Reference-style loss string (trainer.py:277)."""
        parts = [f"step {step}"]
        parts += [f"{k}: {float(v):.3f}" for k, v in sorted(logs.items())]
        parts.append(f"{self.ms_per_batch:.0f} ms/batch")
        if batch_size:
            parts.append(f"{self.images_per_sec(batch_size):.1f} img/s")
        return " | ".join(parts)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed steps."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-phase annotation visible on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
