"""Capture a jax.profiler trace of the flagship train step (VERDICT r2
next #3: name the top sinks in the non-DAMSM 168 ms).

The tunnel runtime makes trace timing unreliable (CLAUDE.md — the same
reason block_until_ready doesn't fence), so the A/B decomposition in
perf_breakdown.py stays the primary evidence; this captures the XLA op
breakdown (relative shares survive even when absolute times are skewed).
The honest value-fetch fence brackets the traced window.

Usage: python scripts/capture_trace.py [batch] [lambda] [outdir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    lam = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sba_trace"

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from perf_ablation import make_args, run  # noqa: F401 (cfg helper)
    from perf_breakdown import flagship_cfg

    from sba_gan_tpu.train import (
        build_models, init_gan_state, make_gan_train_step,
    )

    cfg = flagship_cfg(lam=lam)
    models = build_models(cfg, 5450)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    args = make_args(cfg, b)

    # warmup + compile outside the trace
    state, logs = step(state, *args)
    float(logs["errG"])

    os.makedirs(outdir, exist_ok=True)
    n = 3
    # perfetto trace = plain JSON (gz) — parseable by
    # scripts/summarize_trace.py without the (stale-proto) tensorboard
    # profile plugin; the xplane.pb is still written alongside.
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, *args)
        v = float(logs["errG"])  # fence inside the traced+timed window
        dt = (time.perf_counter() - t0) / n
    assert np.isfinite(v), v
    print(f"trace: batch={b} lambda={lam} {dt * 1000:.1f} ms/step "
          f"-> {outdir}", flush=True)


if __name__ == "__main__":
    main()
