"""Static evidence for DAMSM_FOLD_SOFTMAX while on-chip A/B is blocked
(VERDICT r2 next #2 contingency): XLA cost analysis of the words+sent loss
value_and_grad program, two-pass vs folded Eq.8->Eq.9.

cost_analysis() sums the unoptimized-HLO op costs, so the delta measures
what the fold removes from the GRAPH (one (B,B,T,R) softmax
materialization and its VJP saves) independent of backend fusion; the
on-chip wall-clock A/B (r3 queue item 2b) remains the ground truth.

Usage: python scripts/fold_cost_analysis.py [batch]  (CPU-safe)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Always CPU: cost_analysis() reads the unoptimized HLO, no device needed
# (and jax.default_backend() would hang on a dead tunnel).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.losses.damsm import sent_loss, words_loss


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t, r, d = 18, 289, 256
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    region = jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32))
    code = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    sent = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(4, t + 1, (b,)).astype(np.int32))
    cls = jnp.asarray(rng.integers(0, 200, (b,)).astype(np.int32))
    labels = jnp.arange(b)

    def loss(fold):
        def f(region_, code_):
            w0, w1 = words_loss(region_, words, labels, lens, cls,
                                einsum_dtype=jnp.bfloat16,
                                fold_softmax=fold)
            s0, s1 = sent_loss(code_, sent, labels, cls)
            return w0 + w1 + s0 + s1
        return f

    for fold in (False, True):
        lowered = jax.jit(
            jax.value_and_grad(loss(fold), argnums=(0, 1))
        ).lower(region, code)
        ca = lowered.cost_analysis()
        print(f"fold={fold}: flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0):.3e} "
              f"transcendentals={ca.get('transcendentals', 0):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
