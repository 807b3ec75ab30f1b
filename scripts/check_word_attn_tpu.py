"""On-chip parity check for the fused word-attention kernel.

Interpreter-mode parity (tests/test_word_attention_kernel.py) validates the
math; this validates the MOSAIC COMPILE on real TPU: context/attn values
and input grads under impl='pallas' vs the XLA path at the generator's
actual shapes (QL = 64*64 queries at the 64px attention stage, T = 18
words, D = 32 channels — models/attention.py WordAttention).  Run alone
(one jax process per box).  Prints PASS/FAIL lines; rc != 0 on FAIL.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.ops.word_attention import word_attention


def main():
    ok = True
    for (b, ql, t, d), dtype in (
        ((8, 64 * 64, 18, 32), jnp.float32),
        ((8, 64 * 64, 18, 32), jnp.bfloat16),
        ((4, 128 * 128, 18, 32), jnp.bfloat16),
    ):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, ql, d)), dtype)
        s = jnp.asarray(rng.standard_normal((b, t, d)), dtype)
        lens = rng.integers(4, t + 1, (b,))
        mask = jnp.asarray(np.arange(t)[None, :] >= lens[:, None])

        def loss(impl):
            def f(q_, s_):
                ctx, attn = word_attention(q_, s_, mask, impl=impl)
                # exercise both outputs in the cotangent
                return jnp.sum(ctx * ctx) + jnp.sum(attn[:, ::7, :])
            return f

        vx, (gq_x, gs_x) = jax.jit(jax.value_and_grad(
            loss("xla"), argnums=(0, 1)))(q, s)
        vp, (gq_p, gs_p) = jax.jit(jax.value_and_grad(
            loss("pallas"), argnums=(0, 1)))(q, s)
        vx, vp = float(vx), float(vp)
        rel = abs(vp - vx) / max(abs(vx), 1e-9)

        def cos(a, b_):
            a = a.astype(jnp.float32)
            b_ = b_.astype(jnp.float32)
            return float(jnp.sum(a * b_) / jnp.maximum(
                jnp.linalg.norm(a) * jnp.linalg.norm(b_), 1e-9))

        gq_cos, gs_cos = cos(gq_x, gq_p), cos(gs_x, gs_p)
        name = "f32" if dtype == jnp.float32 else "bf16"
        tol_rel, tol_cos = (1e-4, 0.9999) if name == "f32" else (5e-3, 0.999)
        good = rel < tol_rel and gq_cos > tol_cos and gs_cos > tol_cos
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} b={b} ql={ql} mm={name} "
              f"loss_rel={rel:.2e} d_q_cos={gq_cos:.6f} "
              f"d_s_cos={gs_cos:.6f} (xla={vx:.4f} pallas={vp:.4f})",
              flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
