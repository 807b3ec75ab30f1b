"""On-chip parity check for the fused DAMSM similarity kernel.

Interpreter-mode parity (tests/test_damsm_sim_kernel.py) validates the
math; this validates the MOSAIC COMPILE on real TPU: words_loss values and
grads under impl='pallas' vs the dense-grid XLA path at flagship-like
dims.  Run alone (one jax process per box) before trusting kernel perf
numbers.  Prints PASS/FAIL lines; rc != 0 on FAIL.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.losses.damsm import words_loss


def main():
    b, t, r, d = 32, 18, 289, 256
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    img = jnp.asarray(rng.standard_normal((b, r, d)).astype(np.float32))
    lens = jnp.asarray(rng.integers(4, t + 1, (b,)).astype(np.int32))
    cls = jnp.asarray(rng.integers(0, 200, (b,)).astype(np.int32))
    labels = jnp.arange(b)

    def loss(impl, mm, tile):
        def f(img_, words_):
            l0, l1 = words_loss(img_, words_, labels, lens, cls,
                                einsum_dtype=mm, impl=impl, tile_i=tile)
            return l0 + 2.0 * l1
        return f

    ok = True
    for mm, tile in ((jnp.float32, 16), (jnp.bfloat16, 16),
                     (jnp.bfloat16, 32)):
        name = ("f32" if mm == jnp.float32 else "bf16") + f"/tile{tile}"
        vx, (gi_x, gw_x) = jax.jit(jax.value_and_grad(
            loss("xla", mm, tile), argnums=(0, 1)))(img, words)
        vp, (gi_p, gw_p) = jax.jit(jax.value_and_grad(
            loss("pallas", mm, tile), argnums=(0, 1)))(img, words)
        vx, vp = float(vx), float(vp)
        rel = abs(vp - vx) / max(abs(vx), 1e-9)
        gi_cos = float(jnp.sum(gi_x * gi_p) / jnp.maximum(
            jnp.linalg.norm(gi_x) * jnp.linalg.norm(gi_p), 1e-9))
        gw_cos = float(jnp.sum(gw_x * gw_p) / jnp.maximum(
            jnp.linalg.norm(gw_x) * jnp.linalg.norm(gw_p), 1e-9))
        # bf16 matmul inputs: reduction-order wiggle only; both impls use
        # the same mm dtype so agreement should stay tight.
        tol_rel, tol_cos = ((1e-4, 0.9999) if mm == jnp.float32
                            else (5e-3, 0.999))
        good = rel < tol_rel and gi_cos > tol_cos and gw_cos > tol_cos
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} mm={name} loss_rel={rel:.2e} "
              f"d_img_cos={gi_cos:.6f} d_words_cos={gw_cos:.6f} "
              f"(xla={vx:.6f} pallas={vp:.6f})", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
