"""Static evidence for JAX.UPBLOCK_FUSED: XLA cost analysis of the full
flagship train step with the naive upsample-then-conv UpBlocks vs the
folded low-resolution form (models/blocks.py _FoldedUpConv3x3).

cost_analysis() sums unoptimized-HLO op costs, so the delta measures what
the fold removes from the GRAPH (2.25x fewer conv FLOPs per UpBlock, no
4x-size pre-conv tensors or their VJP saves); the on-chip wall-clock A/B
(scripts/r3_followup_queue.sh) remains the ground truth.

Usage: python scripts/upfused_cost_analysis.py [batch]  (CPU-safe)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.train import build_models, init_gan_state, make_gan_train_step


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    for fused in (False, True):
        cfg = cfg_from_dict(
            {
                "TREE": {"BRANCH_NUM": 3},
                "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
                "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
                "TRAIN": {"BATCH_SIZE": b,
                          "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                     "GAMMA3": 10.0, "LAMBDA": 5.0}},
                "JAX": {"DTYPE": "bfloat16", "REMAT_IMAGE_ENCODER": True,
                        "DAMSM_CHUNKS": 4, "LOSS_DTYPE": "bfloat16",
                        "UPBLOCK_FUSED": fused},
            }
        )
        models = build_models(cfg, 5450)
        state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
        step = make_gan_train_step(cfg, models)
        rng = np.random.default_rng(0)
        t = cfg.TEXT.WORDS_NUM
        imgs = tuple(
            jnp.asarray(rng.uniform(-1, 1, (b, 64 * 2 ** i, 64 * 2 ** i, 3))
                        .astype(np.float32))
            for i in range(3)
        )
        captions = np.zeros((b, t), np.int32)
        cap_lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
        for i, l in enumerate(cap_lens):
            captions[i, :l] = rng.integers(1, 5450, (l,))
        class_ids = rng.integers(0, 200, (b,)).astype(np.int32)
        lowered = jax.jit(step).lower(
            state, imgs, jnp.asarray(captions), jnp.asarray(cap_lens),
            jnp.asarray(class_ids), jax.random.PRNGKey(1))
        ca = lowered.cost_analysis()
        print(f"upfused={fused}: flops={ca.get('flops', 0):.4e} "
              f"bytes={ca.get('bytes accessed', 0):.4e}", flush=True)


if __name__ == "__main__":
    main()
