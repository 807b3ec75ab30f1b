"""Pre-validate that the full flagship GAN train step LOWERS for TPU at a
given ablation config — without a device and without executing.

``jax.export.export(..., platforms=['tpu'])`` runs the complete
StableHLO(+Mosaic for Pallas calls) lowering on the CPU host.  Round-3
lesson (NOTES.md): this catches most lowering rejections before they burn
a 15-30 min on-chip queue slot, but it is necessary, NOT sufficient — the
tunnel-side libtpu AOT compiler enforces additional rules (i1 minor-dim
broadcasts, lane-dim dynamic offsets), and runtime HBM OOMs only show up
on the chip.

Usage (mirrors perf_ablation.py's `one` flags):
    python scripts/check_step_tpu_lowering.py NAME BATCH [flags...]
e.g.
    python scripts/check_step_tpu_lowering.py upf3 128 remat simpallas \
        upfused upimpl=phase3x3
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax

jax.config.update("jax_platforms", "cpu")

from perf_ablation import make_args  # noqa: E402

from sba_gan_tpu.config import cfg_from_dict  # noqa: E402
from sba_gan_tpu.train import (  # noqa: E402
    build_models, init_gan_state, make_gan_train_step,
)


def main():
    name, b = sys.argv[1], int(sys.argv[2])
    flags = set(sys.argv[3:])
    kw = {}
    for f in flags:
        if f.startswith("chunks="):
            kw["DAMSM_CHUNKS"] = int(f.split("=")[1])
        if f.startswith("tile="):
            kw["DAMSM_SIM_TILE"] = int(f.split("=")[1])
        if f.startswith("upimpl="):
            kw["UPBLOCK_FUSED_IMPL"] = f.split("=")[1]
        if f.startswith("rgbpad="):
            kw["RGB_HEAD_PAD"] = int(f.split("=")[1])
    cfg = cfg_from_dict(
        {
            "TREE": {"BRANCH_NUM": 3},
            "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
            "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
            "TRAIN": {"BATCH_SIZE": b,
                      "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                 "GAMMA3": 10.0, "LAMBDA": 5.0}},
            "JAX": {
                "DTYPE": "bfloat16",
                "USE_PALLAS": "pallas" in flags,
                "REMAT_IMAGE_ENCODER": "remat" in flags,
                "REMAT_IMAGE_ENCODER_MODE": ("blocks" if "encblocks" in flags
                                             else "stem" if "encstem" in flags
                                             else "full"),
                "REMAT_GENERATOR": ("rematg" in flags
                                    or "rematgfull" in flags),
                "REMAT_GENERATOR_MODE": ("full" if "rematgfull" in flags
                                         else "stages"),
                "LOSS_DTYPE": ("float32" if "lossf32" in flags
                               else "bfloat16"),
                "DAMSM_SIM_IMPL": ("pallas" if "simpallas" in flags
                                   else "xla"),
                "DAMSM_FOLD_SOFTMAX": "fold" in flags,
                "UPBLOCK_FUSED": "upfused" in flags,
                "BN_COMPACT": ("large" if "bnclarge" in flags
                               else "bncompact" in flags),
                "CONV_WGRAD_DOT": "wgraddot" in flags,
                **kw,
            },
        }
    )
    models = build_models(cfg, 5450)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))
    t0 = time.time()
    exp = jax.export.export(step, platforms=["tpu"])(
        state, *make_args(cfg, b))
    print(f"LOWER_OK {name}: batch={b} flags={sorted(flags)} "
          f"{len(exp.mlir_module_serialized)} bytes "
          f"in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
