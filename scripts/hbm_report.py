"""HBM accounting for a single GAN-step config (VERDICT r3 next-#2).

Round 3's b192 full-lever-stack point compiles but dies with a terse
RESOURCE_EXHAUSTED on first execution (logs/r3_ablations.log 11:06 Aug 20).
This script makes the failure legible:

  1. analytic live-set: bytes held by GAN state (params + EMA + 4 Adam
     opt states) and the input batch — buffers that must coexist with the
     program's temps;
  2. XLA memory_analysis() of the compiled step: temp / argument / output /
     alias sizes as the compiler sees them;
  3. the FULL compile-or-runtime error text (the tunnel's remote_compile
     wraps compile-time HBM OOMs in an HTTP 500 whose stderr carries the
     "Largest program allocations in hbm" ranking — CLAUDE.md).

Usage (one config per process — HBM spill hazard):
    python scripts/hbm_report.py NAME BATCH [same flag words as
        perf_ablation.py one: remat encblocks simpallas rematg bncompact
        upfused upimpl=convt chunks=N ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from perf_ablation import make_args  # noqa: E402  (scripts/ sibling)
from sba_gan_tpu.config import cfg_from_dict  # noqa: E402
from sba_gan_tpu.train import (  # noqa: E402
    build_models,
    init_gan_state,
    make_gan_train_step,
)


def tree_bytes(tree) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )


def gb(n: int) -> str:
    return f"{n / 2**30:.3f} GiB"


def main() -> None:
    name, b = sys.argv[1], int(sys.argv[2])
    flags = set(sys.argv[3:])
    # Flag-word map kept in lockstep with perf_ablation.py's `one` CLI and
    # check_step_tpu_lowering.py (advisor r4: an hbm report that silently
    # ignores a flag word measures the WRONG config without warning).
    known_words = {"remat", "encblocks", "encstem", "rematg", "simpallas",
                   "bncompact", "bnclarge", "upfused", "pallas", "lossf32",
                   "fold", "wgraddot"}
    kw_jax = {
        "DTYPE": "bfloat16",
        "REMAT_IMAGE_ENCODER": "remat" in flags,
        "REMAT_IMAGE_ENCODER_MODE": ("blocks" if "encblocks" in flags
                                     else "stem" if "encstem" in flags
                                     else "full"),
        "DAMSM_CHUNKS": 1,
        "REMAT_GENERATOR": "rematg" in flags,
        "REMAT_GENERATOR_MODE": "stages",
        "LOSS_DTYPE": "float32" if "lossf32" in flags else "bfloat16",
        "DAMSM_SIM_IMPL": "pallas" if "simpallas" in flags else "xla",
        "USE_PALLAS": "pallas" in flags,
        "DAMSM_FOLD_SOFTMAX": "fold" in flags,
        "UPBLOCK_FUSED": "upfused" in flags,
        "BN_COMPACT": ("large" if "bnclarge" in flags
                       else "bncompact" in flags),
        "CONV_WGRAD_DOT": "wgraddot" in flags,
    }
    for f in flags:
        if f.startswith("chunks="):
            kw_jax["DAMSM_CHUNKS"] = int(f.split("=")[1])
        elif f.startswith("upimpl="):
            kw_jax["UPBLOCK_FUSED_IMPL"] = f.split("=")[1]
        elif f.startswith("rgbpad="):
            kw_jax["RGB_HEAD_PAD"] = int(f.split("=")[1])
        elif f.startswith("tile="):
            kw_jax["DAMSM_SIM_TILE"] = int(f.split("=")[1])
        elif f.startswith("grid="):
            kw_jax["DAMSM_GRID_CHUNKS"] = int(f.split("=")[1])
        elif f not in known_words:
            raise SystemExit(f"hbm_report: unknown flag word {f!r}")
    cfg = cfg_from_dict(
        {
            "TREE": {"BRANCH_NUM": 3},
            "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
            "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
            "TRAIN": {"BATCH_SIZE": b,
                      "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                 "GAMMA3": 10.0, "LAMBDA": 5.0}},
            "JAX": kw_jax,
        }
    )
    models = build_models(cfg, 5450)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    args = make_args(cfg, b)
    print(f"[{name}] state live-set {gb(tree_bytes(state))}  "
          f"inputs {gb(tree_bytes(args))}", flush=True)

    step = jax.jit(make_gan_train_step(cfg, models))
    try:
        lowered = step.lower(state, *args)
    except Exception as e:  # noqa: BLE001 — report everything verbatim
        print(f"[{name}] LOWERING FAILED:\n{e}", flush=True)
        return
    try:
        compiled = lowered.compile()
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] COMPILE FAILED (full text follows):\n{e}", flush=True)
        return
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                         "output_size_in_bytes", "alias_size_in_bytes",
                         "generated_code_size_in_bytes"):
                v = getattr(ma, attr, None)
                if v is not None:
                    print(f"[{name}] {attr} = {gb(v)}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] memory_analysis unavailable: {e!r}", flush=True)
    try:
        out_state, logs = compiled(state, *args)
        print(f"[{name}] first step OK errG={float(logs['errG']):.4f}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] RUNTIME FAILED (full text follows):\n{e}", flush=True)


if __name__ == "__main__":
    main()
