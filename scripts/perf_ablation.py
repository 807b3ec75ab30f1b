"""One-off TPU ablation: where does the train-step time go, and does a
larger per-chip batch help?  Informs bench.py's operating point.

MEASUREMENT RULE: one run() per process.  A second program compiled in the
same process inherits the first executable's live HBM buffers and can spill
catastrophically (measured: the same b64 config at 9 ms alone vs 189 ms
as the second config in one process).  Drive each config like:

    python -c "import sys; sys.path.insert(0,'scripts'); \\
               from perf_ablation import run; run('x', 64, 5.0, ...)"
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.config import cfg_from_dict
from sba_gan_tpu.train import build_models, init_gan_state, make_gan_train_step


def timed(step, state, args, n=10):
    """Wall-clock per step with the fence INSIDE the window.

    jax.block_until_ready does NOT block on this runtime (enqueue-rate
    readings up to 26x too fast — see bench.py / CLAUDE.md); the host
    value fetch of the last step's loss forces every prior step through
    the state dependency chain and is the only honest fence."""
    state, logs = step(state, *args)
    float(logs["errG"])  # drain
    t0 = time.perf_counter()
    for _ in range(n):
        state, logs = step(state, *args)
    vals = {k: float(v) for k, v in logs.items()}  # fence, timed
    dt = (time.perf_counter() - t0) / n
    assert all(np.isfinite(v) for v in vals.values()), vals
    return dt


def make_args(cfg, b):
    rng = np.random.default_rng(0)
    t = cfg.TEXT.WORDS_NUM
    imgs = tuple(
        jnp.asarray(rng.uniform(-1, 1, (b, 64 * 2 ** i, 64 * 2 ** i, 3)).astype(np.float32))
        for i in range(cfg.TREE.BRANCH_NUM)
    )
    captions = np.zeros((b, t), np.int32)
    cap_lens = rng.integers(4, t + 1, (b,)).astype(np.int32)
    for i, l in enumerate(cap_lens):
        captions[i, :l] = rng.integers(1, 5450, (l,))
    class_ids = rng.integers(0, 200, (b,)).astype(np.int32)
    return (imgs, jnp.asarray(captions), jnp.asarray(cap_lens),
            jnp.asarray(class_ids), jax.random.PRNGKey(1))


def run(name, b, lam, use_pallas=False, remat=False, chunks=1,
        remat_g=False, loss_dtype="float32", grid_chunks=1,
        sim_impl="xla", sim_tile=16, fold_softmax=False,
        remat_g_mode="stages", upblock_fused=False,
        upblock_fused_impl="phase3x3", bn_compact=False,
        remat_enc_mode="full", rgb_pad=0, wgrad_dot=False):
    cfg = cfg_from_dict(
        {
            "TREE": {"BRANCH_NUM": 3},
            "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
            "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
            "TRAIN": {"BATCH_SIZE": b,
                      "SMOOTH": {"GAMMA1": 4.0, "GAMMA2": 5.0,
                                 "GAMMA3": 10.0, "LAMBDA": lam}},
            "JAX": {"DTYPE": "bfloat16", "USE_PALLAS": use_pallas,
                    "REMAT_IMAGE_ENCODER": remat,
                    "REMAT_IMAGE_ENCODER_MODE": remat_enc_mode,
                    "DAMSM_CHUNKS": chunks,
                    "REMAT_GENERATOR": remat_g,
                    "REMAT_GENERATOR_MODE": remat_g_mode,
                    "LOSS_DTYPE": loss_dtype,
                    "DAMSM_GRID_CHUNKS": grid_chunks,
                    "DAMSM_SIM_IMPL": sim_impl,
                    "DAMSM_SIM_TILE": sim_tile,
                    "DAMSM_FOLD_SOFTMAX": fold_softmax,
                    "UPBLOCK_FUSED": upblock_fused,
                    "UPBLOCK_FUSED_IMPL": upblock_fused_impl,
                    "BN_COMPACT": bn_compact,
                    "RGB_HEAD_PAD": rgb_pad,
                    "CONV_WGRAD_DOT": wgrad_dot},
        }
    )
    models = build_models(cfg, 5450)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    step = jax.jit(make_gan_train_step(cfg, models))  # no donation (axon)
    dt = timed(step, state, make_args(cfg, b))
    print(f"{name}: batch={b} {dt*1000:.1f} ms/step {b/dt:.0f} img/s", flush=True)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "batch"
    if which == "batch":
        run("full_b32", 32, 5.0)
        run("full_b64", 64, 5.0)
        run("full_b128", 128, 5.0)
    elif which == "pallas":
        run("xla_b128", 128, 5.0, use_pallas=False)
        run("pallas_b128", 128, 5.0, use_pallas=True)
        run("xla_b32", 32, 5.0, use_pallas=False)
        run("pallas_b32", 32, 5.0, use_pallas=True)
    elif which == "b256":
        run("full_b256", 256, 5.0)
    elif which == "chunks":
        run("b64_remat_chunks4", 64, 5.0, remat=True, chunks=4)
        run("b128_remat_chunks8", 128, 5.0, remat=True, chunks=8)
    elif which == "rematg":
        run("b64_rematg", 64, 5.0, remat=True, chunks=4, remat_g=True)
        run("b128_rematg_chunks8", 128, 5.0, remat=True, chunks=8,
            remat_g=True)
        run("b128_rematg_chunks4", 128, 5.0, remat=True, chunks=4,
            remat_g=True)
    elif which == "lossdtype":
        run("b64_loss_bf16", 64, 5.0, remat=True, chunks=4,
            loss_dtype="bfloat16")
        run("b64_loss_f32", 64, 5.0, remat=True, chunks=4)
    elif which == "rematg256":
        run("b256_rematg_chunks8", 256, 5.0, remat=True, chunks=8,
            remat_g=True)
    elif which == "one":
        # generic single-config CLI:
        #   perf_ablation.py one NAME BATCH [remat] [rematg] [pallas]
        #                    [chunks=N] [grid=N] [lossf32] [upfused]
        name, b = sys.argv[2], int(sys.argv[3])
        flags = set(sys.argv[4:])
        kw = dict(remat="remat" in flags,
                  remat_g=("rematg" in flags or "rematgfull" in flags),
                  remat_g_mode="full" if "rematgfull" in flags else "stages",
                  use_pallas="pallas" in flags,
                  sim_impl="pallas" if "simpallas" in flags else "xla",
                  fold_softmax="fold" in flags,
                  upblock_fused="upfused" in flags,
                  bn_compact=("large" if "bnclarge" in flags
                              else "bncompact" in flags),
                  wgrad_dot="wgraddot" in flags,
                  remat_enc_mode=("blocks" if "encblocks" in flags
                                  else "stem" if "encstem" in flags
                                  else "full"),
                  loss_dtype="float32" if "lossf32" in flags else "bfloat16")
        for f in flags:
            if f.startswith("chunks="):
                kw["chunks"] = int(f.split("=")[1])
            if f.startswith("grid="):
                kw["grid_chunks"] = int(f.split("=")[1])
            if f.startswith("tile="):
                kw["sim_tile"] = int(f.split("=")[1])
            if f.startswith("upimpl="):
                kw["upblock_fused_impl"] = f.split("=")[1]
            if f.startswith("rgbpad="):
                kw["rgb_pad"] = int(f.split("=")[1])
        run(name, b, 5.0, **kw)
