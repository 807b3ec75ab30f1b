"""Typed configuration system for sba_gan_tpu.

Capability parity with the reference's easydict+YAML config
(``AttnGAN2/code/miscc/config.py:9-109``): a tree of defaults, strict
recursive YAML merge (unknown keys raise ``KeyError``, type mismatches raise
``ValueError``), and dotted attribute access.  Re-designed as a plain Python
class (no easydict dependency) with a few TPU-native extension groups under
``cfg.JAX`` (mesh shape, compute dtype, batch-norm sync policy) that the
CUDA reference has no analogue for.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml


class ConfigDict(dict):
    """dict with attribute access; values are plain Python scalars/ConfigDicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _cd(d: Dict[str, Any]) -> ConfigDict:
    out = ConfigDict()
    for k, v in d.items():
        out[k] = _cd(v) if isinstance(v, dict) else v
    return out


# ---------------------------------------------------------------------------
# Default schema.  Key names/defaults mirror the reference schema
# (`miscc/config.py:12-66`) so the reference's YAML presets remain loadable;
# groups MODEL/JAX/BENCH are new, TPU-specific extensions.
# ---------------------------------------------------------------------------
def default_config() -> ConfigDict:
    return _cd(
        {
            "DATASET_NAME": "birds",
            "CONFIG_NAME": "",
            "DATA_DIR": "",
            "GPU_ID": 0,  # accepted for reference-YAML compat; unused on TPU
            "CUDA": True,  # accepted for reference-YAML compat; unused on TPU
            "WORKERS": 6,
            "RNN_TYPE": "LSTM",  # 'LSTM' | 'GRU'
            "B_VALIDATION": False,
            "TREE": {
                "BRANCH_NUM": 3,
                "BASE_SIZE": 64,
            },
            "TRAIN": {
                "BATCH_SIZE": 64,
                "MAX_EPOCH": 600,
                "SNAPSHOT_INTERVAL": 2000,
                "DISCRIMINATOR_LR": 2e-4,
                "GENERATOR_LR": 2e-4,
                "ENCODER_LR": 2e-4,
                "RNN_GRAD_CLIP": 0.25,
                # micro-batch accumulation: optimizers apply every k steps,
                # preserving the reference's small effective batch on big
                # data-parallel meshes (no reference analogue).
                "GRAD_ACCUM": 1,
                # 'window': G and D both accumulate (large-batch dynamics);
                # 'dfresh': D updates every micro-batch like the reference
                # alternation, only G accumulates (train/state.py
                # gan_optimizers).  EMA always commits once per G window.
                "GRAD_ACCUM_MODE": "window",
                "FLAG": True,
                "NET_E": "",
                "NET_G": "",
                "B_NET_D": True,
                "SMOOTH": {
                    "GAMMA1": 5.0,
                    "GAMMA2": 5.0,
                    "GAMMA3": 10.0,
                    "LAMBDA": 1.0,
                },
                "MIXING": False,
                # gen-2 critic schedule: G updates every CRITIC_ITER D steps
                # (Old_Code/code/miscc/config.py:79, trainer.py:219)
                "CRITIC_ITER": 5,
            },
            "GAN": {
                "DF_DIM": 64,
                "GF_DIM": 128,
                "Z_DIM": 100,
                "W_DIM": 256,
                "CONDITION_DIM": 100,
                "R_NUM": 2,
                "B_ATTENTION": True,
                "B_DCGAN": False,
                # number of mapping-network layers: 6 in the word-vocab variant
                # (reference model.py:301-321), 8 in the BERT/style variant
                # (model_bert.py:334-348).  Explicit here instead of being
                # implied by which model file is imported.
                "M_NUM": 6,
                # whether stage-0 input is concat(c, z) (reference model.py:369)
                # or c alone with z entering only via w (model_bert.py:401-410).
                "INIT_Z_CONCAT": True,
            },
            "TEXT": {
                "CAPTIONS_PER_IMAGE": 10,
                "EMBEDDING_DIM": 256,
                "WORDS_NUM": 20,
            },
            # Gen-2 conditional-StyleGAN stack (SURVEY.md L8-L9).  Key names
            # mirror the reference's gen-2 schema
            # (Old_Code/code/miscc/config.py:23-70), nested here instead of
            # top-level so one unified config serves every generation.
            "GEN2": {
                "E_DIM": 128,
                "C_DIM": 128,
                "Z_DIM": 128,
                "W_DIM": 256,
                "A_DIM": 256,
                "WORD_DIM": 768,
                "MAX_LENGTH": 18,
                "M_LAYERS": 8,
                "M_USE_NORM": True,
                "RESOLUTION": 128,
                "RESOLUTION_INIT": 4,
                "USE_ATTENTION": False,
                "USE_NOISE": False,
                "USE_PIXEL_NORM": False,
                "USE_INSTANCE_NORM": True,
                "USE_TRUNCATION": False,
                "FMAP_BASE": 4096,
                "FMAP_MAX": 256,
                "WGAN": True,
                "WGAN_LAMBDA": 10.0,
                # text-tower dims (bert-base-uncased by default, matching
                # TEXT.PRETRAINED_MODEL in the reference schema); shrink for
                # CPU tests
                "BERT_VOCAB": 30522,
                "BERT_HIDDEN": 768,
                "BERT_LAYERS": 12,
                "BERT_HEADS": 12,
                "BERT_INTERMEDIATE": 3072,
            },
            # --- TPU-native extensions (no reference analogue) ---
            "MODEL": {
                "TEXT_ENCODER": "rnn",  # 'rnn' | 'bert'
                # Inception-v3 input resolution (reference model.py:210 fixes
                # 299).  Smaller values give a cheap encoder for CPU tests.
                "INCEPTION_INPUT": 299,
                # pixel path: 'pil' = exact reference preprocessing parity;
                # 'native' = C++ decode/crop/resize (sba_gan_tpu/native/).
                "IMAGE_LOADER": "pil",
            },
            "JAX": {
                "SEED": 100,
                # '' keeps the preloaded backend; 'cpu'/'tpu' switch it via
                # jax.config before first use (utils/platform.py).
                "PLATFORM": "",
                # compute dtype for conv/matmul-heavy modules; params stay f32.
                "DTYPE": "float32",  # 'float32' | 'bfloat16'
                "MESH_DATA": -1,  # -1: all devices on the data axis
                "MESH_MODEL": 1,
                # True: batch-norm statistics are computed over the global
                # (cross-replica) batch — automatic under jit over a sharded
                # batch.  Recorded here for documentation/tests.
                "SYNC_BATCHNORM": True,
                # Opt-in fused Pallas word-attention.  XLA's fused path is
                # the default: the word table (D=32, T=18 at bird_style
                # dims) is too small for MXU tiling to win; the kernel
                # remains available for larger D/T regimes (see
                # scripts/perf_ablation.py for the measurement harness).
                "USE_PALLAS": False,
                # Rematerialize the frozen Inception forward in the G
                # backward (jax.checkpoint): trades ~15% step time at
                # per-chip batch 32 for large-batch HBM headroom (measured:
                # batch 128 OOMs without it).
                "REMAT_IMAGE_ENCODER": False,
                # 'full' recomputes the whole Inception forward in the
                # backward; 'blocks' saves the checkpoint_name-tagged
                # Mixed-block outputs (models/inception.py, all <= 35x35)
                # and recomputes only the high-resolution stem — the stem
                # activations (299^2..71^2) are what dominate encoder HBM,
                # while the Mixed blocks carry most of the recompute FLOPs.
                # 'stem' is the dual: save everything EXCEPT the tagged
                # stem activations — minimum recompute (~0.9 of the
                # encoder's 1.45 TFLOP fwd stays saved at b128), maximum
                # residual memory short of no remat at all; compose with
                # BN_COMPACT for headroom.
                "REMAT_IMAGE_ENCODER_MODE": "full",
                # Rematerialize the generator forward in the G backward
                # (the step keeps no G residuals) — a memory/flops trade
                # for regimes where G residuals dominate HBM.  Default off;
                # the earlier speed comparison for this flag predates the
                # honest timing fence and is void (NOTES.md).
                "REMAT_GENERATOR": False,
                # 'full' recomputes the whole G forward in the backward
                # (round-1: compile blew past 25 min at b128 over the
                # tunnel); 'stages' saves only the checkpoint_name-tagged
                # stage-boundary tensors (models/generator.py) and
                # recomputes within stages — nearly the same residual
                # savings with a much smaller recompute graph.
                "REMAT_GENERATOR_MODE": "stages",
                # Split the DAMSM Inception pass into N sequential chunks
                # (lax.map): peak activation memory divides by N at the cost
                # of serialization — combine with REMAT_IMAGE_ENCODER for
                # large per-chip batches.  1 = single fused pass.
                "DAMSM_CHUNKS": 1,
                # Split the words-loss (B,B,T,R) attention grid over the
                # image axis into N sequential chunks (lax.map+checkpoint):
                # bit-identical numerics, peak grid memory / N.
                "DAMSM_GRID_CHUNKS": 1,
                # words-loss similarity implementation: 'xla' (dense grid)
                # or 'pallas' (fused flash-style kernel, ops/damsm_sim.py —
                # no (B,B,T,R) grid in HBM; the words loss is HBM-bound in
                # the dense form).  'interpret' runs the kernel on CPU.
                # Any flip of the default to 'pallas' is gated on
                # scripts/check_sim_kernel_tpu.py passing on the real TPU
                # (Mosaic compile + numerics), not just interpret parity.
                # GATE PASSED 2026-08-19 (logs/r3_ablations.log): parity
                # loss rel 2e-7 / grad cos >=0.999996, full-step b128
                # 272.7-275 ms (pallas, chunks=1) vs 300.8 ms (xla,
                # chunks=4).  bench.py now defaults to 'pallas' ON TPU;
                # the library default stays 'xla' because CPU runs would
                # hit the (slow) interpreter and tests cover both.
                "DAMSM_SIM_IMPL": "xla",
                # text tile per kernel grid step; must divide the batch
                # (otherwise words_loss falls back to the XLA path).
                "DAMSM_SIM_TILE": 16,
                # XLA dense path: fold the Eq.8 word-softmax into Eq.9
                # (one fewer (B,B,T,R) materialization; same math).
                "DAMSM_FOLD_SOFTMAX": False,
                # Generator UpBlocks compute conv3x3(nearest_up2(x)) as a
                # folded 2x2 conv at LOW resolution + depth-to-space
                # (models/blocks.py _FoldedUpConv3x3): exact identity,
                # identical parameter tree, 2.25x fewer conv FLOPs, no
                # high-res pre-conv tensor in HBM or in the VJP residuals.
                # Default off until the on-chip A/B lands (same gate
                # discipline as DAMSM_SIM_IMPL above).
                "UPBLOCK_FUSED": False,
                # Lowering for the folded conv (models/blocks.py
                # _FoldedUpConv3x3): 'phase3x3' (aligned phases, pure-
                # reshape depth-to-space), 'convt' (one stride-2
                # transposed conv), 'fold2x2' (shifted slices — OOMed
                # on-chip at b128, kept for A/B evidence).
                "UPBLOCK_FUSED_IMPL": "phase3x3",
                # Memory-compact normalization: G and D BatchNorms
                # (models/blocks.py _CompactBatchNorm) and the AdaIN
                # instance norm (instance_norm_2d compact=True) fold
                # their statistics into small f32 scale/offset tensors
                # applied in the compute dtype — same math and variable
                # tree, but the (B,H,W,C) activation is never promoted
                # to f32.  The two largest HLO temps of the b256 step
                # were 4.00G f32 buffers from exactly that promotion in
                # the flax BN normalize path (logs/r3_ablations.log
                # 2026-08-19 20:50).  On-chip A/Bs: full scope (True) is
                # time-NEUTRAL at the r3 anchor and +17.4 ms at the lean
                # r4 b128 point — a memory lever only.  "large" scopes
                # the compact form to >=128^2 activations, where the r4
                # trace shows the flax f32 promotion costing ~10 ms at
                # the 256^2 UpBlock BN alone.  False | True | "large".
                "BN_COMPACT": False,
                # Zero-pad the RGB-head conv (GetImageG) to N output
                # channels and slice back to 3 — exact identity, same
                # parameter tree (models/blocks.py _LanePaddedConv3x3).
                # The r4 trace attributed each head's backward running
                # ~3x its forward to Cout=3 MXU lane padding.  0 = off;
                # typical values 8/32 (measurement decides — same flip
                # discipline as the other levers).
                "RGB_HEAD_PAD": 0,
                # Lower the G ResBlock convs' WEIGHT gradients as nine
                # shifted-view MXU dots instead of XLA's conv-shaped
                # wgrad (models/blocks.py conv3x3_dot_wgrad) — same math
                # and FLOPs; the r4 trace showed those wgrads at ~2.9x
                # their forwards.  Forward and dgrad lowerings unchanged.
                # Default off until the on-chip A/B lands (same gate
                # discipline as the other levers).
                "CONV_WGRAD_DOT": False,
                # K train steps per dispatch in the training loop
                # (lax.scan fusion, make_gan_train_multistep) — amortizes
                # per-dispatch overhead on low-latency runtimes.  The
                # flagship step here is compute-bound (~310 ms), so 1.
                "TRAIN_UNROLL": 1,
                "LOSS_DTYPE": "float32",
            },
            "BENCH": {
                "WARMUP_STEPS": 5,
                "MEASURE_STEPS": 30,
                # K train steps fused into one dispatch (lax.scan) —
                # amortizes the runtime's per-dispatch overhead
                # (make_gan_train_multistep).
                "UNROLL": 1,
            },
        }
    )


def merge_into(src: Dict[str, Any], dst: ConfigDict, _path: str = "") -> None:
    """Recursively merge ``src`` into ``dst``.

    Same strictness contract as the reference `_merge_a_into_b`
    (`miscc/config.py:69-100`): unknown keys raise KeyError; type mismatches
    raise ValueError.  One deliberate convenience deviation: an int value is
    accepted where a float is expected (YAML `5` for `5.0`).
    """
    if src is None:
        return
    for k, v in src.items():
        where = f"{_path}{k}"
        if k not in dst:
            raise KeyError(f"{where} is not a valid config key")
        old = dst[k]
        if isinstance(old, ConfigDict):
            if not isinstance(v, dict):
                raise ValueError(
                    f"Type mismatch ({type(old)} vs. {type(v)}) for config key: {where}"
                )
            merge_into(v, old, where + ".")
            continue
        if isinstance(old, float) and isinstance(v, int) and not isinstance(v, bool):
            v = float(v)
        if (old is not None and v is not None and type(old) is not type(v)
                # tri-state flags: bool defaults that also accept a scope
                # string (JAX.BN_COMPACT: False | True | "large")
                and not (where == "JAX.BN_COMPACT"
                         and isinstance(old, bool) and isinstance(v, str))):
            raise ValueError(
                f"Type mismatch ({type(old)} vs. {type(v)}) for config key: {where}"
            )
        if where == "JAX.BN_COMPACT" and isinstance(v, str) and v != "large":
            # A typo ('Large', 'lrg') would silently select the plain flax
            # BN path while logging bn_compact=<str> as if active — reject
            # unknown scope strings outright (advisor r4).
            raise ValueError(
                f"JAX.BN_COMPACT must be a bool or the string 'large'; got {v!r}"
            )
        dst[k] = v


def cfg_from_file(filename: str, base: ConfigDict | None = None) -> ConfigDict:
    """Load a YAML preset and merge it over the defaults (reference
    `cfg_from_file`, miscc/config.py:103-109) — but returns a fresh config
    object instead of mutating a global singleton."""
    cfg = base if base is not None else default_config()
    with open(filename, "r") as f:
        merge_into(yaml.safe_load(f), cfg)
    return cfg


def cfg_from_dict(d: Dict[str, Any], base: ConfigDict | None = None) -> ConfigDict:
    cfg = base if base is not None else default_config()
    merge_into(d, cfg)
    return cfg
