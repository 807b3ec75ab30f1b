"""DAMSM pretraining CLI.

Capability parity with the reference pretrain scripts
(AttnGAN2/code/pretrain_DAMSM.py:195-295 / pretrain_DAMSM_bert.py): trains
the text encoder + image projections on the words+sent DAMSM losses with
per-epoch validation (<=50 batches, :133-163), lr decay x0.98/epoch floor
lr/10 (:283-284), periodic attention-map dumps, epoch snapshots, and a
graceful Ctrl-C stop (:293-295).

Usage:
    python -m sba_gan_tpu.pretrain --cfg sba_gan_tpu/configs/DAMSM/bird.yml
"""

from __future__ import annotations

import argparse
import os
import pprint
import random
import time

import jax
import numpy as np

from sba_gan_tpu.config import cfg_from_file, default_config
from sba_gan_tpu.data.pipeline import DataLoader
from sba_gan_tpu.parallel import batch_sharding, make_mesh, replicated
from sba_gan_tpu.train.damsm import DAMSMTrainer, build_damsm_models
from sba_gan_tpu.utils.checkpoint import Checkpointer
from sba_gan_tpu.utils.image import mkdir_p


def parse_args():
    p = argparse.ArgumentParser(description="Pretrain DAMSM encoders")
    p.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--manualSeed", type=int, default=100)
    p.add_argument("--output_dir", type=str, default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--platform", type=str, default="",
                   help="jax platform override: cpu | tpu ('' = preloaded)")
    return p.parse_args()


def build_dataset(cfg, synthetic: bool, split: str):
    from sba_gan_tpu.main import build_dataset as _bd

    return _bd(cfg, synthetic, split)


def run_epoch(trainer, state, loader, rng, log_every=50, image_dir=None,
              ixtoword=None, epoch=0):
    t0 = time.time()
    count = 0
    for batch in loader:
        img = batch.imgs[-1]
        state, logs = trainer.train_step(
            state, img, batch.captions, batch.cap_lens, batch.class_ids, rng
        )
        count += 1
        if count % log_every == 0:
            ms = (time.time() - t0) * 1000.0 / count
            print(
                f"  step {count} | w {float(logs['w_loss0']):.2f} "
                f"{float(logs['w_loss1']):.2f} | s {float(logs['s_loss0']):.2f} "
                f"{float(logs['s_loss1']):.2f} | {ms:.0f} ms/batch"
            )
            if image_dir is not None:
                dump_attention(trainer, state, batch, image_dir, ixtoword,
                               f"{epoch}_{count}")
    return state


def dump_attention(trainer, state, batch, image_dir, ixtoword, tag):
    """Word->region attention grid every log interval (reference
    pretrain_DAMSM.py:100-129 via build_super_images)."""
    import jax.numpy as jnp
    from PIL import Image

    from sba_gan_tpu.losses.damsm import words_loss
    from sba_gan_tpu.utils.viz import build_super_images

    region, _ = trainer.models.image_encoder.apply(
        {"params": state.image_params,
         "batch_stats": state.image_batch_stats},
        jnp.asarray(batch.imgs[-1]), False,
    )
    words_emb, _ = trainer.models.text_encoder.apply(
        {"params": state.text_params},
        jnp.asarray(batch.captions), jnp.asarray(batch.cap_lens), train=False,
    )
    labels = jnp.arange(batch.captions.shape[0], dtype=jnp.int32)
    *_, attn = words_loss(
        region, words_emb, labels, jnp.asarray(batch.cap_lens),
        jnp.asarray(batch.class_ids), return_attn=True,
    )
    # attn: (B, T, R) over own image; reshape regions to a square map
    import numpy as _np

    a = _np.asarray(attn)
    r = int(_np.sqrt(a.shape[2]))
    grid = build_super_images(
        _np.asarray(batch.imgs[-1]),
        _np.asarray(batch.captions),
        ixtoword or {},
        a[:, : a.shape[1], : r * r].transpose(0, 2, 1).reshape(
            a.shape[0], r, r, a.shape[1]
        ),
    )
    mkdir_p(image_dir)
    Image.fromarray(grid).save(os.path.join(image_dir, f"attn_{tag}.png"))


def evaluate(trainer, state, loader, max_batches=50):
    totals, n = [], 0
    for batch in loader:
        img = batch.imgs[-1]
        logs = trainer.eval_step(
            state, img, batch.captions, batch.cap_lens, batch.class_ids
        )
        totals.append(float(logs["total"]))
        n += 1
        if n >= max_batches:
            break
    return float(np.mean(totals)) if totals else float("nan")


def main():
    args = parse_args()
    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else default_config()
    from sba_gan_tpu.utils.platform import select_platform

    select_platform(args.platform or cfg.JAX.PLATFORM)
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    cfg.JAX.SEED = args.manualSeed
    random.seed(args.manualSeed)
    np.random.seed(args.manualSeed)
    print("Using config:")
    pprint.pprint(cfg)

    output_dir = args.output_dir or os.path.join(
        "output", f"DAMSM_{cfg.DATASET_NAME}_{cfg.CONFIG_NAME}"
    )
    mkdir_p(output_dir)

    train_ds = build_dataset(cfg, args.synthetic, "train")
    val_ds = build_dataset(cfg, args.synthetic, "test")
    n_words = train_ds.n_words if hasattr(train_ds, "n_words") else len(train_ds.ixtoword)

    mesh = make_mesh(cfg)
    bsh = batch_sharding(mesh)

    models = build_damsm_models(cfg, n_words)
    trainer = DAMSMTrainer(cfg, models, n_words)
    state = jax.device_put(
        trainer.init_state(jax.random.PRNGKey(cfg.JAX.SEED)), replicated(mesh)
    )
    ckpt = Checkpointer(os.path.join(output_dir, "Model"))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from epoch {ckpt.latest_step()}")

    train_loader = DataLoader(
        train_ds, cfg.TRAIN.BATCH_SIZE, shuffle=True, drop_last=True,
        seed=cfg.JAX.SEED, num_workers=cfg.WORKERS, sharding=bsh,
    )
    val_loader = DataLoader(
        val_ds, cfg.TRAIN.BATCH_SIZE, shuffle=False, drop_last=True,
        num_workers=0, sharding=bsh,
    )

    rng = jax.random.PRNGKey(cfg.JAX.SEED + 7)
    max_epoch = args.max_epoch or cfg.TRAIN.MAX_EPOCH
    start = int(ckpt.latest_step() + 1) if ckpt.latest_step() is not None else 0
    epoch = start
    try:
        for epoch in range(start, max_epoch):
            state = trainer.reset_optimizer(state, epoch)
            t0 = time.time()
            state = run_epoch(
                trainer, state, train_loader, rng,
                image_dir=os.path.join(output_dir, "Image"),
                ixtoword=getattr(train_ds, "ixtoword", None), epoch=epoch,
            )
            val = evaluate(trainer, state, val_loader)
            print(
                f"[{epoch}/{max_epoch}] val loss {val:.3f} "
                f"| {time.time() - t0:.1f}s"
            )
            ckpt.save(epoch, state)
    except KeyboardInterrupt:
        # save under the epoch actually reached so resume continues from it
        print("Ctrl-C: saving and exiting (reference pretrain_DAMSM.py:293-295)")
    ckpt.save(epoch, state, wait=True)


if __name__ == "__main__":
    main()
