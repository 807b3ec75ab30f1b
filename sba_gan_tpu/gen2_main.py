"""Gen-2 conditional-StyleGAN training CLI (SURVEY.md L8-L9).

Capability parity with the reference's gen-2 entry point
(``Old_Code/code/main.py`` + ``Old_Code/code/trainer.py``): fixed-ladder
text-conditioned StyleGAN, RMSprop, WGAN-GP (or BCE) losses, a G update
every ``TRAIN.CRITIC_ITER`` D updates, per-epoch sample grids and
checkpoints.

Data comes from a multi-resolution pack (``python -m
sba_gan_tpu.prepare_data``) at ``GEN2.RESOLUTION``, or ``--synthetic``.

Usage:
    python -m sba_gan_tpu.gen2_main --cfg sba_gan_tpu/configs/gen2_birds.yml \\
        --data_dir data/pack --max_epoch 500
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.config import cfg_from_file, default_config
from sba_gan_tpu.train.gen2 import Gen2Trainer
from sba_gan_tpu.utils.checkpoint import Checkpointer
from sba_gan_tpu.utils.image import make_grid, mkdir_p


def parse_args():
    p = argparse.ArgumentParser(description="Gen-2 conditional StyleGAN")
    p.add_argument("--cfg", default=None)
    p.add_argument("--data_dir", default="")
    p.add_argument("--output_dir", default="output/gen2")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--manualSeed", type=int, default=100)
    p.add_argument("--platform", default="",
                   help="jax platform override: cpu | tpu ('' = preloaded)")
    p.add_argument("--bert_weights", default=None,
                   help="optional HF torch state dict to port into the "
                        "frozen text tower")
    return p.parse_args()


def synthetic_batches(batch: int, resolution: int, max_length: int,
                      n_batches: int, seed: int, vocab: int):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        imgs = rng.uniform(-1, 1, (batch, resolution, resolution, 3))
        toks = rng.integers(1, vocab, (batch, max_length))
        toks[:, max_length // 2:] = 0  # padded tail
        yield imgs.astype(np.float32), toks.astype(np.int32)


def main() -> None:
    args = parse_args()
    cfg = cfg_from_file(args.cfg) if args.cfg else default_config()
    from sba_gan_tpu.utils.platform import select_platform

    select_platform(args.platform or cfg.JAX.PLATFORM)
    if args.max_epoch is not None:
        cfg.TRAIN.MAX_EPOCH = args.max_epoch
    if args.batch is not None:
        cfg.TRAIN.BATCH_SIZE = args.batch
    mkdir_p(args.output_dir)
    mkdir_p(os.path.join(args.output_dir, "Image"))

    trainer = Gen2Trainer(cfg)
    rng = jax.random.PRNGKey(args.manualSeed)
    state = trainer.init_state(rng, batch=2, max_length=cfg.GEN2.MAX_LENGTH)

    if args.bert_weights:
        from sba_gan_tpu.models.text_bert import port_bert
        from sba_gan_tpu.utils.torch_port import load_torch_state_dict

        ported = port_bert(load_torch_state_dict(args.bert_weights),
                           nef=cfg.GEN2.E_DIM)
        g_params = dict(state.g_params)
        emb = dict(g_params["bert_embedding"])
        emb["bert"] = ported["bert"]
        g_params["bert_embedding"] = emb
        state = state.replace(g_params=g_params,
                              g_ema=jax.tree.map(jnp.asarray, g_params))
        print("ported BERT weights into the text tower")

    ckpt = Checkpointer(os.path.join(args.output_dir, "Model"))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed at step {int(state.step)}")

    def epoch_batches(epoch: int):
        if args.synthetic:
            return synthetic_batches(
                cfg.TRAIN.BATCH_SIZE, cfg.GEN2.RESOLUTION,
                cfg.GEN2.MAX_LENGTH, n_batches=8, seed=epoch,
                vocab=cfg.GEN2.BERT_VOCAB)
        from sba_gan_tpu.data.multires import (
            MultiResolutionDataset,
            batch_iterator,
        )

        ds = MultiResolutionDataset(
            args.data_dir, resolution=cfg.GEN2.RESOLUTION,
            max_length=cfg.GEN2.MAX_LENGTH, seed=epoch)
        vocab = cfg.GEN2.BERT_VOCAB

        def clamped():
            # sub-BERT test towers: fold wordpiece ids into the configured
            # vocab (full towers use vocab 30522 and ids always fit)
            for imgs, toks in batch_iterator(ds, cfg.TRAIN.BATCH_SIZE,
                                             seed=epoch):
                yield imgs, np.where(toks == 0, 0, 1 + (toks - 1) % (vocab - 1))

        return clamped()

    fixed_tokens = None
    for epoch in range(cfg.TRAIN.MAX_EPOCH):
        t0 = time.time()
        batches = epoch_batches(epoch)
        state, d_loss, g_loss = trainer.train_epoch(state, batches, rng)
        print(f"[{epoch}/{cfg.TRAIN.MAX_EPOCH}] "
              f"Loss_D: {d_loss:.4f} Loss_G: {g_loss:.4f} "
              f"Time: {time.time() - t0:.2f}s", flush=True)

        # per-epoch sample grid (trainer.py:245-246 save_singleimages)
        if fixed_tokens is None:
            for _, toks in epoch_batches(0):
                fixed_tokens = toks[:8]
                break
        imgs = np.asarray(trainer.sample(
            state, fixed_tokens, jax.random.PRNGKey(epoch)))
        from PIL import Image

        grid = make_grid(list(imgs), nrow=4)
        Image.fromarray(grid).save(
            os.path.join(args.output_dir, "Image", f"epoch_{epoch}.png"))
        if epoch % cfg.TRAIN.SNAPSHOT_INTERVAL == 0 and epoch != 0:
            ckpt.save(int(state.step), state)
    ckpt.save(int(state.step), state, wait=True)
    print("done")


if __name__ == "__main__":
    main()
