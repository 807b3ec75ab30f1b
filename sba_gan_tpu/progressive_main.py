"""Progressive-growing training CLI (legacy gen-1 pipeline).

Capability parity with the reference's first-generation trainer CLI
(Old_Code/train.py:350-462): resolution schedule with alpha fade-in,
``--loss wgan-gp|r1``, n_critic, style mixing, EMA, sample grids every
`sample_every` steps, and full-state checkpoints.  Conditioning uses the
sentence embedding of the framework's text encoder when
``--conditional`` is set (the reference pipes BERT through TextProcess).

Usage:
    python -m sba_gan_tpu.progressive_main --synthetic --steps 200 \
        --max_size 64 --batch 16 --loss wgan-gp
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.data.pipeline import DataLoader
from sba_gan_tpu.models.legacy_style import progressive_schedule_samples
from sba_gan_tpu.train.progressive import ProgressiveTrainer
from sba_gan_tpu.utils.checkpoint import Checkpointer
from sba_gan_tpu.utils.image import make_grid, mkdir_p


def parse_args():
    p = argparse.ArgumentParser(description="Progressive StyleGAN trainer")
    p.add_argument("--data_dir", default="")
    p.add_argument("--pack", default="",
                   help="multi-resolution pack dir (python -m "
                        "sba_gan_tpu.prepare_data) — reads per-rung JPEGs "
                        "like the reference's LMDB loader "
                        "(Old_Code/train.py:95-99,448)")
    p.add_argument("--output_dir", default="output/progressive")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--loss", choices=["wgan-gp", "r1"], default="wgan-gp")
    p.add_argument("--init_size", type=int, default=8)
    p.add_argument("--max_size", type=int, default=256)
    p.add_argument("--phase", type=int, default=600_000,
                   help="samples per resolution phase (train.py:373)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--d_lr_mult", type=float, default=4.0,
                   help="D lr multiplier (train.py:418 uses 4x)")
    p.add_argument("--sched", action="store_true",
                   help="per-resolution lr/batch schedule "
                        "(train.py:450-456)")
    p.add_argument("--n_critic", type=int, default=1)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--z_dim", type=int, default=128)
    p.add_argument("--w_dim", type=int, default=512)
    p.add_argument("--fmap_max", type=int, default=512)
    p.add_argument("--batch_cap", type=int, default=0,
                   help="cap scheduled batch sizes (0 = no cap); for "
                        "smoke-scale runs of --sched")
    p.add_argument("--conditional", action="store_true")
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--sample_every", type=int, default=1000)
    p.add_argument("--ckpt_every", type=int, default=10_000)
    # in-loop Inception Score (gen-1 ran IS every 1000 steps,
    # Old_Code/train.py:309-330); 0 disables.  Random-init classifier
    # unless --inception_weights points at a torchvision .pth.
    p.add_argument("--eval_is_every", type=int, default=0)
    p.add_argument("--inception_weights", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="",
                   help="jax platform override: cpu | tpu ('' = preloaded)")
    return p.parse_args()


# per-resolution schedules (Old_Code/train.py:450-456); the reference's
# adjust_lr applies the same dict to G and D with different fallbacks
SCHED_LR = {4: 1e-3, 8: 1e-3, 16: 5e-4, 32: 1e-4, 64: 1e-4, 128: 1e-4,
            256: 1e-4}
SCHED_BATCH = {4: 64, 8: 64, 16: 64, 32: 32, 64: 32, 128: 16, 256: 16}
SCHED_BATCH_DEFAULT = 32


def build_data(args):
    if args.pack:
        return None  # pack mode builds per-rung datasets in main()
    if args.synthetic:
        from sba_gan_tpu.data.cub import SyntheticDataset

        return SyntheticDataset(
            num_examples=max(4 * args.batch, 64), base_size=args.max_size,
            branch_num=1, words_num=16, seed=args.seed,
        )
    from sba_gan_tpu.data.cub import TextImageDataset

    return TextImageDataset(args.data_dir, split="train",
                            base_size=args.max_size, branch_num=1)


def _write_used_samples(path: str, used: int) -> None:
    try:
        mkdir_p(os.path.dirname(path))
        with open(path, "w") as f:
            f.write(str(used))
    except OSError:
        pass


def main():
    args = parse_args()
    from sba_gan_tpu.utils.platform import select_platform

    select_platform(args.platform)
    mkdir_p(args.output_dir)
    trainer = ProgressiveTrainer(
        z_dim=args.z_dim, w_dim=args.w_dim, max_resolution=args.max_size,
        fmap_max=args.fmap_max,
        loss_mode=args.loss, lr=args.lr, d_lr_mult=args.d_lr_mult,
        n_critic=args.n_critic, mixing_prob=args.mixing,
        embed_dim=args.embed_dim if args.conditional else None,
    )
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng, batch=2)
    ckpt = Checkpointer(os.path.join(args.output_dir, "Model"))
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed at step {int(state.step)}")

    text_encoder = text_vars = None
    if args.conditional:
        from sba_gan_tpu.train.gan import build_text_encoder
        from sba_gan_tpu.config import cfg_from_dict

        cfg = cfg_from_dict({"TEXT": {"EMBEDDING_DIM": args.embed_dim}})
        if args.pack:
            n_words = 30522  # BERT wordpiece id space (dataset.py:31)
        else:
            ds_tmp = build_data(args)
            n_words = getattr(ds_tmp, "n_words", len(ds_tmp.ixtoword))
        text_encoder = build_text_encoder(cfg, n_words)
        text_vars = text_encoder.init(
            {"params": rng, "dropout": rng},
            jnp.ones((2, 16), jnp.int32), jnp.full((2,), 16, jnp.int32),
            train=False,
        )

    is_predict = None
    if args.eval_is_every:
        from sba_gan_tpu.evaluation.inception_score import (
            InceptionV3Classifier,
            make_predict_fn,
        )

        clf = InceptionV3Classifier()
        variables = clf.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)), False
        )
        if args.inception_weights:
            from sba_gan_tpu.utils.torch_port import (
                load_torch_state_dict,
                port_cnn_encoder,
            )

            params, stats = port_cnn_encoder(
                load_torch_state_dict(args.inception_weights)
            )
            variables = {"params": params, "batch_stats": stats}
        is_predict = make_predict_fn(clf, variables)

    dataset = build_data(args)

    def make_loader(batch_size, res):
        if args.pack:
            # per-rung JPEG reads, BERT tokens fixed at 24
            # (Old_Code/dataset.py:11-60)
            from types import SimpleNamespace

            from sba_gan_tpu.data.multires import (
                MultiResolutionDataset,
                batch_iterator,
            )

            ds = MultiResolutionDataset(args.pack, resolution=res,
                                        max_length=24, seed=args.seed)

            def gen():
                epoch = 0
                while True:
                    for imgs, toks in batch_iterator(ds, batch_size,
                                                     seed=args.seed + epoch):
                        lens = np.maximum(
                            (toks != 0).sum(axis=1), 1).astype(np.int32)
                        yield SimpleNamespace(imgs=(imgs,), captions=toks,
                                              cap_lens=lens)
                    epoch += 1

            return gen()
        return DataLoader(dataset, batch_size, shuffle=True, drop_last=True,
                          seed=args.seed, num_workers=0)

    gstep = int(state.step)
    cur_batch = args.batch
    # phase pacing follows ACTUAL samples consumed (Old_Code/train.py:156
    # used_sample += real_image.shape[0]) — under --sched the per-rung batch
    # differs from args.batch.  Persisted in a sidecar so resume keeps the
    # pacing exact.
    used_samples = gstep * args.batch
    used_path = os.path.join(args.output_dir, "Model", "used_samples.txt")
    if gstep and os.path.isfile(used_path):
        try:
            used_samples = int(open(used_path).read().strip())
        except (ValueError, OSError):
            pass
    cur_res, _ = progressive_schedule_samples(
        used_samples, args.phase, args.init_size, args.max_size)
    if args.sched:
        state = trainer.with_lr(state, SCHED_LR.get(cur_res, 1e-4),
                                SCHED_LR.get(cur_res, 4e-4))
        cur_batch = SCHED_BATCH.get(cur_res, SCHED_BATCH_DEFAULT)
        if args.batch_cap:
            cur_batch = min(cur_batch, args.batch_cap)
    loader = make_loader(cur_batch, cur_res)
    data_iter = iter(loader)

    t0 = time.time()
    g_loss = float("nan")  # no G update yet (n_critic schedule)
    n_blocks = trainer.generator.n_blocks()
    while gstep < args.steps:
        res, alpha = progressive_schedule_samples(
            used_samples, args.phase, args.init_size, args.max_size
        )
        res_step = min(int(np.log2(res // 4)), n_blocks - 1)
        if res != cur_res:
            # phase switch: retune lrs + batch (train.py:102-103,163-180)
            new_batch = cur_batch
            if args.sched:
                state = trainer.with_lr(state, SCHED_LR.get(res, 1e-4),
                                        SCHED_LR.get(res, 4e-4))
                new_batch = SCHED_BATCH.get(res, SCHED_BATCH_DEFAULT)
                if args.batch_cap:
                    new_batch = min(new_batch, args.batch_cap)
            if args.pack or new_batch != cur_batch:
                cur_batch = new_batch
                loader = make_loader(cur_batch, res)
                data_iter = iter(loader)
            if args.sched:
                print(f"phase switch -> res {res}, batch {cur_batch}, "
                      f"g_lr {SCHED_LR.get(res, 1e-4)}", flush=True)
        cur_res = res
        try:
            batch = next(data_iter)
        except StopIteration:
            data_iter = iter(loader)
            batch = next(data_iter)
        real = jnp.asarray(batch.imgs[-1])
        if real.shape[1] != res:
            real = jax.image.resize(
                real, (real.shape[0], res, res, 3), "bilinear"
            )
        sent = None
        if text_encoder is not None:
            _, sent = text_encoder.apply(
                text_vars, jnp.asarray(batch.captions),
                jnp.asarray(batch.cap_lens), train=False,
            )
        d_step, g_step = trainer.steps_for(res_step)
        state, d_loss = d_step(state, real, sent, jnp.float32(alpha), rng)
        gstep = int(state.step)
        used_samples += int(real.shape[0])
        if gstep % args.n_critic == 0:
            state, g_loss = g_step(state, sent, jnp.float32(alpha), rng, real)
        if gstep % 100 == 0:
            print(
                f"step {gstep} res {res} alpha {alpha:.2f} "
                f"d {float(d_loss):.3f} g {float(g_loss):.3f} "
                f"({(time.time() - t0):.0f}s)", flush=True,
            )
        if gstep % args.sample_every == 0:
            nb = min(8, cur_batch) if sent is not None else 8
            imgs = trainer.sample(state, jax.random.PRNGKey(gstep), nb,
                                  res_step, sent_emb=(sent[:nb] if sent is not None else None),
                                  alpha=alpha)
            from PIL import Image

            grid = make_grid(list(np.asarray(imgs)), nrow=4)
            mkdir_p(os.path.join(args.output_dir, "Image"))
            Image.fromarray(grid).save(
                os.path.join(args.output_dir, "Image", f"sample_{gstep}.png")
            )
        if is_predict is not None and gstep % args.eval_is_every == 0:
            from sba_gan_tpu.evaluation.inception_score import inception_score

            nb = min(16, args.batch)
            samples = [
                np.asarray(
                    trainer.sample(state, jax.random.PRNGKey(gstep + i), nb,
                                   res_step,
                                   sent_emb=(sent[:nb] if sent is not None else None),
                                   alpha=alpha)
                )
                for i in range(4)
            ]
            imgs = [im for batch_ in samples for im in batch_]
            mean, std = inception_score(imgs, is_predict, batch_size=16,
                                        splits=4)
            print(f"step {gstep} inception score {mean:.3f} +- {std:.3f}",
                  flush=True)
        if gstep % args.ckpt_every == 0:
            ckpt.save(gstep, state)
            _write_used_samples(used_path, used_samples)
    ckpt.save(gstep, state, wait=True)
    _write_used_samples(used_path, used_samples)
    print("done")


if __name__ == "__main__":
    main()
