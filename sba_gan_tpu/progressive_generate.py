"""Progressive StyleGAN sampling CLI (SURVEY.md L7).

Capability parity with the reference's gen-1 sampler
(``Old_Code/generate.py``): mean-style estimation over 10x1024 z draws,
truncation psi=0.7 sample grids, and style-mixing grids — a (n_target+1) x
(n_source+1) matrix whose first row/column hold the pure source/target
images, with the coarse blocks (mixing_range=(0,1)) taking the target style.

Usage:
    python -m sba_gan_tpu.progressive_generate output/progressive/Model \\
        --size 256 --n_row 3 --n_col 5 --out_dir samples/
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from sba_gan_tpu.train.progressive import ProgressiveTrainer
from sba_gan_tpu.utils.checkpoint import Checkpointer
from sba_gan_tpu.utils.image import make_grid, mkdir_p


def parse_args():
    p = argparse.ArgumentParser(description="Progressive StyleGAN sampler")
    p.add_argument("path", help="checkpoint dir (progressive_main Model/)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n_row", type=int, default=3)
    p.add_argument("--n_col", type=int, default=5)
    p.add_argument("--n_mixing", type=int, default=20,
                   help="number of style-mixing grids (generate.py:97)")
    p.add_argument("--style_weight", type=float, default=0.7)
    p.add_argument("--out_dir", default=".")
    p.add_argument("--z_dim", type=int, default=128)
    p.add_argument("--w_dim", type=int, default=512)
    p.add_argument("--fmap_max", type=int, default=512)
    p.add_argument("--max_size", type=int, default=256)
    p.add_argument("--embed_dim", type=int, default=0,
                   help="text conditioning dim (0 = unconditional, as the "
                        "reference sampler)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def mean_style(generator, params, z_dim, rng, sent_emb=None,
               n_draws: int = 10, draw: int = 1024):
    """Average style over 10 x 1024 z draws (generate.py:11-24)."""
    acc = None
    for i in range(n_draws):
        z = jax.random.normal(jax.random.fold_in(rng, i), (draw, z_dim))
        se = (jnp.broadcast_to(sent_emb[:1], (draw, sent_emb.shape[-1]))
              if sent_emb is not None else None)
        w = generator.apply({"params": params}, z, se, 0, jnp.float32(1.0),
                            rng, return_w=True)
        w = jnp.mean(w, axis=0, keepdims=True)
        acc = w if acc is None else acc + w
    return acc / n_draws


def sample_grid(generator, params, z_dim, step, w_mean, style_weight, rng,
                n_sample, sent_emb=None):
    z = jax.random.normal(rng, (n_sample, z_dim))
    return generator.apply(
        {"params": params}, z, sent_emb, step, jnp.float32(1.0),
        jax.random.fold_in(rng, 7), w_mean=w_mean,
        style_weight=style_weight)


def style_mixing_grid(generator, params, z_dim, step, w_mean, style_weight,
                      rng, n_source, n_target, sent_emb=None):
    """(n_target+1) x (n_source+1) grid (generate.py:37-70): row 0 =
    [blank, sources]; row i = [target_i, mixes with target style on the
    coarse blocks]."""
    r_s, r_t, r_n = jax.random.split(rng, 3)
    source = jax.random.normal(r_s, (n_source, z_dim))
    target = jax.random.normal(r_t, (n_target, z_dim))
    kw = dict(w_mean=w_mean, style_weight=style_weight)
    shape = 4 * 2 ** step

    def gen(z, crossover=None):
        se = (jnp.broadcast_to(sent_emb[:1], (z.shape[1] if z.ndim == 3
                                              else z.shape[0],
                                              sent_emb.shape[-1]))
              if sent_emb is not None else None)
        return generator.apply({"params": params}, z, se, step,
                               jnp.float32(1.0), r_n, crossover=crossover,
                               **kw)

    rows = [np.full((1, shape, shape, 3), -1.0, np.float32),
            np.asarray(gen(source))]
    target_imgs = np.asarray(gen(target))
    for i in range(n_target):
        z_pair = jnp.stack(
            [jnp.broadcast_to(target[i], (n_source, z_dim)), source])
        mixed = np.asarray(gen(z_pair, crossover=2))  # blocks 0-1 = target
        rows.append(target_imgs[i:i + 1])
        rows.append(mixed)
    return np.concatenate(rows, axis=0)


def main() -> None:
    args = parse_args()
    mkdir_p(args.out_dir)
    trainer = ProgressiveTrainer(
        z_dim=args.z_dim, w_dim=args.w_dim, max_resolution=args.max_size,
        fmap_max=args.fmap_max,
        embed_dim=args.embed_dim or None)
    rng = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(rng, batch=2)
    ckpt = Checkpointer(args.path)
    if ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"loaded step {int(state.step)}")
    else:
        print("warning: no checkpoint found, sampling from init")
    params = state.g_ema  # g_running (generate.py:88)
    generator = trainer.generator

    sent = (jnp.zeros((1, args.embed_dim), jnp.float32)
            if args.embed_dim else None)
    w_mean = mean_style(generator, params, args.z_dim, rng, sent)
    step = int(math.log2(args.size)) - 2

    from PIL import Image

    n = args.n_row * args.n_col
    se = (jnp.broadcast_to(sent, (n, args.embed_dim)) if sent is not None
          else None)
    img = sample_grid(generator, params, args.z_dim, step, w_mean,
                      args.style_weight, jax.random.fold_in(rng, 1), n, se)
    grid = make_grid(list(np.asarray(img)), nrow=args.n_col)
    Image.fromarray(grid).save(os.path.join(args.out_dir, "sample.png"))

    for j in range(args.n_mixing):
        imgs = style_mixing_grid(
            generator, params, args.z_dim, step, w_mean, args.style_weight,
            jax.random.fold_in(rng, 100 + j), args.n_col, args.n_row, sent)
        grid = make_grid(list(imgs), nrow=args.n_col + 1)
        Image.fromarray(grid).save(
            os.path.join(args.out_dir, f"sample_mixing_{j}.png"))
    print("done")


if __name__ == "__main__":
    main()
