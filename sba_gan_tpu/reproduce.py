"""One-command reference reproduction: released checkpoints -> samples + IS.

    python -m sba_gan_tpu.reproduce \
        --net_e .../text_encoder200.pth --net_g .../netG_epoch_600.pth \
        --data_dir .../birds [--inception_weights inception_v3.pth] \
        [--output_dir out] [--splits 10] [--rounds 1] [--platform cpu]

End-to-end path (VERDICT round 1, next #7): import the reference's torch
checkpoints through utils/torch_port (the resume path of
AttnGAN2/code/trainer.py:48-122: NET_E names the text encoder, the image
encoder path is NET_E with 'text_encoder'->'image_encoder', NET_G carries
the EMA generator weights saved swapped-in, trainer.py:159-170), sample the
whole test split with the bulk sampler ({key}_s-1.png parity,
trainer.py:348-430), then compute the Inception Score exactly as the
reference's inception_score.ipynb (torchvision softmax -> exp(mean KL) over
splits; BASELINE.md) — optionally with real torchvision inception weights.

With no checkpoints supplied it still runs (random init) so the harness is
exercisable before real weights exist; IS of a random-init model is ~1.
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser(
        description="Reproduce reference checkpoints: samples + IS")
    p.add_argument("--cfg", dest="cfg_file", default=None,
                   help="preset YAML (default: configs/eval_bird.yml)")
    p.add_argument("--net_e", default="",
                   help="reference text_encoder .pth (image encoder found "
                        "by the text_encoder->image_encoder name rule)")
    p.add_argument("--net_g", default="", help="reference netG .pth (EMA)")
    p.add_argument("--data_dir", default="")
    p.add_argument("--synthetic", action="store_true",
                   help="generated fixture dataset instead of --data_dir")
    p.add_argument("--output_dir", default="output/reproduce")
    p.add_argument("--inception_weights", default=None,
                   help="torchvision inception_v3 .pth for the IS model "
                        "(random init otherwise — relative IS only)")
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--rounds", type=int, default=1)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--r_precision", action="store_true",
                   help="also report DAMSM R-precision over the eval split "
                        "(framework extension; needs more eval items than "
                        "--rp_candidates)")
    p.add_argument("--rp_candidates", type=int, default=100,
                   help="R-precision candidate pool size (1 true + K-1 "
                        "mismatched)")
    p.add_argument("--skip_is", action="store_true",
                   help="samples only, no Inception Score")
    p.add_argument("--is_size", type=int, default=299,
                   help="IS classifier input size (299 = reference parity)")
    p.add_argument("--platform", default="",
                   help="jax platform override: cpu | tpu ('' = preloaded)")
    return p.parse_args()


def main():
    args = parse_args()
    from sba_gan_tpu.utils.platform import select_platform

    select_platform(args.platform)

    import jax
    import numpy as np

    from sba_gan_tpu.config import cfg_from_file, default_config
    from sba_gan_tpu.main import build_dataset

    if args.cfg_file:
        cfg = cfg_from_file(args.cfg_file)
    else:
        preset = os.path.join(os.path.dirname(__file__), "configs",
                              "eval_bird.yml")
        cfg = cfg_from_file(preset) if os.path.isfile(preset) \
            else default_config()
    cfg.TRAIN.FLAG = False
    cfg.B_VALIDATION = True
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.batch:
        cfg.TRAIN.BATCH_SIZE = args.batch
    if args.net_e:
        cfg.TRAIN.NET_E = args.net_e
    if args.net_g:
        cfg.TRAIN.NET_G = args.net_g

    dataset = build_dataset(cfg, args.synthetic, "test")
    n_words = dataset.n_words if hasattr(dataset, "n_words") \
        else len(dataset.ixtoword)

    from sba_gan_tpu.train.loop import GANTrainer

    trainer = GANTrainer(cfg, args.output_dir, dataset, n_words,
                         dataset.ixtoword)
    loaded = []
    if args.net_g and os.path.isfile(args.net_g):
        loaded.append("netG")
    net_e_img = args.net_e.replace("text_encoder", "image_encoder") \
        if args.net_e else ""
    if args.net_e and os.path.isfile(args.net_e):
        loaded.append("text_encoder")
    trainer.load_torch_weights(
        net_g=args.net_g if args.net_g and os.path.isfile(args.net_g)
        else None,
        net_e_text=args.net_e if args.net_e and os.path.isfile(args.net_e)
        else None,
        net_e_image=net_e_img if net_e_img and os.path.isfile(net_e_img)
        else None,
    )
    print(f"loaded reference checkpoints: {loaded or 'none (random init)'}")

    sample_dir = trainer.sampling("valid", rounds=args.rounds)

    result = {"samples_dir": sample_dir}
    if not args.skip_is:
        import jax.numpy as jnp

        from sba_gan_tpu.evaluation.inception_score import (
            InceptionV3Classifier,
            inception_score,
            load_images_from_dir,
            make_predict_fn,
        )

        clf = InceptionV3Classifier(input_size=args.is_size)
        variables = clf.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.is_size, args.is_size, 3)), False)
        if args.inception_weights:
            from sba_gan_tpu.utils.torch_port import (
                load_torch_state_dict,
                port_cnn_encoder,
            )

            params, stats = port_cnn_encoder(
                load_torch_state_dict(args.inception_weights))
            variables = {"params": params, "batch_stats": stats}
        imgs = list(load_images_from_dir(sample_dir))
        mean, std = inception_score(
            imgs, make_predict_fn(clf, variables),
            batch_size=min(32, len(imgs)), splits=args.splits)
        result.update(
            inception_score=round(float(mean), 4),
            inception_score_std=round(float(std), 4),
            n_images=len(imgs),
            pretrained_is_model=bool(args.inception_weights),
        )
        print(f"Inception Score: {mean:.4f} +- {std:.4f} "
              f"({len(imgs)} images, {args.splits} splits)")
    if args.r_precision:
        rp_mean, rp_std = trainer.r_precision_eval(
            num_candidates=args.rp_candidates)
        result.update(r_precision=round(float(rp_mean), 4),
                      r_precision_std=round(float(rp_std), 4))
        print(f"R-precision (top-1 of {args.rp_candidates}): "
              f"{rp_mean:.4f} +- {rp_std:.4f}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
