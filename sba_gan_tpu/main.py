"""Training / sampling / generation CLI.

Capability parity with the reference entry point (AttnGAN2/code/main.py:22-149
and main_bert.py): ``--cfg`` YAML preset, ``--data_dir`` / ``--manualSeed``
overrides, output dir named ``output/{DATASET}_{CONFIG}_{timestamp}``, and
config-driven mode dispatch — TRAIN.FLAG trains; else B_VALIDATION samples the
full test split; else free-text captions from
``{data_dir}/example_filenames.txt`` are generated (gen_example).

Extensions: ``--synthetic`` runs on the generated fixture dataset (no CUB on
disk), ``--max_epoch``/``--steps`` cap work for smoke runs.

Usage:
    python -m sba_gan_tpu.main --cfg sba_gan_tpu/configs/bird_style.yml
"""

from __future__ import annotations

import argparse
import datetime
import os
import pprint
import random

import numpy as np

from sba_gan_tpu.config import cfg_from_dict, cfg_from_file, default_config


def parse_args():
    p = argparse.ArgumentParser(description="Train/sample an SBA-GAN model")
    p.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    p.add_argument("--data_dir", type=str, default="")
    p.add_argument("--manualSeed", type=int, default=None)
    p.add_argument("--output_dir", type=str, default="")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic fixture dataset")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--platform", type=str, default="",
                   help="jax platform override: cpu | tpu ('' = preloaded)")
    return p.parse_args()


def build_dataset(cfg, synthetic: bool, split: str):
    if synthetic:
        from sba_gan_tpu.data.cub import SyntheticDataset

        return SyntheticDataset(
            num_examples=max(4 * cfg.TRAIN.BATCH_SIZE, 32),
            base_size=cfg.TREE.BASE_SIZE,
            branch_num=cfg.TREE.BRANCH_NUM,
            words_num=cfg.TEXT.WORDS_NUM,
            b_dcgan=cfg.GAN.B_DCGAN,
            seed=cfg.JAX.SEED,
        )
    from sba_gan_tpu.data.cub import TextImageDataset

    return TextImageDataset(
        cfg.DATA_DIR,
        split=split,
        base_size=cfg.TREE.BASE_SIZE,
        branch_num=cfg.TREE.BRANCH_NUM,
        words_num=cfg.TEXT.WORDS_NUM,
        captions_per_image=cfg.TEXT.CAPTIONS_PER_IMAGE,
        b_dcgan=cfg.GAN.B_DCGAN,
        seed=cfg.JAX.SEED,
        vocab="bert" if cfg.MODEL.TEXT_ENCODER == "bert" else "word",
        loader=cfg.MODEL.IMAGE_LOADER,
    )


def load_example_captions(cfg, wordtoix):
    """Reference gen_example ingest (main.py:34-83): read
    example_filenames.txt, tokenize each file's sentences to id arrays.
    BERT-vocab models use the wordpiece tokenizer instead of the regex
    vocab lookup (reference trainer_bert.py gen_example path)."""
    from sba_gan_tpu.data.vocab import bert_vocab_encode, encode_free_text

    use_bert = cfg.MODEL.TEXT_ENCODER == "bert"
    data_dic = {}
    fname = os.path.join(cfg.DATA_DIR, "example_filenames.txt")
    with open(fname, "r") as f:
        filenames = [line.strip() for line in f if line.strip()]
    for name in filenames:
        filepath = os.path.join(cfg.DATA_DIR, name + ".txt")
        with open(filepath, "r") as f:
            sentences = [s for s in f.read().split("\n") if s.strip()]
        if use_bert:
            ids, lens = bert_vocab_encode(sentences, cfg.TEXT.WORDS_NUM)
        else:
            ids, lens = encode_free_text(
                sentences, wordtoix, cfg.TEXT.WORDS_NUM
            )
        key = name[name.rfind("/") + 1:]
        data_dic[key] = (ids, lens, None)
    return data_dic


def main():
    args = parse_args()
    cfg = cfg_from_file(args.cfg_file) if args.cfg_file else default_config()
    from sba_gan_tpu.utils.platform import select_platform

    select_platform(args.platform or cfg.JAX.PLATFORM)
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.manualSeed is None:
        args.manualSeed = 100 if cfg.TRAIN.FLAG else random.randint(1, 10000)
    cfg.JAX.SEED = args.manualSeed
    random.seed(args.manualSeed)
    np.random.seed(args.manualSeed)
    print("Using config:")
    pprint.pprint(cfg)

    now = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    output_dir = args.output_dir or os.path.join(
        "output", f"{cfg.DATASET_NAME}_{cfg.CONFIG_NAME}_{now}"
    )

    split = "train" if cfg.TRAIN.FLAG else "test"
    dataset = build_dataset(cfg, args.synthetic, split)
    n_words = dataset.n_words if hasattr(dataset, "n_words") else len(dataset.ixtoword)

    from sba_gan_tpu.train.loop import GANTrainer

    trainer = GANTrainer(cfg, output_dir, dataset, n_words, dataset.ixtoword)

    # Reference-checkpoint import: NET_E names the text encoder and implies
    # the image encoder path (trainer.py:59-67: replace 'text_encoder' ->
    # 'image_encoder'); NET_G is the (EMA) generator (trainer.py:105-113).
    net_e = cfg.TRAIN.NET_E
    net_g = cfg.TRAIN.NET_G
    if (net_e and os.path.isfile(net_e)) or (net_g and os.path.isfile(net_g)):
        trainer.load_torch_weights(
            net_g=net_g if net_g and os.path.isfile(net_g) else None,
            net_e_text=net_e if net_e and os.path.isfile(net_e) else None,
            net_e_image=(
                net_e.replace("text_encoder", "image_encoder")
                if net_e
                and os.path.isfile(net_e.replace("text_encoder", "image_encoder"))
                else None
            ),
        )

    if cfg.TRAIN.FLAG:
        # frozen-batch fixture dump (reference main.py:135 np.save testcase):
        # one real batch for notebook-style debugging / regression checks
        from sba_gan_tpu.data.pipeline import DataLoader as _DL

        first = next(iter(_DL(dataset, min(cfg.TRAIN.BATCH_SIZE, len(dataset)),
                              shuffle=False, drop_last=True, num_workers=0)))
        np.save(
            os.path.join(output_dir, "testcase.npy"),
            {"imgs": [np.asarray(i) for i in first.imgs],
             "captions": first.captions, "cap_lens": first.cap_lens,
             "class_ids": first.class_ids, "keys": list(first.keys)},
            allow_pickle=True,
        )
        trainer.resume()
        trainer.train(max_epoch=args.max_epoch)
    elif cfg.B_VALIDATION:
        trainer.resume()
        trainer.sampling("valid")
    else:
        trainer.resume()
        data_dic = load_example_captions(cfg, dataset.wordtoix)
        trainer.gen_example(data_dic)


if __name__ == "__main__":
    main()
