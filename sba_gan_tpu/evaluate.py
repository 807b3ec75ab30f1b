"""Inception-Score evaluation CLI.

Capability parity with the reference IS notebook
(AttnGAN2/inception_score.ipynb: torchvision inception_v3 over a generated
image folder -> exp(mean KL) with splits), as a command instead of a
notebook.

Usage:
    python -m sba_gan_tpu.evaluate --dir output/.../valid/single \
        [--weights inception.pth] [--splits 10] [--batch 32]

Without --weights the classifier is randomly initialized — useful only for
pipeline smoke tests; with a torchvision inception_v3 state dict the score
matches the reference methodology.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description="Inception Score over a folder")
    p.add_argument("--dir", required=True, help="folder of generated PNGs")
    p.add_argument("--weights", default=None,
                   help="torchvision inception_v3 .pth state dict")
    p.add_argument("--splits", type=int, default=10)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=299)
    p.add_argument("--platform", default="",
                   help="jax platform override: cpu | tpu ('' = preloaded)")
    args = p.parse_args()
    from sba_gan_tpu.utils.platform import select_platform

    select_platform(args.platform)

    from sba_gan_tpu.evaluation.inception_score import (
        InceptionV3Classifier,
        inception_score,
        load_images_from_dir,
        make_predict_fn,
    )

    clf = InceptionV3Classifier(input_size=args.size)
    variables = clf.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)), False
    )
    if args.weights:
        from sba_gan_tpu.utils.torch_port import (
            load_torch_state_dict,
            port_cnn_encoder,
        )

        params, batch_stats = port_cnn_encoder(
            load_torch_state_dict(args.weights)
        )
        variables = {"params": params, "batch_stats": batch_stats}

    predict = make_predict_fn(clf, variables)
    mean, std = inception_score(
        load_images_from_dir(args.dir), predict,
        batch_size=args.batch, splits=args.splits,
    )
    print(json.dumps({"inception_score": mean, "std": std,
                      "weights": bool(args.weights)}))


if __name__ == "__main__":
    main()
