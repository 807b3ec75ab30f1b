"""Multi-resolution dataset preparation CLI.

Capability parity with the reference's LMDB builder entry point
(``Old_Code/prepare_data.py:91-103``): same flags (``--out --n_worker
--img_path --txt_path --dataset``), writing the pack container of
:mod:`sba_gan_tpu.data.multires` instead of LMDB.

Usage:
    python -m sba_gan_tpu.prepare_data --out data/pack \\
        --img_path data/birds/images --txt_path data/birds/text \\
        --dataset birds --n_worker 4
"""

from __future__ import annotations

import argparse

from sba_gan_tpu.data.multires import DEFAULT_SIZES, build_multires


def main() -> None:
    p = argparse.ArgumentParser(description="Build a multi-resolution pack")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n_worker", type=int, default=4)
    p.add_argument("--img_path", type=str, required=True)
    p.add_argument("--txt_path", type=str, required=True)
    p.add_argument("--dataset", default="birds", choices=["birds", "coco"])
    p.add_argument("--sizes", type=int, nargs="+", default=list(DEFAULT_SIZES))
    args = p.parse_args()
    total = build_multires(args.img_path, args.txt_path, args.out,
                           sizes=tuple(args.sizes), n_worker=args.n_worker,
                           dataset=args.dataset)
    print(f"Total samples: {total}")


if __name__ == "__main__":
    main()
