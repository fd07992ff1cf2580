#!/usr/bin/env python
"""Offline dataset-build entry point (reference:
`python ./preprocess/dataset_gen.py`, preprocess/dataset_gen.py:73-79).

Runs the 4-stage pipeline — JPEG -> float16 gzip HDF5 shards, Chinese word
segmentation, train/dev/test split, vocabulary + caption DBs — and prints
per-stage summaries.

    python dataset_gen.py [--config cfg.json] [--segmenter auto|pkuseg|jieba|space]
                          [--split-seed N]
"""

import argparse
import pprint

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="path to a JSON config")
    ap.add_argument(
        "--segmenter",
        default="auto",
        choices=["auto", "pkuseg", "jieba", "space"],
        help="word segmenter ('auto' picks pkuseg > jieba > space; the "
        "choice is recorded in dataset_meta.json)",
    )
    ap.add_argument(
        "--split-seed", type=int, default=None,
        help="seed for the 5/5/90 test/dev/train split shuffle",
    )
    args = ap.parse_args()
    cfg = (
        config_mod.Config.from_json_file(args.config)
        if args.config
        else config_mod.default
    )
    pprint.pprint(
        dataset_gen.build_all(cfg, segmenter=args.segmenter,
                              split_seed=args.split_seed)
    )


if __name__ == "__main__":
    main()
