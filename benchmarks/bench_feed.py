#!/usr/bin/env python
"""Training input-pipeline benchmark: HDF5 shard -> host batch -> device.

The device train step is ~30 ms / batch-128 (4.2k img/s,
benchmarks/train_roofline.md). This measures whether the host feed keeps
that fed, across the shard storage options (build_dataset.codec /
storage_dtype) and the parallel batch reader (train.reader_threads):
per-image decode from the shards, batch assembly, the native
convert->f32 NHWC pass, and optionally the H2D put.

Usage: python benchmarks/bench_feed.py [--images 768] [--batch 128]
       [--threads 0 4] [--codec gzip lzf] [--dtype float16 uint8] [--device]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import hdf5 as hdf5_mod
from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder
from myimagecaptioningmodel_tpu.data.reader import DataReader


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_dataset(root: str, n_images: int, codec: str, dtype: str,
                  sentence_len: int = 35):
    """Synthetic shard set + train_cap.npy at real image dims."""
    import json

    out = os.path.join(root, f"dataset_{codec}_{dtype}")
    os.makedirs(out)
    cfg = config_mod.Config.from_dict(
        {
            "data": {
                "dict_path": out,
                "h5_path": [out],
                "h5_name2idx": os.path.join(out, "name2idx.json"),
            },
        }
    )
    rng = np.random.RandomState(0)
    names = [f"img_{i:05d}.jpg" for i in range(n_images)]
    with hdf5_mod.DbBuilder(
        out, "aic_flk", (3, 224, 224), max_size=max(256, n_images // 2),
        db_length=n_images, dtype=dtype, compression_opts=5, codec=codec,
        attrs={
            "storage_dtype": dtype, "normalized": dtype != "uint8",
            "image_mean": np.zeros(3, np.float32),
            "image_std": np.ones(3, np.float32),
        },
    ) as b:
        for _name in names:
            # random content compresses poorly, like photos (conservative)
            if dtype == "uint8":
                b.append((rng.rand(3, 224, 224) * 255).astype(np.uint8))
            else:
                b.append(rng.rand(3, 224, 224).astype(dtype))
    with open(os.path.join(out, "name2idx.json"), "w") as f:
        json.dump({n: i for i, n in enumerate(names)}, f)
    caps = [
        (name, np.asarray([2] + [5] * 20 + [3] + [0] * (sentence_len - 22), np.int64))
        for name in names
    ]
    np.save(
        os.path.join(out, "train_cap.npy"),
        np.asarray([caps, sentence_len], dtype=object),
    )
    return cfg, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=768)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--threads", type=int, nargs="*", default=[0, 4])
    ap.add_argument("--codec", nargs="*", default=["gzip", "lzf"])
    ap.add_argument("--dtype", nargs="*", default=["float16", "uint8"])
    ap.add_argument("--device", action="store_true",
                    help="include jax.device_put in the feeder stage")
    args = ap.parse_args()
    log(f"host cores: {os.cpu_count()}")

    root = tempfile.mkdtemp(prefix="feed_bench_")
    try:
        for codec in args.codec:
            for dtype in args.dtype:
                cfg, names = build_dataset(root, args.images, codec, dtype)
                out_dir = cfg.data.dict_path
                sz = sum(
                    os.path.getsize(os.path.join(out_dir, f))
                    for f in os.listdir(out_dir)
                    if ".hdf5" in f
                )
                log(f"--- {codec}/{dtype}: {sz / args.images / 1e3:.0f} KB/img")

                reader = DataReader(cfg)
                reader.init_hdf5()

                def read_all():
                    for name in names:
                        reader._hdf5.read(name)

                read_all()  # warm page cache
                t0 = time.time()
                read_all()
                log(f"  read (1 thread): {args.images / (time.time() - t0):.0f} img/s")

                for k in args.threads:
                    if not k:
                        continue
                    pr = hdf5_mod.ParallelHdf5Reader(
                        list(cfg.data.h5_path), cfg.data.h5_name2idx, threads=k
                    )

                    def read_par():
                        for i in range(0, len(names), args.batch):
                            pr.read_batch(names[i : i + args.batch])

                    read_par()
                    t0 = time.time()
                    read_par()
                    log(f"  read ({k} threads): {args.images / (time.time() - t0):.0f} img/s")
                    pr.close()

                for k in args.threads:
                    for dc in (False, True):
                        feeder = PrefetchingFeeder(
                            reader.get_reader(
                                args.batch, "train", keep_float16=True,
                                reader_threads=k,
                            ),
                            capacity=8,
                            device_put=args.device,
                            image_norm=reader.storage_norm,
                            device_convert=dc,
                        )

                        def drain():
                            n = 0
                            for imgs, _caps in feeder:
                                n += imgs.shape[0]
                            return n

                        drain()
                        t0 = time.time()
                        n = drain()
                        label = "device-convert" if dc else "host-convert"
                        log(f"  feeder ({label}, reader_threads={k}, "
                            f"device_put={args.device}): "
                            f"{n / (time.time() - t0):.0f} img/s")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
