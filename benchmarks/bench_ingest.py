#!/usr/bin/env python
"""Ingest benchmark (BASELINE.json config #4): JPEG decode -> resize ->
normalize -> float16 gzip HDF5 shards, images/sec, serial vs parallel.

The reference's ingest is single-threaded and processed ~158 img/s
(1.05M images / 6,644.8 s, dataset_gen.py:81). Usage:

    python benchmarks/bench_ingest.py [--images 500] [--workers 0 4]
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import hdf5 as hdf5_mod


def synthesize(img_dir: str, n: int, size: int = 512) -> None:
    rng = np.random.RandomState(0)
    for i in range(n):
        Image.fromarray(
            rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(os.path.join(img_dir, f"img_{i:05d}.jpg"), quality=90)


def run(n_images: int, workers: int, codec: str = "gzip",
        storage_dtype: str = "float16", img_dir: str | None = None) -> dict:
    root = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        out = os.path.join(root, "out")
        if img_dir is None:  # corpus is deterministic; callers may share one
            img_dir = os.path.join(root, "images")
            os.makedirs(img_dir)
            synthesize(img_dir, n_images)
        cfg = config_mod.Config.from_dict(
            {
                "build_dataset": {
                    "image_paths": [img_dir],
                    "output_path": out,
                    "num_workers": workers,
                    "codec": codec,
                    "storage_dtype": storage_dtype,
                },
            }
        )
        summary = hdf5_mod.gen_hdf5(cfg, progress_every=0)
        return {
            "workers": workers,
            "codec": codec,
            "storage_dtype": storage_dtype,
            "images": summary["images"],
            "images_per_sec": round(summary["images_per_sec"], 1),
            "vs_reference_158": round(summary["images_per_sec"] / 158.0, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=300)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, os.cpu_count() or 1])
    ap.add_argument("--codec", nargs="*", default=["gzip"])
    ap.add_argument("--dtype", nargs="*", default=["float16"])
    args = ap.parse_args()
    shared = tempfile.mkdtemp(prefix="ingest_corpus_")
    try:
        synthesize(shared, args.images)
        for codec in args.codec:
            for dtype in args.dtype:
                for w in args.workers:
                    print(json.dumps(
                        run(args.images, w, codec, dtype, img_dir=shared)
                    ))
    finally:
        shutil.rmtree(shared, ignore_errors=True)


if __name__ == "__main__":
    main()
