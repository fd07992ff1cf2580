"""Batch captioning: caption a directory of images at full device rate.

The reference serves one image per process invocation (infer.py); this is
the production-shaped path: a prefetching host pipeline (decode/resize on
worker threads) feeding fixed-size device batches through the jitted
greedy/beam decoder, emitting one JSON line per image.

    python -m myimagecaptioningmodel_tpu.inference.batch_caption \
        /path/to/images --out captions.jsonl [--batch 128] [--beam 4]
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

from myimagecaptioningmodel_tpu.data import image as image_mod
from myimagecaptioningmodel_tpu.evaluation import metrics
from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _decode_worker(paths, cfg, out_q, n_threads=4):
    """Decode/normalize images on host threads (PIL releases the GIL)."""
    it = iter(enumerate(paths))
    lock = threading.Lock()

    def work():
        while True:
            with lock:
                try:
                    idx, path = next(it)
                except StopIteration:
                    return
            try:
                arr = image_mod.process_image(
                    image_mod.read_image(path),
                    cfg.data.image_shape, cfg.data.image_mean, cfg.data.image_std,
                )
            except Exception:
                arr = None
            out_q.put((idx, path, arr))

    threads = [threading.Thread(target=work, daemon=True) for _ in range(n_threads)]
    for t in threads:
        t.start()
    return threads


def caption_directory(
    cfg,
    image_dir: str,
    out_path: Optional[str] = None,
    batch_size: int = 128,
    beam_size: int = 0,
    bundle: str = "infer",
    quantize: bool = False,
    early_stop: bool = True,
) -> List[dict]:
    """-> list of {"image": name, "ids": [...], "caption": str} records."""
    from myimagecaptioningmodel_tpu.data.reader import DataReader

    params, model_state, _bcfg, _opts, decode = load_bundle(
        cfg, bundle, beam_size, quantize, early_stop=early_stop
    )
    index_word = DataReader(cfg).index_word

    paths = sorted(
        os.path.join(image_dir, n)
        for n in os.listdir(image_dir)
        if n.lower().endswith(IMAGE_EXTS)
    )
    q: "queue.Queue" = queue.Queue(maxsize=4 * batch_size)
    _decode_worker(paths, cfg, q)

    results: List[Optional[dict]] = [None] * len(paths)
    buf: List[Tuple[int, str, np.ndarray]] = []
    pending = None  # (ids_device, batch_meta) in flight

    def flush(buf):
        metas = [(i, p) for i, p, _ in buf]
        imgs = image_mod.chw_to_nhwc(np.stack([a for _, _, a in buf]))
        if len(buf) < batch_size:
            pad = np.zeros((batch_size - len(buf), *imgs.shape[1:]), imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        return decode(params, model_state, imgs), metas

    def collect(pending):
        ids_dev, metas = pending
        ids = np.asarray(ids_dev)[: len(metas)]
        for (idx, path), row in zip(metas, ids.tolist()):
            words = metrics.filter_ids(
                row, index_word, cfg.data.stop_idx, cfg.data.padding_idx
            )
            results[idx] = {
                "image": os.path.basename(path),
                "ids": row,
                "caption": metrics.words2sentence(words),
            }

    begin = time.time()
    received = 0
    while received < len(paths):
        idx, path, arr = q.get()
        received += 1
        if arr is None:
            results[idx] = {"image": os.path.basename(path), "error": "undecodable"}
            continue
        buf.append((idx, path, arr))
        if len(buf) == batch_size:
            if pending is not None:
                collect(pending)
            pending = flush(buf)
            buf = []
    if buf:
        if pending is not None:
            collect(pending)
        pending = flush(buf)
    if pending is not None:
        collect(pending)

    elapsed = time.time() - begin
    ok = [r for r in results if r is not None]
    print(
        f"captioned {len(ok)} images in {elapsed:.1f}s "
        f"({len(ok) / max(elapsed, 1e-9):.1f} img/s)",
        file=sys.stderr,
    )
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            for r in ok:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return ok


def main() -> None:
    from myimagecaptioningmodel_tpu import config as config_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("--out", default=None, help="output jsonl path")
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--bundle", default="infer")
    ap.add_argument("--quantize", action="store_true",
                    help="int8 decoder weights (4x smaller serving footprint)")
    args = ap.parse_args()
    cfg = (
        config_mod.Config.from_json_file(args.config)
        if args.config
        else config_mod.default
    )
    caption_directory(cfg, args.image_dir, args.out, args.batch, args.beam, args.bundle, args.quantize)


if __name__ == "__main__":
    main()
