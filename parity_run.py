#!/usr/bin/env python
"""Turnkey real-data parity run against the reference (VERDICT r3 #8).

Given the AI_Challenger dataset paths (and ideally pkuseg installed, so the
vocabulary matches the reference's published stats — SURVEY §6), this runs
the reference's full workflow end-to-end with this framework and emits a
single machine-readable ``PARITY_REPORT.json``:

    1. offline dataset build (HDF5 shards + segmentation + split + vocab/DBs,
       reference preprocess/dataset_gen.py) — skipped if artifacts exist;
    2. training for ``train.max_epoch`` epochs (reference train.py defaults:
       batch 128, Adam 5e-5, 10 epochs);
    3. offline BLEU-1..4 (+mean) and CIDEr on dev AND test splits
       (reference evaluate.py:57-74);
    4. optionally, import a REFERENCE PaddlePaddle checkpoint
       (``--reference-checkpoint <save_persistables dir>``,
       compat/paddle_import.py), evaluate it through the same metric path,
       and diff its captions against ours on the test split.

Usage (real data):

    python parity_run.py \
        --images /data/ai_challenger/caption_train_images_20170902 \
        --annotations /data/ai_challenger/caption_train_annotations_20170902.json \
        --workdir /data/parity \
        [--config overrides.json] [--epochs 10] \
        [--reference-checkpoint /data/ref/save/checkpoint] \
        [--skip-build] [--report PARITY_REPORT.json]

The report records which segmenter was actually used and compares the built
vocabulary against the reference's published stats (vocab 12295 /
8160 unk types / max_len 35, ai_challenge_tokenizer.py:131) so a jieba or
space fallback is visible as a parity caveat, not a silent divergence.

Smoke-tested on the synthetic corpus in tests/test_parity_run.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

# reference's published build stats (ai_challenge_tokenizer.py:131) — the
# vocabulary parity bar when pkuseg is available
REFERENCE_VOCAB_STATS = {
    "vocab_size": 12295,
    "unk_word_types": 8160,
    "max_len": 35,
}


def log(msg: str) -> None:
    print(f"[parity_run] {msg}", file=sys.stderr, flush=True)


def build_config(args):
    from myimagecaptioningmodel_tpu import config as config_mod

    if args.config:
        cfg = config_mod.Config.from_json_file(args.config)
    else:
        cfg = config_mod.Config()
    ds = os.path.join(args.workdir, "dataset")
    overrides = {
        "build_dataset.output_path": ds,
        "build_dataset.h5_name2idx": os.path.join(ds, "name2idx.json"),
        "data.dict_path": ds,
        "data.h5_path": [ds],
        "data.h5_name2idx": os.path.join(ds, "name2idx.json"),
        "train.checkpoint_path": os.path.join(args.workdir, "save"),
        "log.log_path": os.path.join(args.workdir, "log"),
    }
    if args.images:
        overrides["build_dataset.image_paths"] = [args.images]
    if args.annotations:
        overrides["build_dataset.annotation_path"] = args.annotations
    if args.epochs is not None:
        overrides["train.max_epoch"] = args.epochs
    for path, value in overrides.items():
        cfg = config_mod.replace_nested(cfg, path, value)
    return cfg


def stage_build(cfg, args, report):
    from myimagecaptioningmodel_tpu.data import dataset_gen, segmenter

    meta_path = os.path.join(cfg.build_dataset.output_path, "dataset_meta.json")
    done_marker = os.path.join(cfg.build_dataset.output_path, "word2idx.json")
    if args.skip_build and os.path.exists(done_marker):
        log("build: skipped (artifacts present)")
        report["build"] = {"skipped": True}
        with open(meta_path, encoding="utf-8") as f:
            report["build"]["dataset_meta"] = json.load(f)
        return cfg
    t0 = time.time()
    summary = dataset_gen.build_all(cfg, segmenter=args.segmenter)
    tok = summary["tokenize"]
    built = {
        "seconds": round(time.time() - t0, 1),
        "segmenter": segmenter.get_segmenter(args.segmenter)[0],
        "images": summary["gen_hdf5"].get("images"),
        "vocab_size": tok["vocab_size"],
        "unk_word_types": tok.get("unk_word_types"),
        "max_len": tok["max_len"],
        "reference_stats": REFERENCE_VOCAB_STATS,
        "matches_reference_vocab": (
            tok["vocab_size"] == REFERENCE_VOCAB_STATS["vocab_size"]
            and tok.get("unk_word_types")
            == REFERENCE_VOCAB_STATS["unk_word_types"]
            and tok["max_len"] == REFERENCE_VOCAB_STATS["max_len"]
        ),
    }
    report["build"] = built
    log(
        f"build: vocab {built['vocab_size']} (ref "
        f"{REFERENCE_VOCAB_STATS['vocab_size']}), segmenter "
        f"{built['segmenter']}, matches_reference_vocab="
        f"{built['matches_reference_vocab']}"
    )
    return cfg


def sync_model_dims(cfg):
    """Pin vocab/sentence dims from the build artifacts (like the reference,
    whose config hardcodes the published numbers)."""
    from myimagecaptioningmodel_tpu import config as config_mod

    with open(
        os.path.join(cfg.data.dict_path, "word2idx.json"), encoding="utf-8"
    ) as f:
        vocab_size = len(json.load(f))
    import numpy as np

    db = np.load(
        os.path.join(cfg.data.dict_path, "train_cap.npy"), allow_pickle=True
    )
    max_len = int(db[1])
    cfg = config_mod.replace_nested(cfg, "model.decoder.vocab_size", vocab_size)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", max_len
    )
    if cfg.model.decoder.infer_max_length < max_len:
        cfg = config_mod.replace_nested(
            cfg, "model.decoder.infer_max_length", max_len
        )
    return cfg


def stage_train(cfg, args, report):
    from myimagecaptioningmodel_tpu.training import loop

    t0 = time.time()
    result = loop.train(cfg, mesh=args.mesh)
    report["train"] = {
        "seconds": round(time.time() - t0, 1),
        "epochs": cfg.train.max_epoch,
        "final_step": result.get("final_step"),
        "last_epoch_loss": result.get("last_epoch_loss"),
        "best_bleu": result.get("best_bleu"),
    }
    log(f"train: {report['train']}")


def stage_evaluate(cfg, report, bundle="infer", key="evaluate"):
    from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod

    out = {}
    for mode in ("dev", "test"):
        t0 = time.time()
        res = evaluate_mod.evaluate(cfg, bundle=bundle, mode=mode)
        out[mode] = {
            "bleu": [round(b, 5) for b in res["bleu"]],
            "cider": round(res["cider"], 5),
            "distinct_sentences": res.get("distinct_sentences"),
            "seconds": round(time.time() - t0, 1),
        }
        log(f"{key}[{bundle}] {mode}: bleu={out[mode]['bleu']} "
            f"cider={out[mode]['cider']}")
    report[key] = out


def _decode_captions(cfg, bundle, limit):
    """Greedy captions (as sentences) for the first ``limit`` test images."""
    import jax
    import numpy as np

    from myimagecaptioningmodel_tpu.data import reader as reader_mod
    from myimagecaptioningmodel_tpu.evaluation import metrics
    from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle

    params, state, _bcfg, opts, decode = load_bundle(cfg, bundle)
    dr = reader_mod.DataReader(cfg)
    dr.init_hdf5()
    out = []
    rdr = dr.get_reader(min(limit, cfg.train.batch_size), "test")
    for batch in rdr():
        imgs, _refs = reader_mod.as_image_batch(batch)
        ids = np.asarray(jax.device_get(decode(params, state, imgs)))
        for row in ids.tolist():
            words = metrics.filter_ids(
                row, dr.index_word, cfg.data.stop_idx, cfg.data.padding_idx
            )
            out.append(metrics.words2sentence(words))
            if len(out) >= limit:
                return out
    return out


def stage_reference_import(cfg, args, report):
    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.compat import paddle_import
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
    from myimagecaptioningmodel_tpu.training import checkpoint

    # parity_mode reproduces the reference's degenerate-attention captions
    cfg_ref = config_mod.replace_nested(cfg, "model.parity_mode", True)
    opts = ModelOptions.from_config(cfg_ref)
    t0 = time.time()
    params, state, rep = paddle_import.import_persistables(
        args.reference_checkpoint, opts
    )
    bundle_dir = os.path.join(cfg.train.checkpoint_path, "infer_reference")
    checkpoint.export_inference_bundle(
        bundle_dir, params, state, cfg_ref, vocab_src_dir=cfg.data.dict_path
    )
    report["reference_import"] = {
        "seconds": round(time.time() - t0, 1),
        "checkpoint": args.reference_checkpoint,
        "summary": rep.summary(),
        "missing": list(rep.missing),
        "unknown": list(rep.unknown)[:20],
    }
    log(f"reference import: {rep.summary()}")
    stage_evaluate(cfg_ref, report, bundle="infer_reference",
                   key="evaluate_reference")
    # caption diff: ours vs the imported reference model on test images
    n = args.diff_captions
    ours = _decode_captions(cfg, "infer", n)
    theirs = _decode_captions(cfg_ref, "infer_reference", n)
    same = sum(a == b for a, b in zip(ours, theirs))
    report["caption_diff"] = {
        "compared": min(len(ours), len(theirs)),
        "identical": same,
        "examples": [
            {"ours": a, "reference": b}
            for a, b in list(zip(ours, theirs))[:10]
        ],
    }
    log(f"caption diff: {same}/{min(len(ours), len(theirs))} identical")


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--images", default=None,
                    help="AI_Challenger image directory")
    ap.add_argument("--annotations", default=None,
                    help="caption annotations JSON")
    ap.add_argument("--workdir", required=True,
                    help="output root (dataset/, save/, log/)")
    ap.add_argument("--config", default=None,
                    help="JSON config overriding the production defaults")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--segmenter", default="auto",
                    help="auto|pkuseg|jieba|space (auto prefers pkuseg)")
    ap.add_argument("--skip-build", action="store_true",
                    help="reuse existing dataset artifacts in workdir")
    ap.add_argument("--skip-train", action="store_true",
                    help="evaluate an existing checkpoint only")
    ap.add_argument("--reference-checkpoint", default=None,
                    help="reference save_persistables dir to import + diff")
    ap.add_argument("--diff-captions", type=int, default=256,
                    help="test images for the caption diff")
    ap.add_argument("--mesh", default=None,
                    help='pass "auto" for multi-chip data parallelism')
    ap.add_argument("--report", default=None,
                    help="report path (default <workdir>/PARITY_REPORT.json)")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    report: dict = {
        "command": " ".join(sys.argv),
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    cfg = build_config(args)
    cfg = stage_build(cfg, args, report)
    cfg = sync_model_dims(cfg)
    if not args.skip_train:
        stage_train(cfg, args, report)
    stage_evaluate(cfg, report)
    if args.reference_checkpoint:
        stage_reference_import(cfg, args, report)

    path = args.report or os.path.join(args.workdir, "PARITY_REPORT.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(report, f, ensure_ascii=False, indent=2)
    log(f"wrote {path}")
    return report


if __name__ == "__main__":
    main()
