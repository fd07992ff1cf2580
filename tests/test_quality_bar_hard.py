"""Discriminating pipeline quality bar (VERDICT r3 #4): a 25-class
COMPOSITIONAL corpus where degraded-but-not-broken models land measurably
below the bar, closing the hole in the 3-class memorization bar
(tests/test_quality_bar.py), which a capacity-crippled model still aces.

Corpus: 48x48 images; the LEFT half's color encodes one of 5 subjects, the
RIGHT half's color (a disjoint palette) one of 5 activities; captions are
the composition "一个 {subject} 在 {activity}" — 25 classes, 10 images
each. Solving it requires representing BOTH attributes at once: round-3/4
probing showed small models collapse to one attribute (the centroid-probe
experiment in benchmarks/quality_bar_notes.md), which is exactly the
degradation mode this bar detects.

Discrimination is asserted in-suite: the production-capacity model must
clear dev AND test BLEU-4 >= 0.9 through the full build->train->export->
evaluate() path (reference metric path: evaluate.py:57-72), while a
deliberately capacity-crippled mutant (hidden 16 / emb 16 — a stand-in
for any silent quality regression) trained with the IDENTICAL recipe must
land BELOW 0.75 on the same corpus (measured: BLEU-4 0.39 dev / 0.16
test). The same mutant passes the old 3-class bar at BLEU 1.0 — probed
capacity sweep in benchmarks/quality_bar_notes.md — so this corpus is
strictly more sensitive.

Both arms run the thin encoder (``model.encoder_scale = 0.35`` — the
reference MobileNetV2.py:24 width multiplier), which keeps the CPU cost of
the suite bounded and exercises the scaled-encoder path end-to-end.
"""

import json

import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
from myimagecaptioningmodel_tpu.training import loop

SUBJECTS = [
    ((230, 40, 40), "男人"),
    ((40, 230, 40), "女人"),
    ((40, 40, 230), "猫"),
    ((230, 230, 40), "狗"),
    ((230, 40, 230), "孩子"),
]
ACTIVITIES = [
    ((40, 230, 230), "打 篮球"),
    ((255, 255, 255), "睡觉"),
    ((20, 20, 20), "跑步"),
    ((255, 140, 20), "吃 饭"),
    ((120, 60, 200), "看 书"),
]
N_IMAGES = 250
NOISE = 25
EPOCHS = 40


def _make_corpus(root):
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    records = []
    for i in range(N_IMAGES):
        (sc, subj) = SUBJECTS[i % 5]
        (ac, act) = ACTIVITIES[(i // 5) % 5]
        S = 48
        arr = np.zeros((S, S, 3), np.int16)
        arr[:, : S // 2] = np.asarray(sc, np.int16)[None, None, :]
        arr[:, S // 2 :] = np.asarray(ac, np.int16)[None, None, :]
        arr = arr + rng.randint(-NOISE, NOISE + 1, (S, S, 3))
        arr = np.clip(arr, 0, 255).astype(np.uint8)
        name = f"img_{i:04d}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=95)
        records.append({"image_id": name, "caption": [f"一个 {subj} 在 {act}"]})
    ann = root / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")
    return img_dir, ann


def _cfg(root, ds, img_dir, ann, hidden, emb, tag):
    return config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(ann),
                "output_path": str(ds),
                "h5_name2idx": str(ds / "name2idx.json"),
            },
            "data": {
                "image_shape": [48, 48],
                "dict_path": str(ds),
                "h5_path": [str(ds)],
                "h5_name2idx": str(ds / "name2idx.json"),
                "sample_count": N_IMAGES,
            },
            "train": {
                "seed": 0,
                "learning_rate": 2e-3,
                "batch_size": 16,
                "max_epoch": EPOCHS,
                "lr_decay_strategy": "cosine_decay",
                "decay_epoch": EPOCHS,
                "log_every_n_step": 100,
                "checkpoint_path": str(root / f"save_{tag}"),
            },
            "model": {
                "decoder": {
                    "vocab_size": 0,
                    "embedding_size": emb,
                    "sentence_length": 0,
                    "hidden_dim": hidden,
                    "infer_max_length": 10,
                },
                "compute_dtype": "float32",
                "encoder_scale": 0.35,
            },
            "log": {"log_path": str(root / f"log_{tag}")},
        }
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("quality_hard")
    img_dir, ann = _make_corpus(root)
    ds = root / "ds"
    cfg0 = _cfg(root, ds, img_dir, ann, hidden=128, emb=32, tag="probe")
    summary = dataset_gen.build_all(cfg0, segmenter="space", split_seed=0)
    return root, ds, img_dir, ann, summary


def _train_and_eval(corpus, hidden, emb, tag):
    root, ds, img_dir, ann, summary = corpus
    cfg = _cfg(root, ds, img_dir, ann, hidden=hidden, emb=emb, tag=tag)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )
    result = loop.train(cfg, mesh=None)
    assert np.isfinite(result["last_epoch_loss"])
    out = {}
    for mode in ("dev", "test"):
        res = evaluate_mod.evaluate(cfg, bundle="infer", mode=mode)
        out[mode] = res["bleu"]
    return out


def test_compositional_bar_discriminates(corpus):
    """Full-capacity model clears the bar; the capacity-crippled mutant —
    trained with the byte-identical recipe on the same corpus — lands well
    below it. A silent quality regression now has a number to fail."""
    full = _train_and_eval(corpus, hidden=128, emb=32, tag="full")
    for mode in ("dev", "test"):
        assert full[mode][3] >= 0.9, (mode, full)

    crippled = _train_and_eval(corpus, hidden=16, emb=16, tag="crippled")
    for mode in ("dev", "test"):
        assert crippled[mode][3] <= 0.75, (mode, crippled)


def test_crippled_mutant_passes_old_bar(tmp_path):
    """The SAME capacity cut (hidden 16 / emb 16), applied to the old
    3-class bar's EXACT recipe (tests/test_quality_bar.py: 32x32,
    full-width encoder, lr 8e-3, 50 epochs), still clears that bar — so the
    old bar cannot detect this degradation and the compositional bar is
    strictly more sensitive (the discrimination claim of VERDICT r3 #4)."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(23)
    three = [
        (SUBJECTS[0][0], "一个 男人 在 打 篮球"),
        (SUBJECTS[2][0], "一只 猫 在 睡觉"),
        (SUBJECTS[1][0], "一个 女人 在 跑步"),
    ]
    records = []
    for i in range(24):
        color, phrase = three[i % 3]
        arr = np.clip(
            np.asarray(color, np.int16)[None, None, :]
            + rng.randint(-15, 15, (48, 48, 3)),
            0, 255,
        ).astype(np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=95)
        records.append({"image_id": name, "caption": [phrase]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")
    ds = tmp_path / "ds"
    cfg = config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(ann),
                "output_path": str(ds),
                "h5_name2idx": str(ds / "name2idx.json"),
            },
            "data": {
                "image_shape": [32, 32],
                "dict_path": str(ds),
                "h5_path": [str(ds)],
                "h5_name2idx": str(ds / "name2idx.json"),
                "sample_count": 24,
            },
            "train": {
                "seed": 0,
                "learning_rate": 8e-3,
                "batch_size": 4,
                "max_epoch": 50,
                "lr_decay_strategy": "cosine_decay",
                "decay_epoch": 50,
                "log_every_n_step": 50,
                "checkpoint_path": str(tmp_path / "save_old3"),
            },
            "model": {
                "decoder": {
                    "vocab_size": 0, "embedding_size": 16,
                    "sentence_length": 0, "hidden_dim": 16,
                    "infer_max_length": 8,
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(tmp_path / "log_old3")},
        }
    )
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )
    result = loop.train(cfg, mesh=None)
    assert np.isfinite(result["last_epoch_loss"])
    for mode in ("dev", "test"):
        res = evaluate_mod.evaluate(cfg, bundle="infer", mode=mode)
        assert res["bleu"][3] >= 0.9, (mode, res["bleu"])
