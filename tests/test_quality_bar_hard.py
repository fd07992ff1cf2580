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

Round 5 additions (VERDICT r4 #3/#6): the full arm is a module fixture
shared across tests (one training, several consumers), a transformer-family
arm trains on the same corpus, and the approximate serving modes (int8,
int8+quantize_kv) are band-tested against their own trained bundles —
BENCH's advertised modes each have a quality number that fails on silent
degradation.
"""

import json

import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
from myimagecaptioningmodel_tpu.training import loop

pytestmark = [pytest.mark.slow, pytest.mark.quality]

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


def _cfg(root, ds, img_dir, ann, hidden, emb, tag, arch=None, lr=2e-3,
         epochs=EPOCHS):
    decoder = {
        "vocab_size": 0,
        "embedding_size": emb,
        "sentence_length": 0,
        "hidden_dim": hidden,
        "infer_max_length": 10,
    }
    if arch == "transformer":
        # recipe probed on this corpus (round 5): lr 1e-3 reaches dev/test
        # BLEU-4 = 1.0 (dev 1.0 from ~epoch 25 of 40); the LSTM's 2e-3
        # overshoots the smaller transformer the same way it did on the
        # 3-class corpus (tests/test_quality_bar.py ARCHS note)
        decoder.update(
            {"arch": "transformer", "num_layers": 2, "num_heads": 4,
             "mlp_ratio": 2}
        )
        lr = 1e-3
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
                "learning_rate": lr,
                "batch_size": 16,
                "max_epoch": epochs,
                "lr_decay_strategy": "cosine_decay",
                "decay_epoch": epochs,
                "log_every_n_step": 100,
                "checkpoint_path": str(root / f"save_{tag}"),
            },
            "model": {
                "decoder": decoder,
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


def _train(corpus, hidden, emb, tag, arch=None):
    root, ds, img_dir, ann, summary = corpus
    cfg = _cfg(root, ds, img_dir, ann, hidden=hidden, emb=emb, tag=tag,
               arch=arch)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )
    result = loop.train(cfg, mesh=None)
    assert np.isfinite(result["last_epoch_loss"])
    return cfg


def _bleu4(cfg, **kw):
    return {
        mode: evaluate_mod.evaluate(cfg, bundle="infer", mode=mode, **kw)[
            "bleu"
        ][3]
        for mode in ("dev", "test")
    }


@pytest.fixture(scope="module")
def full_arm(corpus):
    """The production-capacity LSTM arm, trained ONCE per session and shared
    by the discrimination test and the serving-mode band tests (VERDICT r4
    #6: one trained bundle across arms where soundness allows)."""
    return _train(corpus, hidden=128, emb=32, tag="full")


@pytest.fixture(scope="module")
def transformer_arm(corpus):
    """The transformer-family arm on the same compositional corpus — the
    trained bundle the approximate serving modes (int8 / quantize_kv) are
    band-tested against (VERDICT r4 #3)."""
    return _train(corpus, hidden=128, emb=32, tag="tf", arch="transformer")


def test_compositional_bar_discriminates(corpus, full_arm):
    """Full-capacity model clears the bar; the capacity-crippled mutant —
    trained with the byte-identical recipe on the same corpus — lands well
    below it. A silent quality regression now has a number to fail."""
    full = _bleu4(full_arm)
    for mode in ("dev", "test"):
        assert full[mode] >= 0.9, (mode, full)

    crippled_cfg = _train(corpus, hidden=16, emb=16, tag="crippled")
    crippled = _bleu4(crippled_cfg)
    for mode in ("dev", "test"):
        assert crippled[mode] <= 0.75, (mode, crippled)


def test_int8_band_lstm(full_arm):
    """int8 weight quantization must not move BLEU-4 beyond noise on the
    trained LSTM bundle (reference metric path evaluate.py:57-72). Measured
    round 5: delta == 0.0 on both splits."""
    base = _bleu4(full_arm)
    q = _bleu4(full_arm, quantize=True)
    for mode in ("dev", "test"):
        assert abs(q[mode] - base[mode]) <= 0.02, (mode, base, q)


def test_transformer_bar_and_serving_bands(transformer_arm):
    """The transformer family clears the compositional bar, and every
    serving mode the bench advertises carries a quality band on this
    trained bundle (VERDICT r4 #3):
      - int8 weights: BLEU-4 == full within noise (|delta| <= 0.02);
      - int8 + quantize_kv (approximate by design — per-channel int8
        cross-attention memory): BLEU-4 >= full - 0.05.
    Measured round 5: full = int8 = int8+kv = kv-only = 1.0 on both splits
    (the modes are lossless on this corpus's margins); the asserted bands
    leave room for grid noise without letting a real degradation through.
    On CPU the quantize_kv error model is transformer.quantize_kv_pre — the
    same absmax/127 grid the fused kernel's int8 memory stream uses."""
    base = _bleu4(transformer_arm)
    for mode in ("dev", "test"):
        assert base[mode] >= 0.9, (mode, base)
    q8 = _bleu4(transformer_arm, quantize=True)
    q8kv = _bleu4(transformer_arm, quantize=True, quantize_kv=True)
    for mode in ("dev", "test"):
        assert abs(q8[mode] - base[mode]) <= 0.02, (mode, base, q8)
        assert q8kv[mode] >= base[mode] - 0.05, (mode, base, q8kv)


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
