"""Smoke test of the turnkey parity kit (parity_run.py, VERDICT r3 #8):
the build -> train -> evaluate orchestration runs end-to-end on a tiny
synthetic corpus and emits a well-formed PARITY_REPORT.json. (The
reference-checkpoint import stage's machinery is covered separately by
tests/test_paddle_import.py; real AI_Challenger data and pkuseg are not
available in this environment — ROADMAP #1.)"""

import json
import os

import numpy as np
import pytest
from PIL import Image

import parity_run


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("parity_smoke")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉"]
    records = []
    for i in range(16):
        name = f"img_{i:02d}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(img_dir / name)
        records.append({"image_id": name, "caption": [phrases[i % 2]]})
    ann = root / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")
    cfg_json = root / "tiny.json"
    cfg_json.write_text(
        json.dumps(
            {
                "data": {"image_shape": [32, 32], "sample_count": 16},
                "train": {"seed": 0, "batch_size": 4},
                "model": {
                    "decoder": {
                        "vocab_size": 0, "embedding_size": 8,
                        "sentence_length": 0, "hidden_dim": 16,
                        "infer_max_length": 6, "vocab_pad_multiple": 8,
                    },
                    "compute_dtype": "float32",
                },
            }
        ),
        encoding="utf-8",
    )
    return root, img_dir, ann, cfg_json


def test_parity_run_end_to_end(corpus, tmp_path):
    root, img_dir, ann, cfg_json = corpus
    workdir = str(tmp_path / "run")
    report = parity_run.main(
        [
            "--images", str(img_dir),
            "--annotations", str(ann),
            "--workdir", workdir,
            "--config", str(cfg_json),
            "--epochs", "2",
            "--segmenter", "space",
        ]
    )
    # report written and well-formed
    path = os.path.join(workdir, "PARITY_REPORT.json")
    with open(path, encoding="utf-8") as f:
        on_disk = json.load(f)
    assert on_disk.keys() == report.keys()
    # build stage: vocab stats recorded and compared to the published bar
    assert report["build"]["segmenter"] == "space"
    assert report["build"]["vocab_size"] > 4
    assert report["build"]["matches_reference_vocab"] is False
    assert report["build"]["reference_stats"]["vocab_size"] == 12295
    # train stage ran
    assert report["train"]["final_step"] > 0
    assert report["train"]["epochs"] == 2
    # evaluation on both splits through the real evaluate() path
    for mode in ("dev", "test"):
        ev = report["evaluate"][mode]
        assert len(ev["bleu"]) == 5
        assert all(0.0 <= b <= 1.0 for b in ev["bleu"])
        assert ev["cider"] >= 0.0

    # re-entry: --skip-build --skip-train reuses the artifacts (the
    # idempotence a long real-data session needs after a crash)
    report2 = parity_run.main(
        [
            "--images", str(img_dir),
            "--annotations", str(ann),
            "--workdir", workdir,
            "--config", str(cfg_json),
            "--skip-build", "--skip-train",
            "--segmenter", "space",
        ]
    )
    assert report2["build"]["skipped"] is True
    assert "train" not in report2
    assert report2["evaluate"]["test"]["bleu"] == report["evaluate"]["test"]["bleu"]
