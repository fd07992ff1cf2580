"""The periodic "Mean loss" log must be the true mean over all steps so far
(reference train.py:145-148; round-2 used an off-by-one denominator that
printed 0.0 on the first log line — VERDICT weak #5)."""

import json
import re

import numpy as np
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.training import loop


def test_mean_loss_log_is_running_mean(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(11)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉"]
    records = []
    for i in range(8):
        name = f"img_{i:02d}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": [phrases[i % 2]]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = tmp_path / "ds"
    cfg = config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(ann),
                "output_path": str(out),
                "h5_name2idx": str(out / "name2idx.json"),
            },
            "data": {
                "image_shape": [32, 32],
                "dict_path": str(out),
                "h5_path": [str(out)],
                "h5_name2idx": str(out / "name2idx.json"),
            },
            "train": {
                "seed": 0,
                "batch_size": 2,
                "max_epoch": 1,
                "checkpoint_path": str(tmp_path / "save"),
                "export_infer_model": False,
                "log_every_n_step": 1,
            },
            "model": {
                "decoder": {
                    "vocab_size": 0, "embedding_size": 8,
                    "sentence_length": 0, "hidden_dim": 16,
                    "infer_max_length": 6, "vocab_pad_multiple": 1,
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(tmp_path / "log")},
        }
    )
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )
    loop.train(cfg, mesh=None)

    pat = re.compile(
        r"Step (\d+) Mean loss: ([\d.]+) Step loss: ([\d.]+)"
    )
    steps = []
    with open(tmp_path / "log" / "log.txt", encoding="utf-8") as f:
        for line in f:
            m = pat.search(line)
            if m:
                steps.append((int(m.group(1)), float(m.group(2)), float(m.group(3))))
    assert len(steps) >= 3
    step_losses = [s[2] for s in steps]
    for k, (_n, mean_logged, _step_loss) in enumerate(steps, start=1):
        assert mean_logged > 0.0  # round-2 printed 0.0 on the first line
        np.testing.assert_allclose(
            mean_logged, np.mean(step_losses[:k]), rtol=1e-4
        )
