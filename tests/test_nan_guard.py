"""The train loop must abort on NaN loss (reference train.py:140-141)."""

import json

import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.training import loop


def test_nan_loss_aborts(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    records = []
    for i in range(4):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": ["一个 男人 在 跑步"]})
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
                # an absurd LR drives the loss to NaN within a few steps
                "learning_rate": 1e18,
                "batch_size": 2,
                "max_epoch": 3,
                "checkpoint_path": str(tmp_path / "save"),
                "export_infer_model": False,
            },
            "model": {
                "decoder": {
                    "vocab_size": 16,
                    "embedding_size": 8,
                    "sentence_length": 6,
                    "hidden_dim": 16,
                    "infer_max_length": 6,
                    "vocab_pad_multiple": 1,
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
    with pytest.raises(FloatingPointError, match="NaN"):
        loop.train(cfg, mesh=None)
