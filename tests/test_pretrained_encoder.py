"""Pretrained-encoder partial load through the training loop
(reference train.py:96-99 + util.get_predicate)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.models import captioner, mobilenet_v2
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.parallel.distributed import host_local_slice
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
from myimagecaptioningmodel_tpu.training import loop


def test_pretrained_encoder_loaded_on_first_init(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    records = []
    for i in range(4):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": ["一个 人 在 散步"]})
    (tmp_path / "ann.json").write_text(
        json.dumps(records, ensure_ascii=False), encoding="utf-8"
    )

    # "pretrained" encoder = a fresh init from a distinctive key
    pretrained, _ = mobilenet_v2.init(jax.random.PRNGKey(42))
    enc_path = str(tmp_path / "pretrained_encoder.msgpack")
    ckpt.save_params(enc_path, pretrained)

    out = tmp_path / "ds"
    cfg = config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(tmp_path / "ann.json"),
                "output_path": str(out),
                "h5_name2idx": str(out / "name2idx.json"),
            },
            "data": {
                "image_shape": [32, 32],
                "dict_path": str(out),
                "h5_path": [str(out)],
                "h5_name2idx": str(out / "name2idx.json"),
                "pretrained_mobilenet_path": enc_path,
            },
            "train": {
                "seed": 0,
                "learning_rate": 0.0,  # freeze values: loaded == final
                "batch_size": 2,
                "max_epoch": 1,
                "checkpoint_path": str(tmp_path / "save"),
                "export_infer_model": False,
            },
            "model": {
                "encoder": {"encoder_trainable": False},
                "decoder": {
                    "vocab_size": 16, "embedding_size": 8,
                    "sentence_length": 6, "hidden_dim": 16,
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

    opts = ModelOptions.from_config(cfg)
    like_p, like_s = captioner.init(jax.random.PRNGKey(0), opts)
    p, _o, _s, _m = ckpt.load_checkpoint(
        os.path.join(cfg.train.checkpoint_path, "checkpoint"),
        like_p, {}, like_s,
    )
    # conv weights must equal the pretrained ones (lr=0, frozen encoder)
    got = np.asarray(p["encoder"]["conv1_1"]["conv"]["w"])
    want = np.asarray(pretrained["conv1_1"]["conv"]["w"])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_host_local_slice_partitions():
    # single-process: the whole range
    start, size = host_local_slice(10)
    assert (start, size) == (0, 10)
