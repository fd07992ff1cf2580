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


def test_nan_never_poisons_midepoch_checkpoint(tmp_path):
    """A NaN loss landing exactly on a checkpoint step must abort BEFORE the
    rolling checkpoint is overwritten: resume must restart from finite params
    (ADVICE r1: checkpoint-then-NaN-check lost the last good state)."""
    import jax
    import numpy as np

    from myimagecaptioningmodel_tpu.training import checkpoint as ckpt

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    records = []
    for i in range(8):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": ["一个 男人 在 跑步"]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = tmp_path / "ds"
    save = tmp_path / "save"
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
                "learning_rate": 1e18,  # NaN within a few steps
                "batch_size": 2,
                "max_epoch": 3,
                "checkpoint_path": str(save),
                "export_infer_model": False,
                "checkpoint_every_n_steps": 1,  # every step is a ckpt step
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

    ckpt_dir = str(save / "checkpoint")
    if ckpt.checkpoint_exists(ckpt_dir):
        from myimagecaptioningmodel_tpu.models import captioner
        from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
        from myimagecaptioningmodel_tpu.parallel.train_step import make_optimizer
        from myimagecaptioningmodel_tpu.training import lr_schedules

        opts = ModelOptions.from_config(cfg)
        params, state = captioner.init(jax.random.PRNGKey(0), opts)
        optimizer = make_optimizer(cfg, lr_schedules.from_config(cfg))
        params, _, _, _ = ckpt.load_checkpoint(
            ckpt_dir, params, optimizer.init(params), state
        )
        for leaf in jax.tree_util.tree_leaves(params):
            assert np.all(np.isfinite(np.asarray(leaf))), "poisoned checkpoint"
