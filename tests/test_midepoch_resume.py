"""Mid-epoch crash-resume: fault-inject a crash between step checkpoints and
verify the resumed run reproduces the uninterrupted run exactly (the
reference loses mid-epoch progress — SURVEY §5.3)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
from myimagecaptioningmodel_tpu.training import loop


def make_cfg(root, img_dir, ann, suffix, every_n):
    out = root / "dataset"
    return config_mod.Config.from_dict(
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
                "learning_rate": 1e-3,
                "batch_size": 2,
                "max_epoch": 1,
                "checkpoint_path": str(root / suffix / "save"),
                "export_infer_model": False,
                "checkpoint_every_n_steps": every_n,
            },
            "model": {
                "decoder": {
                    "vocab_size": 0, "embedding_size": 8,
                    "sentence_length": 0, "hidden_dim": 16,
                    "infer_max_length": 6, "vocab_pad_multiple": 1,
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(root / suffix / "log")},
        }
    )


def patch(cfg, summary):
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    return config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )


def test_midepoch_crash_resume_equivalence(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉", "一个 女人 在 跑步"]
    records = []
    for i in range(12):
        name = f"img_{i:02d}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": [phrases[i % 3]]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    base = make_cfg(tmp_path, img_dir, ann, "base", every_n=2)
    summary = dataset_gen.build_all(base, segmenter="space", split_seed=0)

    # A: uninterrupted 1-epoch run
    cfgA = patch(make_cfg(tmp_path, img_dir, ann, "runA", every_n=2), summary)
    loop.train(cfgA, mesh=None)

    # B: crash right after the step-4 checkpoint, then resume
    cfgB = patch(make_cfg(tmp_path, img_dir, ann, "runB", every_n=2), summary)
    with pytest.raises(RuntimeError, match="fault injection"):
        loop.train(cfgB, mesh=None, fault_injection_step=4)
    meta_path = os.path.join(cfgB.train.checkpoint_path, "checkpoint", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["mid_epoch_batches"] == 4 and meta["next_epoch"] == 1

    loop.train(cfgB, mesh=None)  # resumes mid-epoch, finishes epoch 1

    opts = ModelOptions.from_config(cfgA)
    like_p, like_s = captioner.init(jax.random.PRNGKey(0), opts)
    import optax
    from myimagecaptioningmodel_tpu.parallel.train_step import make_optimizer
    from myimagecaptioningmodel_tpu.training import lr_schedules

    tx = make_optimizer(cfgA, lr_schedules.from_config(cfgA))
    like_o = tx.init(like_p)
    pA, oA, sA, mA = ckpt.load_checkpoint(
        os.path.join(cfgA.train.checkpoint_path, "checkpoint"), like_p, like_o, like_s
    )
    pB, oB, sB, mB = ckpt.load_checkpoint(
        os.path.join(cfgB.train.checkpoint_path, "checkpoint"), like_p, like_o, like_s
    )
    assert mA["step"] == mB["step"]
    for a, b in zip(jax.tree_util.tree_leaves(pA), jax.tree_util.tree_leaves(pB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(oA), jax.tree_util.tree_leaves(oB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
