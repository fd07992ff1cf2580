"""The train loop must abort on NaN loss (reference train.py:140-141) and
must never overwrite the rolling checkpoint with non-finite state."""

import json

import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.training import loop


def _tiny_cfg(tmp_path, n_images=4, **train_overrides):
    """Build a tiny on-disk dataset + config for loop tests."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    records = []
    for i in range(n_images):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": ["一个 男人 在 跑步"]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = tmp_path / "ds"
    train = {
        "seed": 0,
        "learning_rate": 1e18,  # an absurd LR drives the loss to NaN quickly
        "batch_size": 2,
        "max_epoch": 3,
        "checkpoint_path": str(tmp_path / "save"),
        "export_infer_model": False,
    }
    train.update(train_overrides)
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
            "train": train,
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
    return cfg


def _assert_checkpoint_finite(cfg):
    import jax

    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
    from myimagecaptioningmodel_tpu.parallel.train_step import make_optimizer
    from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
    from myimagecaptioningmodel_tpu.training import lr_schedules

    ckpt_dir = cfg.train.checkpoint_path + "/checkpoint"
    if not ckpt.checkpoint_exists(ckpt_dir):
        return
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    optimizer = make_optimizer(cfg, lr_schedules.from_config(cfg))
    params, _, _, _ = ckpt.load_checkpoint(
        ckpt_dir, params, optimizer.init(params), state
    )
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.all(np.isfinite(np.asarray(leaf))), "poisoned checkpoint"


def test_nan_loss_aborts(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    with pytest.raises(FloatingPointError, match="NaN"):
        loop.train(cfg, mesh=None)


def test_nan_never_poisons_midepoch_checkpoint(tmp_path):
    """A NaN landing exactly on a checkpoint step must abort BEFORE the
    rolling checkpoint is overwritten: resume must restart from finite params
    (ADVICE r1: checkpoint-then-NaN-check lost the last good state)."""
    cfg = _tiny_cfg(tmp_path, n_images=8, checkpoint_every_n_steps=1)
    with pytest.raises(FloatingPointError, match="NaN"):
        loop.train(cfg, mesh=None)
    _assert_checkpoint_finite(cfg)


def test_finite_loss_nan_params_never_checkpointed(tmp_path, monkeypatch):
    """The hard case the loss check alone cannot catch: the step's loss is
    computed from the *incoming* params and stays finite while the *updated*
    params (what the checkpoint saves) go NaN in the same step. The guard
    must validate the saved state itself."""
    import jax
    import jax.numpy as jnp

    cfg = _tiny_cfg(
        tmp_path, n_images=8, learning_rate=5e-5, checkpoint_every_n_steps=1
    )

    orig_build = loop.build_steps
    calls = {"n": 0}

    def poisoned_build(*args, **kwargs):
        steps = orig_build(*args, **kwargs)
        orig_ts = steps.train_step

        def train_step(params, opt_state, model_state, step, imgs, caps):
            p2, o2, m2, s2, loss, lr = orig_ts(
                params, opt_state, model_state, step, imgs, caps
            )
            calls["n"] += 1
            if calls["n"] == 2:  # poison post-update params; loss stays finite
                p2 = jax.tree_util.tree_map(lambda x: x * jnp.nan, p2)
            return p2, o2, m2, s2, loss, lr

        return steps._replace(train_step=train_step)

    monkeypatch.setattr(loop, "build_steps", poisoned_build)
    with pytest.raises(FloatingPointError, match="NaN"):
        loop.train(cfg, mesh=None)
    assert calls["n"] == 2  # aborted at the poisoned step's checkpoint guard
    _assert_checkpoint_finite(cfg)
