"""End-to-end training-loop test on the 8-device CPU mesh: the full driver
path (feeder sharding, DP train step, dev eval, checkpointing) under data
parallelism — not just the jitted step (SURVEY §4 distributed strategy)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
from myimagecaptioningmodel_tpu.training import loop


def test_train_loop_on_8_device_mesh(tmp_path):
    assert len(jax.devices()) == 8
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(9)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉"]
    records = []
    for i in range(16):
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
                "batch_size": 8,  # divides the 8-device data axis
                "max_epoch": 1,
                "checkpoint_path": str(tmp_path / "save"),
            },
            "model": {
                "decoder": {
                    "vocab_size": 0, "embedding_size": 8,
                    "sentence_length": 0, "hidden_dim": 16,
                    "infer_max_length": 6, "vocab_pad_multiple": 8,
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

    mesh = mesh_mod.make_mesh()  # (8, 1)
    result = loop.train(cfg, mesh=mesh)
    assert result["final_step"] > 0
    assert ckpt.checkpoint_exists(os.path.join(cfg.train.checkpoint_path, "checkpoint"))
    # 'auto' should pick the same mesh (batch 8 % 8 devices == 0) and resume cleanly
    result2 = loop.train(cfg, mesh="auto")
    assert result2["final_step"] == result["final_step"]  # max_epoch reached: no new steps

    # multi-chip evaluation (SURVEY config #5): batch sharded over the mesh
    from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod

    # tiny per-shard batch intentionally misses the fused-kernel gate —
    # the loader must say so (and still produce identical metrics)
    with pytest.warns(UserWarning, match="fused-kernel gate"):
        res_dp = evaluate_mod.evaluate(
            cfg, bundle="infer", mode="test", mesh=mesh
        )
    res_1d = evaluate_mod.evaluate(cfg, bundle="infer", mode="test")
    assert res_dp["bleu"] == pytest.approx(res_1d["bleu"], abs=1e-6)
    assert res_dp["cider"] == pytest.approx(res_1d["cider"], abs=1e-6)

    # non-degenerate geometry (VERDICT r3 #7): global batch 64 -> per-shard
    # batch 8 on the 8-device mesh PASSES the fused-kernel gate, so the
    # degenerate-geometry warning must NOT fire — and the sharded metrics
    # must still match a single-device run at the same batch size
    # (evaluate pads the short final batch internally either way).
    import warnings as warnings_mod

    cfg64 = config_mod.replace_nested(cfg, "train.batch_size", 64)
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        res_dp64 = evaluate_mod.evaluate(
            cfg64, bundle="infer", mode="test", mesh=mesh
        )
    gate_warnings = [
        w for w in caught if "fused-kernel gate" in str(w.message)
    ]
    assert not gate_warnings, f"unexpected gate warning: {gate_warnings}"
    res_164 = evaluate_mod.evaluate(cfg64, bundle="infer", mode="test")
    assert res_dp64["bleu"] == pytest.approx(res_164["bleu"], abs=1e-6)
    assert res_dp64["cider"] == pytest.approx(res_164["cider"], abs=1e-6)
