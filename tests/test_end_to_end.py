"""Golden end-to-end: synthetic dataset -> train 2 epochs -> export ->
evaluate -> infer -> crash-resume equivalence (SURVEY §4)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
from myimagecaptioningmodel_tpu.inference import infer as infer_mod
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
from myimagecaptioningmodel_tpu.training import loop


def build_corpus(root, n_images=16):
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    phrases = [
        "一个 男人 在 打 篮球",
        "一只 猫 在 睡觉",
        "一个 女人 在 跑步",
        "两个 孩子 在 公园 玩耍",
    ]
    records = []
    for i in range(n_images):
        name = f"img_{i:03d}.jpg"
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append(
            {"image_id": name, "caption": [phrases[i % 4], phrases[(i + 2) % 4]]}
        )
    ann = root / "annotations.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")
    return img_dir, ann


def make_cfg(root, img_dir, ann, workdir_suffix="run", max_epoch=2):
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
                "sample_count": 32,
            },
            "train": {
                "seed": 0,
                "learning_rate": 1e-3,
                "batch_size": 4,
                "max_epoch": max_epoch,
                "log_every_n_step": 2,
                "checkpoint_path": str(root / workdir_suffix / "save"),
                "checkpoint_backup_every_n_epoch": 2,
                "export_params": True,
                "data_loader_capacity": 4,
            },
            "model": {
                "decoder": {
                    "vocab_size": 0,  # patched after dataset build
                    "embedding_size": 8,
                    "sentence_length": 0,  # patched after dataset build
                    "hidden_dim": 16,
                    "infer_max_length": 8,
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(root / workdir_suffix / "log")},
        }
    )


def patch_vocab(cfg, summary):
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    return config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    img_dir, ann = build_corpus(root)
    cfg = make_cfg(root, img_dir, ann)
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    return root, img_dir, ann, summary


@pytest.fixture(scope="module")
def trained(corpus):
    root, img_dir, ann, summary = corpus
    cfg = patch_vocab(make_cfg(root, img_dir, ann, "runA"), {"tokenize": summary["tokenize"]})
    result = loop.train(cfg, mesh=None)
    return cfg, result


def test_train_completes_and_saves(trained):
    cfg, result = trained
    assert result["epochs"] == 2
    assert result["final_step"] > 0
    p = cfg.train.checkpoint_path
    assert ckpt.checkpoint_exists(os.path.join(p, "checkpoint"))
    assert ckpt.checkpoint_exists(os.path.join(p, "checkpoint2"))  # backup @2
    assert os.path.exists(os.path.join(p, "params", ckpt.PARAMS_FILE))
    assert os.path.exists(os.path.join(p, "infer", ckpt.PARAMS_FILE))
    assert os.path.exists(os.path.join(p, "infer", "config.json"))
    assert os.path.exists(os.path.join(p, "infer", "word_dict.npy"))
    # logger run-state file (reference <log>/config contract)
    with open(os.path.join(cfg.log.log_path, "config")) as f:
        conf = json.load(f)
    assert conf["epoch"] == 2
    assert os.path.exists(os.path.join(cfg.log.log_path, "log.txt"))


def test_evaluate_from_bundle(trained):
    cfg, _ = trained
    result = evaluate_mod.evaluate(cfg, bundle="infer", mode="test")
    assert len(result["bleu"]) == 5
    assert all(0.0 <= b <= 1.0 for b in result["bleu"])
    assert result["distinct_sentences"] is not None
    assert result["cider"] >= 0.0


def test_evaluate_with_beam(trained):
    cfg, _ = trained
    result = evaluate_mod.evaluate(cfg, bundle="infer", mode="test", beam_size=3)
    assert len(result["bleu"]) == 5


def test_infer_single_image(trained, corpus):
    cfg, _ = trained
    _root, img_dir, _ann, _ = corpus
    img_path = os.path.join(str(img_dir), "img_000.jpg")
    ids, sentence = infer_mod.caption_image(cfg, infer_mod.fetch_image(img_path))
    assert len(ids) == cfg.model.decoder.infer_max_length
    assert isinstance(sentence, str)


def test_batch_caption_directory(trained, corpus, tmp_path):
    from myimagecaptioningmodel_tpu.inference.batch_caption import caption_directory

    cfg, _ = trained
    _root, img_dir, _ann, _ = corpus
    out = tmp_path / "captions.jsonl"
    results = caption_directory(cfg, str(img_dir), str(out), batch_size=4)
    assert len(results) == 16
    assert all("caption" in r or "error" in r for r in results)
    lines = out.read_text(encoding="utf-8").strip().split("\n")
    assert len(lines) == 16
    rec = json.loads(lines[0])
    assert set(rec) >= {"image", "ids", "caption"}


def test_resume_equivalence(corpus, trained):
    """Train 1 epoch, stop, resume for epoch 2 -> identical params to the
    uninterrupted 2-epoch run (epoch-granular crash-resume, SURVEY §5.3)."""
    root, img_dir, ann, summary = corpus
    cfgA, _ = trained  # uninterrupted 2-epoch run

    cfgB1 = patch_vocab(
        make_cfg(root, img_dir, ann, "runB", max_epoch=1), {"tokenize": summary["tokenize"]}
    )
    loop.train(cfgB1, mesh=None)
    cfgB2 = patch_vocab(
        make_cfg(root, img_dir, ann, "runB", max_epoch=2), {"tokenize": summary["tokenize"]}
    )
    resB = loop.train(cfgB2, mesh=None)  # resumes from epoch 2
    assert resB["final_step"] > 0

    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    opts = ModelOptions.from_config(cfgA)
    like_p, like_s = captioner.init(jax.random.PRNGKey(0), opts)
    pA, sA, _cfg = ckpt.load_inference_bundle(
        os.path.join(cfgA.train.checkpoint_path, "infer"), like_p, like_s
    )
    pB, sB, _cfg = ckpt.load_inference_bundle(
        os.path.join(cfgB2.train.checkpoint_path, "infer"), like_p, like_s
    )
    for a, b in zip(jax.tree_util.tree_leaves(pA), jax.tree_util.tree_leaves(pB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sA), jax.tree_util.tree_leaves(sB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_evaluate_quantized(trained):
    cfg, _ = trained
    result = evaluate_mod.evaluate(cfg, bundle="infer", mode="test", quantize=True)
    assert len(result["bleu"]) == 5
