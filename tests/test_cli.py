"""Entry-point tests: the reference's CLI surface (train.py / evaluate.py /
infer.py, SURVEY §1 L4) driven as real subprocesses on a tiny corpus."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# strip every TPU/axon var so subprocesses run pure-CPU JAX (the ambient
# sitecustomize would otherwise try to register the tunneled TPU backend)
ENV = {
    k: v
    for k, v in os.environ.items()
    if not (k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU")))
}
ENV.update(
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)


def run_cli(args, timeout=420):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def corpus_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    records = []
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉", "一个 女人 在 跑步"]
    for i in range(8):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": [phrases[i % 3]]})
    (root / "ann.json").write_text(
        json.dumps(records, ensure_ascii=False), encoding="utf-8"
    )
    out = root / "ds"
    cfg = {
        "build_dataset": {
            "image_paths": [str(img_dir)],
            "annotation_path": str(root / "ann.json"),
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
            "checkpoint_path": str(root / "save"),
            "log_every_n_step": 2,
        },
        "model": {
            "decoder": {
                "vocab_size": 0,
                "embedding_size": 8,
                "sentence_length": 0,
                "hidden_dim": 16,
                "infer_max_length": 8,
                "vocab_pad_multiple": 1,
            },
            "compute_dtype": "float32",
        },
        "log": {"log_path": str(root / "log")},
    }

    # offline build (in-process; the CLI module main is covered elsewhere)
    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.data import dataset_gen

    summary = dataset_gen.build_all(
        config_mod.Config.from_dict(cfg), segmenter="space", split_seed=0
    )
    cfg["model"]["decoder"]["vocab_size"] = summary["tokenize"]["vocab_size"]
    cfg["model"]["decoder"]["sentence_length"] = summary["tokenize"]["max_len"]
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    # train via the CLI here so every test below is order-independent
    r = run_cli(["train.py", "--config", str(cfg_path)])
    assert r.returncode == 0, r.stderr[-2000:]
    return root, img_dir, str(cfg_path), r


def test_train_cli(corpus_cfg):
    root, _img, cfg_path, r = corpus_cfg
    assert "Epoch 1" in r.stdout
    assert os.path.exists(root / "save" / "infer" / "params.msgpack")


def test_evaluate_cli(corpus_cfg):
    root, _img, cfg_path, _r = corpus_cfg
    r = run_cli(["evaluate.py", "--config", cfg_path])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "BLEU [" in r.stdout
    assert "CIDEr-D" in r.stdout


def test_infer_cli_local_path(corpus_cfg):
    root, img_dir, cfg_path, _r = corpus_cfg
    img = str(img_dir / "img_0.jpg")
    r = run_cli(["infer.py", img, "--config", cfg_path])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().split("\n") if l]
    assert lines[-2].startswith("[")  # raw id list (reference contract)


def test_dataset_gen_cli(corpus_cfg, tmp_path):
    """Root dataset_gen.py (reference `python ./preprocess/dataset_gen.py`)
    builds all artifacts from a config file."""
    root, img_dir, cfg_path, _r = corpus_cfg
    cfg = json.loads(open(cfg_path).read())
    out = tmp_path / "ds2"
    cfg["build_dataset"]["output_path"] = str(out)
    cfg["build_dataset"]["h5_name2idx"] = str(out / "name2idx.json")
    cfg["data"]["dict_path"] = str(out)
    cfg["data"]["h5_path"] = [str(out)]
    cfg2 = tmp_path / "cfg2.json"
    cfg2.write_text(json.dumps(cfg))
    r = run_cli(
        ["dataset_gen.py", "--config", str(cfg2), "--segmenter", "space",
         "--split-seed", "0"]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for artifact in (
        "name2idx.json", "word_dict.npy", "train_cap.npy", "dev_data.npy",
        "eval_data.npy", "word2idx.json", "idx2word.json", "dataset_meta.json",
    ):
        assert (out / artifact).exists(), artifact
    meta = json.loads((out / "dataset_meta.json").read_text())
    assert meta["segmenter"] == "space"


def test_evaluate_cli_early_stop_identical_bleu(corpus_cfg):
    """--early-stop must produce byte-identical metrics (same captions,
    the while_loop decode only exits earlier)."""
    root, _img, cfg_path, _r = corpus_cfg
    r1 = run_cli(["evaluate.py", "--config", cfg_path])
    r2 = run_cli(["evaluate.py", "--config", cfg_path, "--early-stop"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert r2.returncode == 0, r2.stderr[-2000:]
    metric_lines = lambda out: [
        l for l in out.strip().split("\n")
        if l.startswith(("BLEU", "CIDEr", "distinct"))
    ]
    assert metric_lines(r1.stdout) == metric_lines(r2.stdout)


def test_infer_cli_early_stop_identical_caption(corpus_cfg):
    # raw ids may differ AFTER <stop> (the fixed scan keeps decoding, the
    # while_loop pads) — the detokenized caption must be identical
    root, img_dir, cfg_path, _r = corpus_cfg
    img = str(img_dir / "img_1.jpg")
    r1 = run_cli(["infer.py", img, "--config", cfg_path])
    r2 = run_cli(["infer.py", img, "--config", cfg_path, "--early-stop"])
    assert r1.returncode == 0 and r2.returncode == 0
    sentence = lambda out: out.strip().split("\n")[-1]
    assert sentence(r1.stdout) == sentence(r2.stdout)


def test_infer_cli_beam_length_norm(corpus_cfg):
    """--beam with --length-norm runs end-to-end through the real CLI (flag
    parse -> load_bundle -> beam_decode's GNMT length-normalized pick); the
    pick semantics themselves are pinned in tests/test_beam.py."""
    root, img_dir, cfg_path, _r = corpus_cfg
    img = str(img_dir / "img_0.jpg")
    r = run_cli(["infer.py", img, "--config", cfg_path, "--beam", "2",
                 "--length-norm", "0.6"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().split("\n") if l]
    # raw id list first (reference contract); the sentence line may be empty
    # on this barely-trained model (normalized pick can prefer <stop>-first)
    assert lines[0].startswith("[")


def test_train_cli_distributed_flags_exposed():
    """The multi-host entry point is reachable from the reference-shaped CLI
    (`python train.py --distributed` on every pod host)."""
    r = run_cli(["train.py", "--help"])
    assert r.returncode == 0
    for flag in ("--distributed", "--coordinator", "--num-processes",
                 "--process-id"):
        assert flag in r.stdout


def test_evaluate_cli_distributed_flags_exposed():
    """Multi-host evaluation is reachable the same way
    (`python evaluate.py --distributed` on every pod host)."""
    r = run_cli(["evaluate.py", "--help"])
    assert r.returncode == 0
    for flag in ("--distributed", "--coordinator", "--num-processes",
                 "--process-id"):
        assert flag in r.stdout
