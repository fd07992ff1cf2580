"""Multi-host tests: real multi-process jax.distributed clusters on the CPU
backend — the cluster smoke test, and REAL multi-host data-parallel training
through the full driver (``loop.train``), asserting per-step loss equality
with the single-process 8-device DP oracle (parallel/distributed.py; the
reference has no multi-node story at all)."""

import json
import os
import re
import subprocess
import sys
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from myimagecaptioningmodel_tpu.parallel import distributed

    pid = int(sys.argv[1])
    port = sys.argv[2]
    distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    assert jax.process_count() == 2, jax.process_count()
    start, size = distributed.host_local_slice(10)
    assert (start, size) == ((0, 5) if pid == 0 else (5, 5)), (start, size)
    x = jnp.ones((1,)) * (pid + 1)
    total = multihost_utils.process_allgather(x)
    assert float(total.sum()) == 3.0, total
    print(f"proc {pid} OK", flush=True)
    """
)


def test_two_process_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU"))
    }
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    port = "12789"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} OK" in out


TRAIN_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from myimagecaptioningmodel_tpu.parallel import distributed

    pid, port, cfg_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.training import loop

    cfg = config_mod.Config.from_json_file(cfg_path)
    res = loop.train(cfg, mesh="auto")
    print("RESULT:" + json.dumps(res), flush=True)

    # multi-host evaluate on the bundle process 0 just exported: decode is
    # distributed, scoring replicated — every process must report the same
    # numbers as a single-process run of the same bundle
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("bundle-exported")
    from myimagecaptioningmodel_tpu.evaluation.evaluate import evaluate
    ev = evaluate(cfg, mode="test", mesh="auto")
    print("EVAL:" + json.dumps(
        {"bleu": ev["bleu"], "cider": ev["cider"],
         "distinct": ev["distinct_sentences"]}), flush=True)
    """
)


def _parse_step_losses(log_path):
    pat = re.compile(r"Step \d+ Mean loss: [\d.]+ Step loss: ([\d.]+)")
    out = []
    with open(log_path, encoding="utf-8") as f:
        for line in f:
            m = pat.search(line)
            if m:
                out.append(float(m.group(1)))
    return out


def _parse_dev_line(log_path):
    pat = re.compile(r"Dev set: BLEU ([\d.]+) distinct sentences: (\d+)")
    with open(log_path, encoding="utf-8") as f:
        for line in f:
            m = pat.search(line)
            if m:
                return float(m.group(1)), int(m.group(2))
    raise AssertionError("no dev line found")


def test_two_process_dp_training_matches_single_process(tmp_path):
    """The scale-out analog of reference train.py:119-127 (SURVEY §5.8):
    loop.train in a real 2-process x 4-CPU-device cluster — host-sharded
    feed, process-0-only checkpointing, cross-process eval reduction —
    reproduces the single-process 8-device DP run: per-step losses, dev
    BLEU/distinct, and the final checkpoint."""
    import jax
    from PIL import Image

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.data import dataset_gen
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
    from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod
    from myimagecaptioningmodel_tpu.parallel.train_step import make_optimizer
    from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
    from myimagecaptioningmodel_tpu.training import loop, lr_schedules

    assert len(jax.devices()) == 8
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(17)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉", "一个 女人 在 跑步"]
    records = []
    for i in range(24):
        name = f"img_{i:02d}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": [phrases[i % 3]]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = tmp_path / "ds"

    def make_cfg(tag):
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
                    "batch_size": 8,  # GLOBAL batch in both runs
                    "max_epoch": 1,
                    "log_every_n_step": 1,
                    "checkpoint_path": str(tmp_path / tag / "save"),
                },
                "model": {
                    "decoder": {
                        "vocab_size": 0, "embedding_size": 8,
                        "sentence_length": 0, "hidden_dim": 16,
                        "infer_max_length": 6, "vocab_pad_multiple": 8,
                    },
                    "compute_dtype": "float32",
                },
                "log": {"log_path": str(tmp_path / tag / "log")},
            }
        )

    summary = dataset_gen.build_all(make_cfg("build"), segmenter="space", split_seed=0)

    def patch(cfg):
        cfg = config_mod.replace_nested(
            cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
        )
        return config_mod.replace_nested(
            cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
        )

    # oracle: single-process over all 8 devices
    cfgA = patch(make_cfg("single"))
    resA = loop.train(cfgA, mesh=mesh_mod.make_mesh())
    lossesA = _parse_step_losses(os.path.join(cfgA.log.log_path, "log.txt"))
    assert len(lossesA) >= 2

    # 2-process x 4-device cluster, same global mesh shape
    cfgB = patch(make_cfg("multi"))
    cfgB_path = tmp_path / "cfgB.json"
    cfgB_path.write_text(cfgB.to_json())
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU", "XLA_FLAGS"))
    }
    env.update(JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    port = "12791"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), port, str(cfgB_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out_text) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out_text[-4000:]}"

    results = []
    for out_text in outs:
        for line in out_text.splitlines():
            if line.startswith("RESULT:"):
                results.append(json.loads(line[len("RESULT:"):]))
    assert len(results) == 2

    # per-step losses equal the single-process oracle
    lossesB = _parse_step_losses(os.path.join(cfgB.log.log_path, "log.txt"))
    assert len(lossesB) == len(lossesA)
    # step 1 matches to ~1e-6 (identical feed/model); later steps drift
    # by ~1e-4: the 2-process gradient psum reduces in a different order
    # than the 1-process one (float32 non-associativity), amplified by
    # the optimizer update. Bound the drift, don't expect bit-equality.
    np.testing.assert_allclose(lossesB, lossesA, atol=5e-4)

    # dev metrics (cross-process reduced) equal the oracle's
    bleuA, distinctA = _parse_dev_line(os.path.join(cfgA.log.log_path, "log.txt"))
    bleuB, distinctB = _parse_dev_line(os.path.join(cfgB.log.log_path, "log.txt"))
    np.testing.assert_allclose(bleuB, bleuA, atol=1e-6)
    assert distinctB == distinctA
    for res in results:  # both processes report the same reduced summary
        np.testing.assert_allclose(res["last_dev_bleu"], bleuA, atol=1e-6)
        np.testing.assert_allclose(
            res["last_epoch_loss"], resA["last_epoch_loss"], atol=5e-4
        )

    # final checkpoints (written by process 0 only) match param-for-param
    opts = ModelOptions.from_config(cfgA)
    like_p, like_s = captioner.init(jax.random.PRNGKey(0), opts)
    tx = make_optimizer(cfgA, lr_schedules.from_config(cfgA))
    like_o = tx.init(like_p)
    pA, oA, _sA, mA = ckpt.load_checkpoint(
        os.path.join(cfgA.train.checkpoint_path, "checkpoint"), like_p, like_o, like_s
    )
    pB, oB, _sB, mB = ckpt.load_checkpoint(
        os.path.join(cfgB.train.checkpoint_path, "checkpoint"), like_p, like_o, like_s
    )
    assert mA["step"] == mB["step"]
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(pA), _jax.tree_util.tree_leaves(pB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # Adam MOMENTS are deliberately not compared: they mirror raw gradients,
    # and encoder gradients wobble up to ~20% in f32 across reduction
    # groupings (catastrophic cancellation through the 50+-layer BN backward
    # chain; semantically identical — float64 agrees to 1e-13, see
    # test_parallel.py's tolerance note), which then perturbs every
    # downstream step-2 gradient at the ~1% level. Params stay lr-clamped
    # (Adam update magnitude <= ~lr), so the 5e-4 param bound above IS the
    # meaningful state-equivalence check; the opt state is covered by the
    # structural load (same treedef) and by per-step loss equality.
    assert len(_jax.tree_util.tree_leaves(oA)) == len(
        _jax.tree_util.tree_leaves(oB)
    )

    # multi-host evaluate() (run inside the cluster on bundle B) matches a
    # single-process multi-chip evaluate of the SAME bundle: identical
    # params -> identical greedy ids -> identical BLEU/CIDEr/distinct
    evals = []
    for out_text in outs:
        for line in out_text.splitlines():
            if line.startswith("EVAL:"):
                evals.append(json.loads(line[len("EVAL:"):]))
    assert len(evals) == 2, "both processes must report evaluate() results"
    from myimagecaptioningmodel_tpu.evaluation.evaluate import evaluate

    ref = evaluate(cfgB, mode="test", mesh=mesh_mod.make_mesh())
    for ev in evals:
        np.testing.assert_allclose(ev["bleu"], ref["bleu"], atol=1e-9)
        np.testing.assert_allclose(ev["cider"], ref["cider"], atol=1e-9)
        assert ev["distinct"] == ref["distinct_sentences"]
