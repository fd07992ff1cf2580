"""Frozen StableHLO serving export (inference/export_stablehlo.py):
serialize the decode program with baked-in weights, reload it with nothing
but jax.export, and pin id-for-id equivalence with the live decode — the
rebuild's analog of the reference's frozen inference program
(save_inference_model, train.py:81-82)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle
from myimagecaptioningmodel_tpu.inference import export_stablehlo as ex
from myimagecaptioningmodel_tpu.training import loop

from test_feed_pipeline import build_corpus, make_cfg, patch_vocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("shlo")
    img_dir, ann = build_corpus(root)
    cfg = make_cfg(root, img_dir, ann, "shlo", export_infer_model=True)
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = patch_vocab(cfg, summary)
    loop.train(cfg, mesh=None)
    return cfg


def test_export_greedy_roundtrip(trained):
    from jax import export as jexport

    cfg = trained
    exported = ex.export_decode(cfg, "infer", batch_size=4)
    data = exported.serialize()
    assert len(data) > 1000

    rng = np.random.RandomState(0)
    images = rng.rand(4, 24, 24, 3).astype(np.float32)

    reloaded = jexport.deserialize(data)
    ids_frozen = np.asarray(reloaded.call(images))

    params, state, _bcfg, _opts, decode = load_bundle(cfg, "infer")
    ids_live = np.asarray(decode(params, state, images))
    np.testing.assert_array_equal(ids_frozen, ids_live)


def test_export_raw_uint8_contract(trained):
    """The frozen program accepts raw uint8 NCHW rows (device-side
    normalize baked in) and matches the live decode on the same rows."""
    from jax import export as jexport

    cfg = trained
    exported = ex.export_decode(cfg, "infer", batch_size=2, image_dtype="uint8")
    reloaded = jexport.deserialize(exported.serialize())

    rng = np.random.RandomState(1)
    raw = rng.randint(0, 256, (2, 3, 24, 24), np.uint8)
    ids_frozen = np.asarray(reloaded.call(raw))

    params, state, _bcfg, opts, decode = load_bundle(cfg, "infer")
    ids_live = np.asarray(decode(params, state, raw))
    np.testing.assert_array_equal(ids_frozen, ids_live)


def test_export_beam_and_cli(trained, tmp_path):
    """Beam export works; the CLI writes a loadable artifact."""
    from jax import export as jexport

    cfg = trained
    exported = ex.export_decode(cfg, "infer", batch_size=2, beam_size=2)
    reloaded = jexport.deserialize(exported.serialize())
    rng = np.random.RandomState(2)
    images = rng.rand(2, 24, 24, 3).astype(np.float32)
    ids = np.asarray(reloaded.call(images))
    assert ids.shape[0] == 2

    # CLI subprocess (pure-CPU env like tests/test_cli.py)
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON", "TPU", "LIBTPU"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()), encoding="utf-8")
    out = tmp_path / "decode.shlo"
    proc = subprocess.run(
        [
            sys.executable, "-m",
            "myimagecaptioningmodel_tpu.inference.export_stablehlo",
            os.path.join(cfg.train.checkpoint_path, "infer"),
            str(out), "--config", str(cfg_path), "--batch", "2",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert out.exists() and out.stat().st_size > 1000
    reloaded = jexport.deserialize(out.read_bytes())
    ids = np.asarray(reloaded.call(rng.rand(2, 24, 24, 3).astype(np.float32)))
    assert ids.shape[0] == 2


def test_export_quantized_roundtrip(trained):
    """--quantize bakes the int8-dequantized decoder into the frozen
    artifact; ids match the live quantized decode."""
    from jax import export as jexport

    cfg = trained
    exported = ex.export_decode(cfg, "infer", batch_size=2, quantize=True)
    reloaded = jexport.deserialize(exported.serialize())
    rng = np.random.RandomState(5)
    images = rng.rand(2, 24, 24, 3).astype(np.float32)
    ids_frozen = np.asarray(reloaded.call(images))

    params, state, _bcfg, _opts, decode = load_bundle(cfg, "infer", quantize=True)
    ids_live = np.asarray(decode(params, state, images))
    np.testing.assert_array_equal(ids_frozen, ids_live)
