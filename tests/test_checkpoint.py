"""Checkpoint / inference-bundle / partial-load round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt


def tiny_tree(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "encoder": {"w": jnp.asarray(rng.randn(4, 4), jnp.float32)},
        "decoder": {"b": jnp.asarray(rng.randn(3), jnp.float32)},
    }


def test_checkpoint_roundtrip(tmp_path):
    params = tiny_tree(0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    model_state = {"bn": {"mean": jnp.ones(2)}}
    meta = {"next_epoch": 3, "step": 42, "best_bleu": 0.5,
            "best_meteor": 0, "train_encoder": True}
    d = str(tmp_path / "checkpoint")
    ckpt.save_checkpoint(d, params, opt_state, model_state, meta)
    assert ckpt.checkpoint_exists(d)

    p2, o2, s2, m2 = ckpt.load_checkpoint(
        d, tiny_tree(1), tx.init(tiny_tree(1)), {"bn": {"mean": jnp.zeros(2)}}
    )
    np.testing.assert_array_equal(np.asarray(p2["encoder"]["w"]),
                                  np.asarray(params["encoder"]["w"]))
    np.testing.assert_array_equal(np.asarray(s2["bn"]["mean"]), np.ones(2))
    assert m2 == meta
    # adam state restored
    a, b = jax.tree_util.tree_leaves(opt_state), jax.tree_util.tree_leaves(o2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_overwrite_atomic(tmp_path):
    d = str(tmp_path / "checkpoint")
    params = tiny_tree(0)
    ckpt.save_checkpoint(d, params, {}, {}, {"next_epoch": 2, "step": 1})
    params2 = tiny_tree(5)
    ckpt.save_checkpoint(d, params2, {}, {}, {"next_epoch": 3, "step": 2})
    p, _, _, m = ckpt.load_checkpoint(d, tiny_tree(1), {}, {})
    assert m["next_epoch"] == 3
    np.testing.assert_array_equal(np.asarray(p["encoder"]["w"]),
                                  np.asarray(params2["encoder"]["w"]))


def test_graft_subtree(tmp_path):
    pretrained = tiny_tree(7)
    path = str(tmp_path / "enc.msgpack")
    ckpt.save_params(path, pretrained["encoder"])
    fresh = tiny_tree(1)
    grafted = ckpt.graft_subtree(fresh, path, "encoder")
    np.testing.assert_array_equal(np.asarray(grafted["encoder"]["w"]),
                                  np.asarray(pretrained["encoder"]["w"]))
    np.testing.assert_array_equal(np.asarray(grafted["decoder"]["b"]),
                                  np.asarray(fresh["decoder"]["b"]))


def test_inference_bundle_roundtrip(tmp_path):
    cfg = config_mod.Config()
    params, state = tiny_tree(0), {"bn": {"mean": jnp.ones(2)}}
    d = str(tmp_path / "infer")
    ckpt.export_inference_bundle(d, params, state, cfg)
    p, s, cfg2 = ckpt.load_inference_bundle(
        d, tiny_tree(1), {"bn": {"mean": jnp.zeros(2)}}
    )
    np.testing.assert_array_equal(np.asarray(p["decoder"]["b"]),
                                  np.asarray(params["decoder"]["b"]))
    assert cfg2.model.decoder.vocab_size == cfg.model.decoder.vocab_size
