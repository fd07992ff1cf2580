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


def _crash_states(tmp_path):
    """Build the on-disk states left by a crash at each point inside
    save_checkpoint's commit dance, from a real prior checkpoint v1 and an
    in-flight v2 write. Returns (dir, make_state) where make_state(point)
    re-creates the post-crash filesystem."""
    import shutil

    d = str(tmp_path / "checkpoint")
    stash = str(tmp_path / "stash")

    def save(seed, epoch):
        ckpt.save_checkpoint(
            d, tiny_tree(seed), {}, {}, {"next_epoch": epoch, "step": epoch}
        )

    # v1 committed, then capture a complete v2 .tmp by copying a committed v2
    save(5, 2)
    os.rename(d, stash + "_v1")
    save(6, 3)
    os.rename(d, stash + "_v2")

    def make_state(point):
        for p in (d, d + ".tmp", d + ".old"):
            shutil.rmtree(p, ignore_errors=True)
        if point == "tmp_incomplete":  # crash mid-payload-write
            shutil.copytree(stash + "_v1", d)
            shutil.copytree(stash + "_v2", d + ".tmp")
            os.remove(os.path.join(d + ".tmp", ckpt.COMMIT_FILE))
        elif point == "after_aside":  # v1 renamed aside, v2 tmp complete
            shutil.copytree(stash + "_v1", d + ".old")
            shutil.copytree(stash + "_v2", d + ".tmp")
        elif point == "aside_tmp_incomplete":  # aside done, tmp partial
            shutil.copytree(stash + "_v1", d + ".old")
            shutil.copytree(stash + "_v2", d + ".tmp")
            os.remove(os.path.join(d + ".tmp", ckpt.CKPT_FILE))
        elif point == "after_publish":  # v2 live, old not yet removed
            shutil.copytree(stash + "_v1", d + ".old")
            shutil.copytree(stash + "_v2", d)
        else:
            raise AssertionError(point)

    return d, make_state


@pytest.mark.parametrize(
    "point,expect_epoch",
    [
        ("tmp_incomplete", 2),       # keep v1, discard the partial tmp
        ("after_aside", 3),          # promote the complete v2 tmp
        ("aside_tmp_incomplete", 2), # restore v1 from .old
        ("after_publish", 3),        # v2 already live; clean .old
    ],
)
def test_checkpoint_crash_recovery(tmp_path, point, expect_epoch):
    """A crash at ANY point inside the commit dance leaves a loadable
    checkpoint (round-2 had an rmtree→rename no-checkpoint window)."""
    d, make_state = _crash_states(tmp_path)
    make_state(point)
    assert ckpt.checkpoint_exists(d)
    p, _, _, m = ckpt.load_checkpoint(d, tiny_tree(1), {}, {})
    assert m["next_epoch"] == expect_epoch
    want = tiny_tree(5 if expect_epoch == 2 else 6)
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["w"]), np.asarray(want["encoder"]["w"])
    )
    # recovery cleaned up the debris and the next save works normally
    assert not os.path.exists(d + ".tmp") and not os.path.exists(d + ".old")
    ckpt.save_checkpoint(d, tiny_tree(7), {}, {}, {"next_epoch": 9, "step": 9})
    _, _, _, m2 = ckpt.load_checkpoint(d, tiny_tree(1), {}, {})
    assert m2["next_epoch"] == 9


def test_bundle_crash_recovery(tmp_path):
    """export_inference_bundle uses the same commit dance."""
    import shutil

    cfg = config_mod.Config()
    d = str(tmp_path / "infer")
    ckpt.export_inference_bundle(d, tiny_tree(0), {}, cfg)
    # simulate a crash between rename-aside and publish of a newer export
    os.rename(d, d + ".old")
    shutil.copytree(d + ".old", d + ".tmp")
    p, _, cfg2 = ckpt.load_inference_bundle(d, tiny_tree(1), {})
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["w"]), np.asarray(tiny_tree(0)["encoder"]["w"])
    )


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


def test_async_writer_roundtrip_and_ordering(tmp_path):
    """AsyncCheckpointWriter: back-to-back saves serialize (at most one in
    flight), the final state on disk is the LAST save, and the snapshot is
    donation-safe (mutating the source trees after save() must not affect
    what lands)."""
    w = ckpt.AsyncCheckpointWriter()
    d = str(tmp_path / "checkpoint")
    opt, state = {"m": jnp.zeros(3)}, {"bn": jnp.ones(2)}
    for i in range(4):
        params = tiny_tree(i)
        w.save(d, params, opt, state, {"next_epoch": i, "step": i * 10})
    w.wait()
    w.wait()  # idempotent
    p, o, s, meta = ckpt.load_checkpoint(d, tiny_tree(9), opt, state)
    assert meta == {"next_epoch": 3, "step": 30}
    np.testing.assert_array_equal(np.asarray(p["encoder"]["w"]),
                                  np.asarray(tiny_tree(3)["encoder"]["w"]))


def test_async_writer_surfaces_errors(tmp_path):
    """A failed background write re-raises at the next wait()/save(), and the
    writer is reusable afterwards."""
    w = ckpt.AsyncCheckpointWriter()
    blocked = tmp_path / "not_a_dir"
    blocked.write_text("file, not dir")  # makedirs under it will fail
    w.save(str(blocked / "checkpoint"), tiny_tree(0), {}, {}, {"next_epoch": 1})
    with pytest.raises(OSError):
        w.wait()
    # error is consumed; the writer still works for a good path
    d = str(tmp_path / "ok")
    w.save(d, tiny_tree(1), {}, {}, {"next_epoch": 2})
    w.wait()
    assert ckpt.checkpoint_exists(d)
