"""Coverage for the remaining corners: config serialization, logger
run-state, multi-directory HDF5, feeder error propagation, the standalone
LSTM cell, and the real jieba segmenter."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myimagecaptioningmodel_tpu import config as config_mod


def test_config_json_roundtrip(tmp_path):
    cfg = config_mod.Config.from_dict(
        {
            "train": {"batch_size": 32, "gradient_clip": 1.5},
            "model": {
                "decoder": {"vocab_size": 99, "vocab_pad_multiple": 16},
                "parity_mode": True,
            },
            "data": {"h5_path": ["/a", "/b"]},
        }
    )
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    cfg2 = config_mod.Config.from_json_file(str(p))
    assert cfg2.train.batch_size == 32
    assert cfg2.train.gradient_clip == 1.5
    assert cfg2.model.decoder.vocab_size == 99
    assert cfg2.model.parity_mode is True
    assert cfg2.data.h5_path == ("/a", "/b")
    # reference aliases
    assert cfg2.dc is cfg2.data and cfg2.md is cfg2.model


def test_from_dict_resolves_new_nested_dataclasses():
    # Regression: nested handling used to special-case ("encoder","decoder")
    # because PEP-563 string annotations defeat dataclasses.is_dataclass on
    # f.type; any NEW nested dataclass must deserialize without edits.
    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class Inner:
        x: int = 1

    @dataclasses.dataclass(frozen=True)
    class Outer:
        inner: Inner = dataclasses.field(default_factory=Inner)
        y: int = 2

    # reuse Config.from_dict's generic builder on a synthetic root
    out = config_mod.Config.from_dict.__func__(Outer, {"inner": {"x": 7}})
    assert out.inner.x == 7 and out.y == 2


def test_enable_compilation_cache(tmp_path):
    import jax

    from myimagecaptioningmodel_tpu.utils import env as env_mod

    old = jax.config.jax_compilation_cache_dir
    try:
        d = env_mod.enable_compilation_cache(str(tmp_path / "xla"))
        assert d == str(tmp_path / "xla")
        import os

        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_from_dict_null_section_means_defaults():
    # Regression: an explicit null section ('{"data": null}') must yield the
    # section's defaults, not a None field that crashes on first access.
    cfg = config_mod.Config.from_json('{"data": null, "train": {"seed": 3}}')
    assert cfg.data == config_mod.DataConfig()
    assert cfg.train.seed == 3


def test_replace_nested():
    cfg = config_mod.Config()
    cfg2 = config_mod.replace_nested(cfg, "model.decoder.hidden_dim", 64)
    assert cfg2.model.decoder.hidden_dim == 64
    assert cfg.model.decoder.hidden_dim == 1024  # original untouched


def test_logger_persistence(tmp_path):
    from myimagecaptioningmodel_tpu.training.logger import Logger

    log = Logger(str(tmp_path), encoder_trainable=True)
    assert log.is_first_init and log.epoch == 1
    log.epoch = 3
    log.best_bleu = 0.25
    log.log("hello")
    log.log_scalars("test", value=1.0)

    log2 = Logger(str(tmp_path))
    assert not log2.is_first_init
    assert log2.epoch == 3 and log2.best_bleu == 0.25
    assert "hello" in (tmp_path / "log.txt").read_text()
    rec = json.loads((tmp_path / "log.jsonl").read_text().strip())
    assert rec["event"] == "test"


def test_hdf5_multi_directory(tmp_path):
    from myimagecaptioningmodel_tpu.data import hdf5

    shape = (3, 4, 4)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    data = np.random.RandomState(0).rand(5, *shape).astype(np.float16)
    with hdf5.DbBuilder(str(d1), "db", shape, 2, 3, "float16") as b:
        for row in data[:3]:
            b.append(row)
    with hdf5.DbBuilder(str(d2), "db", shape, 2, 2, "float16") as b:
        for row in data[3:]:
            b.append(row)
    mgr = hdf5.Hdf5Manager()
    mgr.load_database([str(d1), str(d2)])
    assert len(mgr) == 5
    np.testing.assert_array_equal(mgr.read_index(4), data[4])
    with pytest.raises(IndexError):
        mgr.read_index(5)
    mgr.close()


def test_feeder_propagates_worker_errors():
    from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder

    def bad_reader():
        yield [(np.zeros((3, 4, 4), np.float32), np.zeros(5, np.int64))]
        raise RuntimeError("boom")

    feeder = PrefetchingFeeder(lambda: bad_reader(), capacity=2,
                               drop_remainder=False, device_put=False)
    with pytest.raises(RuntimeError, match="boom"):
        list(feeder)


def test_early_stop_pads_with_padding_idx():
    """Post-stop positions of the early-stop decode hold ``padding_idx`` —
    including positions never written because the while_loop exited early —
    for any padding_idx, not just 0."""
    from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

    dims = DecoderDims(vocab_size=12, embedding_size=8, hidden_dim=16,
                       feat_channels=8)
    params = decoder_mod.init(jax.random.PRNGKey(2), dims)
    rng = np.random.RandomState(2)
    pre = decoder_mod.precompute(
        params,
        jnp.asarray(rng.randn(1, 4, 16), jnp.float32),
        jnp.asarray(rng.randn(1, 16), jnp.float32),
        jnp.float32,
    )
    first = int(
        np.asarray(
            decoder_mod.greedy_decode_ids(params, pre, 8, compute_dtype=jnp.float32)
        )[0, 0]
    )
    ids = np.asarray(
        decoder_mod.greedy_decode_ids(
            params, pre, 8, compute_dtype=jnp.float32,
            early_stop=True, stop_idx=first, padding_idx=5,
        )
    )
    np.testing.assert_array_equal(ids[0], [first] + [5] * 7)


def test_feeder_early_break_releases_worker_and_reader():
    """A consumer that breaks mid-epoch (max_steps_per_epoch) must not leave
    the worker thread blocked on the bounded queue, and the reader
    generator's own cleanup (finally) must run (round-2 leak, VERDICT #3)."""
    import threading
    import time

    from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder

    closed = threading.Event()

    def reader():
        try:
            for _ in range(1000):  # far more than capacity: worker WILL block
                yield [(np.zeros((3, 4, 4), np.float32), np.zeros(5, np.int64))]
        finally:
            closed.set()

    feeder = PrefetchingFeeder(
        lambda: reader(), capacity=2, drop_remainder=False, device_put=False
    )
    for i, _batch in enumerate(feeder):
        if i == 1:
            break
    feeder.close()
    assert closed.wait(5), "reader generator finally never ran"
    deadline = time.time() + 5
    while any(t.name == "feeder" and t.is_alive() for t in threading.enumerate()):
        assert time.time() < deadline, "feeder worker thread still alive"
        time.sleep(0.01)


def test_feeder_exhaustion_still_clean():
    import threading

    from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder

    def reader():
        for _ in range(5):
            yield [(np.zeros((3, 4, 4), np.float32), np.zeros(5, np.int64))]

    feeder = PrefetchingFeeder(
        lambda: reader(), capacity=2, drop_remainder=False, device_put=False
    )
    assert len(list(feeder)) == 5
    feeder.close()
    assert not any(
        t.name == "feeder" and t.is_alive() for t in threading.enumerate()
    )


def test_lstm_cell_standalone():
    from myimagecaptioningmodel_tpu.ops.lstm import init_lstm, lstm_cell

    p = init_lstm(jax.random.PRNGKey(0), 8, 16)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8), jnp.float32)
    h = jnp.asarray(rng.randn(2, 16), jnp.float32)
    c = jnp.asarray(rng.randn(2, 16), jnp.float32)
    h2, c2 = lstm_cell(p, x, h, c, jnp.float32)
    assert h2.shape == (2, 16) and c2.shape == (2, 16)
    # oracle
    xh = np.concatenate([np.asarray(x), np.asarray(h)], -1)
    gates = xh @ np.asarray(p["w"]) + np.asarray(p["b"])
    i, f, g, o = np.split(gates, 4, -1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    c_ref = sig(f) * np.asarray(c) + sig(i) * np.tanh(g)
    h_ref = sig(o) * np.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(h2), h_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), c_ref, atol=1e-5)


def test_jieba_segmenter_available():
    from myimagecaptioningmodel_tpu.data.segmenter import get_segmenter

    name, seg = get_segmenter("jieba")
    words = seg("一个男人在打篮球")
    assert name == "jieba"
    assert isinstance(words, list) and len(words) >= 3
    assert "".join(words) == "一个男人在打篮球"


def test_segmenter_auto_fallback():
    from myimagecaptioningmodel_tpu.data.segmenter import get_segmenter

    name, seg = get_segmenter("auto")  # pkuseg missing here -> jieba
    assert name in ("pkuseg", "jieba")
    name, seg = get_segmenter("space")
    assert seg("a b  c") == ["a", "b", "c"]

def test_reader_shuffle_and_skip(tmp_path):
    """Per-epoch shuffle is deterministic per seed; skip_samples fast-forwards."""
    import numpy as np
    from myimagecaptioningmodel_tpu.data.reader import DataReader

    out = tmp_path / "ds"
    out.mkdir()
    db = [(f"img_{i}", np.full(4, i, np.int64)) for i in range(8)]
    np.save(out / "train_cap.npy", np.array([db, 4], dtype=object), allow_pickle=True)

    cfg = config_mod.Config.from_dict(
        {"data": {"dict_path": str(out), "h5_path": [str(out)],
                  "h5_name2idx": str(out / "x.json")}}
    )
    dr = DataReader(cfg)
    dr._hdf5 = object()  # bypass HDF5: the processor below ignores it

    def proc(name):
        return np.zeros((1,), np.float32)

    order = lambda gen: [int(cap[0]) for _img, cap in gen()]
    base = order(dr._get_reader(proc, None, "train"))
    assert base == list(range(8))  # fixed stored order (reference parity)
    s1 = order(dr._get_reader(proc, None, "train", shuffle_seed=1))
    s1b = order(dr._get_reader(proc, None, "train", shuffle_seed=1))
    s2 = order(dr._get_reader(proc, None, "train", shuffle_seed=2))
    assert s1 == s1b and s1 != base and s1 != s2
    skipped = order(dr._get_reader(proc, None, "train", shuffle_seed=1,
                                   skip_samples=3))
    assert skipped == s1[3:]


def test_process_slice_batches():
    from myimagecaptioningmodel_tpu.data.reader import process_slice_batches

    items = list(range(23))
    # 2 processes, local batch 4 -> global batches of 8: [0..7], [8..15];
    # the trailing partial global batch (16..22) is dropped
    p0 = process_slice_batches(items, 4, 0, 2)
    p1 = process_slice_batches(items, 4, 1, 2)
    assert p0 == [0, 1, 2, 3, 8, 9, 10, 11]
    assert p1 == [4, 5, 6, 7, 12, 13, 14, 15]
    # interleaving p0/p1 per batch reconstructs the global order exactly
    merged = []
    for i in range(0, len(p0), 4):
        merged += p0[i:i + 4] + p1[i:i + 4]
    assert merged == items[:16]
    # single process == identity (minus the remainder)
    assert process_slice_batches(items, 8, 0, 1) == items[:16]
