"""Input-pipeline additions: storage codec/dtype options, the parallel
batch reader, the device-convert feed, and their end-to-end equivalences.

The reference contract (float16 + gzip shards, normalized rows, float32 CHW
samples) stays the default; these tests pin that every rebuild-only option
(codec="lzf"/"none", storage_dtype="uint8", reader_threads>0,
device_convert) yields the same batches / losses as the reference path.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu import native
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.data import hdf5 as hdf5_mod
from myimagecaptioningmodel_tpu.data import image as image_mod
from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder
from myimagecaptioningmodel_tpu.data.reader import DataReader, as_image_batch
from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions


# ---------------------------------------------------------------- helpers


def build_corpus(root, n_images=12):
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉", "一个 女人 在 跑步"]
    records = []
    for i in range(n_images):
        name = f"img_{i:03d}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": [phrases[i % 3]]})
    ann = root / "annotations.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")
    return img_dir, ann


def make_cfg(root, img_dir, ann, suffix, codec="gzip", storage_dtype="float16",
             **train_overrides):
    out = root / f"dataset_{suffix}"
    train = {
        "seed": 0,
        "learning_rate": 1e-3,
        "batch_size": 4,
        "max_epoch": 1,
        "log_every_n_step": 100,
        "checkpoint_path": str(root / f"save_{suffix}"),
        "data_loader_capacity": 4,
        "export_infer_model": False,
    }
    train.update(train_overrides)
    return config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(ann),
                "output_path": str(out),
                "h5_name2idx": str(out / "name2idx.json"),
                "shard_max_size": 5,  # force multiple shards
                "codec": codec,
                "storage_dtype": storage_dtype,
            },
            "data": {
                "image_shape": [24, 24],
                "image_mean": [0.4, 0.5, 0.6],
                "image_std": [0.2, 0.25, 0.3],
                "dict_path": str(out),
                "h5_path": [str(out)],
                "h5_name2idx": str(out / "name2idx.json"),
            },
            "train": train,
            "model": {
                "decoder": {
                    "vocab_size": 0,
                    "embedding_size": 8,
                    "sentence_length": 0,
                    "hidden_dim": 16,
                    "infer_max_length": 8,
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(root / f"log_{suffix}")},
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
def corpora(tmp_path_factory):
    """The same corpus built under every storage option."""
    root = tmp_path_factory.mktemp("feedpipe")
    img_dir, ann = build_corpus(root)
    built = {}
    for suffix, codec, dtype in [
        ("ref", "gzip", "float16"),
        ("lzf", "lzf", "float16"),
        ("u8", "lzf", "uint8"),
        ("raw", "none", "float16"),
    ]:
        cfg = make_cfg(root, img_dir, ann, suffix, codec, dtype)
        summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
        built[suffix] = (patch_vocab(cfg, summary), summary)
    return built


# ---------------------------------------------------------------- storage


def test_storage_options_recorded(corpora):
    for suffix, codec, dtype in [
        ("ref", "gzip", "float16"), ("lzf", "lzf", "float16"),
        ("u8", "lzf", "uint8"), ("raw", "none", "float16"),
    ]:
        cfg, summary = corpora[suffix]
        assert summary["gen_hdf5"]["codec"] == codec
        assert summary["gen_hdf5"]["storage_dtype"] == dtype
        dr = DataReader(cfg)
        dr.init_hdf5()
        info = dr._hdf5.storage_info
        assert info["dtype"] == ("uint8" if dtype == "uint8" else "float16")
        assert info["codec"] == ("none" if codec == "none" else codec)
        assert info["normalized"] == (dtype != "uint8")
        np.testing.assert_allclose(info["image_mean"], [0.4, 0.5, 0.6])
        # provenance also lands in dataset_meta.json
        assert dr.dataset_meta["codec"] == codec
        assert dr.dataset_meta["storage_dtype"] == dtype


def test_storage_variants_yield_same_batches(corpora):
    """Every storage option reconstructs the reference float32 contract."""
    cfg_ref, _ = corpora["ref"]
    ref_batches = list(DataReader(cfg_ref).get_reader(4, "train")())
    assert ref_batches, "empty train reader"
    for suffix, atol in [("lzf", 0.0), ("raw", 0.0), ("u8", 3e-3)]:
        cfg, _ = corpora[suffix]
        batches = list(DataReader(cfg).get_reader(4, "train")())
        assert len(batches) == len(ref_batches)
        for got, want in zip(batches, ref_batches):
            for (gi, gc), (wi, wc) in zip(got, want):
                assert gi.dtype == np.float32
                # u8 rows store raw pixels (normalize-at-feed) vs the f16
                # rounding of the normalized value: small tolerance
                np.testing.assert_allclose(gi, wi, atol=max(atol, 1e-6))
                np.testing.assert_array_equal(gc, wc)


# ---------------------------------------------------------------- parallel


@pytest.mark.parametrize("suffix", ["ref", "lzf", "u8"])
def test_parallel_reader_matches_serial(corpora, suffix):
    cfg, _ = corpora[suffix]
    mgr = hdf5_mod.Hdf5Manager()
    mgr.load_database(list(cfg.data.h5_path))
    mgr.load_name2idx(cfg.data.h5_name2idx)
    names = sorted(mgr._name2idx)[: len(mgr)]
    pr = hdf5_mod.ParallelHdf5Reader(
        list(cfg.data.h5_path), cfg.data.h5_name2idx, threads=3
    )
    # fast path must engage for the gzip contract (multi-shard too)
    if suffix == "ref":
        assert any(fast for _d, _s, fast in pr._plan)
        assert len(pr._plan) > 1  # shard_max_size=5 forced several shards
    got = pr.read_batch(names)
    want = np.stack([mgr.read(n) for n in names])
    np.testing.assert_array_equal(got, want)
    pr.close()
    mgr.close()


def test_threaded_get_reader_matches_serial(corpora):
    cfg, _ = corpora["ref"]
    dr = DataReader(cfg)
    for kwargs in [
        {},
        {"shuffle_seed": 7},
        {"skip_samples": 3},
        {"keep_float16": True},
    ]:
        serial = list(dr.get_reader(4, "train", **kwargs)())
        threaded = list(dr.get_reader(4, "train", reader_threads=3, **kwargs)())
        assert len(threaded) == len(serial)
        for tb, sb in zip(threaded, serial):
            imgs_t, caps_t = tb
            imgs_s = np.stack([s[0] for s in sb])
            caps_s = np.stack([np.asarray(s[1], np.int64) for s in sb])
            np.testing.assert_array_equal(imgs_t, imgs_s)
            np.testing.assert_array_equal(caps_t, caps_s)


def test_threaded_dev_reader_matches_serial(corpora):
    cfg, _ = corpora["ref"]
    dr = DataReader(cfg)
    serial = list(dr.get_reader(2, "dev")())
    threaded = list(dr.get_reader(2, "dev", reader_threads=2)())
    assert len(threaded) == len(serial)
    for tb, sb in zip(threaded, serial):
        imgs_t, refs_t = as_image_batch(tb)
        imgs_s, refs_s = as_image_batch(sb)
        np.testing.assert_array_equal(imgs_t, imgs_s)
        assert [list(map(list, r)) for r in refs_t] == [
            list(map(list, r)) for r in refs_s
        ]


# ---------------------------------------------------------------- feeder


def test_feeder_prestacked_and_u8(corpora):
    cfg, _ = corpora["u8"]
    dr = DataReader(cfg)
    mean, std = dr.storage_norm
    assert mean == (0.4, 0.5, 0.6)

    # host-convert path: raw u8 rows -> normalized f32 NHWC
    feeder = PrefetchingFeeder(
        dr.get_reader(4, "train", keep_float16=True, reader_threads=2),
        capacity=2, drop_remainder=False, device_put=False,
        image_norm=(mean, std),
    )
    batches = list(feeder)
    assert batches
    ref = list(DataReader(corpora["ref"][0]).get_reader(4, "train")())
    for (imgs, caps), rb in zip(batches, ref):
        assert imgs.dtype == np.float32 and imgs.shape[-1] == 3  # NHWC
        want = np.stack([s[0] for s in rb]).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(imgs, want, atol=3e-3)

    # device-convert path: raw storage batch passes through untouched
    feeder = PrefetchingFeeder(
        dr.get_reader(4, "train", keep_float16=True, reader_threads=2),
        capacity=2, drop_remainder=False, device_put=False,
        device_convert=True,
    )
    imgs, caps = next(iter(feeder))
    assert imgs.dtype == np.uint8 and imgs.shape[1] == 3  # raw NCHW


def test_feeder_chw_u8_normalizes(corpora):
    """to_nhwc=False + uint8 rows must still normalize (review finding)."""
    cfg, _ = corpora["u8"]
    dr = DataReader(cfg)
    feeder = PrefetchingFeeder(
        dr.get_reader(4, "train", keep_float16=True),
        capacity=2, drop_remainder=False, device_put=False,
        to_nhwc=False, image_norm=dr.storage_norm,
    )
    imgs, _caps = next(iter(feeder))
    assert imgs.dtype == np.float32 and imgs.shape[1] == 3  # CHW, normalized
    ref = list(DataReader(corpora["ref"][0]).get_reader(4, "train")())[0]
    want = np.stack([s[0] for s in ref])
    np.testing.assert_allclose(imgs, want, atol=3e-3)


def test_parallel_reader_bad_path_raises_cleanly():
    with pytest.raises(FileNotFoundError):
        hdf5_mod.ParallelHdf5Reader("/nonexistent_dir_xyz")
    # partially-constructed instances must not blow up in __del__
    import gc

    gc.collect()


def test_train_uint8_norm_provenance(corpora, tmp_path):
    """Training on uint8 shards uses the normalization recorded in the shard
    attrs even when the current config's image_mean/std disagree — and the
    device_convert and host-convert paths stay bit-equal under the mismatch."""
    from myimagecaptioningmodel_tpu.training import loop

    cfg, _ = corpora["u8"]
    # drift the config's normalization away from what the shards recorded
    cfg = config_mod.replace_nested(cfg, "data.image_mean", (0.0, 0.0, 0.0))
    cfg = config_mod.replace_nested(cfg, "data.image_std", (1.0, 1.0, 1.0))
    losses = {}
    for dc in (False, True):
        run = config_mod.replace_nested(cfg, "train.device_convert", dc)
        run = config_mod.replace_nested(run, "train.export_infer_model", True)
        run = config_mod.replace_nested(
            run, "train.checkpoint_path", str(tmp_path / f"save_np{int(dc)}")
        )
        run = config_mod.replace_nested(
            run, "log.log_path", str(tmp_path / f"log_np{int(dc)}")
        )
        # single step: the host LUT (v*scale+bias) and device ((v/255-m)/s)
        # normalizations differ by ~1 ulp per pixel, which training steps
        # amplify — compare the un-amplified first loss
        losses[dc] = loop.train(run, mesh=None, max_steps_per_epoch=1)[
            "last_epoch_loss"
        ]
        log_text = (tmp_path / f"log_np{int(dc)}" / "log.txt").read_text()
        assert "recorded normalization" in log_text  # provenance warning fired
        # the exported bundle must record the normalization actually used in
        # training (the shard attrs), NOT the drifted config values — a
        # frozen uint8 serving export bakes this into the program
        bundle_cfg = config_mod.Config.from_json_file(
            os.path.join(run.train.checkpoint_path, "infer", "config.json")
        )
        np.testing.assert_allclose(bundle_cfg.data.image_mean, (0.4, 0.5, 0.6))
        np.testing.assert_allclose(bundle_cfg.data.image_std, (0.2, 0.25, 0.3))
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)


def test_native_u8_convert_matches_numpy():
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (3, 3, 17, 17), np.uint8)
    mean, std = (0.1, 0.2, 0.3), (0.5, 0.6, 0.7)
    got = native.convert_u8chw_to_f32nhwc(u8, mean, std)
    want = np.ascontiguousarray(
        image_mod.normalize_uint8_chw(u8, mean, std).transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------- device


def test_prepare_images_variants():
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

    mean, std = (0.4, 0.5, 0.6), (0.2, 0.25, 0.3)
    opts = ModelOptions(
        dims=DecoderDims(vocab_size=8, embedding_size=4, hidden_dim=8,
                         feat_channels=1280),
        image_norm=(mean, std),
    )
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 256, (2, 3, 24, 24), np.uint8)
    want = image_mod.normalize_uint8_chw(u8, mean, std).transpose(0, 2, 3, 1)
    got = np.asarray(captioner.prepare_images(jnp.asarray(u8), opts))
    np.testing.assert_allclose(got, want, atol=1e-6)

    f16 = rng.rand(2, 3, 24, 24).astype(np.float16)
    got = np.asarray(captioner.prepare_images(jnp.asarray(f16), opts))
    np.testing.assert_array_equal(got, f16.astype(np.float32).transpose(0, 2, 3, 1))

    nhwc = rng.rand(2, 24, 24, 3).astype(np.float32)
    got = np.asarray(captioner.prepare_images(jnp.asarray(nhwc), opts))
    np.testing.assert_array_equal(got, nhwc)


def test_train_device_convert_equivalence(corpora):
    """One epoch with device_convert == one epoch with host conversion
    (identical losses: the raw-f16 device path computes the same floats)."""
    from myimagecaptioningmodel_tpu.training import loop

    cfg_ref, _ = corpora["ref"]
    losses = {}
    for dc in (False, True):
        cfg = config_mod.replace_nested(cfg_ref, "train.device_convert", dc)
        cfg = config_mod.replace_nested(
            cfg, "train.checkpoint_path",
            cfg.train.checkpoint_path + f"_dc{int(dc)}",
        )
        cfg = config_mod.replace_nested(
            cfg, "log.log_path", cfg.log.log_path + f"_dc{int(dc)}"
        )
        result = loop.train(cfg, mesh=None)
        losses[dc] = result["last_epoch_loss"]
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_dev_eval_raw_feed_matches_f32(corpora):
    """_dev_eval fed raw f16 NCHW rows == fed host-converted f32 rows
    (identical BLEU/distinct: prepare_images converts exactly on device)."""
    from myimagecaptioningmodel_tpu.training.loop import _dev_eval

    cfg, _ = corpora["ref"]
    # tiny corpora can land 0 images in the 5% dev split — synthesize one
    dr0 = DataReader(cfg)
    dr0.init_hdf5()
    names = sorted(dr0._hdf5._name2idx)[:4]
    refs = {n: [["一个", "男人"], ["一只", "猫"]] for n in names}
    np.save(
        os.path.join(cfg.data.dict_path, "dev_data.npy"),
        np.asarray([names, refs], dtype=object),
    )

    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    decode = jax.jit(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts)
    )
    results = {}
    for raw in (True, False):
        dr = DataReader(cfg)
        results[raw] = _dev_eval(
            decode, params, state,
            dr.get_reader(4, "dev", keep_float16=raw),
            dr.index_word, 4, cfg.data.stop_idx, cfg.data.padding_idx,
        )
    assert results[True] == results[False]
    assert results[True][0] >= 0.0


def test_train_uint8_lzf_end_to_end(corpora):
    """Full loop on the uint8+lzf artifact set with threads + device convert."""
    from myimagecaptioningmodel_tpu.training import loop

    cfg, _ = corpora["u8"]
    cfg = config_mod.replace_nested(cfg, "train.reader_threads", 2)
    cfg = config_mod.replace_nested(cfg, "train.device_convert", True)
    result = loop.train(cfg, mesh=None)
    assert np.isfinite(result["last_epoch_loss"])
    assert result["final_step"] >= 1


def test_parallel_reader_none_codec(corpora):
    cfg, _ = corpora["raw"]  # codec="none"
    mgr = hdf5_mod.Hdf5Manager()
    mgr.load_database(list(cfg.data.h5_path))
    mgr.load_name2idx(cfg.data.h5_name2idx)
    names = sorted(mgr._name2idx)
    pr = hdf5_mod.ParallelHdf5Reader(
        list(cfg.data.h5_path), cfg.data.h5_name2idx, threads=2
    )
    assert not any(fast for _d, _s, fast in pr._plan)  # no chunk fast path
    np.testing.assert_array_equal(
        pr.read_batch(names), np.stack([mgr.read(n) for n in names])
    )
    pr.close()
    mgr.close()


def test_evaluate_u8_norm_mismatch_falls_back(corpora, tmp_path):
    """evaluate() on uint8 shards whose recorded norm disagrees with the
    bundle's image_norm must host-normalize (raw_ok False) — and still
    produce metrics without error."""
    from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
    from myimagecaptioningmodel_tpu.training import loop

    cfg, _ = corpora["u8"]
    cfg = config_mod.replace_nested(
        cfg, "train.checkpoint_path", str(tmp_path / "save_mm")
    )
    cfg = config_mod.replace_nested(cfg, "log.log_path", str(tmp_path / "log_mm"))
    cfg = config_mod.replace_nested(cfg, "train.export_infer_model", True)
    loop.train(cfg, mesh=None, max_steps_per_epoch=1)
    # drift the config norm: the exported bundle records the drifted values,
    # so raw feed would mis-normalize -> the guard must reject it
    drifted = config_mod.replace_nested(cfg, "data.image_mean", (0.0, 0.0, 0.0))
    res = evaluate_mod.evaluate(drifted, bundle="infer", mode="test")
    assert "bleu" in res
