"""Data-plane tests: image normalize, HDF5 shard round-trip, readers, feeder,
and the full 4-stage offline build on a 12-image synthetic corpus."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen, hdf5, image as image_mod
from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder
from myimagecaptioningmodel_tpu.data.reader import DataReader, batched


def test_process_image_normalize():
    rgb = Image.fromarray(
        (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 255).astype(np.uint8)
    )
    out = image_mod.process_image(rgb, (16, 16), mean=(0.5, 0.5, 0.5), std=(2, 2, 2))
    assert out.shape == (3, 16, 16) and out.dtype == np.float32
    raw = np.asarray(rgb.resize((16, 16), image_mod._LANCZOS), np.float32)
    expect = (raw.transpose(2, 0, 1) / 255.0 - 0.5) / 2.0
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_process_image_rejects_grayscale():
    gray = Image.fromarray(np.zeros((20, 20), dtype=np.uint8))
    assert image_mod.process_image(gray, (16, 16)) is None


def test_chw_to_nhwc():
    x = np.arange(2 * 3 * 4 * 5).reshape(2, 3, 4, 5).astype(np.float32)
    y = image_mod.chw_to_nhwc(x)
    assert y.shape == (2, 4, 5, 3)
    np.testing.assert_array_equal(y[0, :, :, 1], x[0, 1])


def test_hdf5_shard_roundtrip(tmp_path):
    shape = (3, 8, 8)
    n, max_size = 7, 3  # forces 3 shards: .hdf5_0/_1/_2
    data = np.random.RandomState(0).rand(n, *shape).astype(np.float16)
    builder = hdf5.DbBuilder(str(tmp_path), "db", shape, max_size, n, "float16")
    with builder:
        for row in data:
            builder.append(row)
    files = sorted(os.listdir(tmp_path))
    assert files == ["db.hdf5_0", "db.hdf5_1", "db.hdf5_2"]

    mgr = hdf5.Hdf5Manager()
    mgr.load_database(str(tmp_path))
    assert len(mgr) == n
    for i in range(n):
        np.testing.assert_array_equal(mgr.read_index(i), data[i])
    mgr.close()


def test_hdf5_single_file_and_name2idx(tmp_path):
    shape = (3, 4, 4)
    data = np.random.RandomState(1).rand(2, *shape).astype(np.float16)
    with hdf5.DbBuilder(str(tmp_path), "db", shape, 100, 2, "float16") as b:
        for row in data:
            b.append(row)
    assert os.listdir(tmp_path) == ["db.hdf5"]
    with open(tmp_path / "name2idx.json", "w") as f:
        json.dump({"a.jpg": 0, "b.jpg": 1}, f)
    mgr = hdf5.Hdf5Manager()
    mgr.load_database(str(tmp_path))
    mgr.load_name2idx(str(tmp_path / "name2idx.json"))
    np.testing.assert_array_equal(mgr.read("b.jpg"), data[1])
    mgr.close()


def test_batched_keeps_remainder():
    gen = batched(lambda: iter(range(7)), 3)
    sizes = [len(b) for b in gen()]
    assert sizes == [3, 3, 1]  # fluid.io.batch semantics (SURVEY §2.2-6)


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """12 images + AI_Challenger-style annotations, built end-to-end."""
    root = tmp_path_factory.mktemp("ds")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(42)
    records = []
    phrases = [
        "一个 男人 在 打 篮球",
        "一只 猫 在 睡觉",
        "一个 女人 在 跑步",
        "两个 孩子 在 公园 玩耍",
    ]
    for i in range(12):
        name = f"img_{i:03d}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append(
            {"image_id": name, "caption": [phrases[i % 4], phrases[(i + 1) % 4]]}
        )
    ann = root / "annotations.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = root / "dataset"
    cfg = config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(ann),
                "output_path": str(out),
                "h5_name2idx": str(out / "name2idx.json"),
                "shard_max_size": 5,  # force multiple shards
            },
            "data": {
                "image_shape": [16, 16],
                "dict_path": str(out),
                "h5_path": [str(out)],
                "h5_name2idx": str(out / "name2idx.json"),
            },
        }
    )
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    return cfg, summary


def test_build_all_artifacts(synthetic_dataset):
    cfg, summary = synthetic_dataset
    out = cfg.build_dataset.output_path
    assert summary["gen_hdf5"]["images"] == 12
    assert summary["split"]["train"] == 12 - 2 * int(0.05 * 12)
    shards = [f for f in os.listdir(out) if ".hdf5" in f]
    assert len(shards) == 3  # 12 images / 5 per shard
    for artifact in ("name2idx.json", "word_dict.npy", "train_cap.npy"):
        assert os.path.exists(os.path.join(out, artifact))


def test_reader_streams(synthetic_dataset):
    cfg, _ = synthetic_dataset
    dr = DataReader(cfg)
    batches = list(dr.get_reader(4, "train")())
    assert all(len(b) <= 4 for b in batches)
    img, cap = batches[0][0]
    assert img.shape == (3, 16, 16) and img.dtype == np.float32
    assert cap.dtype == np.int64
    assert cap[0] == 2  # <start>
    assert dr.index_word[0] == "<pad>"

    dev_batches = list(dr.get_reader(4, "dev")())
    if dev_batches:  # tiny split may be empty
        img, refs = dev_batches[0][0]
        assert isinstance(refs, list) and isinstance(refs[0], list)


def test_feeder_prefetch(synthetic_dataset):
    cfg, _ = synthetic_dataset
    dr = DataReader(cfg)
    feeder = PrefetchingFeeder(
        dr.get_reader(4, "train"), capacity=4, drop_remainder=True, device_put=False
    )
    batches = list(feeder)
    assert batches, "expected at least one full batch"
    imgs, caps = batches[0]
    assert imgs.shape == (4, 16, 16, 3)  # NHWC for TPU
    assert caps.shape[0] == 4
    assert all(i.shape == (4, 16, 16, 3) for i, _ in batches)


def test_gen_hdf5_skips_bad_images(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((20, 20, 3), dtype=np.uint8)).save(img_dir / "ok.jpg")
    Image.fromarray(np.zeros((20, 20), dtype=np.uint8)).save(img_dir / "gray.jpg")
    (img_dir / "corrupt.jpg").write_bytes(b"not a jpeg")
    out = tmp_path / "out"
    cfg = config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "output_path": str(out),
            },
            "data": {"image_shape": [8, 8]},
        }
    )
    summary = hdf5.gen_hdf5(cfg, progress_every=0)
    assert summary["images"] == 1
    assert sorted(summary["skipped"]) == ["corrupt.jpg", "gray.jpg"]
    mgr = hdf5.Hdf5Manager()
    mgr.load_database(str(out))
    assert len(mgr) == 1  # shard trimmed to actual rows
    mgr.close()
