"""Unit tests for vocabulary build + caption DBs (reference ai_challenge_tokenizer.py)."""

import os
import random

import numpy as np
import pytest

from myimagecaptioningmodel_tpu.data import tokenizer as tok


@pytest.fixture()
def token_file(tmp_path):
    # "{name}#{i}\t{words}" lines — the reference token format (dataset_gen.py:35)
    lines = [
        "img_a.jpg#0\t一个 男人 在 打 篮球",
        "img_a.jpg#1\t一个 男人 在 运动",
        "img_b.jpg#0\t一只 猫 在 睡觉",
        "img_b.jpg#1\t一只 猫 在 椅子 上",
        "img_c.jpg#0\t一个 女人 在 跑步",
    ]
    p = tmp_path / "token"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def test_specials_and_ids(token_file):
    word_idx, idx_word = tok.build_dict(token_file, minimum_occur=1)
    assert [idx_word[i] for i in range(4)] == ["<pad>", "<unk>", "<start>", "<stop>"]
    assert word_idx["<pad>"] == tok.PAD_ID == 0
    assert word_idx["<unk>"] == tok.UNK_ID == 1
    assert word_idx["<start>"] == tok.START_ID == 2
    assert word_idx["<stop>"] == tok.STOP_ID == 3


def test_min_occur_filters_rare_words(token_file):
    word_idx, _ = tok.build_dict(token_file, minimum_occur=2)
    assert "在" in word_idx  # occurs 5x
    assert "篮球" not in word_idx  # occurs once -> dropped (min occur 2)
    # count ordering: most frequent first after specials
    assert word_idx["在"] == 4


def test_train_split_only(token_file):
    word_idx, _ = tok.build_dict(token_file, train_div=["img_a.jpg"], minimum_occur=1)
    assert "猫" not in word_idx  # img_b caption word excluded
    assert "篮球" in word_idx


def test_max_keep_cap(token_file):
    word_idx, _ = tok.build_dict(token_file, minimum_occur=1, max_keep=3)
    assert len(word_idx) == 4 + 3


def test_tokenize_unk_fallback(token_file):
    word_idx, _ = tok.build_dict(token_file, train_div=["img_a.jpg"], minimum_occur=1)
    tokens = tok.tokenize(token_file, word_idx, rng=random.Random(0))
    by_name = {}
    for name, ids in tokens:
        by_name.setdefault(name, []).append(ids)
    # img_b words are OOV for an img_a-only vocab -> <unk>
    assert any(tok.UNK_ID in ids for ids in by_name["img_b.jpg"])
    assert all(tok.UNK_ID not in ids for ids in by_name["img_a.jpg"])


def test_training_db_wrap_pad_and_cap(token_file):
    word_idx, _ = tok.build_dict(token_file, minimum_occur=1)
    tokens = tok.tokenize(token_file, word_idx, rng=random.Random(0))
    db, max_len = tok.build_training_db(
        word_idx, tokens, ["img_a.jpg", "img_b.jpg"], sentences_per_image=1
    )
    assert len(db) == 2  # capped to 1 caption per image
    # longest kept caption is 5 words + <start>/<stop> = 7 at most
    for name, arr in db:
        assert arr.dtype == np.int64
        assert arr.shape == (max_len,)
        assert arr[0] == tok.START_ID
        nonpad = arr[arr != tok.PAD_ID]
        assert nonpad[-1] == tok.STOP_ID
        # padding only at the tail
        assert not (arr[: nonpad.size] == tok.PAD_ID).any()


def test_eval_db(token_file):
    db = tok.build_eval_db(token_file, ["img_b.jpg"])
    assert set(db) == {"img_b.jpg"}
    assert db["img_b.jpg"] == [
        ["一只", "猫", "在", "睡觉"],
        ["一只", "猫", "在", "椅子", "上"],
    ]


def test_main_end_to_end(tmp_path, token_file):
    from myimagecaptioningmodel_tpu import config as config_mod

    out = tmp_path / "out"
    temp = out / "temp"
    temp.mkdir(parents=True)
    with open(token_file, encoding="utf-8") as f:
        (temp / "token").write_text(f.read(), encoding="utf-8")
    (temp / "train.txt").write_text("img_a.jpg\nimg_b.jpg\n")
    (temp / "dev.txt").write_text("img_c.jpg\n")
    (temp / "test.txt").write_text("img_c.jpg\n")

    cfg = config_mod.replace_nested(
        config_mod.Config(), "build_dataset.output_path", str(out)
    )
    summary = tok.main(cfg)
    assert summary["train_size"] == 4  # img_a x2 + img_b x2
    assert summary["start"] == 2 and summary["stop"] == 3
    for artifact in (
        "word_dict.npy",
        "train_cap.npy",
        "dev_data.npy",
        "eval_data.npy",
        "word2idx.json",
        "idx2word.json",
    ):
        assert (out / artifact).exists()
    db, max_len = np.load(out / "train_cap.npy", allow_pickle=True)
    assert max_len == max(len(t) for _, t in db)
    names, name2caps = np.load(out / "dev_data.npy", allow_pickle=True)
    assert names == ["img_c.jpg"]
    assert name2caps["img_c.jpg"] == [["一个", "女人", "在", "跑步"]]
