"""CIDEr-D sanity tests (no external reference implementation available):
identity, ordering, discriminativity, and length-penalty behavior."""

import numpy as np
import pytest

from myimagecaptioningmodel_tpu.evaluation.cider import CiderD


def corpus():
    refs = [
        [["一个", "男人", "在", "打", "篮球"], ["男人", "打", "篮球"]],
        [["一只", "猫", "在", "睡觉"], ["猫", "睡", "了"]],
        [["两个", "孩子", "在", "公园", "玩耍"]],
        [["一个", "女人", "在", "跑步"]],
    ]
    return refs


def test_exact_match_beats_partial_and_garbage():
    refs = corpus()
    scorer = CiderD()
    exact = [r[0] for r in refs]
    partial = [r[0][:2] + ["啊"] for r in refs]
    garbage = [["嗯", "哦", "呃"] for _ in refs]
    s_exact, per = scorer.score(exact, refs)
    s_partial, _ = scorer.score(partial, refs)
    s_garbage, _ = scorer.score(garbage, refs)
    assert s_exact > s_partial > s_garbage
    assert s_garbage == pytest.approx(0.0, abs=1e-6)
    assert per.shape == (4,)
    assert np.all(per >= 0)


def test_common_words_weigh_less_than_rare():
    # "在" appears in most references (low idf); a rare content word matters more
    refs = corpus()
    scorer = CiderD()
    with_common = [["在"], ["在"], ["在"], ["在"]]
    with_rare = [["篮球"], ["睡觉"], ["玩耍"], ["跑步"]]
    s_common, _ = scorer.score(with_common, refs)
    s_rare, _ = scorer.score(with_rare, refs)
    assert s_rare > s_common


def test_length_penalty():
    # multiple documents so idf is nonzero (CIDEr degenerates on 1 image)
    refs = [[list("abcdefgh")], [list("ijklmnop")], [list("qrstuvwx")]]
    scorer = CiderD()
    good = [list("abcdefgh"), list("ijklmnop"), list("qrstuvwx")]
    padded = [c + list("zzzzzzzzzzzz") for c in good]
    s_good, _ = scorer.score(good, refs)
    s_padded, _ = scorer.score(padded, refs)
    assert s_good > s_padded > 0


def test_empty_candidate():
    refs = [[["a", "b"]]]
    s, per = CiderD().score([[]], refs)
    assert s == pytest.approx(0.0, abs=1e-9)
