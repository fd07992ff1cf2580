"""BLEU / detokenize tests, including fuzz parity vs NLTK's sentence_bleu+method4."""

import random

import numpy as np
import pytest

from myimagecaptioningmodel_tpu.evaluation import metrics

nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")


def _nltk(refs, hyp, weights=(0.25, 0.25, 0.25, 0.25)):
    return nltk_bleu.sentence_bleu(
        refs, hyp, weights=weights,
        smoothing_function=nltk_bleu.SmoothingFunction().method4,
    )


def test_filter_truncates_at_stop_and_skips_pad():
    iw = {0: "<pad>", 1: "<unk>", 2: "<start>", 3: "<stop>", 4: "猫", 5: "狗"}
    assert metrics.filter_ids([4, 0, 5, 3, 4, 4], iw) == ["猫", "狗"]
    # <unk> is NOT filtered (reference quirk, SURVEY §2.2-7)
    assert metrics.filter_ids([1, 4], iw) == ["<unk>", "猫"]


def test_words2sentence():
    assert metrics.words2sentence(["a", "b", "c"]) == "a b c"


def test_bleu_perfect_match():
    hyp = list("abcdefgh")
    assert metrics.sentence_bleu([hyp], hyp) == pytest.approx(1.0)


def test_bleu_no_overlap_is_zero():
    assert metrics.sentence_bleu([list("abcd")], list("wxyz")) == 0.0


@pytest.mark.parametrize(
    "weights",
    [(0.25, 0.25, 0.25, 0.25), (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0), (0, 0, 0, 1)],
)
def test_bleu_fuzz_matches_nltk(weights):
    rng = random.Random(7)
    vocab = list("abcdefghij")
    for _ in range(200):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(2, 12))]
        refs = [
            [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
            for _ in range(rng.randint(1, 4))
        ]
        ours = metrics.sentence_bleu(refs, hyp, weights)
        theirs = _nltk(refs, hyp, weights)
        assert ours == pytest.approx(theirs, abs=1e-12), (refs, hyp, weights)


def test_calc_bleu_batch_weighting_and_float_ids():
    iw = {0: "<pad>", 1: "<unk>", 2: "<start>", 3: "<stop>"}
    for i, w in enumerate("abcdefgh"):
        iw[4 + i] = w
    # two predictions: one scored, one too short (skipped but counted in mean)
    pred = np.array(
        [[4, 5, 6, 7, 3, 0], [4, 3, 0, 0, 0, 0]], dtype=np.float32
    )  # float ids like the reference eval graph (SURVEY §2.2-2)
    refs = [[["a", "b", "c", "d"]], [["a"]]]
    score = metrics.calc_bleu(pred, refs, iw)
    expected = metrics.sentence_bleu([["a", "b", "c", "d"]], ["a", "b", "c", "d"]) / 2
    assert score == pytest.approx(expected)


def test_calc_bleu_rounds_float_ids():
    iw = {0: "<pad>", 3: "<stop>", 4: "a", 5: "b", 6: "c"}
    pred = np.array([[3.9999, 5.0001, 6.0, 3.0, 0.0, 0.0]], dtype=np.float32)
    refs = [[["a", "b", "c"]]]
    expected = metrics.sentence_bleu([["a", "b", "c"]], ["a", "b", "c"])
    assert metrics.calc_bleu(pred, refs, iw) == pytest.approx(expected)
