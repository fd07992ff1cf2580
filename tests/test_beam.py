"""Beam-search tests: beam=1 == greedy; beam finds higher-probability
sequences than greedy on a crafted distribution; finished-beam freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myimagecaptioningmodel_tpu.inference import beam as beam_mod
from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

F32 = jnp.float32
DIMS = DecoderDims(vocab_size=19, embedding_size=8, hidden_dim=16, feat_channels=12)


@pytest.fixture(scope="module")
def setup():
    params = decoder_mod.init(jax.random.PRNGKey(3), DIMS)
    rng = np.random.RandomState(4)
    p_img_feat = jnp.asarray(rng.randn(3, 5, DIMS.hidden_dim), F32)
    global_feat = jnp.asarray(rng.randn(3, DIMS.hidden_dim), F32)
    pre = decoder_mod.precompute(params, p_img_feat, global_feat, F32)
    return params, pre


def test_beam1_equals_greedy(setup):
    params, pre = setup
    greedy = decoder_mod.greedy_decode_ids(params, pre, 7, compute_dtype=F32)
    ids, _ = beam_mod.beam_search_ids(
        params, pre, 7, beam_size=1, compute_dtype=F32
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(ids))


def test_beam_score_at_least_greedy(setup):
    """The best beam's log-prob must be >= the greedy path's log-prob."""
    params, pre = setup
    T, W = 7, 4
    ids_b, scores_b = beam_mod.beam_search_ids(
        params, pre, T, beam_size=W, compute_dtype=F32
    )

    def path_logprob(ids):
        """Sum log-softmax of the emitted token at each step, stopping the
        accumulation after <stop> (id 3), mirroring finished-beam freezing."""
        B = ids.shape[0]
        h = c = jnp.zeros((B, DIMS.hidden_dim), F32)
        word = jnp.full((B,), 2, jnp.int32)
        total = np.zeros(B)
        alive = np.ones(B, bool)
        for t in range(T):
            h, c, logits = decoder_mod.step(params, pre, word, h, c, compute_dtype=F32)
            logp = np.asarray(jax.nn.log_softmax(logits, -1))
            tok = np.asarray(ids[:, t])
            total += np.where(alive, logp[np.arange(B), tok], 0.0)
            alive = alive & (tok != 3)
            word = jnp.asarray(tok)
        return total

    greedy = decoder_mod.greedy_decode_ids(params, pre, T, compute_dtype=F32)
    lp_beam = path_logprob(ids_b)
    lp_greedy = path_logprob(greedy)
    assert np.all(lp_beam >= lp_greedy - 1e-4), (lp_beam, lp_greedy)
    np.testing.assert_allclose(np.asarray(scores_b), lp_beam, atol=1e-3)


def test_finished_beams_pad(setup):
    """After a beam emits <stop>, it must only emit <pad>."""
    params, pre = setup
    ids, _ = beam_mod.beam_search_ids(
        params, pre, 10, beam_size=3, compute_dtype=F32
    )
    arr = np.asarray(ids)
    for row in arr:
        seen_stop = False
        for tok in row:
            if seen_stop:
                assert tok == 0, row
            if tok == 3:
                seen_stop = True


def test_length_norm_semantics(monkeypatch):
    """GNMT-style length normalization: raw sum-log-prob favors the short
    hypothesis, dividing by len**alpha flips the pick to the longer beam
    with the better per-token score — on a hand-crafted step distribution
    (ids: 0 pad, 1 unk, 2 start, 3 stop, 4 'A', 5 'B')."""
    V, H, B, W, T = 6, 4, 1, 2, 3
    LO = -20.0

    def crafted_step(params, pre, word, h, c, parity_mode=False,
                     padding_idx=0, compute_dtype=F32):
        # from <start>: p(stop)=.6 (short path), p(A)=.39 (long path's 1st)
        from_start = jnp.full((V,), LO).at[3].set(jnp.log(0.6)).at[4].set(
            jnp.log(0.39)
        )
        # from A: p(stop)~1 after normalization -> long path ~free 2nd step
        from_a = jnp.full((V,), LO).at[3].set(jnp.log(0.95))
        other = jnp.full((V,), LO)  # unreached beams
        logits = jnp.where(
            (word == 2)[:, None], from_start[None],
            jnp.where((word == 4)[:, None], from_a[None], other[None]),
        )
        return h, c, logits

    monkeypatch.setattr(decoder_mod, "step", crafted_step)
    params = {
        "p_hid": {"w": jnp.zeros((H, H), F32), "b": jnp.zeros((H,), F32)},
        "embedding": {"table": jnp.zeros((V, 8), F32)},
    }
    z = jnp.zeros((B, 2, H), F32)
    pre = decoder_mod.Precomputed(
        z, z, jnp.zeros((B, H), F32), jnp.zeros((B, 4 * H), F32),
        jnp.zeros((B, H), F32),
    )

    def logZ(p):  # crafted rows are unnormalized; mirror log_softmax
        return np.log(np.sum(p) + (V - len(p)) * np.exp(LO))

    lp_stop = np.log(0.6) - logZ([0.6, 0.39])
    lp_a = np.log(0.39) - logZ([0.6, 0.39])
    lp_a_stop = np.log(0.95) - logZ([0.95])
    short_raw, long_raw = lp_stop, lp_a + lp_a_stop
    assert short_raw > long_raw and long_raw / 2 > short_raw  # test is rigged

    kw = dict(max_length=T, beam_size=W, compute_dtype=F32)
    ids, score = beam_mod.beam_search_ids(params, pre, length_norm=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(ids)[0], [3, 0, 0])
    np.testing.assert_allclose(float(score[0]), short_raw, rtol=1e-5)

    ids, score = beam_mod.beam_search_ids(params, pre, length_norm=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(ids)[0], [4, 3, 0])
    np.testing.assert_allclose(float(score[0]), long_raw / 2, rtol=1e-5)

    # early_stop path applies the same normalization
    ids_es, score_es = beam_mod.beam_search_ids(
        params, pre, length_norm=1.0, early_stop=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_es)[0], [4, 3, 0])
    np.testing.assert_allclose(float(score_es[0]), long_raw / 2, rtol=1e-5)


def test_beam_early_stop_matches_fixed_scan():
    """early_stop while_loop beam == fixed-length scan beam, id-for-id, on a
    model biased to finish early (stop logit boosted)."""
    import jax

    params = decoder_mod.init(jax.random.PRNGKey(3), DIMS)
    params = dict(params)
    params["out_bias"] = params["out_bias"].at[3].add(3.0)  # finish in a few steps
    rng = np.random.RandomState(3)
    B, k, H = 5, 4, DIMS.hidden_dim
    img_embed = jnp.asarray(rng.rand(B, k, H), jnp.float32)
    global_feat = jnp.asarray(rng.rand(B, H), jnp.float32)
    pre = decoder_mod.precompute(params, img_embed, global_feat, jnp.float32)

    kw = dict(max_length=9, beam_size=3, start_idx=2, stop_idx=3,
              padding_idx=0, compute_dtype=jnp.float32)
    ids_scan, sc_scan = beam_mod.beam_search_ids(params, pre, **kw)
    ids_es, sc_es = beam_mod.beam_search_ids(params, pre, early_stop=True, **kw)
    np.testing.assert_array_equal(np.asarray(ids_es), np.asarray(ids_scan))
    np.testing.assert_allclose(np.asarray(sc_es), np.asarray(sc_scan), rtol=1e-6)

    # and on a model that never stops (worst case: full-length run)
    params["out_bias"] = params["out_bias"].at[3].add(-100.0)
    pre = decoder_mod.precompute(params, img_embed, global_feat, jnp.float32)
    ids_scan, _ = beam_mod.beam_search_ids(params, pre, **kw)
    ids_es, _ = beam_mod.beam_search_ids(params, pre, early_stop=True, **kw)
    np.testing.assert_array_equal(np.asarray(ids_es), np.asarray(ids_scan))
