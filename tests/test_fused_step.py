"""Equivalence tests for the fused decode-step Pallas kernel
(ops/pallas/fused_step.py) against (a) its own XLA oracle and (b) the
unfused step_core/head path it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myimagecaptioningmodel_tpu.models import decoder as D
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims
from myimagecaptioningmodel_tpu.ops.pallas import fused_step as FS


@pytest.fixture(scope="module")
def setup():
    # dims must satisfy decoder.pallas_dims_ok (padded vocab >= 2048,
    # 128-aligned E/H) so the decoder-level tests actually take the fused
    # dispatch instead of the undersized-dims XLA fallback
    dims = DecoderDims(
        vocab_size=2000, embedding_size=128, hidden_dim=256,
        feat_channels=1280, vocab_pad_multiple=128,
    )
    params = D.init(jax.random.PRNGKey(0), dims)
    rng = np.random.RandomState(0)
    B, k, H = 16, 49, dims.hidden_dim
    img_embed = jnp.asarray(rng.rand(B, k, H), jnp.float32)
    global_feat = jnp.asarray(rng.rand(B, H), jnp.float32)
    pre = D.precompute(params, img_embed, global_feat, jnp.float32)
    assert D.pallas_dims_ok(params), "fixture must exercise the fused path"
    return dims, params, pre, B, H


def test_pallas_dims_gate_rejects_tiny_models():
    """Undersized models (toy CLIs, unit tests) must fall back to the XLA
    scan/head: Mosaic rejects e.g. a [V=128] bias against the 2048-row
    BlockSpec (observed as a compile failure on v5e)."""
    tiny = DecoderDims(vocab_size=14, embedding_size=8, hidden_dim=16,
                       feat_channels=12)
    params = D.init(jax.random.PRNGKey(0), tiny)
    assert not D.pallas_dims_ok(params)
    # greedy decode with use_pallas=True must silently take the fallback
    rng = np.random.RandomState(0)
    img_embed = jnp.asarray(rng.rand(4, 5, 16), jnp.float32)
    global_feat = jnp.asarray(rng.rand(4, 16), jnp.float32)
    pre = D.precompute(params, img_embed, global_feat, jnp.float32)
    ids = D.greedy_decode_ids(
        params, pre, max_length=5, start_idx=2, parity_mode=False,
        padding_idx=0, compute_dtype=jnp.float32, use_pallas=True,
    )
    assert ids.shape == (4, 5)


def test_fused_step_matches_oracle_interpret(setup):
    """Pallas (interpret) == the XLA oracle of the same math, f32-exact."""
    dims, params, pre, B, H = setup
    fp = FS.prepare(params, pre, padding_idx=0, dt=jnp.float32)
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
    c = jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
    word = jnp.asarray(rng.randint(0, dims.vocab_size, (B,)), jnp.int32)
    word_emb = jnp.take(fp.emb_table, word, axis=0)

    hk, ck, projk, idk = FS.fused_decode_step(
        fp, word_emb, h, c, pre.img_k, pre.img_v,
        with_head=True, compute_dtype=jnp.float32, interpret=True,
    )
    ho, co, projo, ido = FS.reference_step(
        fp, word_emb, h, c, pre.img_k, pre.img_v,
        with_head=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(hk), np.asarray(ho), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ck), np.asarray(co), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(projk), np.asarray(projo), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idk), np.asarray(ido))


def test_oracle_matches_step_core(setup):
    """The kernel math == the unfused step_core + head_logits path (f32)."""
    dims, params, pre, B, H = setup
    fp = FS.prepare(params, pre, padding_idx=0, dt=jnp.float32)
    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
    c = jnp.asarray(rng.randn(B, H), jnp.float32) * 0.1
    word = jnp.asarray(rng.randint(0, dims.vocab_size, (B,)), jnp.int32)

    h1, c1, proj1 = D.step_core(
        params, pre, word, h, c, parity_mode=False, padding_idx=0,
        compute_dtype=jnp.float32,
    )
    ids1 = jnp.argmax(D.head_logits(params, proj1, jnp.float32), axis=-1)

    word_emb = jnp.take(fp.emb_table, word, axis=0)
    h2, c2, proj2, ids2 = FS.reference_step(
        fp, word_emb, h, c, pre.img_k, pre.img_v,
        with_head=True, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(proj1), np.asarray(proj2), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_padding_word_embeds_to_zero(setup):
    dims, params, pre, B, H = setup
    fp = FS.prepare(params, pre, padding_idx=0, dt=jnp.float32)
    we = jnp.take(fp.emb_table, jnp.zeros((B,), jnp.int32), axis=0)
    assert float(jnp.abs(we).max()) == 0.0


def test_fused_greedy_scan_matches_unfused(setup):
    """Full greedy decode via the fused-kernel scan (interpret) == the
    unfused scan path, id-for-id, in f32."""
    dims, params, pre, B, H = setup
    import myimagecaptioningmodel_tpu.ops.pallas.fused_step as fs_mod

    # monkeypatch fused_decode_step to interpret mode for CPU execution
    orig = fs_mod.fused_decode_step
    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)
    fs_mod.fused_decode_step = interp
    try:
        ids_fused = D.greedy_decode_ids(
            params, pre, max_length=7, start_idx=2, parity_mode=False,
            padding_idx=0, compute_dtype=jnp.float32, use_pallas=True,
        )
    finally:
        fs_mod.fused_decode_step = orig
    ids_ref = D.greedy_decode_ids(
        params, pre, max_length=7, start_idx=2, parity_mode=False,
        padding_idx=0, compute_dtype=jnp.float32, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


@pytest.mark.parametrize("small_b", [1, 5])
@pytest.mark.parametrize("early_stop", [False, True])
def test_fused_greedy_pads_small_batches(setup, small_b, early_stop):
    """Batches below/off the 8-row tile gate are PADDED into the fused
    kernel (the single-image CLI fast path — BASELINE config #1): the
    kernel must see a padded batch and the real rows' ids must equal the
    unfused scan's, for both the fixed-length and early-stop decodes."""
    dims, params, pre, B, H = setup
    pre_s = D.Precomputed(*(x[:small_b] for x in pre))
    import myimagecaptioningmodel_tpu.ops.pallas.fused_step as fs_mod

    orig = fs_mod.fused_decode_step
    seen_batches = []

    def interp(fp, word_emb, *args, **kw):
        kw["interpret"] = True
        seen_batches.append(word_emb.shape[0])
        return orig(fp, word_emb, *args, **kw)

    fs_mod.fused_decode_step = interp
    try:
        ids_fused = D.greedy_decode_ids(
            params, pre_s, max_length=6, start_idx=2, parity_mode=False,
            padding_idx=0, compute_dtype=jnp.float32, use_pallas=True,
            early_stop=early_stop,
        )
    finally:
        fs_mod.fused_decode_step = orig
    assert seen_batches and all(b == 8 for b in seen_batches), seen_batches
    assert ids_fused.shape == (small_b, 6)
    ids_ref = D.greedy_decode_ids(
        params, pre_s, max_length=6, start_idx=2, parity_mode=False,
        padding_idx=0, compute_dtype=jnp.float32, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))
