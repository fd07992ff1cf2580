"""Equivalence tests for the whole-decode fused transformer kernel
(ops/pallas/fused_transformer.py) against the XLA KV-cached scan path it
replaces (models/transformer.py greedy_decode_ids, use_pallas=False) —
id-for-id in f32 via interpret mode; the bf16 on-chip equality is pinned by
benchmarks/verify_fused_transformer_onchip.py (the suite is CPU-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myimagecaptioningmodel_tpu.models import transformer as TF
from myimagecaptioningmodel_tpu.models.transformer import (
    TransformerDims,
    TransformerPre,
)
from myimagecaptioningmodel_tpu.ops.pallas import fused_transformer as FT


@pytest.fixture(scope="module")
def setup():
    # smallest dims that pass fused_dims_ok: D/E 128-aligned, dh=128,
    # padded vocab >= 2048; M=6 exercises the single-chunk mem path,
    # T=5 < max_positions exercises the clamped last-step embed
    dims = TransformerDims(
        vocab_size=2050, embedding_size=128, model_dim=256, num_layers=2,
        num_heads=2, mlp_ratio=2, max_positions=6, vocab_pad_multiple=2,
    )
    params = TF.init(jax.random.PRNGKey(0), dims)
    rng = np.random.RandomState(0)
    B, M = 8, 6
    img_embed = jnp.asarray(rng.rand(B, M - 1, dims.model_dim), jnp.float32)
    global_feat = jnp.asarray(rng.rand(B, dims.model_dim), jnp.float32)
    pre = TF.precompute(
        params, img_embed, global_feat, dims.num_heads, jnp.float32
    )
    assert FT.fused_dims_ok(params, dims, B, 5)
    return dims, params, pre, B, img_embed, global_feat


def _interp_fused(monkeypatch):
    orig = FT.fused_greedy_decode

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(FT, "fused_greedy_decode", interp)
    return orig


def test_fused_decode_matches_xla_f32(setup, monkeypatch):
    """Whole-decode kernel (interpret) == the XLA KV-cached scan, id-for-id
    in f32 (bf16 rounding points become no-ops, so the paths are exact)."""
    dims, params, pre, B, _ie, _gf = setup
    _interp_fused(monkeypatch)
    ids_fused = TF.greedy_decode_ids(
        params, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    ids_ref = TF.greedy_decode_ids(
        params, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False,
    )
    assert ids_fused.shape == (B, 5)
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


@pytest.mark.parametrize("small_b", [1, 3])
def test_fused_decode_pads_small_batches(setup, monkeypatch, small_b):
    """B below the 8-row gate is padded into the kernel and sliced back —
    the transformer analog of the LSTM family's single-image fast path."""
    dims, params, pre, B, _ie, _gf = setup
    _interp_fused(monkeypatch)
    pre_s = TransformerPre(
        tuple(k[:small_b] for k in pre.mem_k),
        tuple(v[:small_b] for v in pre.mem_v),
    )
    ids_fused = TF.greedy_decode_ids(
        params, pre_s, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    ids_ref = TF.greedy_decode_ids(
        params, pre_s, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False,
    )
    assert ids_fused.shape == (small_b, 5)
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


def test_fused_decode_multi_mem_chunks(monkeypatch):
    """M > 32 (and M not sublane-aligned) through the resident cross-attn
    memory path — the production M=49 shape class."""
    dims = TransformerDims(
        vocab_size=2050, embedding_size=128, model_dim=256, num_layers=1,
        num_heads=2, mlp_ratio=2, max_positions=4, vocab_pad_multiple=2,
    )
    params = TF.init(jax.random.PRNGKey(1), dims)
    rng = np.random.RandomState(1)
    B, M = 8, 50
    img_embed = jnp.asarray(rng.rand(B, M - 1, dims.model_dim), jnp.float32)
    global_feat = jnp.asarray(rng.rand(B, dims.model_dim), jnp.float32)
    pre = TF.precompute(
        params, img_embed, global_feat, dims.num_heads, jnp.float32
    )
    _interp_fused(monkeypatch)
    ids_fused = TF.greedy_decode_ids(
        params, pre, dims, max_length=3, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    ids_ref = TF.greedy_decode_ids(
        params, pre, dims, max_length=3, compute_dtype=jnp.float32,
        use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


def test_int8_artifact_streams_int8_and_matches_xla_ids(setup, monkeypatch):
    """An int8-quantized artifact keeps its four weight streams int8 in HBM
    (HALF the decode's dominant traffic — the point of the quantized
    bundle), and the fused decode's ids match the XLA int8 path id-for-id:
    the kernel applies each per-output-channel scale to the consumer dot's
    OUTPUT, the exact ``(x @ w_q) * scale`` of ops/layers.py dense."""
    dims, params, pre, B, _ie, _gf = setup
    q = TF.quantize_transformer_decoder(params)
    ftp_q = FT.prepare(q, pre, dims.num_heads, jnp.float32)
    assert ftp_q.w_qkv.dtype == jnp.int8
    assert ftp_q.w_fc2t.dtype == jnp.int8
    assert ftp_q.w_scales is not None
    _interp_fused(monkeypatch)
    ids_fused = TF.greedy_decode_ids(
        q, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    ids_ref = TF.greedy_decode_ids(
        q, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


def test_quantize_kv_exact_on_integer_memory(setup, monkeypatch):
    """quantize_kv plumbing pinned exactly: with integer-valued memory whose
    per-channel absmax is exactly 127, the int8 quantization grid is the
    identity (scale == 1.0), so the int8-kv decode must equal the
    full-precision fused decode id-for-id — this exercises the quantize /
    int8-stream / scale-folding path with zero tolerance. (On real-valued
    memory the mode is approximate by design; its quality is a serving
    property, measured on trained models.)"""
    dims, params, pre, B, _ie, _gf = setup
    rng = np.random.RandomState(3)
    dh = dims.model_dim // dims.num_heads

    def int_mem(shape):
        m = rng.randint(-127, 128, shape).astype(np.float32)
        m[0, 0] = 127.0  # every feature channel sees absmax exactly 127
        return jnp.asarray(m)

    M = 6
    pre_i = TransformerPre(
        tuple(
            int_mem((B, M, dims.num_heads, dh)) for _ in range(dims.num_layers)
        ),
        tuple(
            int_mem((B, M, dims.num_heads, dh)) for _ in range(dims.num_layers)
        ),
    )
    _interp_fused(monkeypatch)
    ids_kv = TF.greedy_decode_ids(
        params, pre_i, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True, quantize_kv=True,
    )
    ids_full = TF.greedy_decode_ids(
        params, pre_i, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    np.testing.assert_array_equal(np.asarray(ids_kv), np.asarray(ids_full))
    # the XLA fallback's quantize_kv emulation (quantize_kv_pre) uses the
    # same grid: identity here too, so all three paths agree id-for-id
    ids_xla_kv = TF.greedy_decode_ids(
        params, pre_i, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False, quantize_kv=True,
    )
    np.testing.assert_array_equal(np.asarray(ids_xla_kv), np.asarray(ids_full))


def test_precompute_mbd_matches_packed_pre(setup):
    """precompute_mbd (projections on the pre-transposed memory, emitted
    directly in kernel layout) packs to the SAME [L, 2, M, B, D] tensor as
    packing a standard heads-layout TransformerPre — bitwise: each output
    row is the same row-by-column MXU contraction."""
    dims, params, pre, B, img_embed, global_feat = setup
    pre_mbd = TF.precompute_mbd(params, img_embed, global_feat, jnp.float32)
    ftp_a = FT.prepare(params, pre, dims.num_heads, jnp.float32)
    ftp_b = FT.prepare(params, pre_mbd, dims.num_heads, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ftp_a.mem_kv), np.asarray(ftp_b.mem_kv)
    )


def test_mbd_pre_decodes_and_falls_back(setup, monkeypatch):
    """greedy_decode_ids accepts the MBD-layout pre on the fused path
    (same ids as the standard pre), and converts it back to the per-head
    layout when the gate rejects the shape (max_length beyond the learned
    positions forces the XLA fallback here)."""
    dims, params, pre, B, img_embed, global_feat = setup
    pre_mbd = TF.precompute_mbd(params, img_embed, global_feat, jnp.float32)
    _interp_fused(monkeypatch)
    ids_mbd = TF.greedy_decode_ids(
        params, pre_mbd, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    ids_std = TF.greedy_decode_ids(
        params, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True,
    )
    np.testing.assert_array_equal(np.asarray(ids_mbd), np.asarray(ids_std))
    # early_stop with an MBD pre at 3 rows: pads into the fused kernel
    # (early_stop is fused since r5) and must match the XLA early-stop path
    pre_mbd3 = TF.TransformerPreMBD(pre_mbd.mem_kv[:, :, :, :3, :])
    pre3 = TransformerPre(
        tuple(k[:3] for k in pre.mem_k), tuple(v[:3] for v in pre.mem_v)
    )
    ids_fb = TF.greedy_decode_ids(
        params, pre_mbd3, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True, early_stop=True,
    )
    ids_xla = TF.greedy_decode_ids(
        params, pre3, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False, early_stop=True,
    )
    np.testing.assert_array_equal(np.asarray(ids_fb), np.asarray(ids_xla))


@pytest.mark.parametrize("stop_bias", [0.0, 2.5, 1e4])
def test_fused_early_stop_matches_xla(setup, monkeypatch, stop_bias):
    """In-kernel early stop == the XLA while_loop early-stop path id-for-id
    (VERDICT r4 #2): done rows emit <pad>, a row is done once it emits
    <stop>, post-all-done steps write nothing (ids stay <pad>). Three
    regimes: never stops (random params), mixed mid-decode stops (a modest
    stop bias makes rows stop at different steps), all-stop-at-step-0 (the
    best-case bracket the bench measures)."""
    dims, params, pre, B, _ie, _gf = setup
    p = dict(params)
    p["out_bias"] = params["out_bias"].at[3].add(stop_bias)
    _interp_fused(monkeypatch)
    ids_fused = TF.greedy_decode_ids(
        p, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True, early_stop=True,
    )
    ids_ref = TF.greedy_decode_ids(
        p, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False, early_stop=True,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))
    if stop_bias >= 1e4:  # all rows stop at step 0; rest is <pad>
        assert np.all(np.asarray(ids_fused)[:, 0] == 3)
        assert np.all(np.asarray(ids_fused)[:, 1:] == 0)


def test_fused_early_stop_padded_batch(setup, monkeypatch):
    """Gate-padded rows start done under early_stop (they must not keep the
    batch alive past the real rows' last <stop>), and the sliced-back ids
    still match the XLA early-stop path on the unpadded batch."""
    dims, params, pre, B, _ie, _gf = setup
    p = dict(params)
    p["out_bias"] = params["out_bias"].at[3].add(1e4)  # all stop at step 0
    _interp_fused(monkeypatch)
    pre_s = TransformerPre(
        tuple(k[:3] for k in pre.mem_k), tuple(v[:3] for v in pre.mem_v)
    )
    ids_fused = TF.greedy_decode_ids(
        p, pre_s, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=True, early_stop=True,
    )
    ids_ref = TF.greedy_decode_ids(
        p, pre_s, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False, early_stop=True,
    )
    assert ids_fused.shape == (3, 5)
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


def test_gate_rejects_tiny_and_early_stop(setup):
    dims, params, pre, B, _ie, _gf = setup
    tiny = TransformerDims(
        vocab_size=50, embedding_size=8, model_dim=16, num_layers=1,
        num_heads=2, mlp_ratio=2, max_positions=4,
    )
    tiny_params = TF.init(jax.random.PRNGKey(2), tiny)
    assert not FT.fused_dims_ok(tiny_params, tiny, 8, 3)
    # max_length beyond the learned positions must be rejected
    assert not FT.fused_dims_ok(params, dims, 8, 99)
    # the XLA while_loop early-stop fallback (use_pallas=False here because
    # the fused VOCAB-HEAD path is TPU-only) stays shape-correct
    ids = TF.greedy_decode_ids(
        params, pre, dims, max_length=5, compute_dtype=jnp.float32,
        use_pallas=False, early_stop=True,
    )
    assert ids.shape == (B, 5)


# ---- whole-decode fused beam search (fused_beam_decode) ---------------------


def _interp_fused_beam(monkeypatch):
    orig = FT.fused_beam_decode

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(FT, "fused_beam_decode", interp)


def test_fused_beam_matches_xla_f32(setup, monkeypatch):
    """Whole-decode beam kernel (interpret) == the XLA beam scan, id-for-id
    AND score-for-score in f32. The XLA reference is the full-V top-k path
    (use_pallas=False); the kernel's per-beam top-W candidate trick is exact
    (at most W winners can come from one beam), so ids must agree wherever
    logits are tie-free (random untrained weights in f32)."""
    dims, params, pre, B, _ie, _gf = setup
    _interp_fused_beam(monkeypatch)
    assert FT.fused_beam_dims_ok(params, dims, B, 4, 5)
    ids_fused, sc_fused = TF.beam_search_ids(
        params, pre, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=True, length_norm=0.7,
    )
    ids_ref, sc_ref = TF.beam_search_ids(
        params, pre, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=False, length_norm=0.7,
    )
    assert ids_fused.shape == (B, 5)
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))
    np.testing.assert_allclose(
        np.asarray(sc_fused), np.asarray(sc_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("stop_bias", [3.0, 30.0])
def test_fused_beam_early_stop_matches(setup, monkeypatch, stop_bias):
    """Early-stop beam: once every beam of every image is finished the
    kernel skips the remaining grid steps; the truncated steps keep the
    prefill (pad words, identity back-pointers), so ids/scores equal the
    fixed-length XLA run. stop_bias=30 stops everything at step 1;
    stop_bias=3 mixes finished and live beams across several steps."""
    dims, params, pre, B, _ie, _gf = setup
    _interp_fused_beam(monkeypatch)
    p = dict(params)
    p["out_bias"] = params["out_bias"].at[3].add(stop_bias)
    ids_fused, sc_fused = TF.beam_search_ids(
        p, pre, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=True, early_stop=True,
    )
    ids_ref, sc_ref = TF.beam_search_ids(
        p, pre, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=False, early_stop=False,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))
    np.testing.assert_allclose(
        np.asarray(sc_fused), np.asarray(sc_ref), rtol=1e-5, atol=1e-5
    )


def test_fused_beam_int8_matches_xla_int8(setup, monkeypatch):
    """int8 beam serving: the kernel streams the int8 weights and must match
    the XLA beam on the SAME quantized params exactly (identical dequant
    math, f32 compute)."""
    dims, params, pre, B, _ie, _gf = setup
    _interp_fused_beam(monkeypatch)
    qp = TF.quantize_transformer_decoder(params)
    ids_fused, _ = TF.beam_search_ids(
        qp, pre, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=True,
    )
    ids_ref, _ = TF.beam_search_ids(
        qp, pre, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ids_fused), np.asarray(ids_ref))


def test_fused_beam_gate_rejects_ragged_images(setup):
    """n_img not a multiple of 8 cannot slice slot-major query groups on
    sublane boundaries -> XLA fallback (shape-correct)."""
    dims, params, pre, B, _ie, _gf = setup
    assert not FT.fused_beam_dims_ok(params, dims, 6, 4, 5)
    assert not FT.fused_beam_dims_ok(params, dims, B, 1, 5)  # W=1 == greedy
    pre_s = TransformerPre(
        tuple(k[:6] for k in pre.mem_k), tuple(v[:6] for v in pre.mem_v)
    )
    ids, scores = TF.beam_search_ids(
        params, pre_s, dims, max_length=5, beam_size=4,
        compute_dtype=jnp.float32, use_pallas=True, interpret=True,
    )
    assert ids.shape == (6, 5) and scores.shape == (6,)
