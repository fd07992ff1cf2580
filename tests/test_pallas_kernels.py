"""Pallas kernel tests (interpreter mode on CPU; the same kernels compile to
Mosaic on real TPU — exercised by bench.py and the driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from myimagecaptioningmodel_tpu.ops.pallas import vocab_head as vh


@pytest.mark.parametrize("V", [100, 2048, 5000])
def test_vocab_argmax_matches_reference(V):
    rng = np.random.RandomState(0)
    B, E = 16, 32
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table = jnp.asarray(rng.randn(V, E), jnp.float32)
    bias = jnp.asarray(rng.randn(V), jnp.float32)
    ref = vh.greedy_vocab_argmax_reference(proj, table, bias)
    out = vh.greedy_vocab_argmax(proj, table, bias, block_v=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_vocab_argmax_tail_block_masked():
    """V not divisible by the block: padded tail must never win."""
    rng = np.random.RandomState(1)
    B, E, V = 8, 16, 1000  # 1000 % 512 != 0
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table = jnp.asarray(rng.randn(V, E), jnp.float32)
    bias = jnp.asarray(np.full(V, 5.0), jnp.float32)  # big bias: tail would win if unmasked
    ref = vh.greedy_vocab_argmax_reference(proj, table, bias)
    out = vh.greedy_vocab_argmax(proj, table, bias, block_v=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert int(np.asarray(out).max()) < V


def test_vocab_argmax_int8_table():
    """Quantized path: int8 table + per-row scale == XLA quantized head."""
    rng = np.random.RandomState(2)
    B, E, V = 8, 32, 1500
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table_q = jnp.asarray(rng.randint(-127, 128, (V, E)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, V), jnp.float32)
    bias = jnp.asarray(rng.randn(V), jnp.float32)
    ref = vh.greedy_vocab_argmax_reference(proj, table_q, bias, scale=scale)
    out = vh.greedy_vocab_argmax(
        proj, table_q, bias, scale=scale, block_v=512, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("V,k,block_v", [(100, 4, 64), (2048, 4, 512), (3000, 8, 1024)])
def test_topk_head_matches_reference(V, k, block_v):
    rng = np.random.RandomState(3)
    B, E = 16, 32
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table = jnp.asarray(rng.randn(V, E), jnp.float32)
    bias = jnp.asarray(rng.randn(V), jnp.float32)
    rv, ri, rlse = vh.topk_vocab_head_reference(proj, table, bias, k=k)
    v, i, lse = vh.topk_vocab_head(
        proj, table, bias, k=k, block_v=block_v, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i))
    np.testing.assert_allclose(np.asarray(rv), np.asarray(v), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rlse), np.asarray(lse), rtol=1e-5, atol=1e-5)


def test_topk_head_int8():
    rng = np.random.RandomState(4)
    B, E, V, k = 8, 16, 1000, 4
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table_q = jnp.asarray(rng.randint(-127, 128, (V, E)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.01, 0.1, V), jnp.float32)
    bias = jnp.asarray(rng.randn(V), jnp.float32)
    rv, ri, rlse = vh.topk_vocab_head_reference(proj, table_q, bias, k=k, scale=scale)
    v, i, lse = vh.topk_vocab_head(
        proj, table_q, bias, k=k, scale=scale, block_v=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(i))
    np.testing.assert_allclose(np.asarray(rv), np.asarray(v), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rlse), np.asarray(lse), rtol=1e-4, atol=1e-4)


def test_greedy_decode_pallas_path_matches_xla():
    """use_pallas=True greedy decode (interpret) == XLA greedy decode."""
    from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

    with pltpu.force_tpu_interpret_mode():
        dims = DecoderDims(vocab_size=50, embedding_size=8, hidden_dim=16,
                           feat_channels=12)
        params = decoder_mod.init(jax.random.PRNGKey(0), dims)
        rng = np.random.RandomState(2)
        pre = decoder_mod.precompute(
            params,
            jnp.asarray(rng.randn(4, 3, dims.hidden_dim), jnp.float32),
            jnp.asarray(rng.randn(4, dims.hidden_dim), jnp.float32),
            jnp.float32,
        )
        ids_xla = decoder_mod.greedy_decode_ids(
            params, pre, 6, compute_dtype=jnp.float32, use_pallas=False
        )
        ids_pl = decoder_mod.greedy_decode_ids(
            params, pre, 6, compute_dtype=jnp.float32, use_pallas=True
        )
        np.testing.assert_array_equal(np.asarray(ids_xla), np.asarray(ids_pl))


def test_greedy_decode_pallas_int8_matches_xla():
    """Quantized decoder + use_pallas (interpret) == quantized XLA decode."""
    from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims
    from myimagecaptioningmodel_tpu.ops.quantization import quantize_decoder

    with pltpu.force_tpu_interpret_mode():
        dims = DecoderDims(vocab_size=50, embedding_size=8, hidden_dim=16,
                           feat_channels=12)
        params = quantize_decoder(decoder_mod.init(jax.random.PRNGKey(1), dims))
        rng = np.random.RandomState(5)
        pre = decoder_mod.precompute(
            params,
            jnp.asarray(rng.randn(8, 3, dims.hidden_dim), jnp.float32),
            jnp.asarray(rng.randn(8, dims.hidden_dim), jnp.float32),
            jnp.float32,
        )
        ids_xla = decoder_mod.greedy_decode_ids(
            params, pre, 6, compute_dtype=jnp.float32, use_pallas=False
        )
        ids_pl = decoder_mod.greedy_decode_ids(
            params, pre, 6, compute_dtype=jnp.float32, use_pallas=True
        )
        np.testing.assert_array_equal(np.asarray(ids_xla), np.asarray(ids_pl))


@pytest.mark.parametrize("quantize", [False, True])
def test_beam_fused_head_matches_xla(quantize):
    """Beam search with the fused top-k head == the XLA beam path."""
    from myimagecaptioningmodel_tpu.inference.beam import beam_search_ids
    from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims
    from myimagecaptioningmodel_tpu.ops.quantization import quantize_decoder

    dims = DecoderDims(vocab_size=60, embedding_size=8, hidden_dim=16,
                       feat_channels=12)
    params = decoder_mod.init(jax.random.PRNGKey(2), dims)
    if quantize:
        params = quantize_decoder(params)
    rng = np.random.RandomState(6)
    B, W = 2, 4
    pre = decoder_mod.precompute(
        params,
        jnp.asarray(rng.randn(B, 3, dims.hidden_dim), jnp.float32),
        jnp.asarray(rng.randn(B, dims.hidden_dim), jnp.float32),
        jnp.float32,
    )
    kw = dict(max_length=7, beam_size=W, compute_dtype=jnp.float32)
    ids_xla, sc_xla = beam_search_ids(params, pre, **kw)
    ids_pl, sc_pl = beam_search_ids(
        params, pre, use_pallas=True, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_xla), np.asarray(ids_pl))
    np.testing.assert_allclose(
        np.asarray(sc_xla), np.asarray(sc_pl), rtol=1e-4, atol=1e-4
    )
