"""int8 decode-path quantization: roundtrip error, greedy/beam parity on a
memorized model (large logit margins -> identical captions)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from myimagecaptioningmodel_tpu.inference import beam as beam_mod
from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims
from myimagecaptioningmodel_tpu.ops.quantization import (
    dequantize,
    is_quantized,
    quantize_decoder,
    quantize_weight,
)

F32 = jnp.float32


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32) * 0.3, F32)
    w_q, scale = quantize_weight(w, axis=0)
    assert w_q.dtype == jnp.int8 and scale.shape == (32,)
    back = dequantize(w_q, scale, axis=0, dtype=F32)
    err = float(jnp.abs(back - w).max())
    assert err <= float(jnp.abs(w).max()) / 127.0 + 1e-6


def test_quantized_decoder_matches_full_precision_logits():
    dims = DecoderDims(vocab_size=23, embedding_size=8, hidden_dim=16,
                       feat_channels=12)
    params = decoder_mod.init(jax.random.PRNGKey(0), dims)
    qparams = quantize_decoder(params)
    assert is_quantized(qparams["lstm"]) and is_quantized(qparams["embedding"])
    assert "w" not in qparams["lstm"]  # int8 replaces the f32 copy

    rng = np.random.RandomState(1)
    pre_f = decoder_mod.precompute(
        params,
        jnp.asarray(rng.randn(2, 4, 16), F32),
        jnp.asarray(rng.randn(2, 16), F32), F32,
    )
    pre_q = decoder_mod.precompute(
        qparams,
        jnp.asarray(rng.randn(2, 4, 16), F32) * 0 + pre_f.img_v * 0,  # unused
        pre_f.global_feat, F32,
    )
    # use the same image features for both
    pre_q = pre_q._replace(img_v=pre_f.img_v, img_k=pre_f.img_k)

    h = c = jnp.zeros((2, 16), F32)
    word = jnp.asarray([2, 5])
    _, _, logits_f = decoder_mod.step(params, pre_f, word, h, c, compute_dtype=F32)
    _, _, logits_q = decoder_mod.step(qparams, pre_q, word, h, c, compute_dtype=F32)
    # int8 error is small relative to the logit scale
    scale = float(jnp.abs(logits_f).max()) + 1e-6
    assert float(jnp.abs(logits_f - logits_q).max()) / scale < 0.1


def test_quantized_decode_reproduces_memorized_captions():
    """Train a tiny decoder to memorize captions; int8 decode must emit the
    same captions greedy AND beam (margins dwarf quantization error)."""
    dims = DecoderDims(vocab_size=12, embedding_size=8, hidden_dim=32,
                       feat_channels=16)
    params = decoder_mod.init(jax.random.PRNGKey(0), dims)
    rng = np.random.RandomState(0)
    p_img_feat = jnp.asarray(rng.randn(2, 4, 32), F32)
    global_feat = jnp.asarray(rng.randn(2, 32), F32)
    caps = jnp.asarray([[2, 4, 5, 6, 3, 0], [2, 7, 8, 9, 3, 0]], jnp.int32)
    source, target = caps[:, :-1], caps[:, 1:]
    mask = (target != 0).astype(F32)

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            pre = decoder_mod.precompute(p, p_img_feat, global_feat, F32)
            logits = decoder_mod.teacher_forcing_logits(p, pre, source,
                                                        compute_dtype=F32)
            logz = jax.nn.logsumexp(logits, -1)
            gold = jnp.take_along_axis(logits, target[..., None], -1)[..., 0]
            return jnp.sum((logz - gold) * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(300):
        params, opt_state, loss = train_step(params, opt_state)
    assert float(loss) < 0.05

    def caption(row):  # truncate at <stop> (post-stop tokens are untrained)
        out = []
        for tok in row:
            if tok == 3:
                break
            out.append(int(tok))
        return out

    pre = decoder_mod.precompute(params, p_img_feat, global_feat, F32)
    ids_full = np.asarray(
        decoder_mod.greedy_decode_ids(params, pre, 5, compute_dtype=F32)
    )

    qparams = quantize_decoder(params)
    pre_q = decoder_mod.precompute(qparams, p_img_feat, global_feat, F32)
    ids_q = np.asarray(
        decoder_mod.greedy_decode_ids(qparams, pre_q, 5, compute_dtype=F32)
    )
    for a, b in zip(ids_full, ids_q):
        assert caption(a) == caption(b), (a, b)

    ids_beam_q, _ = beam_mod.beam_search_ids(qparams, pre_q, 5, beam_size=3,
                                             compute_dtype=F32)
    for a, b in zip(ids_full, np.asarray(ids_beam_q)):
        assert caption(a) == caption(b), (a, b)


def test_early_stop_decode_matches_fixed_scan():
    """while_loop early-exit greedy == fixed-length scan captions (the
    memorized model emits <stop> before max_length)."""
    dims = DecoderDims(vocab_size=12, embedding_size=8, hidden_dim=32,
                       feat_channels=16)
    params = decoder_mod.init(jax.random.PRNGKey(0), dims)
    rng = np.random.RandomState(0)
    p_img_feat = jnp.asarray(rng.randn(2, 4, 32), F32)
    global_feat = jnp.asarray(rng.randn(2, 32), F32)
    caps = jnp.asarray([[2, 4, 5, 6, 3, 0], [2, 7, 3, 0, 0, 0]], jnp.int32)
    source, target = caps[:, :-1], caps[:, 1:]
    mask = (target != 0).astype(F32)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            pre = decoder_mod.precompute(p, p_img_feat, global_feat, F32)
            logits = decoder_mod.teacher_forcing_logits(p, pre, source,
                                                        compute_dtype=F32)
            logz = jax.nn.logsumexp(logits, -1)
            gold = jnp.take_along_axis(logits, target[..., None], -1)[..., 0]
            return jnp.sum((logz - gold) * mask) / jnp.sum(mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(300):
        params, opt_state, loss = train_step(params, opt_state)
    assert float(loss) < 0.1

    pre = decoder_mod.precompute(params, p_img_feat, global_feat, F32)
    fixed = np.asarray(
        decoder_mod.greedy_decode_ids(params, pre, 8, compute_dtype=F32)
    )
    early = np.asarray(
        jax.jit(lambda p, pre: decoder_mod.greedy_decode_ids(
            p, pre, 8, compute_dtype=F32, early_stop=True
        ))(params, pre)
    )

    def caption(row):
        out = []
        for tok in row:
            if tok == 3:
                break
            out.append(int(tok))
        return out

    for a, b in zip(fixed, early):
        assert caption(a) == caption(b), (a, b)
    # post-stop positions are <pad> in the early-stop variant
    for row in early:
        seen = False
        for tok in row:
            if seen:
                assert tok == 0, row
            if tok == 3:
                seen = True
