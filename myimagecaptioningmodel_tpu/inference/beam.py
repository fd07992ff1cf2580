"""Batched beam-search decoding for the adaptive-attention decoder.

The reference decodes greedy-only (model_adaAttention_aic.py:119-123); beam
search is the rebuild's north-star addition (BASELINE.json configs[1]).

TPU-first design: beams are folded into the batch axis ([B*W] rows through
the same fused decode step the greedy path uses), the whole search is one
``lax.scan`` of ``infer_max_length`` steps with static shapes, and candidate
selection is ``jax.lax.top_k`` over the W*V expansion — no host round-trips,
no dynamic shapes.

Semantics:
- log-softmax scores accumulated per beam;
- a beam that has emitted ``<stop>`` is *finished*: it is forced to extend
  only with ``<pad>`` at zero incremental score, so its total score freezes
  and it keeps competing in top-k;
- ``length_norm`` (default 0 = off) divides final scores by
  ``len**length_norm`` before the final beam pick (GNMT-style);
- ``beam_size=1`` reproduces greedy decode exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
from myimagecaptioningmodel_tpu.models.decoder import Precomputed

NEG_INF = -1e9


def _tile_beams(x: jnp.ndarray, beam: int) -> jnp.ndarray:
    """[B, ...] -> [B*W, ...] with each row repeated W times."""
    return jnp.repeat(x, beam, axis=0)


def beam_search_ids(
    params,
    pre: Precomputed,
    max_length: int,
    beam_size: int = 4,
    start_idx: int = 2,
    stop_idx: int = 3,
    padding_idx: int = 0,
    length_norm: float = 0.0,
    parity_mode: bool = False,
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = False,
    interpret: bool = False,
    early_stop: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (ids [B, max_length] of the best beam, scores [B]).

    ``use_pallas=True`` replaces the [B*W, V] logits + full-vocab
    ``log_softmax`` + ``top_k`` tail of each step with the fused
    ``topk_vocab_head`` kernel: per-beam top-W candidates + logsumexp come
    straight out of VMEM, and the cross-beam selection runs on the tiny
    [B, W*W] candidate matrix. Exact w.r.t. the XLA path: for a fixed beam
    only its best W words can win a next-beam slot. Handles int8 tables.
    """
    from myimagecaptioningmodel_tpu.models.decoder import (
        _dense_in_dim,
        pallas_dims_ok,
    )

    B = pre.global_feat.shape[0]
    W = beam_size
    H = _dense_in_dim(params["p_hid"])
    emb = params["embedding"]
    V = (emb["table_q"] if "table_q" in emb else emb["table"]).shape[0]
    use_fused_head = (
        use_pallas and W > 1 and (B * W) % 8 == 0 and not parity_mode
        and pallas_dims_ok(params)
    )
    if use_fused_head:
        from myimagecaptioningmodel_tpu.ops.pallas.vocab_head import (
            topk_vocab_head,
        )

        dt = jnp.dtype(compute_dtype)
        if "table_q" in emb:  # int8 streams 1 byte/elem through the head
            head_table, head_scale = emb["table_q"], emb["scale"]
        else:
            head_table, head_scale = emb["table"].astype(dt), None

        def fused_topk(proj):
            return topk_vocab_head(
                proj, head_table, params["out_bias"], k=W,
                scale=head_scale, interpret=interpret,
            )

    pre_t = Precomputed(*(_tile_beams(t, W) for t in pre))

    h0 = jnp.zeros((B * W, H), jnp.float32)
    c0 = jnp.zeros((B * W, H), jnp.float32)
    word0 = jnp.full((B * W,), start_idx, jnp.int32)
    # only beam 0 of each batch row is live initially (all beams identical)
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((W - 1,), NEG_INF)])[None, :], (B, 1)
    ).astype(jnp.float32)
    finished0 = jnp.zeros((B, W), bool)
    lengths0 = jnp.zeros((B, W), jnp.int32)

    batch_offsets = (jnp.arange(B) * W)[:, None]  # [B,1] row base into [B*W]

    if use_fused_head:
        # the step body itself also runs as the fused Pallas kernel (weights
        # VMEM-resident; int8 params dequantized once at prepare)
        from myimagecaptioningmodel_tpu.ops.pallas import fused_step as FS

        fp = FS.prepare(params, pre_t, padding_idx, compute_dtype)
        img_k_t = pre_t.img_k.astype(compute_dtype)
        img_v_t = pre_t.img_v.astype(compute_dtype)

    def body(carry, _):
        h, c, word, scores, finished, lengths = carry
        if use_fused_head:
            word_emb = jnp.take(fp.emb_table, word, axis=0)
            h, c, proj, _w = FS.fused_decode_step(
                fp, word_emb, h, c, img_k_t, img_v_t,
                with_head=False, compute_dtype=compute_dtype,
                interpret=interpret,
            )
            vals, cand_ids, lse = fused_topk(proj)  # [B*W,W] x2, [B*W]
            logp = (vals - lse[:, None]).reshape(B, W, W)
            cand_ids = cand_ids.reshape(B, W, W)
            # finished beams: single <pad> candidate at zero cost
            pad_row = jnp.full((W,), NEG_INF).at[0].set(0.0)
            logp = jnp.where(finished[..., None], pad_row[None, None, :], logp)
            cand_ids = jnp.where(finished[..., None], padding_idx, cand_ids)
            cand = scores[..., None] + logp  # [B, W, W]
            top_scores, top_flat = jax.lax.top_k(cand.reshape(B, W * W), W)
            src_beam = top_flat // W
            new_word = jnp.take_along_axis(
                cand_ids.reshape(B, W * W), top_flat, axis=1
            ).astype(jnp.int32)
        else:
            h, c, logits = decoder_mod.step(
                params, pre_t, word, h, c, parity_mode, padding_idx, compute_dtype
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(B, W, V)

            # finished beams may only emit <pad> at zero cost
            pad_only = jnp.full((V,), NEG_INF).at[padding_idx].set(0.0)
            logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)

            cand = scores[..., None] + logp  # [B, W, V]
            top_scores, top_flat = jax.lax.top_k(cand.reshape(B, W * V), W)
            src_beam = top_flat // V  # [B, W] which beam each winner came from
            new_word = (top_flat % V).astype(jnp.int32)

        gather = (batch_offsets + src_beam).reshape(-1)  # [B*W] rows into h/c
        new_h = h[gather]
        new_c = c[gather]
        new_finished = jnp.take_along_axis(finished, src_beam, axis=1) | (
            new_word == stop_idx
        )
        prev_finished = jnp.take_along_axis(finished, src_beam, axis=1)
        new_lengths = jnp.take_along_axis(lengths, src_beam, axis=1) + (
            ~prev_finished
        ).astype(jnp.int32)

        carry = (
            new_h,
            new_c,
            new_word.reshape(-1),
            top_scores,
            new_finished,
            new_lengths,
        )
        return carry, (new_word, src_beam)

    carry0 = (h0, c0, word0, scores0, finished0, lengths0)
    if early_stop:
        # Early exit once every beam of every row is finished. The history
        # buffers are pre-filled with the post-finish steady state — <pad>
        # words and identity back-pointers — which is exactly what the scan
        # body produces after all-finished (beams are score-sorted by top_k,
        # so the all-pad candidate set re-selects them in order), so the
        # truncated run backtracks to identical sequences.
        words_buf0 = jnp.full((max_length, B, W), padding_idx, jnp.int32)
        srcs_buf0 = jnp.tile(jnp.arange(W)[None, None, :], (max_length, B, 1))

        def w_cond(state):
            t, carry, _wb, _sb = state
            return (t < max_length) & ~jnp.all(carry[4])

        def w_body(state):
            t, carry, wb, sb = state
            carry, (new_word, src_beam) = body(carry, None)
            wb = jax.lax.dynamic_update_slice(wb, new_word[None], (t, 0, 0))
            sb = jax.lax.dynamic_update_slice(
                sb, src_beam.astype(sb.dtype)[None], (t, 0, 0)
            )
            return t + 1, carry, wb, sb

        _t, (h, c, word, scores, finished, lengths), words_tm, srcs_tm = (
            jax.lax.while_loop(
                w_cond, w_body, (jnp.int32(0), carry0, words_buf0, srcs_buf0)
            )
        )
    else:
        (h, c, word, scores, finished, lengths), (words_tm, srcs_tm) = jax.lax.scan(
            body, carry0, None, length=max_length
        )

    # Backtrack: follow src_beam pointers from the final beams to step 0.
    def back(beam_ptr, step):
        words_t, srcs_t = step
        word = jnp.take_along_axis(words_t, beam_ptr, axis=1)
        beam_ptr = jnp.take_along_axis(srcs_t, beam_ptr, axis=1)
        return beam_ptr, word

    init_ptr = jnp.tile(jnp.arange(W)[None, :], (B, 1))
    _, seq_rev = jax.lax.scan(
        back, init_ptr, (words_tm[::-1], srcs_tm[::-1])
    )
    sequences = jnp.transpose(seq_rev[::-1], (1, 2, 0))  # [B, W, T]

    final_scores = scores
    if length_norm > 0:
        final_scores = scores / jnp.maximum(lengths, 1).astype(jnp.float32) ** length_norm
    best = jnp.argmax(final_scores, axis=1)  # [B]
    ids = jnp.take_along_axis(sequences, best[:, None, None], axis=1)[:, 0, :]
    best_scores = jnp.take_along_axis(final_scores, best[:, None], axis=1)[:, 0]
    return ids.astype(jnp.int32), best_scores


def beam_decode(params, state, images, opts, beam_size: int = 4,
                length_norm: float = 0.0, stop_idx: int = 3):
    """Full-model beam decode (encoder + search) -> (ids [B,T], scores [B]).

    Dispatches on the decoder family: the transformer decoder carries its
    own KV-cached beam search (models/transformer.beam_search_ids) with the
    same finished-beam / length-norm / backtracking semantics."""
    from myimagecaptioningmodel_tpu.models import captioner

    img_embed, _f, global_feat, _s = captioner.img2feature(
        params, state, images, opts, train=False
    )
    if opts.arch == "transformer":
        from myimagecaptioningmodel_tpu.models import transformer as transformer_mod

        tpre = transformer_mod.precompute(
            params["decoder"], img_embed, global_feat,
            opts.tdims.num_heads, opts.dtype,
        )
        return transformer_mod.beam_search_ids(
            params["decoder"],
            tpre,
            opts.tdims,
            opts.infer_max_length,
            beam_size,
            opts.start_idx,
            stop_idx,
            opts.padding_idx,
            length_norm,
            opts.dtype,
            use_pallas=opts.use_pallas,
            early_stop=opts.early_stop_decode,
        )
    pre = decoder_mod.precompute(params["decoder"], img_embed, global_feat, opts.dtype)
    return beam_search_ids(
        params["decoder"],
        pre,
        opts.infer_max_length,
        beam_size,
        opts.start_idx,
        stop_idx,
        opts.padding_idx,
        length_norm,
        opts.parity_mode,
        opts.dtype,
        use_pallas=opts.use_pallas,
        early_stop=opts.early_stop_decode,
    )
