"""Adaptive-attention ("visual sentinel") LSTM decoder with tied embeddings.

Functional JAX rebuild of reference model/model_adaAttention_aic.py:40-135
(the architecture of Lu et al. 2017 "Knowing When to Look"). One decode step
(reference :77-127, SURVEY §3.5):

    word ──embed(E)──┐
                     ├ xt = [word_emb ; global_img_feat]      (:84-86)
    h_prev,c_prev ──► lstm(xt) -> h, c                         (:87-88)
    sentinel = σ(fc(xt) + fc(h_prev)) ⊙ tanh(c)                (:89-92)
    p_hid    = tanh(fc(h))                                     (:99)
    keys     = [img_feat_k ; fc(sentinel)] + fc(p_hid)         (:102-105)
    alpha    = attention over k+1 slots                        (:106-107)
    ctx      = Σ alpha ⊙ [img_feat_v ; sentinel]               (:111-113)
    out      = tanh(fc(ctx + p_hid))                           (:115)
    logits   = proj(out, E) @ embedding_tableᵀ + bias          (:117, tying :15-25)

Dataflow quirks preserved exactly (SURVEY §2.2 quirk 9): the sentinel gate
reads the *previous* hidden state, the post-attention ``p_hid`` reads the
*new* one. The reference's Paddle ``While`` + ``LoDTensorArray`` loop
(:69-133) becomes ``lax.scan`` over the time axis — teacher forcing for
``sentence_length-1`` steps in training, argmax feedback for
``infer_max_length`` steps in greedy decode.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.ops import layers as L
from myimagecaptioningmodel_tpu.ops.attention import (
    adaptive_attention,
    attn_scores_fused_bwd,
    init_attention,
)
from myimagecaptioningmodel_tpu.ops.lstm import init_lstm, lstm_from_gates

Params = Dict[str, Any]


class DecoderDims(NamedTuple):
    vocab_size: int = 12295
    embedding_size: int = 256
    hidden_dim: int = 1024
    feat_channels: int = 1280  # encoder output channels
    vocab_pad_multiple: int = 1

    @property
    def padded_vocab(self) -> int:
        """Table/logits rows: vocab rounded up for MXU lane alignment and
        vocab-TP divisibility. Padded entries carry a -1e9 output bias, so
        they have softmax probability 0 (zero CE gradient) and never win the
        decode argmax/top-k."""
        m = self.vocab_pad_multiple
        return -(-self.vocab_size // m) * m

    @classmethod
    def from_config(cls, md) -> "DecoderDims":
        return cls(
            vocab_size=md.decoder.vocab_size,
            embedding_size=md.decoder.embedding_size,
            hidden_dim=md.decoder.hidden_dim,
            feat_channels=md.encoder.encoder_channel,
            vocab_pad_multiple=getattr(md.decoder, "vocab_pad_multiple", 1),
        )


def init(key, dims: DecoderDims, parity_init: bool = False) -> Params:
    """Build the decoder param pytree.

    ``parity_init=True`` uses the reference's U(-1,1) embedding init
    (fluid.initializer.Uniform() defaults); otherwise a scaled uniform.
    """
    E, H, C, V = (
        dims.embedding_size,
        dims.hidden_dim,
        dims.feat_channels,
        dims.padded_vocab,
    )
    ks = iter(jax.random.split(key, 16))
    emb_scale = None if parity_init else 1.0 / (E**0.5)
    out_bias = jnp.zeros((V,), jnp.float32)
    if V > dims.vocab_size:  # mask padded vocab rows out of the softmax
        out_bias = out_bias.at[dims.vocab_size :].set(-1e9)
    return {
        "embedding": L.init_embedding(next(ks), V, E, scale=emb_scale),
        "lstm": init_lstm(next(ks), E + H, H),
        # attention-value / key projections of the *projected* spatial
        # features ([B,k,H] image_embed — reference applies its img_feat fcs
        # to _img2feature's hidden-dim output, model_adaAttention_aic.py:52-53,191-199)
        "img_v": L.init_dense(next(ks), H, H),  # -> tanh (reference "img_feat")
        "img_k": L.init_dense(next(ks), H, H),  # reference "img_feat_emb"
        # sentinel gate
        "gate_x": L.init_dense(next(ks), E + H, H),
        "gate_h": L.init_dense(next(ks), H, H),
        # hidden projections
        "p_hid": L.init_dense(next(ks), H, H),  # -> tanh
        "hid_emb": L.init_dense(next(ks), H, H),
        "sent_emb": L.init_dense(next(ks), H, H),
        "attention": init_attention(next(ks), H),
        "out": L.init_dense(next(ks), H, H),  # -> tanh
        # weight tying head: proj to E, matmul embeddingᵀ, add vocab bias
        "out_proj": L.init_dense(next(ks), H, E),
        "out_bias": out_bias,
    }


class Precomputed(NamedTuple):
    """Per-image tensors computed once, reused by all decode steps."""

    img_v: jnp.ndarray  # [B, k, H] tanh value projection
    img_k: jnp.ndarray  # [B, k, H] key projection
    global_feat: jnp.ndarray  # [B, H]
    lstm_gx: jnp.ndarray  # [B, 4H] global-feat part of the LSTM gates
    gate_gx: jnp.ndarray  # [B, H] global-feat part of the sentinel gate


def precompute(
    params: Params,
    p_img_feat: jnp.ndarray,  # [B, k, C] projected spatial features
    global_feat: jnp.ndarray,  # [B, H]
    compute_dtype=jnp.bfloat16,
) -> Precomputed:
    """Hoist every step-invariant piece out of the 35x decode loop.

    Besides the attention key/value projections, the *global image feature*
    contributions to the LSTM gates and the sentinel gate are constant
    across steps (xt = [word_emb ; global_img_feat], reference :84-92), so
    their weight rows are multiplied once here instead of streaming from HBM
    every step (~10 MB/step saved at H=1024).
    """
    dt = compute_dtype
    # stored in compute dtype: these [B,k,H] tensors are re-read from HBM on
    # every one of the 35 decode steps — half the traffic in bf16
    img_v = jnp.tanh(L.dense(params["img_v"], p_img_feat, dt)).astype(dt)
    img_k = L.dense(params["img_k"], p_img_feat, dt).astype(dt)

    emb = params["embedding"]
    E = (emb["table_q"] if "table_q" in emb else emb["table"]).shape[1]
    g = global_feat.astype(dt)
    # lstm["w"] rows: [0:E) word emb | [E:E+H) global feat | [E+H:) h_prev
    H = _dense_in_dim(params["gate_h"])
    # the gx terms are emitted in REAL units (quantization scales applied
    # here, once) — the per-step row-split matmuls add their scale before
    # summing with these
    lstm_gx = _row_matmul(params["lstm"], g, E, E + H, dt, scaled=True)
    gate_gx = _row_matmul(params["gate_x"], g, E, E + H, dt, scaled=True)
    return Precomputed(img_v, img_k, global_feat, lstm_gx, gate_gx)


def pallas_dims_ok(params: Params) -> bool:
    """True when the model dims fit the Pallas decode kernels' tiling.

    The fused-step / vocab-head kernels are written for production dims
    (vocab ~12k streamed in 2048-row blocks, 128-lane-aligned embedding and
    hidden). Tiny models (unit tests, toy CLIs) trip Mosaic layout
    constraints (e.g. a [V=128] f32 bias block vs the (2048,) BlockSpec), so
    undersized dims fall back to the XLA scan/head — identical ids, just
    unfused.
    """
    emb = params["embedding"]
    table = emb["table_q"] if "table_q" in emb else emb["table"]
    V, E = table.shape
    H = _dense_in_dim(params["p_hid"])
    return V >= 2048 and E % 128 == 0 and H % 128 == 0


def _dense_in_dim(p: Params) -> int:
    return (p["w_q"] if "w_q" in p else p["w"]).shape[0]


def _row_matmul(p, x, lo, hi, dt, scaled: bool):
    """x @ W[lo:hi] for a possibly int8-quantized [I,O] weight.

    With ``scaled=False`` the per-output-channel scale is NOT applied (the
    caller sums several row-splits of the same weight first — the scale
    commutes with row slicing); the raw product must then be multiplied by
    ``_out_scale(p)``.
    """
    w = p["w_q"] if "w_q" in p else p["w"]
    y = jnp.matmul(x.astype(dt), w[lo:hi].astype(dt))
    if scaled and "w_q" in p:
        y = y.astype(jnp.float32) * p["scale"]
    return y.astype(jnp.float32) if scaled else y


def _out_scale(p):
    return p["scale"] if "w_q" in p else None


def step_core(
    params: Params,
    pre: Precomputed,
    word: jnp.ndarray,  # [B] int ids
    h_prev: jnp.ndarray,
    c_prev: jnp.ndarray,
    parity_mode: bool = False,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step up to the tied-vocab head -> (h, c, proj [B,E])."""
    dt = compute_dtype
    word_emb = L.embed(params["embedding"], word, padding_idx)
    E = word_emb.shape[-1]
    H = h_prev.shape[-1]

    # LSTM over xt = [word_emb ; global_img_feat]: the global part of the
    # gates is precomputed (pre.lstm_gx); only the word and h_prev rows of
    # the weight matrix are touched per step.
    # per-step dots stay in compute dtype (bf16 backward too); the cast to
    # f32 happens once, so the cell-state arithmetic is full precision
    lp = params["lstm"]
    raw = _row_matmul(lp, word_emb, 0, E, dt, scaled=False) + _row_matmul(
        lp, h_prev, E + H, None, dt, scaled=False
    )
    s = _out_scale(lp)
    raw = raw.astype(jnp.float32) * s if s is not None else raw.astype(jnp.float32)
    gates = raw + pre.lstm_gx + lp["b"]
    h, c = lstm_from_gates(gates, c_prev)

    # visual sentinel from the PREVIOUS hidden state (reference :89-92);
    # gate_x's global-feat part is precomputed (pre.gate_gx)
    gp = params["gate_x"]
    raw_g = _row_matmul(gp, word_emb, 0, E, dt, scaled=False).astype(jnp.float32)
    sg = _out_scale(gp)
    if sg is not None:
        raw_g = raw_g * sg
    gate = jax.nn.sigmoid(
        raw_g
        + pre.gate_gx
        + gp["b"]
        + L.dense(params["gate_h"], h_prev, dt).astype(jnp.float32)
    )
    sentinel = gate * jnp.tanh(c)

    # post-attention hidden projection from the NEW hidden state (:99)
    p_hid = jnp.tanh(L.dense(params["p_hid"], h, dt))
    hid_emb = L.dense(params["hid_emb"], p_hid, dt)
    sent_key = L.dense(params["sent_emb"], sentinel, dt)

    context, _alpha = adaptive_attention(
        params["attention"], pre.img_k, pre.img_v, sent_key, sentinel,
        hid_emb, parity_mode, dt,
    )

    out = jnp.tanh(L.dense(params["out"], context + p_hid, dt))

    proj = L.dense(params["out_proj"], out, dt)  # [B, E]
    return h, c, proj


def head_logits(params: Params, proj: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Tied-embedding vocab head: proj @ E^T + bias -> [B, V] float32.

    The dot runs (fwd and bwd) in the compute dtype; the f32 upcast before
    the bias keeps softmax/logsumexp math in full precision. Handles the
    int8-quantized table (per-row scale -> per-logit-column scale)."""
    dt = compute_dtype
    emb = params["embedding"]
    if "table_q" in emb:
        logits = (
            jnp.matmul(proj.astype(dt), emb["table_q"].T.astype(dt)).astype(
                jnp.float32
            )
            * emb["scale"][None, :]
        )
    else:
        logits = jnp.matmul(
            proj.astype(dt), emb["table"].T.astype(dt)
        ).astype(jnp.float32)
    return logits + params["out_bias"]


def step(
    params: Params,
    pre: Precomputed,
    word: jnp.ndarray,
    h_prev: jnp.ndarray,
    c_prev: jnp.ndarray,
    parity_mode: bool = False,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step -> (h, c, logits [B,V])."""
    h, c, proj = step_core(
        params, pre, word, h_prev, c_prev, parity_mode, padding_idx, compute_dtype
    )
    return h, c, head_logits(params, proj, compute_dtype)


def _zero_state(batch: int, hidden: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    z = jnp.zeros((batch, hidden), jnp.float32)
    return z, z


def teacher_forcing_logits(
    params: Params,
    pre: Precomputed,
    source: jnp.ndarray,  # [B, T] input words (caption[:, :-1])
    parity_mode: bool = False,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
    remat: bool = True,
    fused_attn_bwd: bool = False,
) -> jnp.ndarray:
    """Training forward: scan the cell over the time axis -> logits [B,T,V].

    ``remat=True`` checkpoints the step: the backward pass recomputes the
    cell instead of storing its per-step intermediates (notably the
    [B,k,H] attention tensors — ~870 MB of residuals per batch-128 step
    otherwise), trading cheap recompute FLOPs for HBM traffic.

    ``fused_attn_bwd``: hand-written one-pass-per-gradient backward for the
    attention scores (ops/attention.attn_scores_fused_bwd) — same forward
    bit-for-bit, gradients equal up to reduction order. Measured ~parity
    with autodiff on-chip (benchmarks/proto_attn_bwd.py: 8.42 vs 8.52 ms
    decoder fwd+bwd — XLA already duplicates the cheap tanh recompute into
    both reduction consumers), so the default is OFF and the op is kept for
    backends where that fusion heuristic differs.
    """
    B, T = source.shape
    H = _dense_in_dim(params["p_hid"])
    dt = compute_dtype
    h0, c0 = _zero_state(B, H)

    # --- everything that does not feed the recurrence is batched over time.
    # The scan body keeps ONLY h/c and the h-recurrent matmul: a scan's
    # backward otherwise accumulates every weight gradient as a carried
    # f32 buffer (~70 MB/step here), which dominates HBM traffic; batched
    # ops get their weight grads as single large matmuls instead.
    word_emb = L.embed(params["embedding"], source, padding_idx)  # [B,T,E]
    E = word_emb.shape[-1]
    lw = params["lstm"]["w"]
    gx = (
        jnp.matmul(word_emb.astype(dt), lw[:E].astype(dt)).astype(jnp.float32)
        + pre.lstm_gx[:, None, :]
        + params["lstm"]["b"]
    )  # [B,T,4H] word + global + bias gate pre-activations
    gx_tm = jnp.transpose(gx, (1, 0, 2))  # time-major
    w_hh = lw[E + H :].astype(dt)

    def body(carry, gx_t):
        h, c = carry
        gates = gx_t + jnp.matmul(h.astype(dt), w_hh).astype(jnp.float32)
        h, c = lstm_from_gates(gates, c_prev=c)
        return (h, c), (h, c)

    if remat:
        body = jax.checkpoint(body)
    _, (hs, cs) = jax.lax.scan(body, (h0, c0), gx_tm)  # [T,B,H] each
    h_prev_seq = jnp.concatenate([h0[None], hs[:-1]], axis=0)  # h_{t-1}

    # --- batched post-recurrence decode math (identical to step_core) ------
    gw = params["gate_x"]["w"]
    gate = jax.nn.sigmoid(
        jnp.transpose(
            jnp.matmul(word_emb.astype(dt), gw[:E].astype(dt)), (1, 0, 2)
        ).astype(jnp.float32)
        + pre.gate_gx
        + params["gate_x"]["b"]
        + L.dense(params["gate_h"], h_prev_seq, dt).astype(jnp.float32)
    )
    sentinel = gate * jnp.tanh(cs)  # [T,B,H]

    p_hid = jnp.tanh(L.dense(params["p_hid"], hs, dt))
    hid_emb = L.dense(params["hid_emb"], p_hid, dt)
    sent_key = L.dense(params["sent_emb"], sentinel, dt)

    if parity_mode:
        k1 = pre.img_v.shape[1] + 1
        context = (
            jnp.sum(pre.img_v, axis=1).astype(jnp.float32)[None] + sentinel
        ) / k1
    else:
        # additive attention, all steps at once. The [T,B,k,H] tanh tensor
        # (~437 MB at batch 128) fuses into the score reduction in the
        # forward, but autodiff would SAVE it as the tanh residual;
        # jax.checkpoint recomputes it in the backward from the [B,k,H] +
        # [T,B,H] inputs instead — ~870 MB of HBM traffic avoided per step.
        # The checkpointed backward still materializes dz over [T,B,k,H]
        # (two reductions with different axes consume it); at production
        # dims the custom-VJP form computes each gradient as its own fused
        # reduction instead (ops/attention.attn_scores_fused_bwd).
        if fused_attn_bwd:
            e_img = attn_scores_fused_bwd(
                dt, params["attention"]["score"], pre.img_k, hid_emb
            )
        else:
            def _attn_scores(score_p, img_k, h_emb):
                z_img = jnp.tanh(img_k[None].astype(dt) + h_emb[:, :, None, :])
                return L.dense(score_p, z_img, dt)[..., 0]

            e_img = jax.checkpoint(_attn_scores)(
                params["attention"]["score"], pre.img_k, hid_emb
            )
        z_sent = jnp.tanh(sent_key + hid_emb)
        e_sent = L.dense(params["attention"]["score"], z_sent, dt)
        e = jnp.concatenate([e_img, e_sent], axis=-1).astype(jnp.float32)
        alpha = jax.nn.softmax(e, axis=-1)  # [T,B,k+1]
        context = (
            jnp.einsum(
                "tbk,bkh->tbh", alpha[..., :-1].astype(dt), pre.img_v.astype(dt)
            ).astype(jnp.float32)
            + alpha[..., -1:] * sentinel
        )

    out = jnp.tanh(L.dense(params["out"], context + p_hid, dt))
    proj = L.dense(params["out_proj"], out, dt)  # [T,B,E]
    logits_tm = head_logits(params, proj, dt)  # [T,B,V]
    return jnp.transpose(logits_tm, (1, 0, 2))  # [B, T, V]


def greedy_decode_ids(
    params: Params,
    pre: Precomputed,
    max_length: int,
    start_idx: int = 2,
    parity_mode: bool = False,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = False,
    early_stop: bool = False,
    stop_idx: int = 3,
) -> jnp.ndarray:
    """Greedy decode: argmax feedback for ``max_length`` steps -> ids [B,T].

    Runs the full fixed-length scan (TPU-friendly static shapes); like the
    reference eval graph, generation continues past ``<stop>`` and the
    metric/detokenizer truncates (evaluate.py:15-25). Ids stay int32
    end-to-end — the reference's float-cast (:122-123) is not reproduced
    (SURVEY §2.2 quirk 2: rebuild keeps int ids).

    ``use_pallas=True`` runs the tied-vocab head + argmax as one fused Pallas
    kernel (ops/pallas/vocab_head.py) so the [B,V] logits never leave VMEM.

    ``early_stop=True`` swaps the fixed scan for a ``lax.while_loop`` that
    exits once every row has emitted ``<stop>`` — trained models finish
    captions well before ``max_length``, so this roughly halves average
    serving latency. Post-stop positions are ``<pad>`` (the detokenizer
    truncates at ``<stop>`` either way, so captions are identical to the
    fixed-length scan's).
    """
    B = pre.global_feat.shape[0]
    H = _dense_in_dim(params["p_hid"])

    # fully-fused step: the whole per-step body (gates + sentinel + attention
    # + out/proj + tied-vocab argmax) as ONE Pallas kernel with VMEM-resident
    # weights (ops/pallas/fused_step.py). The unfused scan body is ~25 small
    # fusions at ~54 us/step on v5e — launch-bound, not bandwidth-bound.
    # int8 params are dequantized once at prepare() (weights stay in VMEM
    # across all steps, so per-step HBM streaming — int8's win — is moot).
    use_pallas = use_pallas and pallas_dims_ok(params)
    # Small/ragged batches are padded up to the kernel's 8-row tile gate so
    # the single-image CLI (B=1 — BASELINE config #1, reference infer.py)
    # runs the SAME fused kernel as serving batches instead of the unfused
    # scan. Every step quantity is per-row, so zero-padded rows decode
    # independent garbage that is sliced off at the end; under early_stop
    # they start 'done' and can never hold the while_loop open.
    orig_B = B
    pad_rows = (-B) % 8 if (use_pallas and not parity_mode) else 0
    if pad_rows:
        pre = Precomputed(
            *(
                jnp.concatenate(
                    [x, jnp.zeros((pad_rows,) + x.shape[1:], x.dtype)]
                )
                for x in pre
            )
        )
        B += pad_rows
    h0, c0 = _zero_state(B, H)
    word0 = jnp.full((B,), start_idx, jnp.int32)
    use_fused = (
        use_pallas
        and not parity_mode
        and B >= 8
        and B % 8 == 0
    )
    if use_fused:
        from myimagecaptioningmodel_tpu.ops.pallas import fused_step as FS

        fp = FS.prepare(params, pre, padding_idx, compute_dtype)
        img_k = pre.img_k.astype(compute_dtype)
        img_v = pre.img_v.astype(compute_dtype)

        def fused_step_fn(h, c, word):
            word_emb = jnp.take(fp.emb_table, word, axis=0)
            h, c, _proj, next_word = FS.fused_decode_step(
                fp, word_emb, h, c, img_k, img_v,
                with_head=True, compute_dtype=compute_dtype,
            )
            return h, c, next_word

        if early_stop:
            # pad-fill (not zero-fill) so post-stop positions equal the
            # fixed-length scan's ids even when padding_idx != 0
            ids0 = jnp.full((B, max_length), padding_idx, jnp.int32)
            done0 = jnp.zeros((B,), bool)
            if pad_rows:
                done0 = done0.at[orig_B:].set(True)

            def f_cond(state):
                t, _h, _c, _w, _ids, done = state
                return (t < max_length) & ~jnp.all(done)

            def f_body(state):
                t, h, c, word, ids, done = state
                h, c, next_word = fused_step_fn(h, c, word)
                next_word = jnp.where(done, padding_idx, next_word)
                ids = jax.lax.dynamic_update_slice(
                    ids, next_word[:, None], (0, t)
                )
                done = done | (next_word == stop_idx)
                return t + 1, h, c, next_word, ids, done

            _, _, _, _, ids, _ = jax.lax.while_loop(
                f_cond, f_body, (jnp.int32(0), h0, c0, word0, ids0, done0)
            )
            return ids[:orig_B]

        def fused_body(carry, _):
            h, c, word = carry
            h, c, next_word = fused_step_fn(h, c, word)
            return (h, c, next_word), next_word

        _, ids_tm = jax.lax.scan(
            fused_body, (h0, c0, word0), None, length=max_length
        )
        return jnp.transpose(ids_tm, (1, 0))[:orig_B]

    if use_pallas:
        from myimagecaptioningmodel_tpu.ops.pallas.vocab_head import (
            greedy_vocab_argmax,
        )

        emb = params["embedding"]
        if "table_q" in emb:  # int8 table: 1 byte/elem streamed, scale fused

            def argmax_head(proj):
                return greedy_vocab_argmax(
                    proj, emb["table_q"], params["out_bias"], scale=emb["scale"]
                )

        else:

            def argmax_head(proj):
                return greedy_vocab_argmax(proj, emb["table"], params["out_bias"])

    else:

        def argmax_head(proj):
            logits = head_logits(params, proj, compute_dtype)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if early_stop:
        # pad-fill: see the fused branch's ids0 note
        ids0 = jnp.full((B, max_length), padding_idx, jnp.int32)
        done0 = jnp.zeros((B,), bool)

        def w_cond(state):
            t, _h, _c, _w, _ids, done = state
            return (t < max_length) & ~jnp.all(done)

        def w_body(state):
            t, h, c, word, ids, done = state
            h, c, proj = step_core(
                params, pre, word, h, c, parity_mode, padding_idx, compute_dtype
            )
            next_word = jnp.where(done, padding_idx, argmax_head(proj))
            ids = jax.lax.dynamic_update_slice(ids, next_word[:, None], (0, t))
            done = done | (next_word == stop_idx)
            return t + 1, h, c, next_word, ids, done

        _, _, _, _, ids, _ = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), h0, c0, word0, ids0, done0)
        )
        return ids

    def body(carry, _):
        h, c, word = carry
        h, c, proj = step_core(
            params, pre, word, h, c, parity_mode, padding_idx, compute_dtype
        )
        next_word = argmax_head(proj)
        return (h, c, next_word), next_word

    _, ids_tm = jax.lax.scan(body, (h0, c0, word0), None, length=max_length)
    return jnp.transpose(ids_tm, (1, 0))
