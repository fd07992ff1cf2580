"""Fused adaptive-attention decode step — SURVEY §7 stage 5 kernel.

One greedy-decode step (reference model_adaAttention_aic.py:77-127, SURVEY
§3.5) is ~25 small XLA ops: 12 matmuls with [B,H]-sized operands plus the
glue between them. Profiled on v5e at batch 128 the 35-step scan runs at
~54 µs/step — ~5x its compute floor — because each op is a separate
fusion with pipeline bubbles between MXU launches (see
benchmarks/decode_roofline.md).

This kernel runs the ENTIRE step body as one Pallas program with every
weight VMEM-resident:

    xw   = word_emb @ [W_lstm[:E] ; W_gate[:E]]            (one MXU dot)
    hh   = h_prev  @ [W_lstm[E+H:] ; W_gate_h]             (one MXU dot)
    gates= xw[:, :4H] + hh[:, :4H] + gxb[:, :4H]           (gxb = global-feat
    gate = σ(xw[:,4H:] + hh[:,4H:] + gxb[:,4H:])            parts + biases,
    c'   = σ(f)·c + σ(i)·tanh(g);  h' = σ(o)·tanh(c')       precomputed)
    sentinel = gate ⊙ tanh(c')
    p_hid    = tanh(h' @ Wp + bp)
    hid_emb  = p_hid @ Whe + bhe
    sent_key = sentinel @ Wse + bse
    e_img    = tanh(img_k + hid_emb) · w_score + b_score    ([B,k] scores)
    e_sent   = tanh(sent_key + hid_emb) · w_score + b_score
    α        = softmax([e_img ; e_sent])
    ctx      = Σ α_img ⊙ img_v + α_sent ⊙ sentinel
    out      = tanh((ctx + p_hid) @ Wout + bout)
    proj     = out @ Wproj + bproj                          ([B,E])
    (greedy variant) word' = argmax(proj @ tableᵀ + vocab_bias)

Dataflow quirks preserved (SURVEY §2.2 quirk 9): the h-recurrent dot and the
sentinel gate read h_prev; p_hid reads the new h'.

VMEM budget at B=128, H=1024, k=49, E=256, V=12416 (bf16 weights):
img_k/img_v ~34 MB (padded) + W_hh_cat 10.5 + W_word_cat 2.6 + 4 H×H 8 +
vocab table 6.4 + logits scratch 6.4 + z scratch ~17 => ~90 MB < 128 MB.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedStepParams(NamedTuple):
    """Decode-invariant tensors, prepared once per decode call
    (loop-invariant: XLA hoists the prep out of the scan)."""

    emb_table: jnp.ndarray  # [V, E] gather table, padding row zeroed
    w_word_cat: jnp.ndarray  # [E, 5H] = [W_lstm[:E] ; W_gate_x[:E]]
    w_hh_cat: jnp.ndarray  # [H, 5H] = [W_lstm[E+H:] ; W_gate_h]
    gxb: jnp.ndarray  # [B, 5H] f32: global-feat gate parts + all gate biases
    w_p: jnp.ndarray  # [H, H]
    b_p: jnp.ndarray  # [H]
    w_he: jnp.ndarray  # [H, H]
    b_he: jnp.ndarray  # [H]
    w_se: jnp.ndarray  # [H, H]
    b_se: jnp.ndarray  # [H]
    w_out: jnp.ndarray  # [H, H]
    b_out: jnp.ndarray  # [H]
    w_proj: jnp.ndarray  # [H, E]
    b_proj: jnp.ndarray  # [E]
    w_score: jnp.ndarray  # [1, H] attention score row
    b_score: jnp.ndarray  # [1] f32
    head_table: jnp.ndarray  # [V, E] tied vocab table (compute dtype)
    head_bias: jnp.ndarray  # [V] f32


def prepare(params: Dict[str, Any], pre, padding_idx: int, dt) -> FusedStepParams:
    """Slice/concat the decoder params into the kernel's fused layout.

    int8-quantized params (ops/quantization.py) are dequantized here: the
    kernel holds every weight VMEM-resident across the whole decode scan, so
    the quantized artifact costs one prep-time dequant and then decodes at
    full fused speed (weights never re-stream from HBM per step)."""
    from myimagecaptioningmodel_tpu.ops.quantization import (
        dense_weight,
        embedding_table,
    )

    lw = dense_weight(params["lstm"])
    gw = dense_weight(params["gate_x"])
    w_proj = dense_weight(params["out_proj"])
    E = w_proj.shape[1]
    H = dense_weight(params["p_hid"]).shape[0]
    table = embedding_table(params["embedding"])
    emb_table = table.at[padding_idx].set(0.0)  # embed(padding_idx) == 0
    w_word_cat = jnp.concatenate([lw[:E], gw[:E]], axis=1).astype(dt)
    w_hh_cat = jnp.concatenate(
        [lw[E + H :], dense_weight(params["gate_h"])], axis=1
    ).astype(dt)
    gxb = jnp.concatenate(
        [
            pre.lstm_gx + params["lstm"]["b"],
            pre.gate_gx + params["gate_x"]["b"] + params["gate_h"]["b"],
        ],
        axis=1,
    ).astype(jnp.float32)
    return FusedStepParams(
        emb_table=emb_table,
        w_word_cat=w_word_cat,
        w_hh_cat=w_hh_cat,
        gxb=gxb,
        w_p=dense_weight(params["p_hid"]).astype(dt),
        b_p=params["p_hid"]["b"].astype(jnp.float32),
        w_he=dense_weight(params["hid_emb"]).astype(dt),
        b_he=params["hid_emb"]["b"].astype(jnp.float32),
        w_se=dense_weight(params["sent_emb"]).astype(dt),
        b_se=params["sent_emb"]["b"].astype(jnp.float32),
        w_out=dense_weight(params["out"]).astype(dt),
        b_out=params["out"]["b"].astype(jnp.float32),
        w_proj=w_proj.astype(dt),
        b_proj=params["out_proj"]["b"].astype(jnp.float32),
        w_score=params["attention"]["score"]["w"].T.astype(dt),  # [1, H]
        b_score=params["attention"]["score"]["b"].astype(jnp.float32),
        head_table=table.astype(dt),
        head_bias=params["out_bias"].astype(jnp.float32),
    )


def _dot(a, b, dt):
    return jax.lax.dot_general(
        a.astype(dt), b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _step_math(
    word_emb, h, c, imgk, imgv,
    w_word_cat, w_hh_cat, gxb,
    w_p, b_p, w_he, b_he, w_se, b_se, w_out, b_out, w_proj, b_proj,
    w_score, b_score, dt, H,
):
    """The shared straight-line step body (runs inside the Pallas kernel)."""
    xw = _dot(word_emb, w_word_cat, dt)  # [B, 5H]
    hh = _dot(h, w_hh_cat, dt)  # [B, 5H]
    pre_act = xw + hh + gxb
    i = jax.nn.sigmoid(pre_act[:, :H])
    f = jax.nn.sigmoid(pre_act[:, H : 2 * H])
    g = jnp.tanh(pre_act[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(pre_act[:, 3 * H : 4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    gate = jax.nn.sigmoid(pre_act[:, 4 * H :])
    sentinel = gate * jnp.tanh(c_new)

    p_hid = jnp.tanh(_dot(h_new, w_p, dt) + b_p)
    hid_emb = _dot(p_hid, w_he, dt) + b_he
    sent_key = _dot(sentinel, w_se, dt) + b_se

    # attention in f32 registers (measured FASTER in-kernel than the bf16
    # variant — Mosaic vectorizes the f32 tanh/FMA chain better than mixed
    # bf16/f32 conversions here: 35 vs 44 us/step on v5e)
    ws32 = w_score.astype(jnp.float32)  # [1, H]
    z_img = jnp.tanh(imgk.astype(jnp.float32) + hid_emb[:, None, :])  # [B,k,H]
    e_img = jnp.sum(z_img * ws32[None], axis=-1) + b_score  # [B, k]
    z_sent = jnp.tanh(sent_key + hid_emb)
    e_sent = jnp.sum(z_sent * ws32, axis=-1, keepdims=True) + b_score  # [B,1]

    m = jnp.maximum(jnp.max(e_img, axis=-1, keepdims=True), e_sent)
    a_img = jnp.exp(e_img - m)
    a_sent = jnp.exp(e_sent - m)
    denom = jnp.sum(a_img, axis=-1, keepdims=True) + a_sent
    ctx = (
        jnp.sum(a_img[:, :, None] * imgv.astype(jnp.float32), axis=1)
        + a_sent * sentinel
    ) / denom

    out = jnp.tanh(_dot(ctx + p_hid, w_out, dt) + b_out)
    proj = _dot(out, w_proj, dt) + b_proj  # [B, E]
    return h_new, c_new, proj


def _kernel(
    word_emb_ref, h_ref, c_ref, imgk_ref, imgv_ref,
    w_word_ref, w_hh_ref, gxb_ref,
    w_p_ref, b_p_ref, w_he_ref, b_he_ref, w_se_ref, b_se_ref,
    w_out_ref, b_out_ref, w_proj_ref, b_proj_ref, w_score_ref, b_score_ref,
    head_table_ref, head_bias_ref,
    h_out_ref, c_out_ref, proj_out_ref, word_out_ref,
    *, H: int, dt, with_head: bool, vocab: int,
):
    h_new, c_new, proj = _step_math(
        word_emb_ref[:], h_ref[:], c_ref[:], imgk_ref[:], imgv_ref[:],
        w_word_ref[:], w_hh_ref[:], gxb_ref[:],
        w_p_ref[:], b_p_ref[:], w_he_ref[:], b_he_ref[:],
        w_se_ref[:], b_se_ref[:], w_out_ref[:], b_out_ref[:],
        w_proj_ref[:], b_proj_ref[:], w_score_ref[:], b_score_ref[:],
        dt, H,
    )
    h_out_ref[:] = h_new
    c_out_ref[:] = c_new
    proj_out_ref[:] = proj
    if with_head:
        logits = (
            jax.lax.dot_general(
                proj.astype(dt), head_table_ref[:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + head_bias_ref[:][None, :]
        )  # [B, V]
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < vocab, logits, float("-inf"))
        word_out_ref[:] = jnp.argmax(logits, axis=1)[:, None].astype(jnp.int32)
    else:
        # keep the documented contract (zeros, matching reference_step) —
        # an unwritten output ref would be uninitialized VMEM
        word_out_ref[:] = jnp.zeros(word_out_ref.shape, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("with_head", "compute_dtype", "interpret")
)
def fused_decode_step(
    fp: FusedStepParams,
    word_emb: jnp.ndarray,  # [B, E] current word embedding (f32)
    h: jnp.ndarray,  # [B, H] f32
    c: jnp.ndarray,  # [B, H] f32
    img_k: jnp.ndarray,  # [B, k, H] compute dtype
    img_v: jnp.ndarray,  # [B, k, H] compute dtype
    with_head: bool = True,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (h', c', proj [B,E] f32, word' [B] int32 — zeros if not with_head)."""
    B, H = h.shape
    E = fp.w_proj.shape[1]
    V = fp.head_table.shape[0]
    dt = jnp.dtype(compute_dtype)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    flops = 2 * B * (
        E * 5 * H + H * 5 * H + 3 * H * H + H * H + H * E
        + img_k.shape[1] * H * 2
    ) + (2 * B * E * V if with_head else 0)
    h_new, c_new, proj, word = pl.pallas_call(
        functools.partial(
            _kernel, H=H, dt=dt, with_head=with_head, vocab=V
        ),
        in_specs=[vmem()] * 22,
        out_specs=(vmem(), vmem(), vmem(), vmem()),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, E), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=0, transcendentals=B * (5 * H + 50 * H)
        ),
        interpret=interpret,
    )(
        word_emb.astype(dt), h, c, img_k.astype(dt), img_v.astype(dt),
        fp.w_word_cat, fp.w_hh_cat, fp.gxb,
        fp.w_p, fp.b_p, fp.w_he, fp.b_he, fp.w_se, fp.b_se,
        fp.w_out, fp.b_out, fp.w_proj, fp.b_proj, fp.w_score, fp.b_score,
        fp.head_table, fp.head_bias,
    )
    return h_new, c_new, proj, word[:, 0]


def reference_step(fp: FusedStepParams, word_emb, h, c, img_k, img_v,
                   with_head: bool = True, compute_dtype=jnp.bfloat16):
    """Pure-XLA oracle of the same math (tests + off-TPU fallback)."""
    B, H = h.shape
    h_new, c_new, proj = _step_math(
        word_emb, h, c, img_k, img_v,
        fp.w_word_cat, fp.w_hh_cat, fp.gxb,
        fp.w_p, fp.b_p, fp.w_he, fp.b_he, fp.w_se, fp.b_se,
        fp.w_out, fp.b_out, fp.w_proj, fp.b_proj, fp.w_score, fp.b_score,
        jnp.dtype(compute_dtype), H,
    )
    word = jnp.zeros((B,), jnp.int32)
    if with_head:
        logits = (
            jnp.matmul(
                proj.astype(compute_dtype), fp.head_table.T,
                preferred_element_type=jnp.float32,
            )
            + fp.head_bias
        )
        word = jnp.argmax(logits, axis=1).astype(jnp.int32)
    return h_new, c_new, proj, word
