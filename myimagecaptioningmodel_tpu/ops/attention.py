"""Adaptive ("visual sentinel") attention over spatial features + sentinel.

Implements the attention block of Lu et al. 2017 "Knowing When to Look"
as used by the reference decoder (model_adaAttention_aic.py:99-115):

    z      = tanh(feat_keys + hid_emb)            # [B, k+1, H]
    e      = z @ w_a + b_a                        # [B, k+1]
    alpha  = softmax(e) over the k+1 slots
    ctx    = sum(alpha * values) over slots       # [B, H]

Parity note (SURVEY §2.2 quirk 1): the reference's
``fc(z, size=1, num_flatten_dims=2, act='softmax')`` applies softmax over a
size-1 axis, so alpha == 1 everywhere, and with ``reduce_mean`` the context
degenerates to uniform mean pooling over the k+1 slots. ``parity_mode=True``
reproduces that exactly (bit-comparable captions with the reference);
the default is true attention with a weighted sum.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.ops.layers import Params, dense, init_dense


def init_attention(key, hidden: int) -> Params:
    return {"score": init_dense(key, hidden, 1)}


def _attn_scores_math(dt, score_p: Params, img_k, h_emb):
    """e[t,b,k] = tanh(img_k[b,k,:] + h_emb[t,b,:]) @ w + b — the batched
    (all-timesteps) additive-attention score, shared by the autodiff and
    fused-backward paths (bit-identical forwards)."""
    z = jnp.tanh(img_k[None].astype(dt) + h_emb.astype(dt)[:, :, None, :])
    return dense(score_p, z, dt)[..., 0]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def attn_scores_fused_bwd(dt, score_p: Params, img_k, h_emb):
    """Batched attention scores with a hand-written one-pass-per-gradient
    backward (training decoder hot spot, benchmarks/train_roofline.md).

    Autodiff of the (checkpointed) forward recomputes z = tanh(...) and then
    materializes dz = de*w*(1-z^2) over [T,B,k,H] — ~437 MB bf16 at batch
    128 — because two reductions with different axes (over k -> dh_emb, over
    T -> dimg_k) consume it. This backward instead computes each of the
    three gradients as its own *independent* fused reduction over a
    recomputed z (``optimization_barrier`` defeats CSE so XLA cannot merge
    the recomputes back into one materialized tensor): three cheap input
    passes (img_k ~13 MB + h_emb ~9 MB each) replace ~1.3 GB of dz traffic.
    Accumulations are f32 (same as the MXU/reduce accumulators autodiff
    uses); gradient values differ from autodiff only by reduction order.
    """
    return _attn_scores_math(dt, score_p, img_k, h_emb)


def _attn_fused_fwd(dt, score_p, img_k, h_emb):
    return _attn_scores_math(dt, score_p, img_k, h_emb), (score_p, img_k, h_emb)


def _attn_fused_bwd(dt, res, de):
    score_p, img_k, h_emb = res
    w = score_p["w"][:, 0].astype(dt)  # [H]
    de = de.astype(dt)
    ik, he = img_k.astype(dt), h_emb.astype(dt)

    def z_of(a, b):
        return jnp.tanh(a[None] + b[:, :, None, :])

    # pass 1: dw (z consumed directly by the reduction) and db
    z1 = z_of(ik, he)
    dw = jnp.sum(z1 * de[..., None], axis=(0, 1, 2), dtype=jnp.float32)
    dscore = {"w": dw.reshape(-1, 1).astype(score_p["w"].dtype)}
    if "b" in score_p:
        dscore["b"] = jnp.sum(de, dtype=jnp.float32).reshape(1).astype(
            score_p["b"].dtype
        )

    # pass 2: dh_emb = sum_k de*w*(1-z^2)
    ik2, he2, de2 = jax.lax.optimization_barrier((ik, he, de))
    z2 = z_of(ik2, he2)
    dz2 = (de2[..., None] * w) * (1.0 - jnp.square(z2))
    dh = jnp.sum(dz2, axis=2, dtype=jnp.float32).astype(h_emb.dtype)

    # pass 3: dimg_k = sum_t de*w*(1-z^2)
    ik3, he3, de3 = jax.lax.optimization_barrier((ik, he, de))
    z3 = z_of(ik3, he3)
    dz3 = (de3[..., None] * w) * (1.0 - jnp.square(z3))
    dk = jnp.sum(dz3, axis=0, dtype=jnp.float32).astype(img_k.dtype)

    return dscore, dk, dh


attn_scores_fused_bwd.defvjp(_attn_fused_fwd, _attn_fused_bwd)


def adaptive_attention(
    p: Params,
    img_keys: jnp.ndarray,  # [B, k, H] projected spatial keys
    img_values: jnp.ndarray,  # [B, k, H] spatial attention values
    sent_key: jnp.ndarray,  # [B, H] projected sentinel key
    sentinel: jnp.ndarray,  # [B, H] sentinel value
    hid_emb: jnp.ndarray,  # [B, H] projected decoder hidden
    parity_mode: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (context [B,H], alpha [B,k+1]).

    The spatial slots and the sentinel slot are scored separately and only
    the [B,k+1] score vector is combined — mathematically identical to the
    reference's concat([img; sentinel]) formulation, but never materializes
    per-step [B,k+1,H] concatenations (a pure HBM-bandwidth saving on the
    35x-repeated decode step).
    """
    if parity_mode:
        # degenerate reference path: alpha==1, context = mean over k+1 slots
        k1 = img_values.shape[1] + 1
        alpha = jnp.ones((img_values.shape[0], k1), jnp.float32)
        context = (
            jnp.sum(img_values, axis=1).astype(jnp.float32) + sentinel
        ) / k1
        return context, alpha
    dt = compute_dtype
    z_img = jnp.tanh(img_keys.astype(dt) + hid_emb.astype(dt)[:, None, :])
    e_img = dense(p["score"], z_img, dt)[..., 0]  # [B, k]
    z_sent = jnp.tanh(sent_key.astype(dt) + hid_emb.astype(dt))
    e_sent = dense(p["score"], z_sent, dt)  # [B, 1]
    e = jnp.concatenate([e_img, e_sent], axis=-1).astype(jnp.float32)
    alpha = jax.nn.softmax(e, axis=-1)  # [B, k+1], float32
    context = (
        jnp.einsum(
            "bk,bkh->bh", alpha[:, :-1].astype(dt), img_values.astype(dt)
        ).astype(jnp.float32)
        + alpha[:, -1:] * sentinel
    )
    return context, alpha
