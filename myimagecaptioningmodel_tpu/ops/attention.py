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

from typing import Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.ops.layers import Params, dense, init_dense


def init_attention(key, hidden: int) -> Params:
    return {"score": init_dense(key, hidden, 1)}


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
