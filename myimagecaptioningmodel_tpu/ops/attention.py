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
    feat_keys: jnp.ndarray,  # [B, k+1, H] projected keys (spatial + sentinel)
    values: jnp.ndarray,  # [B, k+1, H] attention values (spatial + sentinel)
    hid_emb: jnp.ndarray,  # [B, H] projected decoder hidden
    parity_mode: bool = False,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (context [B,H], alpha [B,k+1])."""
    k1 = feat_keys.shape[1]
    if parity_mode:
        # degenerate reference path: alpha==1, context = mean over slots
        alpha = jnp.ones(values.shape[:2], values.dtype)
        context = jnp.mean(values, axis=1)
        return context, alpha
    z = jnp.tanh(feat_keys + hid_emb[:, None, :])
    e = dense(p["score"], z, compute_dtype)[..., 0]  # [B, k+1]
    alpha = jax.nn.softmax(e, axis=-1)
    context = jnp.sum(alpha[..., None] * values, axis=1)
    return context, alpha
