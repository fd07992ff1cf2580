"""Fused LSTM cell — the functional replacement for Paddle's ``lstm_unit``
C++/CUDA op (reference model_adaAttention_aic.py:87-88, SURVEY §2.4).

One parameter block per cell: ``w`` [D+H, 4H], ``b`` [4H] (gate order
i, f, g, o) — a single MXU matmul per step over the concatenated
[x_t, h_prev], which XLA fuses with the gate nonlinearities.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.ops.layers import Params, xavier_uniform


def init_lstm(key, in_dim: int, hidden: int) -> Params:
    return {
        "w": xavier_uniform(key, (in_dim + hidden, 4 * hidden), in_dim + hidden, 4 * hidden),
        "b": jnp.zeros((4 * hidden,), jnp.float32),
    }


def lstm_cell(
    p: Params,
    x: jnp.ndarray,
    h_prev: jnp.ndarray,
    c_prev: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard LSTM step: returns (h, c) in float32.

    c = sigmoid(f) * c_prev + sigmoid(i) * tanh(g)
    h = sigmoid(o) * tanh(c)
    """
    xh = jnp.concatenate([x, h_prev], axis=-1)
    gates = (
        jnp.matmul(xh.astype(compute_dtype), p["w"].astype(compute_dtype))
        .astype(jnp.float32)
        + p["b"]
    )
    return lstm_from_gates(gates, c_prev)


def lstm_from_gates(
    gates: jnp.ndarray, c_prev: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the gate nonlinearities to precomputed gate pre-activations
    [.., 4H] (i, f, g, o order) -> (h, c)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c
