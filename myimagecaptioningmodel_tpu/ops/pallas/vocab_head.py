"""Fused tied-embedding vocab head + argmax (greedy decode hot op).

The greedy decode step ends with ``logits = proj @ E^T + b`` over the full
vocabulary followed by ``argmax`` (reference model_adaAttention_aic.py:117-120).
Unfused, the [B, V] float32 logits (B=128, V=12295 -> 6.3 MB) round-trip
through HBM between the matmul and the argmax — pure wasted bandwidth on an
op that runs 35x per batch.

This kernel streams the embedding table through VMEM in vocab blocks
(grid over V), computes each logits block on the MXU, and keeps a running
(max, argmax) pair in VMEM scratch across grid steps — TPU grid iterations
execute sequentially, so the scratch carries state. Only the [B] winning ids
ever leave the chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _kernel(proj_ref, table_ref, bias_ref, out_ref, max_ref, idx_ref, *, vocab: int):
    vb = table_ref.shape[0]  # vocab block size
    j = pl.program_id(0)
    offset = j * vb

    logits = (
        jax.lax.dot_general(
            proj_ref[:],
            table_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),  # proj @ block^T
            preferred_element_type=jnp.float32,
        )
        + bias_ref[:].astype(jnp.float32)[None, :]
    )  # [B, vb]

    # mask the padded tail of the last block
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + offset
    logits = jnp.where(col < vocab, logits, NEG_INF)

    block_max = jnp.max(logits, axis=1, keepdims=True)  # [B, 1]
    block_arg = jnp.argmax(logits, axis=1)[:, None] + offset  # [B, 1]

    @pl.when(j == 0)
    def _init():
        max_ref[:] = block_max
        idx_ref[:] = block_arg.astype(jnp.int32)

    @pl.when(j > 0)
    def _update():
        better = block_max > max_ref[:]
        max_ref[:] = jnp.where(better, block_max, max_ref[:])
        idx_ref[:] = jnp.where(better, block_arg.astype(jnp.int32), idx_ref[:])

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:] = idx_ref[:]


@functools.partial(jax.jit, static_argnames=("block_v",))
def greedy_vocab_argmax(
    proj: jnp.ndarray,  # [B, E] float32 (or compute dtype)
    table: jnp.ndarray,  # [V, E] embedding table
    bias: jnp.ndarray,  # [V]
    block_v: int = 2048,
) -> jnp.ndarray:
    """-> argmax over ``proj @ table^T + bias`` as int32 [B]."""
    B, E = proj.shape
    V = table.shape[0]
    nblocks = pl.cdiv(V, block_v)
    dt = table.dtype

    out = pl.pallas_call(
        functools.partial(_kernel, vocab=V),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, E), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v,), lambda j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * E * V,
            bytes_accessed=V * E * dt.itemsize + B * E * 4 + V * 4 + B * 4,
            transcendentals=0,
        ),
    )(proj.astype(dt), table, bias)
    return out[:, 0]


def greedy_vocab_argmax_reference(proj, table, bias):
    """XLA reference path (used off-TPU and in tests)."""
    logits = (
        jnp.matmul(
            proj.astype(table.dtype), table.T, preferred_element_type=jnp.float32
        )
        + bias
    )
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
