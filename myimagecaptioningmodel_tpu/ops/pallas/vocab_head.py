"""Fused tied-embedding vocab head: argmax (greedy) and top-k (beam).

The decode step ends with ``logits = proj @ E^T + b`` over the full
vocabulary followed by ``argmax`` (reference model_adaAttention_aic.py:117-120)
— or, for this rebuild's beam search, ``top_k`` + ``log_softmax``. Unfused,
the [B, V] float32 logits (B=128, V=12295 -> 6.3 MB) round-trip through HBM
between the matmul and the selection — pure wasted bandwidth on an op that
runs 35x per batch.

These kernels stream the embedding table through VMEM in vocab blocks
(grid over V), compute each logits block on the MXU, and keep running
selection state in VMEM scratch across grid steps — TPU grid iterations
execute sequentially, so the scratch carries state:

- ``greedy_vocab_argmax``: running (max, argmax); only [B] ids leave the chip.
- ``topk_vocab_head``: running per-row top-k (k unrolled max/mask rounds)
  plus an online logsumexp, so beam search gets normalized per-beam
  candidates ([B,k] values + ids + [B] lse) without ever materializing
  [B, V] logits or running XLA's full-vocab sort.

Both take an optional per-vocab-row ``scale`` for int8-quantized tables
(ops/quantization.py): the int8 block is cast to the compute dtype on load
(1 byte/elem of HBM traffic — 2x less than bf16) and the scale applies to
the logits columns after the MXU contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _block_logits(proj_ref, table_ref, bias_ref, scale_ref, offset, vocab):
    """[B, vb] float32 logits for one vocab block, tail masked to -inf."""
    block = table_ref[:]
    if block.dtype == jnp.int8:
        block = block.astype(proj_ref.dtype)
    logits = jax.lax.dot_general(
        proj_ref[:],
        block,
        dimension_numbers=(((1,), (1,)), ((), ())),  # proj @ block^T
        preferred_element_type=jnp.float32,
    )
    if scale_ref is not None:
        logits = logits * scale_ref[:].astype(jnp.float32)[None, :]
    logits = logits + bias_ref[:].astype(jnp.float32)[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + offset
    return jnp.where(col < vocab, logits, NEG_INF)


def _kernel(proj_ref, table_ref, bias_ref, *refs, vocab: int, quantized: bool):
    if quantized:
        scale_ref, out_ref, max_ref, idx_ref = refs
    else:
        scale_ref = None
        out_ref, max_ref, idx_ref = refs
    vb = table_ref.shape[0]  # vocab block size
    j = pl.program_id(0)
    offset = j * vb

    logits = _block_logits(proj_ref, table_ref, bias_ref, scale_ref, offset, vocab)

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


@functools.partial(jax.jit, static_argnames=("block_v", "interpret"))
def greedy_vocab_argmax(
    proj: jnp.ndarray,  # [B, E] float32 (or compute dtype)
    table: jnp.ndarray,  # [V, E] embedding table (f32/bf16 or int8)
    bias: jnp.ndarray,  # [V]
    scale: jnp.ndarray = None,  # [V] per-row scale for an int8 table
    block_v: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> argmax over ``proj @ table^T (* scale) + bias`` as int32 [B]."""
    B, E = proj.shape
    V = table.shape[0]
    nblocks = pl.cdiv(V, block_v)
    dt = jnp.bfloat16 if table.dtype == jnp.int8 else table.dtype
    quantized = scale is not None

    in_specs = [
        pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_v, E), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_v,), lambda j: (j,), memory_space=pltpu.VMEM),
    ]
    args = [proj.astype(dt), table, bias]
    if quantized:
        in_specs.append(
            pl.BlockSpec((block_v,), lambda j: (j,), memory_space=pltpu.VMEM)
        )
        args.append(scale)

    out = pl.pallas_call(
        functools.partial(_kernel, vocab=V, quantized=quantized),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * E * V,
            bytes_accessed=V * E * table.dtype.itemsize + B * E * 4 + V * 4 + B * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:, 0]


def _topk_rounds(logits: jnp.ndarray, k: int, offset):
    """Per-row top-k of [B, N] by k unrolled (max, argmax, mask) rounds
    -> (vals [B,k] f32, ids [B,k] int32 global)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    vals, ids = [], []
    for _ in range(k):
        m = jnp.max(logits, axis=1)  # [B]
        a = jnp.argmax(logits, axis=1).astype(jnp.int32)  # [B]
        vals.append(m)
        ids.append(a + offset)
        logits = jnp.where(cols == a[:, None], NEG_INF, logits)
    return jnp.stack(vals, axis=1), jnp.stack(ids, axis=1)


def _topk_kernel(
    proj_ref, table_ref, bias_ref, *refs, vocab: int, k: int, quantized: bool
):
    if quantized:
        (scale_ref, vals_out, ids_out, lse_out,
         vals_ref, ids_ref, m_ref, s_ref) = refs
    else:
        scale_ref = None
        vals_out, ids_out, lse_out, vals_ref, ids_ref, m_ref, s_ref = refs
    vb = table_ref.shape[0]
    j = pl.program_id(0)
    offset = j * vb

    logits = _block_logits(proj_ref, table_ref, bias_ref, scale_ref, offset, vocab)

    # online logsumexp over the row
    bm = jnp.max(logits, axis=1, keepdims=True)  # [B,1]
    bs = jnp.sum(jnp.exp(logits - bm), axis=1, keepdims=True)  # [B,1]

    # block top-k (global ids)
    bv, bi = _topk_rounds(logits, k, offset)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = bm
        s_ref[:] = bs
        vals_ref[:] = bv
        ids_ref[:] = bi

    @pl.when(j > 0)
    def _update():
        m_new = jnp.maximum(m_ref[:], bm)
        s_ref[:] = s_ref[:] * jnp.exp(m_ref[:] - m_new) + bs * jnp.exp(bm - m_new)
        m_ref[:] = m_new
        cat_v = jnp.concatenate([vals_ref[:], bv], axis=1)  # [B, 2k]
        cat_i = jnp.concatenate([ids_ref[:], bi], axis=1)
        # k merge rounds; id selection via masked reduction (no gather op)
        cols = jax.lax.broadcasted_iota(jnp.int32, cat_v.shape, 1)
        mv, mi = [], []
        for _ in range(k):
            a = jnp.argmax(cat_v, axis=1).astype(jnp.int32)
            sel = cols == a[:, None]
            mv.append(jnp.max(cat_v, axis=1))
            mi.append(jnp.sum(jnp.where(sel, cat_i, 0), axis=1))
            cat_v = jnp.where(sel, NEG_INF, cat_v)
        vals_ref[:] = jnp.stack(mv, axis=1)
        ids_ref[:] = jnp.stack(mi, axis=1)

    @pl.when(j == pl.num_programs(0) - 1)
    def _emit():
        vals_out[:] = vals_ref[:]
        ids_out[:] = ids_ref[:]
        lse_out[:] = m_ref[:] + jnp.log(s_ref[:])


@functools.partial(jax.jit, static_argnames=("k", "block_v", "interpret"))
def topk_vocab_head(
    proj: jnp.ndarray,  # [B, E]
    table: jnp.ndarray,  # [V, E] (f32/bf16 or int8)
    bias: jnp.ndarray,  # [V]
    k: int = 4,
    scale: jnp.ndarray = None,  # [V] for int8 tables
    block_v: int = 1024,
    interpret: bool = False,
):
    """Fused tied-vocab head + per-row top-k + logsumexp for beam search.

    -> (vals [B,k] f32 raw logits, ids [B,k] int32, lse [B] f32);
    ``log_softmax`` of winner i is ``vals[:, i] - lse``. Per-beam top-k is
    sufficient for exact beam search: the next beam set consists of
    (beam, word) pairs, and for any fixed beam only its best ``k`` words can
    win a slot.
    """
    B, E = proj.shape
    V = table.shape[0]
    nblocks = pl.cdiv(V, block_v)
    dt = jnp.bfloat16 if table.dtype == jnp.int8 else table.dtype
    quantized = scale is not None

    in_specs = [
        pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_v, E), lambda j: (j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_v,), lambda j: (j,), memory_space=pltpu.VMEM),
    ]
    args = [proj.astype(dt), table, bias]
    if quantized:
        in_specs.append(
            pl.BlockSpec((block_v,), lambda j: (j,), memory_space=pltpu.VMEM)
        )
        args.append(scale)

    vals, ids, lse = pl.pallas_call(
        functools.partial(_topk_kernel, vocab=V, k=k, quantized=quantized),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * E * V,
            bytes_accessed=V * E * table.dtype.itemsize + B * E * 4 + V * 4,
            transcendentals=B * V,
        ),
        interpret=interpret,
    )(*args)
    return vals, ids, lse[:, 0]


def greedy_vocab_argmax_reference(proj, table, bias, scale=None):
    """XLA reference path (used off-TPU and in tests)."""
    logits = _reference_logits(proj, table, bias, scale)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _reference_logits(proj, table, bias, scale=None):
    dt = jnp.bfloat16 if table.dtype == jnp.int8 else table.dtype
    logits = jnp.matmul(
        proj.astype(dt), table.astype(dt).T, preferred_element_type=jnp.float32
    )
    if scale is not None:
        logits = logits * scale[None, :]
    return logits + bias


def topk_vocab_head_reference(proj, table, bias, k=4, scale=None):
    """XLA reference of ``topk_vocab_head`` (off-TPU and tests)."""
    logits = _reference_logits(proj, table, bias, scale)
    vals, ids = jax.lax.top_k(logits, k)
    lse = jax.nn.logsumexp(logits, axis=-1)
    return vals, ids.astype(jnp.int32), lse
