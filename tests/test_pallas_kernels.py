"""Pallas kernel tests (interpreter mode on CPU; the same kernels compile to
Mosaic on real TPU — exercised by bench.py and the driver)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myimagecaptioningmodel_tpu.ops.pallas import vocab_head as vh


def interp_argmax(proj, table, bias, block_v=2048):
    """greedy_vocab_argmax with interpret=True for CPU execution."""
    B, E = proj.shape
    V = table.shape[0]
    nblocks = pl.cdiv(V, block_v)
    out = pl.pallas_call(
        functools.partial(vh._kernel, vocab=V),
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
        interpret=True,
    )(proj.astype(table.dtype), table, bias)
    return out[:, 0]


@pytest.mark.parametrize("V", [100, 2048, 5000])
def test_vocab_argmax_matches_reference(V):
    rng = np.random.RandomState(0)
    B, E = 16, 32
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table = jnp.asarray(rng.randn(V, E), jnp.float32)
    bias = jnp.asarray(rng.randn(V), jnp.float32)
    ref = vh.greedy_vocab_argmax_reference(proj, table, bias)
    out = interp_argmax(proj, table, bias, block_v=1024)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_vocab_argmax_tail_block_masked():
    """V not divisible by the block: padded tail must never win."""
    rng = np.random.RandomState(1)
    B, E, V = 8, 16, 1000  # 1000 % 512 != 0
    proj = jnp.asarray(rng.randn(B, E), jnp.float32)
    table = jnp.asarray(rng.randn(V, E), jnp.float32)
    bias = jnp.asarray(np.full(V, 5.0), jnp.float32)  # big bias: tail would win if unmasked
    ref = vh.greedy_vocab_argmax_reference(proj, table, bias)
    out = interp_argmax(proj, table, bias, block_v=512)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert int(np.asarray(out).max()) < V


def test_greedy_decode_pallas_path_matches_xla():
    """use_pallas=True greedy decode (interpret) == XLA greedy decode."""
    from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

    with pltpu.force_tpu_interpret_mode():
        dims = DecoderDims(vocab_size=50, embedding_size=8, hidden_dim=16,
                           feat_channels=12)
        params = decoder_mod.init(jax.random.PRNGKey(0), dims)
        rng = np.random.RandomState(2)
        pre = decoder_mod.precompute(
            params,
            jnp.asarray(rng.randn(4, 3, dims.hidden_dim), jnp.float32),
            jnp.asarray(rng.randn(4, dims.hidden_dim), jnp.float32),
            jnp.float32,
        )
        ids_xla = decoder_mod.greedy_decode_ids(
            params, pre, 6, compute_dtype=jnp.float32, use_pallas=False
        )
        ids_pl = decoder_mod.greedy_decode_ids(
            params, pre, 6, compute_dtype=jnp.float32, use_pallas=True
        )
        np.testing.assert_array_equal(np.asarray(ids_xla), np.asarray(ids_pl))
