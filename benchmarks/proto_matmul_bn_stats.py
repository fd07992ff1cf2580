#!/usr/bin/env python
"""Prototype (VERDICT r2 #6): fuse BN batch-statistics into the OUTPUT pass
of MobileNetV2's 1x1 convs.

Two thirds of the encoder's convs (every expand/linear, reference
MobileNetV2.py:37-45 table) are 1x1 — i.e. pure matmuls over [B*H*W, Cin] —
and their outputs are most of the 1.81 GB/step activation footprint that
makes BN train-mode bandwidth-bound (benchmarks/train_roofline.md: the
separate stats pass re-reads every activation, ~2.2 ms/step total). A
windowed Pallas conv lost 2x to XLA (ops/pallas/fused_irb.py), but a 1x1
conv is MXU-trivial, so a Pallas matmul with a stats epilogue (accumulate
per-channel sum/sum-of-squares in VMEM scratch across the sequential M-block
grid) could eliminate the stats read pass without re-fighting XLA's conv
pipeline.

This microbench answers: is `pallas matmul+stats` faster than the real
pipeline's `lax.conv 1x1 -> materialize bf16 y -> one-pass stats read`?
Run on the TPU chip:  python benchmarks/proto_matmul_bn_stats.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, y_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    s = jnp.sum(y, axis=0)
    q = jnp.sum(y * y, axis=0)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(i > 0)
    def _():
        sum_ref[...] = sum_ref[...] + s
        sq_ref[...] = sq_ref[...] + q


@functools.partial(jax.jit, static_argnames=("bm",))
def matmul_bn_stats(x, w, bm=2048):
    """y = x @ w (bf16 out) + per-channel (sum, sumsq) in ONE output pass."""
    M, K = x.shape
    N = w.shape[1]
    grid = (pl.cdiv(M, bm),)
    y, s, q = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.float32),
        ],
    )(x, w)
    return y, s, q


@jax.jit
def pipeline_ref(x_img, w):
    """The real model's path: 1x1 conv (NHWC) -> bf16 y -> one-pass stats
    (fused E[x], E[x^2] read, ops/layers.py) as a separate pass over y."""
    y = jax.lax.conv_general_dilated(
        x_img, w[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


def timeit(fn, *args, iters=20, warmup=3):
    out = jax.block_until_ready(fn(*args))
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


def main():
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    # (tag, B, H, W, Cin, Cout): the heaviest 1x1-conv stages at batch 128
    cases = [
        ("s3-expand 112x112 16->96", 128, 112, 112, 16, 96),
        ("s4-expand 56x56 24->144", 128, 56, 56, 24, 144),
        ("s4-linear 56x56 144->24", 128, 56, 56, 144, 24),
        ("s5-expand 28x28 32->192", 128, 28, 28, 32, 192),
    ]
    for tag, B, H, W, Cin, Cout in cases:
        x_img = jnp.asarray(rng.randn(B, H, W, Cin), jnp.bfloat16)
        w = jnp.asarray(rng.randn(Cin, Cout) * 0.1, jnp.bfloat16)
        x_flat = x_img.reshape(-1, Cin)
        M = x_flat.shape[0]

        y_p, s_p, q_p = matmul_bn_stats(x_flat, w)
        y_r, s_r, q_r = pipeline_ref(x_img, w)
        np.testing.assert_allclose(
            np.asarray(y_p), np.asarray(y_r).reshape(-1, Cout), rtol=0.05, atol=0.1
        )
        np.testing.assert_allclose(
            np.asarray(s_p), np.asarray(s_r), rtol=2e-2
        )  # f32-from-f32 vs f32-from-bf16 stats

        t_ref = timeit(pipeline_ref, x_img, w)
        t_pal = timeit(matmul_bn_stats, x_flat, w)
        bytes_y = M * Cout * 2
        print(
            f"{tag}: ref {t_ref:.3f} ms | pallas-fused {t_pal:.3f} ms "
            f"({t_ref / t_pal:.2f}x; y={bytes_y / 1e6:.0f} MB, "
            f"stats-pass floor ~{bytes_y / 819e9 * 1e3:.3f} ms)"
        )


if __name__ == "__main__":
    main()
