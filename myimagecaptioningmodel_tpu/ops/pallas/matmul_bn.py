"""1x1-conv (matmul) with BN batch-statistics fused into the output pass.

Two thirds of MobileNetV2's convs — every inverted-residual expand/linear
projection (reference MobileNetV2.py:37-45 table) — are 1x1 stride-1, i.e.
pure matmuls over the flattened [B*H*W, Cin] activations. Training-mode BN
then *re-reads* each conv output once just to compute batch mean/E[x^2]
(``ops/layers._bn_train_fwd_math``), and at batch 128 those outputs are most
of the step's 1.81 GB activation footprint; the stats pass alone is ~2 ms of
the 30 ms train step (benchmarks/train_roofline.md).

This kernel computes ``y = x @ w`` on the MXU and accumulates per-channel
``sum(y)`` / ``sum(y*y)`` in the same output pass (VMEM-carried across the
sequential M-block grid), eliminating the separate stats read for these
layers. Stats are taken over the *compute-dtype* (bf16-rounded) y — exactly
what the unfused BN sees. The surrounding ``conv1x1_bn_train`` does the BN
normalize/affine and carries a hand-written VJP identical in structure to
``_bn_train``'s two-pass backward, with the conv grads expressed as the two
matmuls a 1x1-conv backward is (XLA lowers its own 1x1 conv dgrad/wgrad the
same way), so backward traffic is unchanged.

Opt-in via ``model.fuse_bn_stats`` (ModelOptions.fuse_bn_stats); forward
parity with the unfused path is pinned by tests/test_fused_bn_stats.py.

A windowed Pallas conv lost 2x to XLA's conv pipeline
(ops/pallas/fused_irb.py) — this targets only the matmul-shaped convs where
there is no window pipeline to re-fight.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_MOMENTUM = 0.9  # keep in sync with ops/layers.py
BN_EPS = 1e-5


def _kernel(x_ref, w_ref, y_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    acc_dt = sum_ref.dtype  # f32; f64 under x64 test runs
    y = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=acc_dt)
    yb = y.astype(y_ref.dtype)
    y_ref[...] = yb
    # stats over the rounded (stored) values — bit-matches what the unfused
    # BN computes from the materialized conv output
    yf = yb.astype(acc_dt)
    s = jnp.sum(yf, axis=0)
    q = jnp.sum(yf * yf, axis=0)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = s
        sq_ref[...] = q

    @pl.when(i > 0)
    def _():
        sum_ref[...] = sum_ref[...] + s
        sq_ref[...] = sq_ref[...] + q


def _pick_bm(m: int) -> int:
    for bm in (4096, 2048, 1024, 512, 256, 128):
        if m % bm == 0:
            return bm
    return m  # tiny spatial grids (e.g. 7x7 tails) run as one block


def _matmul_stats(x_flat: jnp.ndarray, w: jnp.ndarray, interpret: bool):
    """(y [M,N] x.dtype, sum [N] f32, sumsq [N] f32) in one output pass."""
    M, K = x_flat.shape
    N = w.shape[1]
    bm = _pick_bm(M)
    stat_dt = jnp.float64 if x_flat.dtype == jnp.float64 else jnp.float32
    return pl.pallas_call(
        _kernel,
        grid=(M // bm,),
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
            jax.ShapeDtypeStruct((M, N), x_flat.dtype),
            jax.ShapeDtypeStruct((N,), stat_dt),
            jax.ShapeDtypeStruct((N,), stat_dt),
        ],
        interpret=interpret,
    )(x_flat, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv1x1_bn(interpret: bool, w, scale, offset, x_flat):
    """-> (normalized y [M,N] in x dtype, batch mean [N], batch var [N]).

    Semantics identical to ``conv2d(1x1) -> _bn_train`` with the stats read
    folded into the conv's output pass.
    """
    (yn, mean, var), _ = _conv1x1_bn_fwd(interpret, w, scale, offset, x_flat)
    return yn, mean, var


def _conv1x1_bn_fwd(interpret, w, scale, offset, x_flat):
    y, s, q = _matmul_stats(x_flat, w, interpret)
    n = x_flat.shape[0]
    mean = s / n
    var = jnp.maximum(q / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    yn = ((y.astype(s.dtype) - mean) * (inv * scale) + offset).astype(y.dtype)
    return (yn, mean, var), (w, scale, x_flat, y, mean, inv)


def _conv1x1_bn_bwd(interpret, res, cts):
    w, scale, x_flat, y, mean, inv = res
    dyn, _dmean, _dvar = cts  # moving-stat outputs carry no loss cotangent
    n = y.shape[0]
    sdt = mean.dtype  # f32; f64 under x64 test runs
    dy32 = dyn.astype(sdt)
    xhat = (y.astype(sdt) - mean) * inv
    doffset = jnp.sum(dy32, axis=0)
    dscale = jnp.sum(dy32 * xhat, axis=0)
    # textbook BN dx (identical to ops/layers._bn_train_bwd), landing in the
    # conv-output cotangent
    dy_conv = ((scale * inv / n) * (n * dy32 - doffset - xhat * dscale)).astype(
        x_flat.dtype
    )
    # 1x1-conv backward IS two matmuls (what XLA's conv dgrad/wgrad lower to)
    dw = jax.lax.dot_general(
        x_flat, dy_conv, (((0,), (0,)), ((), ())),
        preferred_element_type=sdt,
    ).astype(w.dtype)
    dx = jnp.dot(dy_conv, w.T).astype(x_flat.dtype)
    return dw, dscale, doffset, dx


_conv1x1_bn.defvjp(_conv1x1_bn_fwd, _conv1x1_bn_bwd)


def conv1x1_bn_train(conv_p, bn_p, x, compute_dtype):
    """Fused train-mode 1x1-conv + BN over an NHWC batch.

    -> (normalized output [B,H,W,Cout] compute dtype, batch_mean, batch_var)
    — the same triple the unfused ``conv2d`` + ``_bn_train`` produces, for
    the caller's moving-stat EMA update.
    """
    w = conv_p["w"]  # [1, 1, Cin, Cout]
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    dt = jnp.dtype(compute_dtype)
    interpret = jax.default_backend() != "tpu"
    x_flat = x.astype(dt).reshape(-1, Cin)
    yn, mean, var = _conv1x1_bn(
        interpret,
        w.reshape(Cin, Cout).astype(dt),
        bn_p["scale"],
        bn_p["offset"],
        x_flat,
    )
    return yn.reshape(B, H, W, Cout), mean, var
