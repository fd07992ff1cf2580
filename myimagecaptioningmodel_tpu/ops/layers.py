"""Functional layer primitives with explicit param pytrees.

These replace the reference's ``fluid.layers.{fc, conv2d, batch_norm,
embedding}`` graph ops (SURVEY §2.4). Conventions:

- params are float32 leaves in plain dicts; ``init_*`` builds them,
  ``apply``-style functions consume them;
- matmuls/convs run in a configurable ``compute_dtype`` (bfloat16 by
  default) with float32 MXU accumulation (``preferred_element_type``);
- convolutions are NHWC / HWIO — the TPU-native layout (the reference's
  NCHW is a CUDA convention; storage artifacts stay CHW, the feed path
  transposes once per batch).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def xavier_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Xavier/Glorot uniform — the Paddle fc/conv default initializer."""
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def uniform(key, shape, low: float = -1.0, high: float = 1.0, dtype=jnp.float32):
    """Plain uniform — matches ``fluid.initializer.Uniform()`` defaults."""
    return jax.random.uniform(key, shape, dtype, low, high)


# ---- dense ------------------------------------------------------------------


def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    p = {"w": xavier_uniform(key, (in_dim, out_dim), in_dim, out_dim)}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(p: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ W (+ b), computed AND returned in ``compute_dtype``.

    The output deliberately stays in the compute dtype (MXU accumulation is
    f32 internally either way): an f32 output would make every *backward*
    matmul run with f32 cotangents against f32-promoted weights — streaming
    f32 weights from HBM and skipping the bf16 MXU path (observed 2x on the
    train step). Callers upcast at numerically sensitive points (BN, cell
    state, softmax/logsumexp).
    """
    dt = compute_dtype
    if "w_q" in p:  # int8-quantized weight (ops/quantization.py): the
        # int8->dt cast fuses into the matmul operand load; the per-output-
        # channel scale applies after the contraction
        y = jnp.matmul(x.astype(dt), p["w_q"].astype(dt)) * p["scale"].astype(dt)
    else:
        y = jnp.matmul(x.astype(dt), p["w"].astype(dt))
    if "b" in p:
        y = y + p["b"].astype(dt)
    return y


# ---- embedding ---------------------------------------------------------------


def init_embedding(key, vocab: int, dim: int, scale: Optional[float] = None) -> Params:
    """Embedding table. ``scale=None`` -> U(-1,1) like the reference's
    ``fluid.initializer.Uniform()`` (model_adaAttention_aic.py:18-19);
    otherwise U(-scale, scale)."""
    lim = 1.0 if scale is None else scale
    return {"table": uniform(key, (vocab, dim), -lim, lim)}


def embed(p: Params, ids: jnp.ndarray, padding_idx: Optional[int] = 0) -> jnp.ndarray:
    """Gather rows; lookups of ``padding_idx`` return zeros (Paddle
    ``embedding(padding_idx=...)`` semantics, model_adaAttention_aic.py:28-32).
    Handles int8-quantized tables (per-row scale)."""
    if "table_q" in p:
        out = jnp.take(p["table_q"], ids, axis=0).astype(jnp.float32)
        out = out * jnp.take(p["scale"], ids, axis=0)[..., None]
    else:
        out = jnp.take(p["table"], ids, axis=0)
    if padding_idx is not None:
        out = out * (ids != padding_idx)[..., None].astype(out.dtype)
    return out


# ---- convolution -------------------------------------------------------------


def init_conv(
    key,
    in_ch: int,
    out_ch: int,
    kernel: int,
    groups: int = 1,
) -> Params:
    # HWIO with I = in_ch // groups
    shape = (kernel, kernel, in_ch // groups, out_ch)
    fan_in = kernel * kernel * in_ch // groups
    fan_out = kernel * kernel * out_ch // groups
    return {"w": xavier_uniform(key, shape, fan_in, fan_out)}


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    compute_dtype=jnp.bfloat16,
    safe_depthwise: bool = False,
) -> jnp.ndarray:
    """NHWC conv; ``groups=C`` gives the depthwise path (XLA:TPU lowers both
    onto the MXU — replaces Paddle's custom depthwise CUDA kernel,
    MobileNetV2.py:155-164).

    Output dtype == compute dtype: the MXU accumulates bf16 inputs in f32
    internally either way, the following BatchNorm renormalizes in f32, and
    a same-dtype output keeps the conv VJP well-typed (an f32 cotangent
    against bf16 operands is rejected by lax.conv_general_dilated).

    ``safe_depthwise=True`` expresses depthwise convs (groups == channels)
    as k*k explicit shifted multiply-accumulates instead of a grouped
    ``conv_general_dilated``: XLA's SPMD partitioner miscompiles the grouped-
    conv *gradient* when the batch is sharded over a strict subset of the
    mesh (observed: (data=4, model=2) mesh, grads off by ~30%; exact when
    expressed as elementwise taps). The taps form is ~1.7x slower on TPU
    than the tuned grouped-conv lowering, so it is only enabled for training
    under tensor parallelism (parallel/train_step.py flips it). Forward-only
    paths and full-mesh data parallelism are unaffected by the bug.
    """
    w = p["w"]
    if safe_depthwise and groups > 1 and w.shape[2] == 1 and groups == x.shape[-1]:
        return _depthwise_conv_taps(w, x, stride, padding, compute_dtype)
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def _depthwise_conv_taps(
    w: jnp.ndarray,  # [k, k, 1, C] HWIO
    x: jnp.ndarray,  # [B, H, W, C]
    stride: int,
    padding: int,
    compute_dtype,
) -> jnp.ndarray:
    """Depthwise conv as k*k shifted FMAs (f32 accumulate, sharding-safe)."""
    k = w.shape[0]
    B, H, W, C = x.shape
    x = x.astype(compute_dtype)
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    Ho = (H + 2 * padding - k) // stride + 1
    Wo = (W + 2 * padding - k) // stride + 1
    w32 = w.astype(jnp.float32)
    acc = jnp.zeros((B, Ho, Wo, C), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            tap = jax.lax.slice(
                x,
                (0, dy, dx, 0),
                (B, dy + (Ho - 1) * stride + 1, dx + (Wo - 1) * stride + 1, C),
                (1, stride, stride, 1),
            )
            acc = acc + tap.astype(jnp.float32) * w32[dy, dx, 0]
    return acc.astype(compute_dtype)


# ---- batch norm ---------------------------------------------------------------

BN_MOMENTUM = 0.9  # Paddle batch_norm default
BN_EPS = 1e-5


@jax.custom_vjp
def _bn_train(scale, offset, x):
    """Train-mode BN core -> (y, batch_mean, batch_var).

    Hand-written VJP: autodiff of the mean/var formulation emits 3-4 separate
    reduction fusions per layer, each re-reading the full activation — the
    profiled cost was 12.2 ms/step (40% of the batch-128 train step) across
    MobileNetV2's 53 BN layers. The custom backward does the textbook BN
    gradient in exactly two fused passes over (x, dy):
        pass 1: doffset = Σdy, dscale = Σdy·x̂        (one fused dual reduction)
        pass 2: dx = scale·inv/N · (N·dy - doffset - x̂·dscale)
    """
    y, mean, var, _inv = _bn_train_fwd_math(scale, offset, x)
    return y, mean, var


def _stat_dtype(x):
    """BN statistics dtype: f32, except f64 inputs keep f64 — so float64
    equivalence tests (fused-vs-unfused, DP-vs-single) are not floored by
    f32 stats noise amplified through the 53-layer BN chain."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def _bn_train_fwd_math(scale, offset, x):
    x32 = x.astype(_stat_dtype(x))
    axes = tuple(range(x.ndim - 1))
    # one-pass stats: mean and E[x^2] fuse into a single activation read
    mean = jnp.mean(x32, axes)
    mean_sq = jnp.mean(jnp.square(x32), axes)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = ((x32 - mean) * (inv * scale) + offset).astype(x.dtype)
    return y, mean, var, inv


def _bn_train_fwd(scale, offset, x):
    y, mean, var, inv = _bn_train_fwd_math(scale, offset, x)
    return (y, mean, var), (scale, x, mean, inv)


def _bn_train_bwd(res, cts):
    scale, x, mean, inv = res
    dy, _dmean, _dvar = cts  # moving-stat outputs carry no loss cotangent
    axes = tuple(range(x.ndim - 1))
    n = x.size // x.shape[-1]
    dy32 = dy.astype(_stat_dtype(x))
    xhat = (x.astype(_stat_dtype(x)) - mean) * inv
    doffset = jnp.sum(dy32, axes)
    dscale = jnp.sum(dy32 * xhat, axes)
    dx = (scale * inv / n) * (n * dy32 - doffset - xhat * dscale)
    return dscale, doffset, dx.astype(x.dtype)


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


# --- opt-in approximate BN: subset statistics + decoupled backward ------------
#
# The full-semantics BN above is at its activation-pass floor on TPU (six
# passes over every conv output; the dominant fusion measured at 93% of HBM
# peak — benchmarks/train_roofline.md). The ONLY way to cut BN's HBM traffic
# further is to change what is computed. ``bn_stat_rows = R > 0`` does so in
# three places, each bounded and documented:
#
#   1. batch statistics from the first R images only (the same class of
#      approximation data-parallel BN already makes: per-device stats ARE a
#      subset of the global batch) — the stats pass reads R/B of the batch;
#   2. mu/sigma treated as constants in backward (no gradient coupling
#      through the statistics), making dx = scale*inv*dy purely elementwise
#      so XLA fuses it into the adjacent relu6/conv-backward chain instead
#      of a separate full read(dy,xhat)+write(dx) pass;
#   3. dscale/doffset estimated from the same R rows (scaled by B/R so the
#      expectation matches), shrinking the backward reduction read to R/B.
#
# Training contract change: gradients are unbiased estimates w.r.t. the
# subset, and the mean/var pull-through term (a weak regularizer) is
# dropped. Convergence is validated on the synthetic corpora
# (tests/test_train_features.py); default stays 0 = exact reference
# semantics.


def _bn_subset_fwd_math(scale, offset, x, R):
    sd = _stat_dtype(x)
    xs = x[:R].astype(sd)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xs, axes)
    mean_sq = jnp.mean(jnp.square(xs), axes)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = ((x.astype(sd) - mean) * (inv * scale) + offset).astype(x.dtype)
    return y, mean, var, inv


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_subset(scale, offset, x, stat_rows: int):
    y, mean, var, _inv = _bn_subset_fwd_math(scale, offset, x, stat_rows)
    return y, mean, var


def _bn_train_subset_fwd(scale, offset, x, stat_rows):
    y, mean, var, inv = _bn_subset_fwd_math(scale, offset, x, stat_rows)
    # residual keeps only the R stat rows of x — the backward never touches
    # the other B-R rows of the activation
    return (y, mean, var), (scale, x[:stat_rows], mean, inv, x.shape[0])


def _bn_train_subset_bwd(stat_rows, res, cts):
    scale, xs, mean, inv, n_full = res
    dy, _dmean, _dvar = cts
    sd = _stat_dtype(xs)
    axes = tuple(range(xs.ndim - 1))
    dyS = dy[:stat_rows].astype(sd)
    xhatS = (xs.astype(sd) - mean) * inv
    ratio = n_full / stat_rows  # unbiased-expectation scaling
    doffset = jnp.sum(dyS, axes) * ratio
    dscale = jnp.sum(dyS * xhatS, axes) * ratio
    # stats are constants in backward: dx is elementwise in dy
    dx = (dy.astype(sd) * (scale * inv)).astype(dy.dtype)
    return dscale, doffset, dx


_bn_train_subset.defvjp(_bn_train_subset_fwd, _bn_train_subset_bwd)


def init_batch_norm(num_ch: int) -> Tuple[Params, Params]:
    """Returns (params, state): learnable scale/offset + moving stats."""
    params = {
        "scale": jnp.ones((num_ch,), jnp.float32),
        "offset": jnp.zeros((num_ch,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((num_ch,), jnp.float32),
        "var": jnp.ones((num_ch,), jnp.float32),
    }
    return params, state


def batch_norm(
    p: Params,
    s: Params,
    x: jnp.ndarray,
    train: bool,
    stat_rows: int = 0,
) -> Tuple[jnp.ndarray, Params]:
    """BN over all but the channel (last) axis; float32 statistics.

    Train mode normalizes with batch stats and returns updated moving stats
    (``moving = momentum*moving + (1-momentum)*batch``); eval mode uses the
    moving stats. Running stats live in an explicit state pytree — the
    functional replacement for Paddle's moving_mean/variance variables
    (MobileNetV2.py:112-117, SURVEY §2.4).

    ``stat_rows = R > 0`` opts into the approximate subset-statistics BN
    (see ``_bn_train_subset``) when the batch is larger than R; default 0
    keeps exact reference semantics.
    """
    if train:
        if 0 < stat_rows < x.shape[0]:
            y, mean, var = _bn_train_subset(
                p["scale"], p["offset"], x, stat_rows
            )
        else:
            y, mean, var = _bn_train(p["scale"], p["offset"], x)
        new_s = {
            "mean": BN_MOMENTUM * s["mean"] + (1.0 - BN_MOMENTUM) * mean,
            "var": BN_MOMENTUM * s["var"] + (1.0 - BN_MOMENTUM) * var,
        }
        return y, new_s
    mean, var = s["mean"], s["var"]
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
    y = (x.astype(jnp.float32) - mean) * inv + p["offset"]
    return y.astype(x.dtype), s


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 6.0)
