#!/usr/bin/env python
"""Prototype: int8-activation MobileNetV2 inference encoder.

The batch-128 greedy decode spends ~2.9 ms of 4.59 ms in the encoder forward
(benchmarks/decode_roofline.md), and that segment is HBM-bound on the
expanded (6x-channel) activations. Every such tensor is a relu6 output, so
its range is exactly [0, 6]: a static scale of 6/127 quantizes it to int8
with no calibration. This prototype measures, on the real chip:

  bf16        — the shipping eval path (control)
  folded      — BN folded into conv weights, still bf16 (isolates fold gain)
  int8        — expanded activations int8; dwise as int8 grouped conv
                (MXU int8), 1x1 linear as int8 dot_general
  int8_taps   — same, but dwise as 9 shifted int8 FMAs fused with the
                requantize (never materializes an int32/bf16 expanded tensor)

Usage: python benchmarks/proto_int8_encoder.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.models import mobilenet_v2 as mnv2
from myimagecaptioningmodel_tpu.ops.pallas.fused_irb import fold_bn

ACT_SCALE = 6.0 / 127.0  # relu6 output range is [0, 6] by construction
INV_ACT_SCALE = 127.0 / 6.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def quant_w(w, axis):
    """Symmetric per-channel int8 (reduce over ``axis``)."""
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, jnp.squeeze(scale, axis=axis).astype(jnp.float32)


def relu6_quant(y32):
    """fused relu6 + static int8 quantize (y32 is f32/bf16 pre-activation)."""
    return jnp.clip(jnp.round(y32.astype(jnp.float32) * INV_ACT_SCALE), 0, 127).astype(jnp.int8)


def fold_all(params, state):
    """BN-fold every conv in the encoder -> {name: (w_folded, bias)}."""
    folded = {}
    for name in params:
        folded[name] = fold_bn(
            params[name]["conv"]["w"], params[name]["bn"], state[name]["bn"]
        )
    return folded


# ---------------------------------------------------------------- variants


def apply_folded_bf16(folded, x):
    dt = jnp.bfloat16

    def conv(name, x, stride, pad, groups=1, act=True):
        w, b = folded[name]
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
        y = y + b.astype(dt)
        return jnp.clip(y, 0.0, 6.0) if act else y

    x = conv("conv1_1", x, 2, 1)
    in_c = 32
    for stage, (t, c, n, s_) in enumerate(mnv2.BOTTLENECK_PARAMS, start=2):
        for i in range(1, n + 1):
            name = f"conv{stage}_{i}"
            stride = s_ if i == 1 else 1
            exp = in_c * t
            res = x
            x = conv(name + "_expand", x, 1, 0)
            x = conv(name + "_dwise", x, stride, 1, groups=exp)
            x = conv(name + "_linear", x, 1, 0, act=False)
            if i > 1:
                x = x + res
            in_c = c
    x = conv("conv9", x, 1, 0)
    return x


def prep_int8(folded):
    """Quantize the folded weights for the int8 variants."""
    q = {}
    for name, (w, b) in folded.items():
        if name.endswith("_dwise"):
            w_q, s = quant_w(w, axis=(0, 1, 2))  # [3,3,1,C] -> per-channel [C]
        elif name.endswith("_linear"):
            w_q, s = quant_w(w[0, 0], axis=0)  # [C,O] per-output
        else:
            w_q, s = None, None  # expand/conv1_1/conv9 stay bf16 (input is bf16)
        q[name] = dict(w=w, b=b, w_q=w_q, s=s)
    return q


def apply_int8(q, x, dwise_taps: bool):
    dt = jnp.bfloat16

    def conv_bf16(name, x, stride, pad, act):
        w, b = q[name]["w"], q[name]["b"]
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + b.astype(dt)
        if act is None:
            return y
        return relu6_quant(y) if act == "q" else jnp.clip(y, 0.0, 6.0)

    def dwise_int8(name, e_q, stride):
        w_q, s, b = q[name]["w_q"], q[name]["s"], q[name]["b"]
        if not dwise_taps:
            acc = jax.lax.conv_general_dilated(
                e_q, w_q, (stride, stride), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=e_q.shape[-1],
                preferred_element_type=jnp.int32,
            )
        else:
            B, H, W, C = e_q.shape
            xp = jnp.pad(e_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
            Ho = (H + 2 - 3) // stride + 1
            Wo = (W + 2 - 3) // stride + 1
            acc = jnp.zeros((B, Ho, Wo, C), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    tap = jax.lax.slice(
                        xp, (0, dy, dx, 0),
                        (B, dy + (Ho - 1) * stride + 1, dx + (Wo - 1) * stride + 1, C),
                        (1, stride, stride, 1),
                    )
                    acc = acc + tap.astype(jnp.int32) * w_q[dy, dx, 0].astype(jnp.int32)
        y = acc.astype(jnp.float32) * (ACT_SCALE * s) + b
        return relu6_quant(y)  # -> int8 again

    def linear_int8(name, d_q):
        w_q, s, b = q[name]["w_q"], q[name]["s"], q[name]["b"]
        B, H, W, C = d_q.shape
        acc = jax.lax.dot_general(
            d_q.reshape(B * H * W, C), w_q,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (ACT_SCALE * s) + b
        return y.astype(dt).reshape(B, H, W, -1)

    x = conv_bf16("conv1_1", x, 2, 1, act="f")  # keep bf16: block 2_1 expand is t=1
    in_c = 32
    for stage, (t, c, n, s_) in enumerate(mnv2.BOTTLENECK_PARAMS, start=2):
        for i in range(1, n + 1):
            name = f"conv{stage}_{i}"
            stride = s_ if i == 1 else 1
            res = x
            e_q = conv_bf16(name + "_expand", x, 1, 0, act="q")  # bf16 matmul -> int8
            d_q = dwise_int8(name + "_dwise", e_q, stride)
            x = linear_int8(name + "_linear", d_q)
            if i > 1:
                x = x + res
            in_c = c
    x = conv_bf16("conv9", x, 1, 0, act="f")
    return x


# ---------------------------------------------------------------- timing


def sustained_ms(fn, x, iters=10, reps=3):
    @jax.jit
    def run_k(x):
        def body(carry, k):
            out = fn(x + k.astype(jnp.float32) * 1e-6)
            return carry, out[0, 0, 0, :1].astype(jnp.float32)

        _, outs = jax.lax.scan(body, 0, jnp.arange(iters))
        return outs

    jax.block_until_ready(run_k(x))
    t0 = time.time()
    r = None
    for _ in range(reps):
        r = run_k(x)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    log(f"device: {jax.devices()[0]}")
    params, state = mnv2.init(jax.random.PRNGKey(0))
    # At random init 53 BN(var=1) layers shrink activations to ~1e-5 — far
    # below the 6/127 static quant step, which would make any int8-vs-bf16
    # comparison meaningless. Gently boost the BN scales so activations stay
    # O(0.1-1) and exercise the relu6 range like a trained model's do.
    # (Aggressive boosts make the 53-layer net chaotic: even the
    # mathematically-identical folded-bf16 path then diverges from the
    # shipping path through amplified bf16 rounding, cos ~0.78.)
    for name in params:
        params[name]["bn"]["scale"] = params[name]["bn"]["scale"] * 1.25
        params[name]["bn"]["offset"] = params[name]["bn"]["offset"] + 0.05
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 224, 224, 3), jnp.float32)

    folded = jax.jit(lambda p, s: fold_all(p, s))(params, state)
    q = jax.jit(prep_int8)(folded)
    jax.block_until_ready((folded, q))

    base = jax.jit(lambda x: mnv2.apply(params, state, x, train=False)[0])
    variants = {
        "bf16_shipping": lambda x: mnv2.apply(params, state, x, train=False)[0],
        "folded_bf16": functools.partial(apply_folded_bf16, folded),
        "int8_grouped": functools.partial(apply_int8, q, dwise_taps=False),
        "int8_taps": functools.partial(apply_int8, q, dwise_taps=True),
    }

    # numeric sanity. folded-bf16 is compared against the shipping path
    # (formulation difference + bf16 rounding); the int8 variants against
    # folded-bf16, isolating pure quantization error.
    def cmp(name, out, ref):
        rel = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        cos = float(
            (out.ravel() @ ref.ravel())
            / (np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
        )
        log(f"{name}: mean-rel-err {rel:.4f}  cosine {cos:.5f}")

    try:
        ref = np.asarray(base(x[:8]), np.float32)
        fld = np.asarray(jax.jit(variants["folded_bf16"])(x[:8]), np.float32)
        cmp("folded_bf16 (vs shipping)", fld, ref)
        for name in ("int8_grouped", "int8_taps"):
            out = np.asarray(jax.jit(variants[name])(x[:8]), np.float32)
            cmp(f"{name} (vs folded)", out, fld)
    except Exception as e:
        log(f"numerics FAILED: {type(e).__name__}: {e}")

    for name, fn in variants.items():
        try:
            ms = sustained_ms(fn, x, iters=args.iters)
            log(f"{name}: {ms:.2f} ms / batch {args.batch}")
        except Exception as e:
            log(f"{name}: FAILED timing: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
