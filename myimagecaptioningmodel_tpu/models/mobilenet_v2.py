"""MobileNetV2 encoder, functional JAX, NHWC (TPU-native layout).

Same architecture as the reference's PaddleClas copy
(model/MobileNetV2.py:23-209): conv3x3 s2 -> 7 inverted-residual stages with
the (t, c, n, s) table below -> 1x1 conv to 1280 channels, ReLU6 activations,
BN after every conv. ``use_pooling`` adds a global average pool (the
captioner keeps the 7x7 spatial map, model_adaAttention_aic.py:141).

Differences from the reference (deliberate, TPU-first):
- NHWC activations / HWIO weights (reference is NCHW/CUDA);
- encoder freezing is per-call ``jax.lax.stop_gradient`` on the param
  pytree instead of the reference's module-global ``ParamAttr`` monkey-patch
  (MobileNetV2.py:27-29 — a cross-instance leak; SURVEY §2.2 quirk 4);
- BN running stats live in an explicit state pytree.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.ops import layers as L

# (expansion t, channels c, repeats n, stride s) — MobileNetV2.py:37-45
BOTTLENECK_PARAMS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

Params = Dict[str, Any]
State = Dict[str, Any]


def _init_conv_bn(key, in_ch: int, out_ch: int, kernel: int, groups: int = 1):
    kc, _ = jax.random.split(key)
    conv = L.init_conv(kc, in_ch, out_ch, kernel, groups)
    bn_p, bn_s = L.init_batch_norm(out_ch)
    return {"conv": conv, "bn": bn_p}, {"bn": bn_s}


def _apply_conv_bn(
    p, s, x, stride: int, padding: int, groups: int, if_act: bool,
    train: bool, compute_dtype, safe_depthwise: bool = False,
    fuse_bn_stats: bool = False, bn_stat_rows: int = 0,
):
    w = p["conv"]["w"]
    if (
        fuse_bn_stats and train and groups == 1 and stride == 1
        and padding == 0 and w.shape[0] == 1 and w.shape[1] == 1
    ):
        # 1x1 conv == matmul: fold the BN stats read into the conv's output
        # pass (ops/pallas/matmul_bn.py); EMA update matches L.batch_norm
        from myimagecaptioningmodel_tpu.ops.pallas import matmul_bn as MB

        x, mean, var = MB.conv1x1_bn_train(p["conv"], p["bn"], x, compute_dtype)
        bn_s = {
            "mean": L.BN_MOMENTUM * s["bn"]["mean"] + (1.0 - L.BN_MOMENTUM) * mean,
            "var": L.BN_MOMENTUM * s["bn"]["var"] + (1.0 - L.BN_MOMENTUM) * var,
        }
    else:
        x = L.conv2d(p["conv"], x, stride, padding, groups, compute_dtype,
                     safe_depthwise=safe_depthwise)
        x, bn_s = L.batch_norm(p["bn"], s["bn"], x, train, bn_stat_rows)
    if if_act:
        x = L.relu6(x)
    return x, {"bn": bn_s}


def init(key, scale: float = 1.0) -> Tuple[Params, State]:
    """Build the (params, state) pytrees for MobileNetV2 x``scale``."""
    params: Params = {}
    state: State = {}
    keys = iter(jax.random.split(key, 256))

    def conv_bn(name, in_ch, out_ch, kernel, groups=1):
        p, s = _init_conv_bn(next(keys), in_ch, out_ch, kernel, groups)
        params[name], state[name] = p, s

    conv_bn("conv1_1", 3, int(32 * scale), 3)

    in_c = int(32 * scale)
    for stage, (t, c, n, s_) in enumerate(BOTTLENECK_PARAMS, start=2):
        c = int(c * scale)
        for i in range(1, n + 1):
            name = f"conv{stage}_{i}"
            exp = int(round(in_c * t))
            conv_bn(name + "_expand", in_c, exp, 1)
            conv_bn(name + "_dwise", exp, exp, 3, groups=exp)
            conv_bn(name + "_linear", exp, c, 1)
            in_c = c

    out_ch = int(1280 * scale) if scale > 1.0 else 1280
    conv_bn("conv9", in_c, out_ch, 1)
    return params, state


def apply(
    params: Params,
    state: State,
    x: jnp.ndarray,  # [B, 224, 224, 3] NHWC
    train: bool = True,
    trainable: bool = True,
    use_pooling: bool = False,
    scale: float = 1.0,
    compute_dtype=jnp.bfloat16,
    use_fused_irb: bool = False,
    safe_depthwise: bool = False,
    fuse_bn_stats: bool = False,
    bn_stat_rows: int = 0,
) -> Tuple[jnp.ndarray, State]:
    """Forward pass -> ([B,7,7,1280] features or [B,1280] pooled, new state).

    ``use_fused_irb=True`` (eval mode only, EXPERIMENTAL) runs the
    inverted-residual blocks as fused Pallas kernels with BN folded into the
    conv weights, keeping the expanded 6x activations out of HBM
    (ops/pallas/fused_irb.py). Measured on v5e @ batch 128 it is ~2x slower
    on-device than XLA's conv pipeline (5.9 ms vs 2.8 ms — XLA's conv
    fusions are already excellent here), so it stays opt-in; kept as
    infrastructure and a worked example of VMEM-resident block fusion.
    """
    if use_fused_irb and not train:
        return _apply_fused_eval(params, state, x, use_pooling, scale, compute_dtype)
    if not trainable:
        # per-call freeze — replaces the reference's ParamAttr(trainable=False)
        # monkey-patch; BN moving stats still update in train mode, matching
        # Paddle's frozen-encoder behavior.
        params = jax.lax.stop_gradient(params)
    new_state: State = {}

    def conv_bn(name, x, stride, padding, groups=1, if_act=True):
        y, s = _apply_conv_bn(
            params[name], state[name], x, stride, padding, groups, if_act,
            train, compute_dtype, safe_depthwise, fuse_bn_stats, bn_stat_rows,
        )
        new_state[name] = s
        return y

    x = conv_bn("conv1_1", x, 2, 1)

    in_c = int(32 * scale)
    for stage, (t, c, n, s_) in enumerate(BOTTLENECK_PARAMS, start=2):
        c = int(c * scale)
        for i in range(1, n + 1):
            name = f"conv{stage}_{i}"
            stride = s_ if i == 1 else 1
            exp = int(round(in_c * t))
            residual = x
            x = conv_bn(name + "_expand", x, 1, 0)
            x = conv_bn(name + "_dwise", x, stride, 1, groups=exp)
            x = conv_bn(name + "_linear", x, 1, 0, if_act=False)
            if i > 1:  # shortcut on non-first blocks of a stage
                x = x + residual
            in_c = c

    x = conv_bn("conv9", x, 1, 0)
    if use_pooling:
        x = jnp.mean(x, axis=(1, 2))
    return x, new_state


def _apply_fused_eval(
    params: Params,
    state: State,
    x: jnp.ndarray,
    use_pooling: bool,
    scale: float,
    compute_dtype,
) -> Tuple[jnp.ndarray, State]:
    """Inference forward with fused-IRB Pallas kernels (BN folded, state unchanged)."""
    from myimagecaptioningmodel_tpu.ops.pallas import fused_irb as F

    def conv_bn_eval(name, x, stride, padding, groups=1, if_act=True):
        wf, bf = F.fold_bn(
            params[name]["conv"]["w"], params[name]["bn"], state[name]["bn"]
        )
        y = L.conv2d({"w": wf}, x, stride, padding, groups, compute_dtype)
        y = (y.astype(jnp.float32) + bf).astype(compute_dtype)
        return L.relu6(y) if if_act else y

    x = x.astype(compute_dtype)
    x = conv_bn_eval("conv1_1", x, 2, 1)

    # Blocks run fused-in-VMEM while a whole image fits the VMEM budget
    # (8 <= H <= 56 at batch scale); activations stay in the padded chain
    # format between fused blocks so no per-layer pad copies happen. The two
    # 112-row blocks and the tiny 7-row blocks use the BN-folded XLA path.
    chained = False
    real_w = x.shape[2]
    in_c = int(32 * scale)
    for stage, (t, c, n, s_) in enumerate(BOTTLENECK_PARAMS, start=2):
        c = int(c * scale)
        for i in range(1, n + 1):
            name = f"conv{stage}_{i}"
            stride = s_ if i == 1 else 1
            bp = {k: params[f"{name}_{k}"] for k in ("expand", "dwise", "linear")}
            bs = {k: state[f"{name}_{k}"] for k in ("expand", "dwise", "linear")}
            folded = F.fold_irb(bp, bs)
            h = real_w  # square maps throughout
            # whole-image blocks fit the 16MB scoped VMEM once H <= 56
            # (the 112-row blocks overflow by ~2%); sub-8 maps hit Mosaic
            # reshape limits — both run the BN-folded XLA path instead
            use_chain = 8 <= h <= 56
            if use_chain and not chained:
                x = F.pad_activation(x)
                chained = True
            elif not use_chain and chained:
                x = F.strip_activation(x, in_c, real_w)
                chained = False
            if chained:
                x = F.fused_irb_chain(x, folded, stride, shortcut=(i > 1),
                                      real_w=real_w)
            else:
                x = F.reference_irb(x, folded, stride, shortcut=(i > 1))
            in_c = c
            real_w //= stride
    if chained:
        x = F.strip_activation(x, in_c, real_w)

    x = conv_bn_eval("conv9", x, 1, 0)
    if use_pooling:
        x = jnp.mean(x, axis=(1, 2))
    return x, state
