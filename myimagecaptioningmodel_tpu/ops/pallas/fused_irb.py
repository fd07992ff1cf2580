"""Fused MobileNetV2 inverted-residual block (inference) as one Pallas kernel.

The encoder is activation-bandwidth bound: each inverted-residual block
(1x1 expand conv -> 3x3 depthwise -> 1x1 project, MobileNetV2.py:128-178)
writes and re-reads a 6x-expanded activation tensor through HBM twice. This
kernel computes the whole block per (image, row-tile) grid step with the
expanded tensor living only in VMEM: HBM sees just the block input once and
the block output once (~3x traffic cut on the expanded stages).

Inference-mode only: BatchNorm (moving stats) is folded into the conv
weights/biases beforehand (``fold_bn``), which is exact in eval mode. The
training path keeps the XLA composition (autodiff-friendly).

Layout: NHWC with channels on the TPU lane dimension. The input is
pre-padded by one zero row top+bottom in XLA; column padding and
out-of-image row masking happen in-kernel (the halo of a row tile is real
neighbor data, fetched by overlapping manual DMA — BlockSpecs can't overlap).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myimagecaptioningmodel_tpu.ops.layers import BN_EPS


class FoldedIRB(NamedTuple):
    """BN-folded inference weights of one inverted-residual block."""

    we: jnp.ndarray  # [Cin, Cexp] expand 1x1
    be: jnp.ndarray  # [1, Cexp]
    wd: jnp.ndarray  # [9, Cexp]  3x3 depthwise, (dy*3+dx) major
    bd: jnp.ndarray  # [1, Cexp]
    wp: jnp.ndarray  # [Cexp, Cout] project 1x1
    bp: jnp.ndarray  # [1, Cout]


def fold_bn(w: jnp.ndarray, bn_params, bn_state) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BN (y = (conv(x)-mean)*gamma/sqrt(var+eps)+beta) into
    conv weights (scale on the output-channel axis) + bias."""
    scale = bn_params["scale"] / jnp.sqrt(bn_state["var"] + BN_EPS)
    return w * scale, (bn_params["offset"] - bn_state["mean"] * scale)


def fold_irb(block_params, block_state) -> FoldedIRB:
    """Fold one IRB's three conv+BN pairs (params/state keyed
    ``{expand,dwise,linear}`` as built by models/mobilenet_v2.init)."""
    we, be = fold_bn(
        block_params["expand"]["conv"]["w"][0, 0],  # [1,1,Cin,Cexp] -> [Cin,Cexp]
        block_params["expand"]["bn"], block_state["expand"]["bn"],
    )
    wd4, bd = fold_bn(
        block_params["dwise"]["conv"]["w"],  # [3,3,1,Cexp] (feature-grouped)
        block_params["dwise"]["bn"], block_state["dwise"]["bn"],
    )
    wd = wd4.reshape(9, -1)
    wp, bp = fold_bn(
        block_params["linear"]["conv"]["w"][0, 0],
        block_params["linear"]["bn"], block_state["linear"]["bn"],
    )
    return FoldedIRB(we, be[None, :], wd, bd[None, :], wp, bp[None, :])


def _relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def _kernel(
    x_hbm, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref, out_ref,
    xwin, e_ref, sem,
    *, stride: int, th: int, h_in: int, w_in: int, shortcut: bool, act_dtype,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    wrows = xwin.shape[0]  # th*stride + 2
    cin = xwin.shape[2]
    cexp = e_ref.shape[2]
    w_out = out_ref.shape[2]

    # fetch the (overlapping) input row window from the row-padded input
    iw0 = t * (th * stride)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(iw0, wrows), :, :], xwin, sem
    )
    dma.start()
    dma.wait()

    w_pad = xwin.shape[1]  # W rounded up to the 8-sublane tile
    x = xwin[:].astype(jnp.float32)
    # expand (1x1 conv == matmul over channels) + BN bias + relu6
    e = _relu6(
        jax.lax.dot_general(
            x.reshape(wrows * w_pad, cin), we_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + be_ref[0, :]
    ).reshape(wrows, w_pad, cexp)

    # zero out-of-image halo rows (padded coords: real rows are 1..h_in)
    row_abs = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1, 1), 0) + iw0
    e = jnp.where((row_abs >= 1) & (row_abs <= h_in), e, 0.0)

    # column-pad by one zero on each side (image W boundary); drop the
    # W-alignment padding columns (their expand output is garbage relu6(be))
    e_ref[:] = jnp.zeros_like(e_ref)
    e_ref[:, 1 : w_in + 1, :] = e[:, :w_in, :]

    # 3x3 depthwise at ``stride`` + BN bias + relu6, expanded tensor in VMEM
    ea = e_ref[:]
    wd = wd_ref[:].astype(jnp.float32)
    acc = jnp.zeros((th, w_out, cexp), jnp.float32)
    if stride == 1:
        for dy in range(3):
            for dx in range(3):
                acc += ea[dy : dy + th, dx : dx + w_out, :] * wd[dy * 3 + dx, :]
    else:  # stride 2 via pair-reshape (static strided view)
        v = ea.reshape(wrows // 2, 2, (w_in + 2) // 2, 2, cexp)
        for dy in range(3):
            rp, rq = dy // 2, dy % 2
            for dx in range(3):
                cp, cq = dx // 2, dx % 2
                acc += (
                    v[rp : rp + th, rq, cp : cp + w_out, cq, :]
                    * wd[dy * 3 + dx, :]
                )
    d = _relu6(acc + bd_ref[0, :])

    # project (1x1 conv) + BN bias [+ residual]
    out = (
        jax.lax.dot_general(
            d.reshape(th * w_out, cexp), wp_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[0, :]
    ).reshape(th, w_out, -1)
    if shortcut:  # stride 1, Cin == Cout: residual rows are xwin[1 : th+1]
        cout = out_ref.shape[3]
        out = out + xwin[1 : th + 1, :w_in, :cout].astype(jnp.float32)
    out_ref[0] = out.astype(act_dtype)


def fused_inverted_residual(
    x: jnp.ndarray,  # [B, H, W, Cin]
    folded: FoldedIRB,
    stride: int,
    shortcut: bool,
    row_tile: int = 7,
) -> jnp.ndarray:
    """Run one BN-folded inverted-residual block as a fused Pallas kernel."""
    B, H, W, Cin = x.shape
    Cexp = folded.we.shape[1]
    Cout = folded.wp.shape[1]
    Hout, Wout = H // stride, W // stride
    th = min(row_tile, Hout)
    while Hout % th:
        th -= 1
    wrows = th * stride + 2
    act_dtype = x.dtype

    # Channels padded to the 128-lane tile and W to the 8-sublane tile so
    # the halo DMA slices are tile-aligned (physically ~free: the tiled HBM
    # layout pads both dims anyway); expand weights grow matching zero rows
    # and the kernel drops the padded columns after the expand matmul.
    cin_pad = -(-Cin // 128) * 128
    w_pad = -(-W // 8) * 8
    we = folded.we
    if cin_pad != Cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad - Cin)))
        we = jnp.pad(we, ((0, cin_pad - Cin), (0, 0)))
    if w_pad != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w_pad - W), (0, 0)))
    folded = folded._replace(we=we)

    x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    grid = (B, Hout // th)
    kernel = functools.partial(
        _kernel,
        stride=stride, th=th, h_in=H, w_in=W, shortcut=shortcut,
        act_dtype=act_dtype,
    )
    flops = 2 * B * H * W * Cin * Cexp + B * Hout * Wout * Cexp * 18 + \
        2 * B * Hout * Wout * Cexp * Cout
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad: manual halo DMA
            pl.BlockSpec((cin_pad, Cexp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cexp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cexp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cexp), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, Cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, Wout, Cout), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hout, Wout, Cout), act_dtype),
        scratch_shapes=[
            pltpu.VMEM((wrows, w_pad, cin_pad), act_dtype),
            pltpu.VMEM((wrows, W + 2, Cexp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * Hout * Wout * Cout * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x_pad, folded.we, folded.be, folded.wd, folded.bd, folded.wp, folded.bp)


def reference_irb(x, folded: FoldedIRB, stride: int, shortcut: bool):
    """XLA reference of the same BN-folded block (for tests / non-TPU)."""
    e = _relu6(jnp.einsum("bhwc,cd->bhwd", x.astype(jnp.float32), folded.we) + folded.be[0])
    wd = folded.wd.reshape(3, 3, 1, -1)
    d = jax.lax.conv_general_dilated(
        e, wd.transpose(0, 1, 2, 3),
        window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e.shape[-1],
    )
    d = _relu6(d + folded.bd[0])
    out = jnp.einsum("bhwc,cd->bhwd", d, folded.wp) + folded.bp[0]
    if shortcut:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)
