"""Fused MobileNetV2 inverted-residual block (inference) as one Pallas kernel.

The encoder is activation-bandwidth bound: each inverted-residual block
(1x1 expand conv -> 3x3 depthwise -> 1x1 project, MobileNetV2.py:128-178)
writes and re-reads a 6x-expanded activation tensor through HBM twice. This
kernel computes the whole block per (image, row-tile) grid step with the
expanded tensor living only in VMEM: HBM sees the block input once and the
block output once (~6x traffic cut on the expanded stages).

Inference-mode only: BatchNorm (moving stats) is folded into the conv
weights/biases beforehand (``fold_bn``), which is exact in eval mode. The
training path keeps the XLA composition (autodiff-friendly).

Implementation notes:
- row tiles need a 1-row halo of *real neighbor data*, which BlockSpecs
  cannot express (blocks never overlap), so the input window is fetched by
  manual DMA from HBM — double-buffered across grid steps (the prefetch for
  step i+1 is issued before the compute of step i);
- row-tile height adapts per layer to a VMEM budget (v5e scoped VMEM is
  16 MB); whole images are one tile once small enough;
- channels are padded to the 128-lane tile and W to the 8-sublane tile
  (physically ~free: the tiled layout pads those dims anyway); the kernel
  drops the alignment columns after the expand matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from myimagecaptioningmodel_tpu.ops.layers import BN_EPS

VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


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


def _pick_row_tile(
    Hout: int, stride: int, W: int, cin_pad: int, Cexp: int, Cout: int, itemsize: int
) -> int:
    """Largest divisor of Hout whose working set fits the VMEM budget."""
    cout_pad = -(-Cout // 128) * 128
    for th in sorted((d for d in range(1, Hout + 1) if Hout % d == 0), reverse=True):
        wrows = th * stride + 2
        xwin = 2 * wrows * W * cin_pad * itemsize  # 2 DMA slots
        e = wrows * (W + 2) * Cexp * 4
        out = 2 * th * (W // stride) * cout_pad * itemsize  # 2 pipeline slots
        weights = (cin_pad * Cexp + Cexp * Cout) * itemsize + 12 * Cexp * 4
        if xwin + e + out + weights <= VMEM_BUDGET:
            return th
    return 1


def _kernel(
    x_hbm, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref, out_ref,
    xwin, e_ref, sems,
    *, stride: int, th: int, nt: int, h_in: int, w_in: int,
    shortcut: bool, act_dtype,
):
    i = pl.program_id(0)  # linear (image, tile) step
    total = pl.num_programs(0)
    wrows = xwin.shape[1]  # th*stride + 2
    w_pad = xwin.shape[2]
    cin = xwin.shape[3]
    cexp = e_ref.shape[2]
    w_out = out_ref.shape[2]

    def window_copy(step, slot):
        b = step // nt
        iw0 = (step % nt) * (th * stride)
        return pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(iw0, wrows), :, :], xwin.at[slot], sems.at[slot]
        )

    # double buffer: step 0 fetches its own window; every step prefetches
    # the next window before computing on the current one
    @pl.when(i == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(i + 1 < total)
    def _():
        window_copy(i + 1, (i + 1) % 2).start()

    window_copy(i, i % 2).wait()
    x = xwin[i % 2]

    # expand (1x1 conv == matmul over channels) + BN bias + relu6
    e = _relu6(
        jax.lax.dot_general(
            x.reshape(wrows * w_pad, cin), we_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + be_ref[0, :]
    ).reshape(wrows, w_pad, cexp)

    # zero out-of-image halo rows (padded coords: real rows are 1..h_in)
    iw0 = (i % nt) * (th * stride)
    row_abs = jax.lax.broadcasted_iota(jnp.int32, (wrows, 1, 1), 0) + iw0
    e = jnp.where((row_abs >= 1) & (row_abs <= h_in), e, 0.0)

    # column-pad by one zero each side; drop W-alignment padding columns
    e_ref[:] = jnp.zeros_like(e_ref)
    e_ref[:, 1 : w_in + 1, :] = e[:, :w_in, :].astype(e_ref.dtype)

    # 3x3 depthwise at ``stride`` + BN bias + relu6 (expanded tensor in VMEM)
    ea = e_ref[:]
    wd = wd_ref[:]
    acc = jnp.zeros((th, w_out, cexp), jnp.float32)
    if stride == 1:
        for dy in range(3):
            for dx in range(3):
                acc += ea[dy : dy + th, dx : dx + w_out, :].astype(
                    jnp.float32
                ) * wd[dy * 3 + dx, :]
    else:  # stride 2 via pair-reshape (static strided view)
        v = ea.reshape(wrows // 2, 2, (w_in + 2) // 2, 2, cexp)
        for dy in range(3):
            rp, rq = dy // 2, dy % 2
            for dx in range(3):
                cp, cq = dx // 2, dx % 2
                acc += v[rp : rp + th, rq, cp : cp + w_out, cq, :].astype(
                    jnp.float32
                ) * wd[dy * 3 + dx, :]
    d = _relu6(acc + bd_ref[0, :]).astype(wp_ref.dtype)

    # project (1x1 conv) + BN bias [+ residual]
    out = (
        jax.lax.dot_general(
            d.reshape(th * w_out, cexp), wp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[0, :]
    ).reshape(th, w_out, -1)
    if shortcut:  # stride 1, Cin == Cout: residual rows are x[1 : th+1]
        cout = out_ref.shape[3]
        out = out + x[1 : th + 1, :w_in, :cout].astype(jnp.float32)
    out_ref[0] = out.astype(act_dtype)


def fused_inverted_residual(
    x: jnp.ndarray,  # [B, H, W, Cin]
    folded: FoldedIRB,
    stride: int,
    shortcut: bool,
    row_tile: int = 0,  # 0 = auto (largest tile fitting the VMEM budget)
) -> jnp.ndarray:
    """Run one BN-folded inverted-residual block as a fused Pallas kernel."""
    B, H, W, Cin = x.shape
    Cexp = folded.we.shape[1]
    Cout = folded.wp.shape[1]
    Hout, Wout = H // stride, W // stride
    act_dtype = x.dtype
    itemsize = jnp.dtype(act_dtype).itemsize

    cin_pad = -(-Cin // 128) * 128
    w_pad = -(-W // 8) * 8
    we = folded.we
    if cin_pad != Cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_pad - Cin)))
        we = jnp.pad(we, ((0, cin_pad - Cin), (0, 0)))
    if w_pad != W:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w_pad - W), (0, 0)))
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    th = row_tile or _pick_row_tile(Hout, stride, w_pad, cin_pad, Cexp, Cout, itemsize)
    while Hout % th:
        th -= 1
    nt = Hout // th
    wrows = th * stride + 2

    dt = act_dtype
    kernel = functools.partial(
        _kernel,
        stride=stride, th=th, nt=nt, h_in=H, w_in=W,
        shortcut=shortcut, act_dtype=act_dtype,
    )
    flops = (
        2 * B * H * W * Cin * Cexp
        + B * Hout * Wout * Cexp * 18
        + 2 * B * Hout * Wout * Cexp * Cout
    )
    return pl.pallas_call(
        kernel,
        grid=(B * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x_pad: manual halo DMA
            pl.BlockSpec((cin_pad, Cexp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cexp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cexp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cexp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, Wout, Cout),
            lambda i, nt=nt: (i // nt, i % nt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hout, Wout, Cout), act_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, wrows, w_pad, cin_pad), act_dtype),
            pltpu.VMEM((wrows, W + 2, Cexp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * (H + 2) * w_pad * cin_pad * itemsize
            + B * Hout * Wout * Cout * itemsize,
            transcendentals=0,
        ),
    )(
        x_pad,
        we.astype(dt), folded.be.astype(jnp.float32),
        folded.wd.astype(jnp.float32), folded.bd.astype(jnp.float32),
        folded.wp.astype(dt), folded.bp.astype(jnp.float32),
    )


# ---- padded-chain variant ------------------------------------------------------
#
# Chaining fused blocks through jnp.pad costs a full tensor copy per layer
# (TPU buffers are physically lane/sublane padded anyway, but an XLA pad op
# still reads+writes everything). The padded-chain keeps activations in
# [B, H+2, W, C_pad128] form BETWEEN blocks: each kernel consumes and
# produces that format directly (zero boundary rows/lanes written in-kernel),
# so the only pads are one entry pad and one exit strip for the whole chain.
# Whole images are one grid block (auto-pipelined by Mosaic) — usable once
# H <= 56 at batch-128 VMEM budgets.


def pad_activation(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> chain format [B,H+2,W,Cpad128] (one explicit copy)."""
    B, H, W, C = x.shape
    cpad = -(-C // 128) * 128
    return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, cpad - C)))


def strip_activation(x: jnp.ndarray, channels: int, real_w: int) -> jnp.ndarray:
    """Chain format -> [B,H,real_w,channels]."""
    return x[:, 1:-1, :real_w, :channels]


def _chain_kernel(
    x_ref, we_ref, be_ref, wd_ref, bd_ref, wp_ref, bp_ref, out_ref, e_ref,
    *, stride: int, h_in: int, w_in: int, cout: int, shortcut: bool, act_dtype,
):
    rows = x_ref.shape[1]  # h_in + 2
    w_pad = x_ref.shape[2]
    cin = x_ref.shape[3]
    cexp = e_ref.shape[2]
    h_out = (rows - 2) // stride
    w_out = w_in // stride

    x = x_ref[0]
    e = _relu6(
        jax.lax.dot_general(
            x.reshape(rows * w_pad, cin), we_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + be_ref[0, :]
    ).reshape(rows, w_pad, cexp)

    # halo rows of the padded input are zeros -> their expand output is
    # relu6(be); zero them (real rows are 1..h_in)
    row_abs = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    e = jnp.where((row_abs >= 1) & (row_abs <= h_in), e, 0.0)

    e_ref[:] = jnp.zeros_like(e_ref)
    e_ref[:, 1 : w_in + 1, :] = e[:, :w_in, :].astype(e_ref.dtype)

    ea = e_ref[:]
    wd = wd_ref[:]
    acc = jnp.zeros((h_out, w_out, cexp), jnp.float32)
    if stride == 1:
        for dy in range(3):
            for dx in range(3):
                acc += ea[dy : dy + h_out, dx : dx + w_out, :].astype(
                    jnp.float32
                ) * wd[dy * 3 + dx, :]
    else:
        v = ea.reshape(rows // 2, 2, (w_in + 2) // 2, 2, cexp)
        for dy in range(3):
            rp, rq = dy // 2, dy % 2
            for dx in range(3):
                cp, cq = dx // 2, dx % 2
                acc += v[rp : rp + h_out, rq, cp : cp + w_out, cq, :].astype(
                    jnp.float32
                ) * wd[dy * 3 + dx, :]
    d = _relu6(acc + bd_ref[0, :]).astype(wp_ref.dtype)

    out = (
        jax.lax.dot_general(
            d.reshape(h_out * w_out, cexp), wp_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bp_ref[0, :]
    ).reshape(h_out, w_out, cout)
    if shortcut:  # stride 1, Cin == Cout (chain-padded alike)
        out = out + x[1 : h_in + 1, :w_in, :cout].astype(jnp.float32)

    # emit in chain format: zero boundary rows / W tail / channel pad lanes
    out_ref[0] = jnp.zeros_like(out_ref[0])
    out_ref[0, 1 : h_out + 1, :w_out, :cout] = out.astype(act_dtype)


def fused_irb_chain(
    x: jnp.ndarray,  # chain format [B, H+2, W_pad, Cpad128]
    folded: FoldedIRB,
    stride: int,
    shortcut: bool,
    real_w: int,  # logical W of this layer's input
) -> jnp.ndarray:
    """One block in chain format -> chain format [B, Hout+2, Wout_pad, Cpad]."""
    B, rows, w_pad, cin_pad = x.shape
    H = rows - 2
    Cin = folded.we.shape[0]
    Cexp = folded.we.shape[1]
    Cout = folded.wp.shape[1]
    Hout, Wout = H // stride, real_w // stride
    wout_pad = -(-Wout // 8) * 8
    cout_pad = -(-Cout // 128) * 128
    act_dtype = x.dtype

    we = folded.we
    if cin_pad != Cin:  # zero weight rows for the padded input lanes
        we = jnp.pad(we, ((0, cin_pad - Cin), (0, 0)))

    kernel = functools.partial(
        _chain_kernel,
        stride=stride, h_in=H, w_in=real_w, cout=Cout,
        shortcut=shortcut, act_dtype=act_dtype,
    )
    itemsize = jnp.dtype(act_dtype).itemsize
    flops = (
        2 * B * H * real_w * Cin * Cexp
        + B * Hout * Wout * Cexp * 18
        + 2 * B * Hout * Wout * Cexp * Cout
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, w_pad, cin_pad), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin_pad, Cexp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cexp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cexp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cexp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cexp, Cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Hout + 2, wout_pad, cout_pad), lambda b: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hout + 2, wout_pad, cout_pad), act_dtype),
        scratch_shapes=[
            # expanded tensor kept in the activation dtype (relu6 range
            # [0,6] is bf16-safe); the depthwise accumulates in f32
            pltpu.VMEM((rows, real_w + 2, Cexp), act_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * rows * w_pad * cin_pad * itemsize
            + B * (Hout + 2) * wout_pad * cout_pad * itemsize,
            transcendentals=0,
        ),
    )(
        x,
        we.astype(act_dtype), folded.be.astype(jnp.float32),
        folded.wd.astype(jnp.float32), folded.bd.astype(jnp.float32),
        folded.wp.astype(act_dtype), folded.bp.astype(jnp.float32),
    )


def reference_irb(x, folded: FoldedIRB, stride: int, shortcut: bool):
    """XLA path of the same BN-folded block (tests / layers the kernel
    doesn't cover). Intermediates stay in the activation dtype — an f32
    expanded tensor would double the HBM traffic of the hottest stages."""
    dt = x.dtype
    e = _relu6(
        jnp.einsum("bhwc,cd->bhwd", x, folded.we.astype(dt))
        + folded.be[0].astype(dt)
    )
    wd = folded.wd.reshape(3, 3, 1, -1)
    d = jax.lax.conv_general_dilated(
        e, wd.astype(dt),
        window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e.shape[-1],
    )
    d = _relu6(d + folded.bd[0].astype(dt))
    out = jnp.einsum("bhwc,cd->bhwd", d, folded.wp.astype(dt)) + folded.bp[0].astype(dt)
    if shortcut:
        out = out + x
    return out.astype(x.dtype)
