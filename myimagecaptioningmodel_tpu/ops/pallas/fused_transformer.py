"""Whole-decode fused transformer kernel — the transformer family's analog
of ops/pallas/fused_step.py, one level more aggressive: the ENTIRE greedy
decode (all ``max_length`` steps x all layers x the tied-vocab argmax head
x the next-word embedding feedback) runs as ONE Pallas program with a
``grid=(T,)`` sequential time axis.

Why whole-decode instead of per-step (VERDICT r3 #2): the XLA KV-cached step
(models/transformer.py:354-376) is ~15 small ops per layer per token —
launch-bound exactly like the LSTM scan was before fused_step.py. But unlike
the LSTM (whose ~30 MB of step weights fit VMEM-resident), the transformer
streams ~117 MB of layer weights + ~105 MB of cross-attention K/V from HBM
every step, so the per-step shape is bandwidth-bound. The whole-decode form
lets the expensive per-step streams be *software-pipelined* (ring-buffered
DMA overlapping compute) while the KV caches — the only state that grows
with t — live in VMEM scratch across the whole decode and never touch HBM:

    resident in VMEM across all T steps:
        self-attention K/V caches   [L, T, B, D] x2   (bf16, scratch; 73 MB
                                                       at production dims —
                                                       why the 105 MB memory
                                                       and 117 MB weights
                                                       CANNOT also be
                                                       resident)
        tied embedding/head table   [V, E]            (used twice per step:
                                                       one-hot gather of the
                                                       next word + the vocab
                                                       argmax head)
        in/out projections, LNs, biases, positions    (small)
    ring-buffered HBM streams, per step (~222 MB/step -> ~271 us/step
    bandwidth floor at the v5e's 819 GB/s):
        layer weights  4 contiguous chunk arrays (qkv | wo,xq,xo | fc1 | fc2^T)
        cross-attn K/V [L, 2, M, B, D] in M-chunks

Per-head attention math avoids per-head loops and relayouts with a
*selector matmul*: with head h owning lanes [h*dh, (h+1)*dh), the 0/1
selector S [D, heads] turns lane-group reductions into one skinny MXU dot
(scores = (K ⊙ q) @ S) and lane-group broadcasts into its transpose
(w_expanded = W @ S^T). Everything stays in the [*, B, D] layout the MXU
and DMA engines like; no [B, T, heads, d_head] reshapes ever happen.

Numerics mirror models/transformer.py decode exactly (bf16 matmuls with f32
accumulation rounded at the same points, f32 LayerNorm/softmax/logits), so
greedy ids match the unfused path id-for-id — pinned by
tests/test_fused_transformer.py in f32 and on-chip in bf16.

Reference anchors: decode loop model_adaAttention_aic.py:119-125 (greedy
argmax feedback; this is the transformer-family replacement), tied head
model_adaAttention_aic.py:117.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

# per-layer weight chunk order in the stream (each chunk type its own
# contiguous [L, D, cols] array so every DMA is one contiguous block; all
# stored input-major so every stage is a plain [B, *] @ [D_in, *] dot;
# fc2 [4D, D] is stored transposed and contracted on its second axis)
_QKV, _MISC, _FC1, _FC2T = 0, 1, 2, 3

# Timing-probe ablations (benchmarks/probe_fused_transformer.py ONLY):
# static stage skips compiled into the kernel to attribute per-step time.
# Always empty in production; never consulted outside _build_kernel.
_ABLATE: frozenset = frozenset()

# DMA ring depths (probe-tunable; production values fixed by measurement —
# see benchmarks/probe_fused_transformer.py). More slots = more HBM chunks
# in flight at the cost of VMEM. At production dims (D=1024) neither the
# cross-attn memory (105 MB) nor the full weight set (117 MB) fits VMEM
# alongside the 73 MB of self-attn caches, so BOTH are per-step streams
# and the kernel is bandwidth-bound at ~222 MB/step.
_W_SLOTS: int = 3
_MEM_SLOTS: int = 4
_MEM_CHUNK: int = 0  # 0 = auto (cdiv(M, 3) above 32 rows)


class FusedTransformerDecode(NamedTuple):
    """Decode-invariant tensors, packed once per decode call.

    For an int8-quantized artifact the four weight streams STAY int8 in HBM
    (``w_scales`` carries the per-channel scales; dequantization happens
    in-kernel right after each chunk's DMA) — the decode is weight-stream
    bound, so halving those bytes is the entire point of the quantized
    bundle. Full-precision params stream as bf16 and ``w_scales`` is None."""

    w_qkv: jnp.ndarray  # [L, D, 3D] bf16|int8 fused self-attn q|k|v projections
    w_misc: jnp.ndarray  # [L, D, 3D] bf16|int8 wo | xq | xo
    w_fc1: jnp.ndarray  # [L, D, F] bf16|int8
    w_fc2t: jnp.ndarray  # [L, D, F] bf16|int8 (fc2 [F, D] stored transposed)
    # int8 mode only: per-OUTPUT-channel scales, padded to one [L, 4, SMAX]
    # f32 block (rows: qkv[3D] | misc[3D] | fc1[F] | fc2[D], each
    # zero-padded to SMAX = max(3D, F)); applied to each consumer dot's
    # output, matching L.dense's ``(x @ w_q) * scale``. None in bf16 mode
    w_scales: Any
    mem_kv: jnp.ndarray  # [L, 2, M, B, D] bf16 (int8 in quantize_kv mode)
    # quantize_kv mode only: per-feature-channel scales [L, 2, D] f32 for
    # the int8 cross-attn memory; None otherwise. The kernel folds them
    # into per-step [B, D]-sized multiplies (K's scale pre-multiplies the
    # query, V's post-multiplies the accumulated context), so the streamed
    # tensor itself only pays an int8->bf16 convert.
    mem_scales: Any
    table: jnp.ndarray  # [V, E] bf16 tied embedding/head table
    smalls: jnp.ndarray  # [L, 12, D] f32: q_b v_b wo_b xq_b xo_b fc2_b ln1g ln1b ln2g ln2b ln3g ln3b
    fc1_b: jnp.ndarray  # [L, F] f32 (F = D * mlp_ratio)
    sel: jnp.ndarray  # [D, heads] bf16 head-selector matrix
    in_proj_w: jnp.ndarray  # [E, D] bf16
    in_proj_b: jnp.ndarray  # [D] f32
    pos: jnp.ndarray  # [P, D] f32 learned positions
    lnf: jnp.ndarray  # [2, D] f32 (g, b)
    out_proj_w: jnp.ndarray  # [D, E] bf16
    out_proj_b: jnp.ndarray  # [E] f32
    out_bias: jnp.ndarray  # [V] f32

    @property
    def dims(self) -> Tuple[int, int, int, int, int, int, int]:
        L, D, F = self.w_fc1.shape
        _, _, M, B, _ = self.mem_kv.shape
        V, E = self.table.shape
        return L, D, F, M, B, V, E


def _dw(p) -> jnp.ndarray:
    from myimagecaptioningmodel_tpu.ops.quantization import dense_weight

    return dense_weight(p)


def _db(p, dim: int) -> jnp.ndarray:
    b = p.get("b")
    return jnp.zeros((dim,), jnp.float32) if b is None else b.astype(jnp.float32)


def prepare(
    params: Params,
    pre,  # transformer.TransformerPre: per-layer mem K/V [B, M, heads, dh]
    n_heads: int,
    compute_dtype=jnp.bfloat16,
    quantize_kv: bool = False,
) -> FusedTransformerDecode:
    """Pack the decoder params + precomputed cross-attention memory into the
    kernel's streaming layout. Cheap (one concat/transpose per tensor) and
    jit-hoisted out of nothing — the kernel is called once per decode.

    int8 artifacts keep their weight streams int8 (plus packed per-channel
    scales for the in-kernel dequant); everything else is packed bf16.

    ``quantize_kv``: symmetric per-feature-channel int8 quantization of the
    streamed cross-attention K/V (an opt-in approximate serving mode — the
    memory stream is the decode's single largest HBM consumer). The
    quantization error is bounded by the per-channel absmax/127 grid; the
    weight streams' semantics are unchanged."""
    from myimagecaptioningmodel_tpu.ops.quantization import embedding_table

    dt = jnp.dtype(compute_dtype)
    layers = params["layers"]
    L = len(layers)
    table_f32 = embedding_table(params["embedding"])
    dense_leaves = [
        leaf
        for layer in layers
        for sub in (layer["attn"], layer["xattn"], layer["mlp"])
        for leaf in sub.values()
    ]
    int8_mode = all("w_q" in p for p in dense_leaves)

    def wq(p):  # raw int8 weight (int8 mode only)
        return p["w_q"]

    qkv_rows, misc_rows, fc1w_rows, fc2t_rows = [], [], [], []
    scale_rows = []
    small_rows, fc1_rows = [], []
    for layer in layers:
        a, xa, mlp = layer["attn"], layer["xattn"], layer["mlp"]
        D = (wq(a["wq"]) if int8_mode else _dw(a["wq"])).shape[0]
        if int8_mode:
            qkv_rows.append(
                jnp.concatenate([wq(a["wq"]), wq(a["wk"]), wq(a["wv"])], axis=1)
            )
            misc_rows.append(
                jnp.concatenate([wq(a["wo"]), wq(xa["wq"]), wq(xa["wo"])], axis=1)
            )
            fc1w_rows.append(wq(mlp["fc1"]))
            fc2t_rows.append(wq(mlp["fc2"]).T)
            F_ = wq(mlp["fc1"]).shape[1]
            smax = max(3 * D, F_)

            def pad(s):
                return jnp.pad(s.astype(jnp.float32), (0, smax - s.shape[0]))

            scale_rows.append(
                jnp.stack(
                    [
                        pad(jnp.concatenate(
                            [a["wq"]["scale"], a["wk"]["scale"], a["wv"]["scale"]]
                        )),
                        pad(jnp.concatenate(
                            [a["wo"]["scale"], xa["wq"]["scale"], xa["wo"]["scale"]]
                        )),
                        pad(mlp["fc1"]["scale"]),
                        pad(mlp["fc2"]["scale"]),  # per OUTPUT channel [D]
                    ]
                )
            )
        else:
            qkv_rows.append(
                jnp.concatenate(
                    [_dw(a["wq"]), _dw(a["wk"]), _dw(a["wv"])], axis=1
                ).astype(dt)
            )
            misc_rows.append(
                jnp.concatenate(
                    [_dw(a["wo"]), _dw(xa["wq"]), _dw(xa["wo"])], axis=1
                ).astype(dt)
            )
            fc1w_rows.append(_dw(mlp["fc1"]).astype(dt))
            fc2t_rows.append(_dw(mlp["fc2"]).T.astype(dt))
        small_rows.append(
            jnp.stack(
                [
                    _db(a["wq"], D), _db(a["wv"], D), _db(a["wo"], D),
                    _db(xa["wq"], D), _db(xa["wo"], D), _db(mlp["fc2"], D),
                    layer["ln1"]["g"], layer["ln1"]["b"],
                    layer["ln2"]["g"], layer["ln2"]["b"],
                    layer["ln3"]["g"], layer["ln3"]["b"],
                ]
            ).astype(jnp.float32)
        )
        fc1_rows.append(_db(mlp["fc1"], _dw(mlp["fc1"]).shape[1]))
    D = qkv_rows[0].shape[0]
    if hasattr(pre, "mem_kv"):
        # transformer.TransformerPreMBD: already [L, 2, M, B, D] in the
        # kernel's layout (precompute_mbd transposed the 13 MB feature
        # memory once instead of shuffling the 105 MB K/V here)
        mem_kv = pre.mem_kv.astype(dt)
    else:
        # cross-attention memory: [B, M, heads, dh] -> [M, B, D] (the
        # kernel's DMA-friendly layout: (B, D) are the tiled trailing
        # dims, M chunks lead)
        def to_mbd(x):
            B, M, h, dh = x.shape
            return jnp.transpose(x.reshape(B, M, h * dh), (1, 0, 2)).astype(dt)

        mem_kv = jnp.stack(
            [
                jnp.stack([to_mbd(k), to_mbd(v)])
                for k, v in zip(pre.mem_k, pre.mem_v)
            ]
        )  # [L, 2, M, B, D]
    mem_scales = None
    if quantize_kv:
        absmax = jnp.max(
            jnp.abs(mem_kv.astype(jnp.float32)), axis=(2, 3), keepdims=True
        )  # [L, 2, 1, 1, D]
        s = jnp.maximum(absmax / 127.0, 1e-12)
        mem_scales = jnp.squeeze(s, (2, 3)).astype(jnp.float32)  # [L, 2, D]
        mem_kv = jnp.clip(
            jnp.round(mem_kv.astype(jnp.float32) / s), -127, 127
        ).astype(jnp.int8)
    dh = D // n_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, n_heads), 1)
    sel = (lane // dh == head).astype(dt)
    return FusedTransformerDecode(
        w_qkv=jnp.stack(qkv_rows),
        w_misc=jnp.stack(misc_rows),
        w_fc1=jnp.stack(fc1w_rows),
        w_fc2t=jnp.stack(fc2t_rows),
        w_scales=jnp.stack(scale_rows) if int8_mode else None,
        mem_kv=mem_kv,
        mem_scales=mem_scales,
        table=table_f32.astype(dt),
        smalls=jnp.stack(small_rows),
        fc1_b=jnp.stack(fc1_rows).astype(jnp.float32),
        sel=sel,
        in_proj_w=_dw(params["in_proj"]).astype(dt),
        in_proj_b=_db(params["in_proj"], D),
        pos=params["pos"].astype(jnp.float32),
        lnf=jnp.stack([params["ln_f"]["g"], params["ln_f"]["b"]]).astype(
            jnp.float32
        ),
        out_proj_w=_dw(params["out_proj"]).astype(dt),
        out_proj_b=_db(params["out_proj"], _dw(params["out_proj"]).shape[1]),
        out_bias=params["out_bias"].astype(jnp.float32),
    )


def _ln(x, g, b):
    """f32 LayerNorm over lanes — same expression as transformer._layer_norm."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + b


def _dot(a, b, dt):
    """bf16 MXU dot with f32 accumulation, rounded back to the compute dtype
    — the L.dense contraction (callers add biases in the compute dtype)."""
    return jax.lax.dot_general(
        a.astype(dt), b.astype(dt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)


class _Stream:
    """Static double-buffered DMA stream: ``makes[i](slot)`` builds the DMA
    for chunk i into buffer slot ``i % 2``. prime() starts chunks 0..1;
    take() waits for the next chunk and returns its slot; refill() (call
    AFTER the chunk's consumer instruction) starts the chunk that reuses
    the just-freed slot. Pure Python bookkeeping — the kernel body is
    statically unrolled, so this compiles to straight-line DMA ops."""

    def __init__(self, makes, slots: int = 2):
        self.makes = makes
        self.slots = slots
        self.issued = 0
        self.taken = 0

    def _issue(self):
        if self.issued < len(self.makes):
            self.makes[self.issued](self.issued % self.slots).start()
            self.issued += 1

    def prime(self):
        while self.issued < min(self.slots, len(self.makes)):
            self._issue()

    def take(self) -> int:
        i = self.taken
        assert i < self.issued, (
            "DMA stream take() before issue — a consumer forgot refill()"
        )
        self.makes[i](i % self.slots).wait()
        self.taken += 1
        return i % self.slots

    def refill(self):
        self._issue()


def _build_kernel(
    *, L: int, D: int, F: int, M: int, B: int, V: int, E: int, T: int,
    P: int, heads: int, start_idx: int, padding_idx: int, dt,
    mem_chunk: int, t_chunk: int, int8_stream: bool, int8_kv: bool,
    early_stop: bool = False, stop_idx: int = 3, valid_rows: int = None,
):
    dh = D // heads
    n_mc = pl.cdiv(M, mem_chunk)
    n_valid = B if valid_rows is None else valid_rows

    # ---- probe-only VPU stand-ins (benchmarks/probe_fused_transformer) ----
    # "novpu" swaps every serial VPU chain (LayerNorm, softmax, gelu) for a
    # cheap linear op of the same shape/dtype, keeping ALL streams and MXU
    # dots: full - novpu attributes the data-dependent VPU links that no
    # DMA overlap can hide. Production builds never set _ABLATE.
    _novpu = "novpu" in _ABLATE

    def ln_k(x, g, b):
        if _novpu:
            return x.astype(jnp.float32) * g + b
        return _ln(x, g, b)

    def softmax_k(s):
        if _novpu:
            return s * (1.0 / 128.0)
        return jax.nn.softmax(s, axis=0)

    def act_k(h):
        if _novpu:
            return h
        return jax.nn.gelu(h, approximate=True)

    def kernel(
        # streamed (ANY/HBM) inputs: contiguous per-chunk-type weight
        # arrays (a column slice of one packed [L, D, 14D] block would be a
        # row-strided DMA; these are single contiguous blocks) + memory
        wq_ref, wm_ref, wf1_ref, wf2t_ref, mem_kv_ref,
        # VMEM-resident inputs (wsc_ref / msc_ref: per-channel scales for
        # the int8 weight / memory streams; never-read dummies when off)
        wsc_ref, msc_ref, table_ref, smalls_ref, fc1_b_ref, sel_ref,
        in_proj_w_ref,
        in_proj_b_ref, pos_ref, lnf_ref, out_proj_w_ref, out_proj_b_ref,
        out_bias_ref,
        # outputs
        ids_ref,
        # scratch (done_v / all_done_s: early-stop state — per-row done
        # mask in VMEM, all-rows-done flag in SMEM; dormant when
        # early_stop=False)
        kcache, vcache, x_s, done_v, all_done_s, wbuf, membuf, wsem, msem,
    ):
        t = pl.program_id(0)

        def wchunk(slot, cols):
            """Weight chunk as a compute-dtype value (int8 mode: an exact
            int8->dt convert only — the per-channel scale applies to each
            consumer dot's OUTPUT via ``wscaled``, matching ops/layers.py
            dense's ``(x @ w_q) * scale`` exactly, and costing a [B, cols]
            multiply instead of a [D, cols] dequant)."""
            return wbuf[slot, :, pl.ds(0, cols)].astype(dt)

        def wscaled(y, c, l, c0, cols):
            """Apply chunk ``c``'s per-output-channel scale slice
            [c0, c0+cols) to a dot output ``y`` [B, cols] (int8 mode only;
            identity in bf16 mode). L.dense order: scale BEFORE bias."""
            if not int8_stream:
                return y
            s = wsc_ref[l, c, pl.ds(c0, cols)].astype(dt)
            return y * s[None, :]

        def embed_to_x(word, pos_row):
            """word [B] int32 -> residual stream [B, D] f32 (in_proj of the
            bf16 table row + position), matching transformer._embed_in."""
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
                == word[:, None]
            ).astype(dt)
            # one-hot MXU gather == jnp.take of the bf16 table, exactly
            emb = jax.lax.dot_general(
                onehot, table_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            # cast BEFORE the [:, None]: Mosaic cannot insert a minor dim on
            # an i1 vector ("only supported for 32-bit types" — triggered
            # once `word` flows through the early-stop select)
            emb = emb * (word != padding_idx).astype(jnp.float32)[
                :, None
            ].astype(dt)
            x = _dot(emb, in_proj_w_ref[:], dt) + in_proj_b_ref[:].astype(dt)
            return x.astype(jnp.float32) + pos_row

        @pl.when(t == 0)
        def _init():
            word0 = jnp.full((B,), start_idx, jnp.int32)
            x_s[:] = embed_to_x(word0, pos_ref[0, :][None, :])
            # zero the caches: not-yet-written slots are multiplied by the
            # (exactly zero) softmax weight of their -1e9-masked scores, and
            # 0 x garbage/NaN would poison the accumulation (the XLA path's
            # cache is zero-initialized for the same reason)
            kcache[:] = jnp.zeros(kcache.shape, kcache.dtype)
            vcache[:] = jnp.zeros(vcache.shape, vcache.dtype)
            # defined baseline for the full-array ids block: <pad>. Without
            # early_stop each row is overwritten exactly once (at its own
            # step's select below); with early_stop the steps after
            # all-rows-done never write, and <pad> is their contract
            # (reference early-exit semantics: model_adaAttention_aic.py:
            # 119-125 stop handling, transformer.greedy_decode_ids ids0)
            ids_ref[:] = jnp.full(ids_ref.shape, padding_idx, jnp.int32)
            if early_stop:
                # gate-padded rows [n_valid, B) start done: they carry no
                # caption (sliced off by the caller) and must not keep the
                # batch alive past the real rows' last <stop>
                col = jax.lax.broadcasted_iota(jnp.int32, done_v.shape, 1)
                done_v[:] = (col >= n_valid).astype(jnp.int32)
                all_done_s[0] = jnp.int32(0)

        # ---- the whole step, as one (possibly predicated) body --------------
        # With early_stop the body is skipped entirely once every row has
        # emitted <stop>: no DMA starts, no waits, no compute — a skipped
        # grid step costs only grid overhead instead of the ~222 MB weight/
        # memory stream. All DMAs started inside a body are waited inside
        # the same body (the _Stream invariant), so predication is clean.

        # ---- static DMA plans for this step --------------------------------
        w_srcs = [
            (wq_ref, 3 * D), (wm_ref, 3 * D), (wf1_ref, F), (wf2t_ref, F)
        ]

        def make_w(i):
            l, c = divmod(i, 4)
            ref, cols = w_srcs[c]

            def make(slot):
                return pltpu.make_async_copy(
                    ref.at[l],
                    wbuf.at[slot, :, pl.ds(0, cols)],
                    wsem.at[slot],
                )

            return make

        def make_mem(i):
            l, rest = divmod(i, 2 * n_mc)
            kv, c = divmod(rest, n_mc)
            m0 = c * mem_chunk
            mc = min(mem_chunk, M - m0)

            def make(slot):
                return pltpu.make_async_copy(
                    mem_kv_ref.at[l, kv, pl.ds(m0, mc), :, :],
                    membuf.at[slot, pl.ds(0, mc), :, :],
                    msem.at[slot],
                )

            return make

        sel = sel_ref[:]
        inv_sqrt_dh = 1.0 / (dh**0.5)

        def attend_resident(q, l, n_ctx, valid_upto):
            """Self-attention over layer ``l``'s VMEM cache: q [B,D] bf16,
            masked to slots <= valid_upto. The cache is read directly from
            scratch in T-chunks (bounded transients, no full-cache copy).
            Matches transformer._attend: f32 scores/softmax, bf16 weight
            re-rounding, f32 accumulation."""
            scores = []
            for c0 in range(0, n_ctx, t_chunk):
                cc = min(t_chunk, n_ctx - c0)
                prod = kcache[l, pl.ds(c0, cc)] * q[None]  # [cc, B, D] bf16
                s = jax.lax.dot_general(
                    prod.reshape(cc * B, D), sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [cc*B, heads]
                scores.append(s.reshape(cc, B, heads))
            s = jnp.concatenate(scores, axis=0) * inv_sqrt_dh  # [n_ctx,B,h]
            slot_ids = jax.lax.broadcasted_iota(
                jnp.int32, (n_ctx, B, heads), 0
            )
            s = jnp.where(slot_ids <= valid_upto, s, -1e9)
            w = jax.nn.softmax(s, axis=0).astype(dt)  # [n_ctx, B, heads]
            out = jnp.zeros((B, D), jnp.float32)
            for c0 in range(0, n_ctx, t_chunk):
                cc = min(t_chunk, n_ctx - c0)
                wexp = jax.lax.dot_general(
                    w[c0 : c0 + cc].reshape(cc * B, heads), sel,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt).reshape(cc, B, D)
                out = out + jnp.sum(
                    (wexp * vcache[l, pl.ds(c0, cc)]).astype(jnp.float32),
                    axis=0,
                )
            return out.astype(dt)  # [B, D] — merged heads

        def step_body():
            ws = _Stream([make_w(i) for i in range(4 * L)], _W_SLOTS)
            n_m_dmas = 0 if "noxattn" in _ABLATE else 2 * n_mc * L
            ms = _Stream([make_mem(i) for i in range(n_m_dmas)], _MEM_SLOTS)
            ws.prime()
            ms.prime()
            x = x_s[:]
            for l in range(L):
                q_b, v_b, wo_b, xq_b, xo_b, fc2_b = (
                    smalls_ref[l, i, :] for i in range(6)
                )
                ln = lambda x_, i: _ln(
                    x_, smalls_ref[l, 6 + 2 * i, :], smalls_ref[l, 7 + 2 * i, :]
                )

                # ---- self-attention (cache in VMEM scratch) --------------------
                h1 = ln(x, 0).astype(dt)
                slot = ws.take()  # qkv weights [D, 3D]
                qkv = wscaled(
                    _dot(h1, wchunk(slot, 3 * D), dt), _QKV, l, 0, 3 * D
                )  # [B, 3D]
                ws.refill()
                q = qkv[:, :D] + q_b.astype(dt)
                k_new = qkv[:, D : 2 * D]
                v_new = qkv[:, 2 * D :] + v_b.astype(dt)
                kcache[l, pl.ds(t, 1)] = k_new[None]
                vcache[l, pl.ds(t, 1)] = v_new[None]
                if "noselfattn" in _ABLATE:
                    sa = q
                else:
                    sa = attend_resident(q, l, T, t)

                slot = ws.take()  # misc weights [D, 3D] = wo | xq | xo
                wm = wchunk(slot, 3 * D)
                x = x + (
                    wscaled(_dot(sa, wm[:, :D], dt), _MISC, l, 0, D)
                    + wo_b.astype(dt)
                ).astype(jnp.float32)

                if "noxattn" in _ABLATE:
                    ws.refill()  # misc chunk's last consumer was the wo dot
                else:
                    # ---- cross-attention (memory streamed in M-chunks) ---------
                    h2 = ln(x, 1).astype(dt)
                    qx = wscaled(
                        _dot(h2, wm[:, D : 2 * D], dt), _MISC, l, D, D
                    ) + xq_b.astype(dt)
                    # int8_kv: fold K's per-channel scale into the query (one
                    # [B, D] multiply) so the streamed K chunks only pay an
                    # int8->bf16 convert, not a full dequant multiply
                    if int8_kv:
                        qk = (
                            qx.astype(jnp.float32) * msc_ref[l, 0, :]
                        ).astype(dt)
                    else:
                        qk = qx
                    # pass 1: scores over all K chunks
                    xs_parts = []
                    for c in range(n_mc):
                        mc = min(mem_chunk, M - c * mem_chunk)
                        mslot = ms.take()  # K chunk c
                        kchunk = membuf[mslot, pl.ds(0, mc), :, :].astype(dt)
                        prod = kchunk * qk[None]
                        s = jax.lax.dot_general(
                            prod.reshape(mc * B, D), sel, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(mc, B, heads)
                        xs_parts.append(s)
                        ms.refill()  # V chunk c (or next layer's K) into this slot
                    s = jnp.concatenate(xs_parts, axis=0) * inv_sqrt_dh  # [M,B,h]
                    wght = jax.nn.softmax(s, axis=0).astype(dt)
                    # pass 2: weighted V accumulation over V chunks
                    ca = jnp.zeros((B, D), jnp.float32)
                    for c in range(n_mc):
                        mc = min(mem_chunk, M - c * mem_chunk)
                        m0 = c * mem_chunk
                        mslot = ms.take()  # V chunk c
                        wexp = jax.lax.dot_general(
                            wght[m0 : m0 + mc].reshape(mc * B, heads), sel,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(dt).reshape(mc, B, D)
                        vchunk = membuf[mslot, pl.ds(0, mc), :, :].astype(dt)
                        ca = ca + jnp.sum(
                            (wexp * vchunk).astype(jnp.float32), axis=0
                        )
                        ms.refill()
                    # int8_kv: V's per-channel scale applied once to the
                    # accumulated context (the other [B, D]-sized multiply)
                    if int8_kv:
                        ca = ca * msc_ref[l, 1, :]
                    x = x + (
                        wscaled(
                            _dot(ca.astype(dt), wm[:, 2 * D :], dt),
                            _MISC, l, 2 * D, D,
                        )
                        + xo_b.astype(dt)
                    ).astype(jnp.float32)
                    ws.refill()  # the misc chunk's last consumer was the xo dot

                # ---- MLP -------------------------------------------------------
                h3 = ln(x, 2).astype(dt)
                slot = ws.take()  # fc1 [D, F]
                hmid = jax.nn.gelu(
                    wscaled(_dot(h3, wchunk(slot, F), dt), _FC1, l, 0, F)
                    + fc1_b_ref[l, :].astype(dt),
                    approximate=True,
                )
                ws.refill()
                slot = ws.take()  # fc2^T [D, F]
                mlp_out = wscaled(
                    jax.lax.dot_general(
                        hmid, wchunk(slot, F),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dt),
                    _FC2T, l, 0, D,
                ) + fc2_b.astype(dt)
                ws.refill()
                x = x + mlp_out.astype(jnp.float32)

            # ---- tied-vocab head + argmax + next-word embedding feedback -------
            if "nohead" in _ABLATE:
                word = jnp.full((B,), start_idx, jnp.int32)
            else:
                hf = _ln(x, lnf_ref[0, :], lnf_ref[1, :]).astype(dt)
                proj = (
                    _dot(hf, out_proj_w_ref[:], dt) + out_proj_b_ref[:].astype(dt)
                )
                logits = (
                    jax.lax.dot_general(
                        proj, table_ref[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + out_bias_ref[:][None, :]
                )  # [B, V] f32
                word = jnp.argmax(logits, axis=1).astype(jnp.int32)
            if early_stop:
                # reference early-exit semantics (transformer.greedy_decode_
                # ids w_body): already-done rows emit <pad>; a row is done
                # once it has emitted <stop>. The done mask rides VMEM
                # scratch as a full-tile [8, B] block (all sublanes
                # identical); the all-rows-done flag lands in SMEM where the
                # next grid step's predicate reads it.
                prev_done = done_v[:] > 0  # [8, B] (rows identical)
                word = jnp.where(prev_done[0], padding_idx, word)
                new_done = prev_done[0] | (word == stop_idx)
                done_v[:] = jnp.broadcast_to(
                    new_done[None, :], done_v.shape
                ).astype(jnp.int32)
                all_done_s[0] = jnp.all(new_done).astype(jnp.int32)
            # The ids output is one full-array [T, B] VMEM-resident block
            # (Mosaic rejects sub-(8,128) blocks like (1, B) on int32; a full
            # block sidesteps the dynamic-sublane store too). Write row t with
            # a vectorized select — 17.5 KB of VPU work, negligible per step.
            row_t = jax.lax.broadcasted_iota(jnp.int32, (T, B), 0)
            ids_ref[:] = jnp.where(row_t == t, word[None, :], ids_ref[:])

            # embed the new word for step t+1 (clamped no-op on the last step)
            if "noembed" not in _ABLATE:
                pos_idx = jnp.minimum(t + 1, P - 1)
                x_s[:] = embed_to_x(word, pos_ref[pl.ds(pos_idx, 1), :])

        if early_stop:
            # once every row is done, the remaining grid steps are skipped
            # wholesale: no DMA, no MXU/VPU work — only grid overhead
            @pl.when(all_done_s[0] == 0)
            def _run():
                step_body()
        else:
            step_body()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_length", "n_heads", "start_idx", "padding_idx",
        "compute_dtype", "interpret", "early_stop", "stop_idx",
        "valid_rows",
    ),
)
def fused_greedy_decode(
    ftp: FusedTransformerDecode,
    max_length: int,
    n_heads: int,
    start_idx: int = 2,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    early_stop: bool = False,
    stop_idx: int = 3,
    valid_rows: int = None,
) -> jnp.ndarray:
    """Whole-decode fused transformer greedy decode -> ids [B, max_length].

    One Pallas dispatch: grid=(max_length,), KV caches in VMEM scratch,
    weights/memory double-buffered from HBM (see module docstring).

    ``early_stop``: in-kernel all-rows-done exit (reference semantics
    model_adaAttention_aic.py:119-125 / transformer.greedy_decode_ids
    ``early_stop=True``): done rows emit <pad>, and once every row has
    emitted <stop> the remaining grid steps skip ALL DMA and compute.
    ``valid_rows``: rows >= valid_rows are gate-padding — they start done so
    they cannot keep the batch alive (their ids are sliced off anyway)."""
    L, D, F, M, B, V, E = ftp.dims
    T = max_length
    P = ftp.pos.shape[0]
    dt = jnp.dtype(compute_dtype)
    int8_stream = ftp.w_scales is not None
    int8_kv = ftp.mem_scales is not None
    mem_chunk = _MEM_CHUNK or (M if M <= 32 else pl.cdiv(M, 3))
    mem_chunk = min(mem_chunk, M)
    t_chunk = min(T, 8)

    kernel = _build_kernel(
        L=L, D=D, F=F, M=M, B=B, V=V, E=E, T=T, P=P, heads=n_heads,
        start_idx=start_idx, padding_idx=padding_idx, dt=dt,
        mem_chunk=mem_chunk, t_chunk=t_chunk, int8_stream=int8_stream,
        int8_kv=int8_kv, early_stop=early_stop, stop_idx=stop_idx,
        valid_rows=valid_rows,
    )
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    resident = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    nbytes = jnp.dtype(dt).itemsize
    w_nbytes = 1 if int8_stream else nbytes
    m_nbytes = 1 if int8_kv else nbytes
    wbuf_dtype = jnp.int8 if int8_stream else dt
    membuf_dtype = jnp.int8 if int8_kv else dt
    # disabled modes never read their scales ref; feed 1-row dummies
    wsc = (
        ftp.w_scales
        if int8_stream
        else jnp.zeros((1, 1, 128), jnp.float32)
    )
    msc = (
        ftp.mem_scales if int8_kv else jnp.zeros((1, 1, 128), jnp.float32)
    )
    flops_step = 2 * B * (
        L * ((6 * D + 2 * F) * D + (T + M) * D + (T + M) * n_heads * D)
        + 2 * E * V + E * D + D * E
    )
    ids_tm = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # w_qkv (HBM, manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # w_misc (HBM, manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # w_fc1 (HBM, manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # w_fc2t (HBM, manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # mem_kv (HBM, manual DMA)
            resident(wsc.shape),
            resident(msc.shape),
            resident(ftp.table.shape),
            resident(ftp.smalls.shape),
            resident(ftp.fc1_b.shape),
            resident(ftp.sel.shape),
            resident(ftp.in_proj_w.shape),
            resident(ftp.in_proj_b.shape),
            resident(ftp.pos.shape),
            resident(ftp.lnf.shape),
            resident(ftp.out_proj_w.shape),
            resident(ftp.out_proj_b.shape),
            resident(ftp.out_bias.shape),
        ],
        out_specs=pl.BlockSpec((T, B), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L, T, B, D), dt),  # kcache
            pltpu.VMEM((L, T, B, D), dt),  # vcache
            pltpu.VMEM((B, D), jnp.float32),  # x_s residual stream
            pltpu.VMEM((8, B), jnp.int32),  # done_v (early-stop row mask)
            pltpu.SMEM((1,), jnp.int32),  # all_done_s (early-stop exit flag)
            pltpu.VMEM((_W_SLOTS, D, max(3 * D, F)), wbuf_dtype),  # wbuf ring
            pltpu.VMEM((_MEM_SLOTS, mem_chunk, B, D), membuf_dtype),  # membuf
            pltpu.SemaphoreType.DMA((_W_SLOTS,)),  # wsem
            pltpu.SemaphoreType.DMA((_MEM_SLOTS,)),  # msem
        ],
        cost_estimate=pl.CostEstimate(
            flops=T * flops_step,
            bytes_accessed=T
            * (
                (6 * D + 2 * F) * L * D * w_nbytes
                + 2 * L * M * B * D * m_nbytes
            ),
            transcendentals=T * B * (L * (T + M + 2 * F) + V),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=130 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        ftp.w_qkv, ftp.w_misc, ftp.w_fc1, ftp.w_fc2t, ftp.mem_kv,
        wsc, msc, ftp.table, ftp.smalls, ftp.fc1_b, ftp.sel,
        ftp.in_proj_w, ftp.in_proj_b, ftp.pos, ftp.lnf, ftp.out_proj_w,
        ftp.out_proj_b, ftp.out_bias,
    )
    return jnp.transpose(ids_tm, (1, 0))


def fused_dims_ok(
    params: Params, dims, batch: int, max_length: int, mem_len: int = 50
) -> bool:
    """Gate for the whole-decode kernel: production-ish dims whose tiles and
    VMEM plan the kernel is written for, AND a VMEM budget check — the
    self-attn caches, the weight/memory DMA rings and the tied table must
    all fit (v5e: 128 MB/core, ~8 MB headroom left for Mosaic temporaries).
    Anything else falls back to the XLA KV-cached scan (identical ids, just
    unfused)."""
    D = dims.model_dim
    L, F = dims.num_layers, dims.model_dim * dims.mlp_ratio
    itemsize = 2  # bf16 compute dtype (f32 only in tests' interpret mode)
    mem_chunk = mem_len if mem_len <= 32 else -(-mem_len // 3)
    vmem = (
        2 * L * max_length * batch * D * itemsize  # self-attn K/V caches
        + _W_SLOTS * D * max(3 * D, F) * itemsize  # weight DMA ring
        + _MEM_SLOTS * mem_chunk * batch * D * itemsize  # memory DMA ring
        + dims.padded_vocab * dims.embedding_size * itemsize  # tied table
        + batch * D * 4  # residual stream (f32)
    )
    return (
        D % 128 == 0
        and dims.embedding_size % 128 == 0
        and D // dims.num_heads >= 8
        and dims.padded_vocab >= 2048
        and batch >= 8
        and batch % 8 == 0
        and max_length <= params["pos"].shape[0]
        and vmem <= 126 * 1024 * 1024
    )
