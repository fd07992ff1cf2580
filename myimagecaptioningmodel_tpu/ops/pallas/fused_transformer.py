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
lets the expensive per-step streams be *software-pipelined* (double-buffered
DMA overlapping compute) while the KV caches — the only state that grows
with t — live in VMEM scratch across the whole decode and never touch HBM:

    resident in VMEM across all T steps:
        self-attention K/V caches   [L, T, B, D] x2   (bf16, scratch)
        tied embedding/head table   [V, E]            (used twice per step:
                                                       one-hot gather of the
                                                       next word + the vocab
                                                       argmax head)
        in/out projections, LNs, biases, positions    (small)
    double-buffered HBM streams, per step:
        layer weights  [L, D, 14D]  in 4 chunks/layer (qkv | wo,xq,xo | fc1 | fc2^T)
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

# column layout of the packed per-layer weight block [D, 14D]
# (all stored input-major so every stage is a plain [B, *] @ [D_in, *] dot;
# fc2 [4D, D] is stored transposed and contracted on its second axis)
_QKV, _MISC, _FC1, _FC2T = 0, 1, 2, 3


class FusedTransformerDecode(NamedTuple):
    """Decode-invariant tensors, packed once per decode call (int8 params
    are dequantized here — the streams are bf16 either way, and the fused
    program is the bandwidth-optimal consumer of the artifact)."""

    w_all: jnp.ndarray  # [L, D, 6D+2F] bf16: qkv(3D) | wo(D) xq(D) xo(D) | fc1(F) | fc2^T(F)
    mem_kv: jnp.ndarray  # [L, 2, M, B, D] bf16 cross-attention K/V
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
        L, D, W = self.w_all.shape
        _, _, M, B, _ = self.mem_kv.shape
        V, E = self.table.shape
        return L, D, (W - 6 * D) // 2, M, B, V, E


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
) -> FusedTransformerDecode:
    """Pack the decoder params + precomputed cross-attention memory into the
    kernel's streaming layout. Cheap (one concat/transpose per tensor) and
    jit-hoisted out of nothing — the kernel is called once per decode."""
    from myimagecaptioningmodel_tpu.ops.quantization import embedding_table

    dt = jnp.dtype(compute_dtype)
    layers = params["layers"]
    L = len(layers)
    table_f32 = embedding_table(params["embedding"])
    w_rows, small_rows, fc1_rows = [], [], []
    for layer in layers:
        a, xa, mlp = layer["attn"], layer["xattn"], layer["mlp"]
        D = _dw(a["wq"]).shape[0]
        w_cat = jnp.concatenate(
            [
                _dw(a["wq"]), _dw(a["wk"]), _dw(a["wv"]),  # qkv -> [D, 3D]
                _dw(a["wo"]), _dw(xa["wq"]), _dw(xa["wo"]),  # misc -> [D, 3D]
                _dw(mlp["fc1"]),  # [D, 4D]
                _dw(mlp["fc2"]).T,  # [D, 4D]
            ],
            axis=1,
        ).astype(dt)
        w_rows.append(w_cat)
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
    D = w_rows[0].shape[0]
    # cross-attention memory: [B, M, heads, dh] -> [M, B, D] (the kernel's
    # DMA-friendly layout: (B, D) are the tiled trailing dims, M chunks lead)
    def to_mbd(x):
        B, M, h, dh = x.shape
        return jnp.transpose(x.reshape(B, M, h * dh), (1, 0, 2)).astype(dt)

    mem_kv = jnp.stack(
        [
            jnp.stack([to_mbd(k), to_mbd(v)])
            for k, v in zip(pre.mem_k, pre.mem_v)
        ]
    )  # [L, 2, M, B, D]
    dh = D // n_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (D, n_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (D, n_heads), 1)
    sel = (lane // dh == head).astype(dt)
    return FusedTransformerDecode(
        w_all=jnp.stack(w_rows),
        mem_kv=mem_kv,
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

    def __init__(self, makes):
        self.makes = makes
        self.issued = 0
        self.taken = 0

    def _issue(self):
        if self.issued < len(self.makes):
            self.makes[self.issued](self.issued % 2).start()
            self.issued += 1

    def prime(self):
        while self.issued < min(2, len(self.makes)):
            self._issue()

    def take(self) -> int:
        i = self.taken
        assert i < self.issued, (
            "DMA stream take() before issue — a consumer forgot refill()"
        )
        self.makes[i](i % 2).wait()
        self.taken += 1
        return i % 2

    def refill(self):
        self._issue()


def _build_kernel(
    *, L: int, D: int, F: int, M: int, B: int, V: int, E: int, T: int,
    P: int, heads: int, start_idx: int, padding_idx: int, dt,
    mem_chunk: int, t_chunk: int,
):
    dh = D // heads
    n_mc = pl.cdiv(M, mem_chunk)
    w_cols = [(0, 3 * D), (3 * D, 3 * D), (6 * D, F), (6 * D + F, F)]

    def kernel(
        # streamed (ANY/HBM) inputs
        w_all_ref, mem_kv_ref,
        # VMEM-resident inputs
        table_ref, smalls_ref, fc1_b_ref, sel_ref, in_proj_w_ref,
        in_proj_b_ref, pos_ref, lnf_ref, out_proj_w_ref, out_proj_b_ref,
        out_bias_ref,
        # outputs
        ids_ref,
        # scratch
        kcache, vcache, x_s, wbuf, membuf, wsem, msem,
    ):
        t = pl.program_id(0)

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
            emb = emb * (word != padding_idx)[:, None].astype(dt)
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

        # ---- static DMA plans for this step --------------------------------
        def make_w(i):
            l, c = divmod(i, 4)
            c0, cols = w_cols[c]

            def make(slot):
                return pltpu.make_async_copy(
                    w_all_ref.at[l, :, pl.ds(c0, cols)],
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

        ws = _Stream([make_w(i) for i in range(4 * L)])
        ms = _Stream([make_mem(i) for i in range(2 * n_mc * L)])
        ws.prime()
        ms.prime()

        sel = sel_ref[:]
        inv_sqrt_dh = 1.0 / (dh**0.5)
        x = x_s[:]

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
            qkv = _dot(h1, wbuf[slot, :, pl.ds(0, 3 * D)], dt)  # [B, 3D]
            ws.refill()
            q = qkv[:, :D] + q_b.astype(dt)
            k_new = qkv[:, D : 2 * D]
            v_new = qkv[:, 2 * D :] + v_b.astype(dt)
            kcache[l, pl.ds(t, 1)] = k_new[None]
            vcache[l, pl.ds(t, 1)] = v_new[None]
            sa = attend_resident(q, l, T, t)
            pl.debug_print("DBG q00 {}", q.astype(jnp.float32)[0, 0])

            slot = ws.take()  # misc weights [D, 3D] = wo | xq | xo
            x = x + (
                _dot(sa, wbuf[slot, :, pl.ds(0, D)], dt) + wo_b.astype(dt)
            ).astype(jnp.float32)

            # ---- cross-attention (memory streamed in M-chunks) -------------
            h2 = ln(x, 1).astype(dt)
            qx = _dot(h2, wbuf[slot, :, pl.ds(D, D)], dt) + xq_b.astype(dt)
            # pass 1: scores over all K chunks
            xs_parts = []
            for c in range(n_mc):
                mc = min(mem_chunk, M - c * mem_chunk)
                mslot = ms.take()  # K chunk c
                prod = membuf[mslot, pl.ds(0, mc), :, :] * qx[None]
                s = jax.lax.dot_general(
                    prod.reshape(mc * B, D), sel, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(mc, B, heads)
                xs_parts.append(s)
                ms.refill()  # V chunk c (or next layer's K) into this slot
            s = jnp.concatenate(xs_parts, axis=0) * inv_sqrt_dh  # [M, B, h]
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
                ca = ca + jnp.sum(
                    (wexp * membuf[mslot, pl.ds(0, mc), :, :]).astype(
                        jnp.float32
                    ),
                    axis=0,
                )
                ms.refill()
            x = x + (
                _dot(ca.astype(dt), wbuf[slot, :, pl.ds(2 * D, D)], dt)
                + xo_b.astype(dt)
            ).astype(jnp.float32)
            ws.refill()  # the misc chunk's last consumer was the xo dot
            pl.debug_print("DBG ca00 {}", ca[0, 0])

            # ---- MLP -------------------------------------------------------
            h3 = ln(x, 2).astype(dt)
            slot = ws.take()  # fc1 [D, F]
            hmid = jax.nn.gelu(
                _dot(h3, wbuf[slot, :, pl.ds(0, F)], dt)
                + fc1_b_ref[l, :].astype(dt),
                approximate=True,
            )
            ws.refill()
            slot = ws.take()  # fc2^T [D, F]
            mlp_out = jax.lax.dot_general(
                hmid, wbuf[slot, :, pl.ds(0, F)].astype(dt),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt) + fc2_b.astype(dt)
            ws.refill()
            x = x + mlp_out.astype(jnp.float32)

        # ---- tied-vocab head + argmax + next-word embedding feedback -------
        hf = _ln(x, lnf_ref[0, :], lnf_ref[1, :]).astype(dt)
        proj = _dot(hf, out_proj_w_ref[:], dt) + out_proj_b_ref[:].astype(dt)
        logits = (
            jax.lax.dot_general(
                proj, table_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + out_bias_ref[:][None, :]
        )  # [B, V] f32
        word = jnp.argmax(logits, axis=1).astype(jnp.int32)
        ids_ref[0, :] = word

        # embed the new word for step t+1 (clamped no-op on the last step)
        pos_idx = jnp.minimum(t + 1, P - 1)
        x_s[:] = embed_to_x(word, pos_ref[pl.ds(pos_idx, 1), :])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_length", "n_heads", "start_idx", "padding_idx",
        "compute_dtype", "interpret",
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
) -> jnp.ndarray:
    """Whole-decode fused transformer greedy decode -> ids [B, max_length].

    One Pallas dispatch: grid=(max_length,), KV caches in VMEM scratch,
    weights/memory double-buffered from HBM (see module docstring)."""
    L, D, F, M, B, V, E = ftp.dims
    T = max_length
    P = ftp.pos.shape[0]
    dt = jnp.dtype(compute_dtype)
    mem_chunk = M if M <= 32 else pl.cdiv(M, 2)
    t_chunk = min(T, 8)

    kernel = _build_kernel(
        L=L, D=D, F=F, M=M, B=B, V=V, E=E, T=T, P=P, heads=n_heads,
        start_idx=start_idx, padding_idx=padding_idx, dt=dt,
        mem_chunk=mem_chunk, t_chunk=t_chunk,
    )
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    resident = lambda shape: pl.BlockSpec(
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    nbytes = jnp.dtype(dt).itemsize
    flops_step = 2 * B * (
        L * ((6 * D + 2 * F) * D + (T + M) * D + (T + M) * n_heads * D)
        + 2 * E * V + E * D + D * E
    )
    ids_tm = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # w_all (HBM, manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # mem_kv (HBM, manual DMA)
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
        out_specs=pl.BlockSpec((1, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((L, T, B, D), dt),  # kcache
            pltpu.VMEM((L, T, B, D), dt),  # vcache
            pltpu.VMEM((B, D), jnp.float32),  # x_s residual stream
            pltpu.VMEM((2, D, max(3 * D, F)), dt),  # wbuf (largest chunk)
            pltpu.VMEM((2, mem_chunk, B, D), dt),  # membuf
            pltpu.SemaphoreType.DMA((2,)),  # wsem
            pltpu.SemaphoreType.DMA((2,)),  # msem
        ],
        cost_estimate=pl.CostEstimate(
            flops=T * flops_step,
            bytes_accessed=T
            * ((6 * D + 2 * F) * L * D + 2 * L * M * B * D) * nbytes,
            transcendentals=T * B * (L * (T + M + 2 * F) + V),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=130 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        ftp.w_all, ftp.mem_kv, ftp.table, ftp.smalls, ftp.fc1_b, ftp.sel,
        ftp.in_proj_w, ftp.in_proj_b, ftp.pos, ftp.lnf, ftp.out_proj_w,
        ftp.out_proj_b, ftp.out_bias,
    )
    return jnp.transpose(ids_tm, (1, 0))


def fused_dims_ok(params: Params, dims, batch: int, max_length: int) -> bool:
    """Gate for the whole-decode kernel: production-ish dims whose tiles and
    VMEM plan the kernel is written for. Anything else falls back to the XLA
    KV-cached scan (identical ids, just unfused)."""
    D = dims.model_dim
    return (
        D % 128 == 0
        and dims.embedding_size % 128 == 0
        and D // dims.num_heads >= 8
        and dims.padded_vocab >= 2048
        and batch >= 8
        and batch % 8 == 0
        and max_length <= params["pos"].shape[0]
    )
