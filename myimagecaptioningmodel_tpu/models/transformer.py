"""Transformer captioning decoder — the rebuild's second decoder family.

The reference ships exactly one architecture (the adaptive-attention LSTM of
model_adaAttention_aic.py:40-135); this module adds a pre-LN transformer
decoder with cross-attention over the same MobileNetV2 feature map, selected
by ``model.decoder.arch = "transformer"``. It plugs into the SAME facade
surfaces (captioner.init / loss_fn / greedy_decode, inference.beam), the same
checkpoint/bundle formats, the same CLIs, and the same vocab-TP shardings
(the tied table keeps the ``embedding``/``out_bias`` key names that
parallel/mesh.param_shardings targets).

TPU-first design choices (vs a recurrent cell):

- **Training is one pass, no scan.** Teacher forcing computes all T steps'
  logits with batched causal self-attention — three large MXU matmuls per
  layer instead of 34 sequential cell iterations. At T=34 / 50 memory slots
  the attention tensors are tiny; no flash-attention tiling is needed, XLA's
  fusion handles it.
- **Decode carries a KV cache** ([B, T_max, heads, d_head] per layer,
  written with ``lax.dynamic_update_slice`` inside a ``lax.scan`` /
  ``lax.while_loop`` with static shapes). Cross-attention K/V over the 50
  image slots are step-invariant and precomputed once (the transformer
  analog of ``decoder.Precomputed``).
- **Same tied head as the LSTM family**: ``out_proj`` D->E, logits =
  proj @ tableᵀ + out_bias (padded-vocab rows carry -1e9 bias). Greedy
  decode reuses the fused Pallas vocab argmax kernel
  (ops/pallas/vocab_head.py) — it only contracts proj [B,E] with the table,
  so it is architecture-agnostic.
- Matmuls/softmax run in the configurable compute dtype with f32
  LayerNorm/softmax/logit math, matching ops/layers conventions.

Memory layout: the cross-attention memory is the 49 projected spatial
features plus the global feature as a 50th slot (both produced by
captioner.img2feature — reference model_adaAttention_aic.py:191-199).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from myimagecaptioningmodel_tpu.ops import layers as L

Params = Dict[str, Any]


class TransformerDims(NamedTuple):
    vocab_size: int = 12295
    embedding_size: int = 256  # tied-table width (same role as the LSTM's)
    model_dim: int = 1024  # == hidden_dim: the img2feature output width
    num_layers: int = 4
    num_heads: int = 8
    mlp_ratio: int = 4
    max_positions: int = 35  # >= max(sentence_length-1, infer_max_length)
    vocab_pad_multiple: int = 1

    @property
    def padded_vocab(self) -> int:
        m = self.vocab_pad_multiple
        return -(-self.vocab_size // m) * m

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.num_heads

    @classmethod
    def from_config(cls, md) -> "TransformerDims":
        d = md.decoder
        return cls(
            vocab_size=d.vocab_size,
            embedding_size=d.embedding_size,
            model_dim=d.hidden_dim,
            num_layers=d.num_layers,
            num_heads=d.num_heads,
            mlp_ratio=d.mlp_ratio,
            max_positions=max(d.sentence_length, d.infer_max_length),
            vocab_pad_multiple=getattr(d, "vocab_pad_multiple", 1),
        )


def _init_ln(dim: int) -> Params:
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def _layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """f32 LayerNorm regardless of the compute dtype (cheap, numerically
    load-bearing under bf16 residual streams)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"] + p["b"]


def _init_attn(ks, dim: int) -> Params:
    return {
        "wq": L.init_dense(next(ks), dim, dim),
        "wk": L.init_dense(next(ks), dim, dim, use_bias=False),
        "wv": L.init_dense(next(ks), dim, dim),
        "wo": L.init_dense(next(ks), dim, dim),
    }


def init(key, dims: TransformerDims) -> Params:
    """Decoder param pytree. Key names ``embedding``/``out_bias`` match the
    LSTM family's so vocab tensor parallelism and int8 export reuse the same
    tree paths (parallel/mesh.param_shardings:68-72)."""
    E, D, V = dims.embedding_size, dims.model_dim, dims.padded_vocab
    # exact key budget: embedding + in_proj + pos + out_proj, then per layer
    # attn(4) + xattn(4) + mlp(2)
    n_keys = 4 + dims.num_layers * 10
    ks = iter(jax.random.split(key, n_keys))
    out_bias = jnp.zeros((V,), jnp.float32)
    if V > dims.vocab_size:
        out_bias = out_bias.at[dims.vocab_size :].set(-1e9)
    layers = []
    for _ in range(dims.num_layers):
        layers.append(
            {
                "ln1": _init_ln(D),
                "attn": _init_attn(ks, D),
                "ln2": _init_ln(D),
                "xattn": _init_attn(ks, D),
                "ln3": _init_ln(D),
                "mlp": {
                    "fc1": L.init_dense(next(ks), D, D * dims.mlp_ratio),
                    "fc2": L.init_dense(next(ks), D * dims.mlp_ratio, D),
                },
            }
        )
    return {
        "embedding": L.init_embedding(
            next(ks), V, E, scale=1.0 / (E**0.5)
        ),
        "in_proj": L.init_dense(next(ks), E, D),
        # learned positions, N(0, 0.02) — the standard GPT-style init
        "pos": 0.02 * jax.random.normal(next(ks), (dims.max_positions, D)),
        "layers": tuple(layers),
        "ln_f": _init_ln(D),
        "out_proj": L.init_dense(next(ks), D, E),
        "out_bias": out_bias,
    }


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """[..., T, D] -> [..., T, heads, d_head]"""
    return x.reshape(*x.shape[:-1], n_heads, x.shape[-1] // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[..., T, heads, d_head] -> [..., T, D]"""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])


def _attend(q, k, v, mask=None):
    """Scaled dot-product attention; f32 softmax, bf16 contractions.

    q: [B, Tq, h, d]   k/v: [B, Tk, h, d]   mask: broadcastable [B?, Tq, Tk]
    """
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    scores = scores / (d**0.5)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, -1e9)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(q.dtype), v)
    return out


class TransformerPre(NamedTuple):
    """Step-invariant per-image tensors (the Precomputed analog): the
    cross-attention memory and its per-layer K/V projections."""

    mem_k: Tuple[jnp.ndarray, ...]  # per layer: [B, M, heads, d_head]
    mem_v: Tuple[jnp.ndarray, ...]  # per layer: [B, M, heads, d_head]

    @property
    def batch(self) -> int:
        return self.mem_k[0].shape[0]


def precompute(
    params: Params,
    img_embed: jnp.ndarray,  # [B, k, D] projected spatial features
    global_feat: jnp.ndarray,  # [B, D]
    n_heads: int,
    compute_dtype=jnp.bfloat16,
) -> TransformerPre:
    dt = compute_dtype
    mem = jnp.concatenate(
        [img_embed.astype(dt), global_feat.astype(dt)[:, None, :]], axis=1
    )  # [B, M=k+1, D]
    ks, vs = [], []
    for layer in params["layers"]:
        xa = layer["xattn"]
        ks.append(_split_heads(L.dense(xa["wk"], mem, dt), n_heads))
        vs.append(_split_heads(L.dense(xa["wv"], mem, dt), n_heads))
    return TransformerPre(tuple(ks), tuple(vs))


class TransformerPreMBD(NamedTuple):
    """Fused-decode layout of the step-invariant cross-attention memory:
    K/V already in the whole-decode kernel's [M, B, D] DMA layout. Built by
    ``precompute_mbd``: transposing the 13 MB feature memory ONCE before
    the per-layer projections puts every K/V in kernel layout for free —
    packing a [B, M, heads, dh] TransformerPre instead would shuffle
    2*L*M*B*D bytes (105 MB at production dims) per decode call."""

    mem_kv: jnp.ndarray  # [L, 2, M, B, D] compute-dtype

    @property
    def batch(self) -> int:
        return self.mem_kv.shape[3]


def precompute_mbd(
    params: Params,
    img_embed: jnp.ndarray,  # [B, k, D] projected spatial features
    global_feat: jnp.ndarray,  # [B, D]
    compute_dtype=jnp.bfloat16,
) -> TransformerPreMBD:
    """Same projections as ``precompute`` (bitwise: each output row is the
    same row-by-column contraction, row order is irrelevant to the MXU),
    emitted directly in the fused kernel's [M, B, D] layout."""
    dt = compute_dtype
    mem = jnp.concatenate(
        [img_embed.astype(dt), global_feat.astype(dt)[:, None, :]], axis=1
    )  # [B, M, D]
    mem_t = jnp.transpose(mem, (1, 0, 2))  # [M, B, D] — one small transpose
    rows = []
    for layer in params["layers"]:
        xa = layer["xattn"]
        rows.append(
            jnp.stack([L.dense(xa["wk"], mem_t, dt), L.dense(xa["wv"], mem_t, dt)])
        )
    return TransformerPreMBD(jnp.stack(rows))


def quantize_kv_pre(pre: TransformerPre) -> TransformerPre:
    """Per-feature-channel int8 quantize->dequantize of the cross-attention
    memory — the XLA-path emulation of the fused kernel's ``quantize_kv``
    streaming mode (ops/pallas/fused_transformer.prepare): the SAME
    symmetric absmax/127 grid per (layer, K|V, feature channel) over all
    (M, B) positions, so the XLA fallback sees the same quantization error
    the kernel's int8 memory stream introduces (the kernel additionally
    folds the scales into per-step multiplies; both compute
    q·(K_q·s) up to bf16 rounding order). Keeps ``quantize_kv`` honored on
    every backend instead of silently ignored off-TPU."""

    def qdq(x):  # [B, M, heads, dh] — channels are the trailing heads*dh
        B, M, h, dh = x.shape
        flat = x.reshape(B, M, h * dh).astype(jnp.float32)
        absmax = jnp.max(jnp.abs(flat), axis=(0, 1), keepdims=True)
        s = jnp.maximum(absmax / 127.0, 1e-12)
        q = jnp.clip(jnp.round(flat / s), -127, 127)
        return (q * s).astype(x.dtype).reshape(B, M, h, dh)

    return TransformerPre(
        tuple(qdq(k) for k in pre.mem_k), tuple(qdq(v) for v in pre.mem_v)
    )


def _mbd_to_pre(pre: TransformerPreMBD, n_heads: int) -> TransformerPre:
    """[L, 2, M, B, D] -> per-layer [B, M, heads, dh] views (the XLA decode
    fallback's layout) — only taken when the fused gate rejects a shape the
    caller optimistically packed for the kernel."""
    Lh, _, M, B, D = pre.mem_kv.shape
    def heads_view(x):  # [M, B, D] -> [B, M, heads, dh]
        return _split_heads(jnp.transpose(x, (1, 0, 2)), n_heads)
    return TransformerPre(
        tuple(heads_view(pre.mem_kv[l, 0]) for l in range(Lh)),
        tuple(heads_view(pre.mem_kv[l, 1]) for l in range(Lh)),
    )


def prepare_decode_layers(params: Params) -> Tuple[Params, ...]:
    """Decode-time layer views with the self-attention q/k/v projections
    fused into ONE [D, 3D] matmul ("wqkv"). The KV-cached step is launch-
    bound (many small ops per layer), so collapsing three [B,1,D]x[D,D]
    matmuls into one removes two fusion boundaries per layer per step.
    Exact: concatenating the weights along the output axis (and the biases,
    with zeros for the bias-free wk) computes the identical three products.
    Handles int8 weights (per-output-channel scales concatenate likewise).
    The concat happens once per decode call, outside the step scan; training
    keeps the separate leaves (their gradients are the checkpoint format).
    """
    out = []
    for layer in params["layers"]:
        a = layer["attn"]
        la = dict(layer)
        if "w_q" in a["wq"]:
            wqkv = {
                "w_q": jnp.concatenate(
                    [a["wq"]["w_q"], a["wk"]["w_q"], a["wv"]["w_q"]], axis=1
                ),
                "scale": jnp.concatenate(
                    [a["wq"]["scale"], a["wk"]["scale"], a["wv"]["scale"]]
                ),
            }
        else:
            wqkv = {
                "w": jnp.concatenate(
                    [a["wq"]["w"], a["wk"]["w"], a["wv"]["w"]], axis=1
                )
            }
        D = (a["wq"]["w_q"] if "w_q" in a["wq"] else a["wq"]["w"]).shape[0]
        wqkv["b"] = jnp.concatenate(
            [a["wq"].get("b", jnp.zeros((D,))), jnp.zeros((D,)),
             a["wv"].get("b", jnp.zeros((D,)))]
        )
        la["attn"] = dict(a, wqkv=wqkv)
        out.append(la)
    return tuple(out)


def _block(
    layer: Params,
    x: jnp.ndarray,  # [B, T, D] residual stream (f32)
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    n_heads: int,
    dt,
    self_mask,  # [B?, T, T] or None
    cache: Tuple[jnp.ndarray, jnp.ndarray] = None,
    cache_index=None,
):
    """One pre-LN block. With ``cache`` (decode): x is [B, 1, D], the new
    self-attention K/V are written at ``cache_index`` and attention runs over
    the cache prefix. Returns (x, new_cache)."""
    a = layer["attn"]
    h = _layer_norm(layer["ln1"], x)
    if "wqkv" in a:  # decode-prepared fused projection (prepare_decode_layers)
        qkv = L.dense(a["wqkv"], h, dt)
        D = qkv.shape[-1] // 3
        q = _split_heads(qkv[..., :D], n_heads)
        k_new = _split_heads(qkv[..., D : 2 * D], n_heads)
        v_new = _split_heads(qkv[..., 2 * D :], n_heads)
    else:
        q = _split_heads(L.dense(a["wq"], h, dt), n_heads)
        k_new = _split_heads(L.dense(a["wk"], h, dt), n_heads)
        v_new = _split_heads(L.dense(a["wv"], h, dt), n_heads)
    if cache is None:
        sa = _attend(q, k_new, v_new, self_mask)
        new_cache = None
    else:
        ck, cv = cache  # [B, T_max, heads, d]
        ck = jax.lax.dynamic_update_slice(ck, k_new.astype(ck.dtype), (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_new.astype(cv.dtype), (0, cache_index, 0, 0))
        T_max = ck.shape[1]
        valid = (jnp.arange(T_max) <= cache_index)[None, None, :]  # [1,1,T_max]
        sa = _attend(q, ck, cv, valid)
        new_cache = (ck, cv)
    x = x + L.dense(a["wo"], _merge_heads(sa), dt).astype(jnp.float32)

    xa = layer["xattn"]
    h = _layer_norm(layer["ln2"], x)
    qx = _split_heads(L.dense(xa["wq"], h, dt), n_heads)
    ca = _attend(qx, mem_k, mem_v)
    x = x + L.dense(xa["wo"], _merge_heads(ca), dt).astype(jnp.float32)

    h = _layer_norm(layer["ln3"], x)
    h = jax.nn.gelu(L.dense(layer["mlp"]["fc1"], h, dt), approximate=True)
    x = x + L.dense(layer["mlp"]["fc2"], h, dt).astype(jnp.float32)
    return x, new_cache


def _embed_in(params: Params, ids: jnp.ndarray, positions, padding_idx: int, dt):
    """ids [..., T] -> residual stream [..., T, D] (f32)."""
    emb = L.embed(params["embedding"], ids, padding_idx)  # [..., T, E]
    x = L.dense(params["in_proj"], emb, dt).astype(jnp.float32)
    return x + params["pos"][positions]


def head_logits(params: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Final LN -> out_proj D->E -> tied table head -> [..., V] f32."""
    dt = compute_dtype
    h = _layer_norm(params["ln_f"], x)
    proj = L.dense(params["out_proj"], h, dt)
    emb = params["embedding"]
    if "table_q" in emb:
        logits = (
            jnp.matmul(proj.astype(dt), emb["table_q"].T.astype(dt)).astype(
                jnp.float32
            )
            * emb["scale"]
        )
    else:
        logits = jnp.matmul(proj.astype(dt), emb["table"].T.astype(dt)).astype(
            jnp.float32
        )
    return logits + params["out_bias"]


def head_proj(params: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Final LN -> out_proj only (the [B,E] input of the fused Pallas vocab
    head kernels)."""
    return L.dense(params["out_proj"], _layer_norm(params["ln_f"], x), compute_dtype)


def teacher_forcing_logits(
    params: Params,
    pre: TransformerPre,
    source: jnp.ndarray,  # [B, T] input words (caption[:, :-1])
    dims: TransformerDims,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Training forward -> logits [B, T, V]. All T steps at once: causal
    self-attention replaces the LSTM family's lax.scan (models/decoder.py:299)
    — sequential depth num_layers instead of T."""
    B, T = source.shape
    dt = compute_dtype
    x = _embed_in(params, source, jnp.arange(T), padding_idx, dt)
    causal = jnp.tril(jnp.ones((T, T), bool))[None]  # [1, T, T]
    for layer, mk, mv in zip(params["layers"], pre.mem_k, pre.mem_v):
        x, _ = _block(layer, x, mk, mv, dims.num_heads, dt, causal)
    return head_logits(params, x, dt)


def _init_cache(dims: TransformerDims, batch: int, max_length: int, dt):
    shape = (batch, max_length, dims.num_heads, dims.head_dim)
    return tuple(
        (jnp.zeros(shape, dt), jnp.zeros(shape, dt))
        for _ in range(dims.num_layers)
    )


def _decode_step(
    params: Params,
    pre: TransformerPre,
    dims: TransformerDims,
    word: jnp.ndarray,  # [B]
    caches,
    t,  # scalar step index
    padding_idx: int,
    dt,
    layers=None,  # prepared decode layers (prepare_decode_layers) or None
):
    """One KV-cached decode step -> (x_last [B, D] f32, new caches)."""
    x = _embed_in(params, word[:, None], t[None], padding_idx, dt)  # [B,1,D]
    new_caches = []
    for layer, mk, mv, cache in zip(
        params["layers"] if layers is None else layers,
        pre.mem_k, pre.mem_v, caches,
    ):
        x, cache = _block(
            layer, x, mk, mv, dims.num_heads, dt, None, cache=cache, cache_index=t
        )
        new_caches.append(cache)
    return x[:, 0, :], tuple(new_caches)


def _pallas_head_ok(params: Params) -> bool:
    """Same production-dims gate as decoder.pallas_dims_ok, for the shared
    fused vocab-argmax kernel (it contracts proj [B,E] with the table — the
    kernel is decoder-architecture agnostic)."""
    emb = params["embedding"]
    table = emb["table_q"] if "table_q" in emb else emb["table"]
    V, E = table.shape
    return V >= 2048 and E % 128 == 0


def greedy_decode_ids(
    params: Params,
    pre: TransformerPre,
    dims: TransformerDims,
    max_length: int,
    start_idx: int = 2,
    padding_idx: int = 0,
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = False,
    early_stop: bool = False,
    stop_idx: int = 3,
    quantize_kv: bool = False,
) -> jnp.ndarray:
    """Greedy decode -> ids [B, max_length]; mirrors the LSTM family's
    contract (fixed-length scan by default; ``early_stop`` switches to a
    while_loop that exits at all-<stop>, post-stop positions = <pad>).

    ``quantize_kv``: stream the cross-attention K/V as per-channel int8 —
    an opt-in approximate serving mode. The fused kernel streams the int8
    tensor and folds the scales into per-step multiplies; the XLA fallback
    applies the same quantization grid via quantize_kv_pre, so the mode is
    honored (with the same error model) on every backend.

    On TPU at production dims the decode dispatches the whole-decode fused
    Pallas kernel (ops/pallas/fused_transformer.py): all steps, layers, the
    tied-vocab argmax and the next-word embedding run as ONE Pallas program
    — KV caches and the cross-attention memory live in VMEM scratch, layer
    weights double-buffer from HBM. ``early_stop`` stays fused: the kernel
    tracks per-row done state and skips every remaining grid step's DMA and
    compute once all rows have emitted <stop>. Small/ragged batches are
    padded to the 8-row gate (single-image CLI) and sliced back (pad rows
    start done under early_stop); identical ids to the XLA path
    (tests/test_fused_transformer.py)."""
    B = pre.batch
    dt = jnp.dtype(compute_dtype)

    if use_pallas:
        from myimagecaptioningmodel_tpu.ops.pallas import (
            fused_transformer as FT,
        )

        orig_B = B
        pad_rows = (-B) % 8
        is_mbd = isinstance(pre, TransformerPreMBD)
        mem_len = (
            pre.mem_kv.shape[2] if is_mbd else pre.mem_k[0].shape[1]
        )
        if FT.fused_dims_ok(
            params, dims, B + pad_rows, max_length, mem_len=mem_len
        ):
            pre_p = pre
            if pad_rows and is_mbd:
                pre_p = TransformerPreMBD(
                    jnp.pad(
                        pre.mem_kv,
                        ((0, 0), (0, 0), (0, 0), (0, pad_rows), (0, 0)),
                    )
                )
            elif pad_rows:
                pre_p = TransformerPre(
                    tuple(
                        jnp.concatenate(
                            [k, jnp.zeros((pad_rows,) + k.shape[1:], k.dtype)]
                        )
                        for k in pre.mem_k
                    ),
                    tuple(
                        jnp.concatenate(
                            [v, jnp.zeros((pad_rows,) + v.shape[1:], v.dtype)]
                        )
                        for v in pre.mem_v
                    ),
                )
            ftp = FT.prepare(
                params, pre_p, dims.num_heads, dt, quantize_kv=quantize_kv
            )
            ids = FT.fused_greedy_decode(
                ftp, max_length, dims.num_heads, start_idx, padding_idx, dt,
                early_stop=early_stop, stop_idx=stop_idx,
                valid_rows=orig_B if (early_stop and pad_rows) else None,
            )
            return ids[:orig_B]

    if isinstance(pre, TransformerPreMBD):
        # caller packed for the kernel but the gate rejected the shape —
        # recover the XLA fallback's per-head layout
        pre = _mbd_to_pre(pre, dims.num_heads)
    if quantize_kv:
        # XLA fallback: emulate the kernel's int8 memory stream with an
        # explicit quantize->dequantize on the same grid (quantize_kv_pre)
        pre = quantize_kv_pre(pre)
    word0 = jnp.full((B,), start_idx, jnp.int32)
    caches0 = _init_cache(dims, B, max_length, dt)
    layers_p = prepare_decode_layers(params)  # fused qkv, hoisted off the scan

    if use_pallas and _pallas_head_ok(params) and B >= 8 and B % 8 == 0:
        from myimagecaptioningmodel_tpu.ops.pallas.vocab_head import (
            greedy_vocab_argmax,
        )

        emb = params["embedding"]
        if "table_q" in emb:

            def argmax_head(x_last):
                return greedy_vocab_argmax(
                    head_proj(params, x_last, dt),
                    emb["table_q"], params["out_bias"], scale=emb["scale"],
                )

        else:

            def argmax_head(x_last):
                return greedy_vocab_argmax(
                    head_proj(params, x_last, dt), emb["table"], params["out_bias"]
                )

    else:

        def argmax_head(x_last):
            logits = head_logits(params, x_last, dt)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if early_stop:
        ids0 = jnp.full((B, max_length), padding_idx, jnp.int32)
        done0 = jnp.zeros((B,), bool)

        def w_cond(state):
            t, _w, _c, _ids, done = state
            return (t < max_length) & ~jnp.all(done)

        def w_body(state):
            t, word, caches, ids, done = state
            x_last, caches = _decode_step(
                params, pre, dims, word, caches, t, padding_idx, dt,
                layers=layers_p,
            )
            next_word = jnp.where(done, padding_idx, argmax_head(x_last))
            ids = jax.lax.dynamic_update_slice(ids, next_word[:, None], (0, t))
            done = done | (next_word == stop_idx)
            return t + 1, next_word, caches, ids, done

        _, _, _, ids, _ = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), word0, caches0, ids0, done0)
        )
        return ids

    def body(carry, t):
        word, caches = carry
        x_last, caches = _decode_step(
            params, pre, dims, word, caches, t, padding_idx, dt,
            layers=layers_p,
        )
        next_word = argmax_head(x_last)
        return (next_word, caches), next_word

    _, ids_tm = jax.lax.scan(
        body, (word0, caches0), jnp.arange(max_length)
    )
    return jnp.transpose(ids_tm, (1, 0))


# ---- beam search ---------------------------------------------------------------

NEG_INF = -1e9


def beam_search_ids(
    params: Params,
    pre: TransformerPre,
    dims: TransformerDims,
    max_length: int,
    beam_size: int = 4,
    start_idx: int = 2,
    stop_idx: int = 3,
    padding_idx: int = 0,
    length_norm: float = 0.0,
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = False,
    interpret: bool = False,
    early_stop: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search with the beams folded into the batch axis — the
    same semantics/backtracking as inference/beam.beam_search_ids (finished
    beams extend only with <pad> at zero cost; GNMT length_norm; beam_size=1
    == greedy). The KV caches are gathered alongside the beams on reorder.

    ``use_pallas``: the fused top-k vocab head (ops/pallas/vocab_head.py)
    replaces the [B*W, V] logits + full log_softmax + top_k tail — the
    kernel contracts proj [B*W, E] with the tied table, so it is decoder-
    architecture agnostic (exact: for a fixed beam only its best W words can
    win a next-beam slot). ``early_stop``: while_loop exit once every beam
    of every row is finished (identical sequences; see the prefill note in
    inference/beam.py)."""
    B = pre.batch
    W = beam_size
    dt = jnp.dtype(compute_dtype)
    emb = params["embedding"]
    V = (emb["table_q"] if "table_q" in emb else emb["table"]).shape[0]

    if use_pallas:
        # whole-decode fused beam kernel (VERDICT r4 #4): all steps, layers,
        # the per-beam top-W head, the beam reorder and the embedding
        # feedback as ONE Pallas program; the cross-attention memory streams
        # UNREPEATED (1/W of this XLA path's bytes). Returns the same
        # (words, srcs, scores, lengths) quadruple the scan below carries,
        # then falls through to the shared backtrack.
        from myimagecaptioningmodel_tpu.ops.pallas import (
            fused_transformer as FT,
        )

        is_mbd = isinstance(pre, TransformerPreMBD)
        mem_len = pre.mem_kv.shape[2] if is_mbd else pre.mem_k[0].shape[1]
        if FT.fused_beam_dims_ok(params, dims, B, W, max_length, mem_len):
            ftp = FT.prepare(params, pre, dims.num_heads, dt)
            words_tm, srcs_tm, scores, lengths = FT.fused_beam_decode(
                ftp, max_length, dims.num_heads, W, start_idx, padding_idx,
                stop_idx, dt, early_stop=early_stop, interpret=interpret,
            )
            return _beam_backtrack(
                words_tm, srcs_tm, scores, lengths, B, W, length_norm
            )

    use_fused_head = (
        use_pallas and W > 1 and (B * W) % 8 == 0 and _pallas_head_ok(params)
    )
    if use_fused_head:
        from myimagecaptioningmodel_tpu.ops.pallas.vocab_head import (
            topk_vocab_head,
        )

        if "table_q" in emb:
            head_table, head_scale = emb["table_q"], emb["scale"]
        else:
            head_table, head_scale = emb["table"].astype(dt), None

    pre_t = TransformerPre(
        tuple(jnp.repeat(k, W, axis=0) for k in pre.mem_k),
        tuple(jnp.repeat(v, W, axis=0) for v in pre.mem_v),
    )
    word0 = jnp.full((B * W,), start_idx, jnp.int32)
    caches0 = _init_cache(dims, B * W, max_length, dt)
    layers_p = prepare_decode_layers(params)  # fused qkv, hoisted off the scan
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((W - 1,), NEG_INF)])[None, :],
        (B, 1),
    ).astype(jnp.float32)
    finished0 = jnp.zeros((B, W), bool)
    lengths0 = jnp.zeros((B, W), jnp.int32)
    batch_offsets = (jnp.arange(B) * W)[:, None]

    def body(carry, t):
        word, caches, scores, finished, lengths = carry
        x_last, caches = _decode_step(
            params, pre_t, dims, word, caches, t, padding_idx, dt,
            layers=layers_p,
        )
        if use_fused_head:
            proj = head_proj(params, x_last, dt)
            vals, cand_ids, lse = topk_vocab_head(
                proj, head_table, params["out_bias"], k=W,
                scale=head_scale, interpret=interpret,
            )  # [B*W, W] x2, [B*W]
            logp = (vals - lse[:, None]).reshape(B, W, W)
            cand_ids = cand_ids.reshape(B, W, W)
            pad_row = jnp.full((W,), NEG_INF).at[0].set(0.0)
            logp = jnp.where(finished[..., None], pad_row[None, None, :], logp)
            cand_ids = jnp.where(finished[..., None], padding_idx, cand_ids)
            cand = scores[..., None] + logp  # [B, W, W]
            top_scores, top_flat = jax.lax.top_k(cand.reshape(B, W * W), W)
            src_beam = top_flat // W
            new_word = jnp.take_along_axis(
                cand_ids.reshape(B, W * W), top_flat, axis=1
            ).astype(jnp.int32)
        else:
            logits = head_logits(params, x_last, dt)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = logp.reshape(B, W, V)

            pad_only = jnp.full((V,), NEG_INF).at[padding_idx].set(0.0)
            logp = jnp.where(finished[..., None], pad_only[None, None, :], logp)

            cand = scores[..., None] + logp  # [B, W, V]
            top_scores, top_flat = jax.lax.top_k(cand.reshape(B, W * V), W)
            src_beam = top_flat // V
            new_word = (top_flat % V).astype(jnp.int32)

        gather = (batch_offsets + src_beam).reshape(-1)  # [B*W]
        caches = tuple((ck[gather], cv[gather]) for ck, cv in caches)
        prev_finished = jnp.take_along_axis(finished, src_beam, axis=1)
        new_finished = prev_finished | (new_word == stop_idx)
        new_lengths = jnp.take_along_axis(lengths, src_beam, axis=1) + (
            ~prev_finished
        ).astype(jnp.int32)

        carry = (
            new_word.reshape(-1), caches, top_scores, new_finished, new_lengths,
        )
        return carry, (new_word, src_beam)

    carry0 = (word0, caches0, scores0, finished0, lengths0)
    if early_stop:
        # prefill = the post-all-finished steady state (pad words, identity
        # back-pointers), so the truncated run backtracks identically —
        # same argument as inference/beam.py's early_stop
        words_buf0 = jnp.full((max_length, B, W), padding_idx, jnp.int32)
        srcs_buf0 = jnp.tile(jnp.arange(W)[None, None, :], (max_length, B, 1))

        def w_cond(state):
            t, carry, _wb, _sb = state
            return (t < max_length) & ~jnp.all(carry[3])

        def w_body(state):
            t, carry, wb, sb = state
            carry, (new_word, src_beam) = body(carry, t)
            wb = jax.lax.dynamic_update_slice(wb, new_word[None], (t, 0, 0))
            sb = jax.lax.dynamic_update_slice(
                sb, src_beam.astype(sb.dtype)[None], (t, 0, 0)
            )
            return t + 1, carry, wb, sb

        _t, (word, caches, scores, finished, lengths), words_tm, srcs_tm = (
            jax.lax.while_loop(
                w_cond, w_body, (jnp.int32(0), carry0, words_buf0, srcs_buf0)
            )
        )
    else:
        (word, caches, scores, finished, lengths), (words_tm, srcs_tm) = (
            jax.lax.scan(body, carry0, jnp.arange(max_length))
        )

    return _beam_backtrack(words_tm, srcs_tm, scores, lengths, B, W, length_norm)


def _beam_backtrack(words_tm, srcs_tm, scores, lengths, B, W, length_norm):
    """Shared beam epilogue: follow the source-beam back-pointers from the
    last step to reconstruct each beam's sequence, GNMT-length-normalize,
    and return the best caption per image. Identical for the XLA scan and
    the fused whole-decode kernel (both produce [T, B, W] words/srcs)."""
    def back(beam_ptr, step):
        words_t, srcs_t = step
        w = jnp.take_along_axis(words_t, beam_ptr, axis=1)
        beam_ptr = jnp.take_along_axis(srcs_t, beam_ptr, axis=1)
        return beam_ptr, w

    init_ptr = jnp.tile(jnp.arange(W)[None, :], (B, 1))
    _, seq_rev = jax.lax.scan(back, init_ptr, (words_tm[::-1], srcs_tm[::-1]))
    sequences = jnp.transpose(seq_rev[::-1], (1, 2, 0))  # [B, W, T]

    final_scores = scores
    if length_norm > 0:
        final_scores = scores / jnp.maximum(lengths, 1).astype(
            jnp.float32
        ) ** length_norm
    best = jnp.argmax(final_scores, axis=1)
    ids = jnp.take_along_axis(sequences, best[:, None, None], axis=1)[:, 0, :]
    best_scores = jnp.take_along_axis(final_scores, best[:, None], axis=1)[:, 0]
    return ids.astype(jnp.int32), best_scores


# ---- int8 serving quantization ----------------------------------------------


def quantize_transformer_decoder(decoder_params: Params) -> Params:
    """int8 weight storage for serving (ops/quantization.py scheme): every
    dense-like [I, O] weight gets a per-output-channel scale, the tied table
    a per-row scale. L.dense/L.embed detect the quantized leaves, so the
    decode functions above consume the result unchanged."""
    from myimagecaptioningmodel_tpu.ops.quantization import quantize_weight

    def q_dense(p):
        p = dict(p)
        w_q, scale = quantize_weight(p.pop("w"), axis=0)
        p["w_q"], p["scale"] = w_q, scale
        return p

    q = dict(decoder_params)
    q["in_proj"] = q_dense(q["in_proj"])
    q["out_proj"] = q_dense(q["out_proj"])
    layers = []
    for layer in q["layers"]:
        nl = {}
        for name, sub in layer.items():
            if name.startswith("ln"):
                nl[name] = sub
            else:
                nl[name] = {k: (q_dense(v) if "w" in v else v) for k, v in sub.items()}
        layers.append(nl)
    q["layers"] = tuple(layers)
    emb = dict(q["embedding"])
    table = emb.pop("table")
    t_q, t_scale = quantize_weight(table, axis=1)
    emb["table_q"], emb["scale"] = t_q, t_scale
    q["embedding"] = emb
    return q
