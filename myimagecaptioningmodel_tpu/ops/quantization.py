"""Post-training int8 weight quantization for the decode path (serving).

Greedy decode is weight-streaming bound: every one of the 35 steps re-reads
the LSTM/gate/projection weights and the tied embedding from HBM. Symmetric
per-channel int8 storage halves that traffic; XLA fuses the dequantize
(int8 -> bf16 cast * scale) into the matmul operand load (measured ~25%
faster per in-scan matmul on v5e).

Scheme:
- dense-like weights [I, O]: per-OUTPUT-channel scale [O] — scales commute
  with row slicing, so the decoder's split LSTM matmuls stay valid;
- the tied embedding [V, E]: per-ROW scale [V] — works for both the lookup
  (rows scaled independently) and the tied head (proj @ E^T picks up the
  scale per logit column);
- quantized leaves are dicts {"w_q": int8, "scale": f32} (embedding:
  {"table_q", "scale"}); apply-sites detect them, so one transform
  (``quantize_decoder``) produces drop-in params for the existing decode
  functions. Training always uses the full-precision originals.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization; scale per channel of the kept axis.

    ``axis`` is the axis REDUCED over when computing the scale (for [I,O]
    dense weights, axis=0 gives a per-output-channel scale [O]).
    """
    absmax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, jnp.squeeze(scale, axis=axis).astype(jnp.float32)


def dequantize(w_q: jnp.ndarray, scale: jnp.ndarray, axis: int, dtype) -> jnp.ndarray:
    shape = [1] * w_q.ndim
    shape[1 - axis if w_q.ndim == 2 else -1] = scale.shape[0]
    return w_q.astype(dtype) * scale.reshape(shape).astype(dtype)


_DENSE_KEYS = (
    "img_v", "img_k", "gate_h", "p_hid", "hid_emb", "sent_emb", "out", "out_proj",
)


def quantize_decoder(decoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Return decoder params with the decode-hot weights stored as int8."""
    q = dict(decoder_params)

    for key in _DENSE_KEYS:
        p = dict(q[key])
        w_q, scale = quantize_weight(p.pop("w"), axis=0)
        p["w_q"], p["scale"] = w_q, scale
        q[key] = p

    for key in ("lstm", "gate_x"):
        p = dict(q[key])
        w_q, scale = quantize_weight(p.pop("w"), axis=0)
        p["w_q"], p["scale"] = w_q, scale
        q[key] = p

    emb = dict(q["embedding"])
    table = emb.pop("table")
    t_q, t_scale = quantize_weight(table, axis=1)  # per-row [V]
    emb["table_q"], emb["scale"] = t_q, t_scale
    q["embedding"] = emb

    # attention score weight is [H,1] — negligible, keep full precision
    return q


def is_quantized(p: Dict[str, Any]) -> bool:
    return "w_q" in p or "table_q" in p


def dense_weight(p: Dict[str, Any]) -> jnp.ndarray:
    """Full-precision [I, O] view of a dense weight (dequantized if int8).

    Used by the fused decode-step kernel's ``prepare``: the kernel keeps all
    weights VMEM-resident across the 35-step scan, so an int8 artifact costs
    one dequant at prep time and then decodes at full fused speed."""
    if "w_q" in p:
        return p["w_q"].astype(jnp.float32) * p["scale"][None, :]
    return p["w"]


def embedding_table(p: Dict[str, Any]) -> jnp.ndarray:
    """Full-precision [V, E] view of the tied embedding (dequantized)."""
    if "table_q" in p:
        return p["table_q"].astype(jnp.float32) * p["scale"][:, None]
    return p["table"]
