#!/usr/bin/env python
"""Decoder teacher-forcing fwd+bwd isolation: where do the 3.7 ms of
"batched post-recurrence math" (train_roofline.md) actually go?

Hypothesis under test: the backward of the checkpointed additive-attention
scores materializes dz = de*w*(1-z^2) over [T,B,k,H] (~437 MB bf16 at batch
128) because two different reductions (over k -> dh_emb, over T -> dimg_k)
consume it. If true, a one-pass fused backward (recompute z blockwise,
accumulate all three gradients) removes ~1.3 GB of HBM traffic per step.

Variants:
  A. current        — jax.checkpoint(_attn_scores) (production path)
  B. parity         — no attention at all (lower bound for the segment)
  C. fused-bwd      — custom-VJP attention scores with a hand-written
                      backward (ops/attention.py attn_scores_fused)

Run on the TPU chip:  python benchmarks/proto_attn_bwd.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, K, H, E, V = 128, 34, 49, 1024, 256, 12416


def timeit(fn, *args, iters=10, warmup=3):
    import jax

    out = jax.block_until_ready(fn(*args))
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from myimagecaptioningmodel_tpu.models import decoder as dec
    from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    dims = DecoderDims(
        vocab_size=12295, embedding_size=E, hidden_dim=H, feat_channels=1280
    )
    params = dec.init(jax.random.PRNGKey(0), dims)

    rng = np.random.RandomState(0)
    p_img_feat = jnp.asarray(rng.randn(B, K, H) * 0.1, jnp.float32)
    global_feat = jnp.asarray(rng.randn(B, H) * 0.1, jnp.float32)
    source = jnp.asarray(rng.randint(1, 12295, (B, T)), jnp.int32)

    def make_loss(parity, fused_bwd):
        def loss(params):
            pre = dec.precompute(params, p_img_feat, global_feat)
            logits = dec.teacher_forcing_logits(
                params, pre, source, parity_mode=parity,
                fused_attn_bwd=fused_bwd,
            )
            return jnp.mean(logits.astype(jnp.float32) ** 2) * 1e-3

        return jax.jit(jax.grad(loss))

    rows = []
    for name, parity, fused in (
        ("A current (checkpointed attn)", False, False),
        ("B parity_mode (no attention)", True, False),
        ("C fused-bwd attention", False, True),
    ):
        try:
            ms = timeit(make_loss(parity, fused), params)
            rows.append((name, ms))
            print(f"{name}: {ms:.2f} ms", file=sys.stderr)
        except TypeError as e:  # fused_attn_bwd not implemented yet
            print(f"{name}: skipped ({e})", file=sys.stderr)

    print("| variant | decoder fwd+bwd ms |")
    print("|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.2f} |")


if __name__ == "__main__":
    main()
