#!/usr/bin/env python
"""Transformer-family train-step decomposition on one TPU chip (VERDICT r4
#5). Times the full batch-128 arch="transformer" train step and its separable
segments (encoder fwd+bwd, decoder fwd+bwd from features, head/CE), captures
an xplane trace of 3 consecutive steps for the per-category table, and prints
hand-computed MXU/HBM floors next to the measurements. Companion doc:
benchmarks/transformer_train_roofline.md.

Usage: python benchmarks/profile_train_transformer.py [--trace-dir DIR]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128


def timeit(fn, *args, iters=8, warmup=2):
    import jax

    out = jax.block_until_ready(fn(*args))
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000  # ms


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner, mobilenet_v2
    from myimagecaptioningmodel_tpu.models import transformer as TF
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
    from myimagecaptioningmodel_tpu.parallel.train_step import build_steps
    from myimagecaptioningmodel_tpu.training import lr_schedules

    trace_dir = None
    if "--trace-dir" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace-dir") + 1]

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = config_mod.replace_nested(
        config_mod.Config(), "model.decoder.arch", "transformer"
    )
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)
    caps = jnp.asarray(
        rng.randint(1, opts.dims.vocab_size, (BATCH, opts.sentence_length)),
        jnp.int32,
    )

    rows = []

    # 1. full train step (fwd+bwd+adam)
    schedule = lr_schedules.constant(5e-5)
    optimizer = optax.adam(schedule)
    steps = build_steps(opts, optimizer, schedule, mesh=None, donate=False)
    opt_state = optimizer.init(params)
    step0 = jnp.zeros((), jnp.int32)

    def full(params, opt_state, state, images, caps):
        return steps.train_step(params, opt_state, state, step0, images, caps)

    ms_full = timeit(full, params, opt_state, state, images, caps)
    rows.append(("full train step (fwd+bwd+adam)", ms_full))

    # 2. encoder-only fwd+bwd (the shared MobileNetV2 wall — train_roofline.md)
    enc_p, enc_s = params["encoder"], state["encoder"]

    @jax.jit
    def enc_fb(p, s, x):
        def lf(p):
            feats, ns = mobilenet_v2.apply(
                p, s, x, train=True, compute_dtype=jnp.bfloat16
            )
            return jnp.mean(feats.astype(jnp.float32)), ns

        (l, ns), g = jax.value_and_grad(lf, has_aux=True)(p)
        return l, g

    rows.append(("encoder fwd+bwd", timeit(enc_fb, enc_p, enc_s, images)))

    # 3. transformer decoder fwd+bwd from random features (no encoder)
    feats = jnp.asarray(rng.rand(BATCH, 49, 1280), jnp.float32)
    tdims = opts.tdims

    @jax.jit
    def dec_fb(p, feats, caps):
        source, target = caps[:, :-1], caps[:, 1:]
        mask = (target != opts.padding_idx).astype(jnp.float32)

        def lf(p):
            import jax.nn as jnn

            from myimagecaptioningmodel_tpu.ops import layers as L

            dt = opts.dtype
            img_embed = jnn.relu(L.dense(p["img_embed"], feats, dt))
            global_feat = jnn.relu(
                L.dense(p["img_global"], jnp.mean(feats, axis=1), dt)
            )
            pre = TF.precompute(
                p["decoder"], img_embed, global_feat, tdims.num_heads, dt
            )
            logits = TF.teacher_forcing_logits(
                p["decoder"], pre, source, tdims, opts.padding_idx, dt
            )
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, target[..., None], axis=-1)[..., 0]
            return jnp.sum((logz - gold) * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        return jax.value_and_grad(lf)(p)

    rows.append(("decoder fwd+bwd (from features)", timeit(dec_fb, params, feats, caps)))

    # 4. full fwd only
    @jax.jit
    def loss_f(p, s, x, c):
        l, _ = captioner.loss_fn(p, s, x, c, opts, True)
        return l

    rows.append(("full fwd only", timeit(loss_f, params, state, images, caps)))

    # ---- hand floors -------------------------------------------------------
    T = opts.sentence_length - 1
    D, F_, V, E = (
        tdims.model_dim, tdims.model_dim * tdims.mlp_ratio,
        tdims.padded_vocab, tdims.embedding_size,
    )
    Lyr, M = tdims.num_layers, 50
    tokens = BATCH * T
    dec_fwd_gf = (
        Lyr * (tokens * (3 * D + D + D + D) * D + BATCH * M * 2 * D * D
               + tokens * 2 * F_ * D)
        + tokens * (D * E + E * V)
    ) * 2 / 1e9
    print(
        f"decoder fwd GFLOP ~{dec_fwd_gf:.0f}; fwd+bwd ~{3 * dec_fwd_gf:.0f} "
        f"-> MXU floor at 197 TFLOP/s bf16: {3 * dec_fwd_gf / 197:.1f} ms",
        file=sys.stderr,
    )

    # ---- xplane trace of 3 consecutive full steps ---------------------------
    if trace_dir:
        from myimagecaptioningmodel_tpu.utils import profiling

        jax.block_until_ready(full(params, opt_state, state, images, caps))
        with profiling.trace(trace_dir):
            for _ in range(3):
                out = full(params, opt_state, state, images, caps)
            jax.block_until_ready(out)
        print(f"trace written to {trace_dir}", file=sys.stderr)

    print("| segment | ms/step (batch 128) |")
    print("|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.2f} |")
    print(f"\nimages/s: {BATCH / ms_full * 1000:.0f}")


if __name__ == "__main__":
    main()
