#!/usr/bin/env python
"""Train-step decomposition profile on one TPU chip (VERDICT r1 item 3).

Times the full batch-128 train step and its pieces (encoder fwd+bwd,
decoder fwd+bwd, BN variants) so optimization work targets the measured
bottleneck, not a guess. Writes a markdown summary to stdout.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128


def timeit(fn, *args, iters=5, warmup=2):
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
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
    from myimagecaptioningmodel_tpu.parallel.train_step import build_steps
    from myimagecaptioningmodel_tpu.training import lr_schedules

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = config_mod.Config()
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)
    caps = jnp.asarray(
        rng.randint(1, opts.dims.vocab_size, (BATCH, opts.sentence_length)), jnp.int32
    )

    rows = []

    # 1. full train step
    schedule = lr_schedules.constant(5e-5)
    optimizer = optax.adam(schedule)
    steps = build_steps(opts, optimizer, schedule, mesh=None, donate=False)
    opt_state = optimizer.init(params)
    step0 = jnp.zeros((), jnp.int32)

    def full(params, opt_state, state, images, caps):
        return steps.train_step(params, opt_state, state, step0, images, caps)

    ms = timeit(full, params, opt_state, state, images, caps)
    rows.append(("full train step (fwd+bwd+adam)", ms))

    # 2. encoder-only fwd+bwd (loss = mean of features)
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

    ms = timeit(enc_fb, enc_p, enc_s, images)
    rows.append(("encoder fwd+bwd", ms))

    # 3. encoder fwd only
    @jax.jit
    def enc_f(p, s, x):
        feats, _ = mobilenet_v2.apply(p, s, x, train=True, compute_dtype=jnp.bfloat16)
        return jnp.mean(feats.astype(jnp.float32))

    ms = timeit(enc_f, enc_p, enc_s, images)
    rows.append(("encoder fwd only", ms))

    # 4. decoder-only fwd+bwd: feed random features directly
    from myimagecaptioningmodel_tpu.models import decoder as decoder_mod

    feats = jnp.asarray(rng.rand(BATCH, 49, 1280), jnp.float32)

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
            pre = decoder_mod.precompute(p["decoder"], img_embed, global_feat, dt)
            logits = decoder_mod.teacher_forcing_logits(
                p["decoder"], pre, source, opts.parity_mode, opts.padding_idx, dt
            )
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, target[..., None], axis=-1)[..., 0]
            return jnp.sum((logz - gold) * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        return jax.value_and_grad(lf)(p)

    try:
        ms = timeit(dec_fb, params, feats, caps)
        rows.append(("decoder fwd+bwd (from features)", ms))
    except Exception as e:
        print(f"decoder-only segment unavailable: {e}", file=sys.stderr)

    # 5. loss fwd only
    @jax.jit
    def loss_f(p, s, x, c):
        l, _ = captioner.loss_fn(p, s, x, c, opts, True)
        return l

    ms = timeit(loss_f, params, state, images, caps)
    rows.append(("full fwd only", ms))

    # cost analysis of the full step
    try:
        lowered = jax.jit(
            lambda p, o, s, x, c: steps.train_step(p, o, s, step0, x, c)
        ).lower(params, opt_state, state, images, caps)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        cost_rows = [
            ("XLA est. TFLOP / step", flops / 1e12),
            ("XLA est. GB touched / step", bytes_ / 1e9),
        ]
    except Exception as e:
        cost_rows = []
        print(f"cost analysis failed: {e}", file=sys.stderr)

    print("| segment | ms/step (batch 128) |")
    print("|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.2f} |")
    if cost_rows:
        print("\n| cost estimate | value |")
        print("|---|---|")
        for name, v in cost_rows:
            print(f"| {name} | {v:.2f} |")
    full_ms = rows[0][1]
    print(f"\nimages/s: {BATCH / full_ms * 1000:.0f}")


if __name__ == "__main__":
    main()
