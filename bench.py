#!/usr/bin/env python
"""Headline benchmark: batched greedy-decode captions/sec on one TPU chip.

Measures the flagship inference path (BASELINE.json config #1/#2 territory):
MobileNetV2 encoder + 35-step adaptive-attention LSTM greedy decode at real
model dims (vocab 12295, hidden 1024, 224x224 inputs), batch 128.

Prints ONE JSON line:
    {"metric": "greedy_captions_per_sec_per_chip", "value": N,
     "unit": "captions/s", "vs_baseline": R}

``vs_baseline`` is value / BASELINE_CAPTIONS_PER_SEC. The reference publishes
no throughput numbers (SURVEY §6); BASELINE_CAPTIONS_PER_SEC = 15.0 is a
documented *estimate* of PaddlePaddle-1.8 CPU greedy decode for this model
(MobileNetV2 forward + 35 sequential LSTM+attention+12K-vocab-matmul steps
per image on host CPU). The BASELINE.json north star is >=10x that on one
v5e chip, i.e. vs_baseline >= 10.

Extra diagnostics (train-step images/sec) go to stderr, never stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_CAPTIONS_PER_SEC = 15.0  # estimated PaddlePaddle-1.8 CPU (see docstring)
BATCH = 128
WARMUP = 2
ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    dev = jax.devices()[0]
    log(f"device: {dev}")

    cfg = config_mod.Config()
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)

    decode = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts))

    t0 = time.time()
    ids = jax.block_until_ready(decode(params, state, images))
    log(f"decode compile+first run: {time.time() - t0:.1f}s, ids {ids.shape}")

    for _ in range(WARMUP):
        jax.block_until_ready(decode(params, state, images))

    t0 = time.time()
    for _ in range(ITERS):
        ids = decode(params, state, images)
    jax.block_until_ready(ids)
    dt = time.time() - t0
    log(f"greedy decode, per-call dispatch: {BATCH * ITERS / dt:.1f} captions/s "
        f"({dt / ITERS * 1000:.1f} ms / batch of {BATCH})")

    # Sustained device throughput: ITERS decodes inside ONE dispatch
    # (lax.scan), each on a perturbed batch so nothing can be CSE'd. This is
    # the serving number — per-call RPC overhead of the dev-environment TPU
    # tunnel (~3 ms/call, absent on directly-attached chips) is excluded.
    @jax.jit
    def decode_k(p, s, x):
        def body(carry, k):
            xs = x + k.astype(jnp.float32) * 1e-6
            out = captioner.greedy_decode(p, s, xs, opts)
            return carry, out[:, 0]
        _, outs = jax.lax.scan(body, 0, jnp.arange(ITERS))
        return outs

    jax.block_until_ready(decode_k(params, state, images))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        r = decode_k(params, state, images)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps
    captions_per_sec = BATCH * ITERS / dt
    log(f"greedy decode, sustained: {captions_per_sec:.1f} captions/s "
        f"({dt / ITERS * 1000:.1f} ms / batch of {BATCH})")

    # diagnostic: single-image greedy latency (BASELINE config #1 shape)
    try:
        img1 = images[:1]
        dec1 = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts))
        jax.block_until_ready(dec1(params, state, img1))
        for _ in range(3):
            jax.block_until_ready(dec1(params, state, img1))
        t0 = time.time()
        n1 = 20
        for _ in range(n1):
            jax.block_until_ready(dec1(params, state, img1))
        log(
            f"single-image greedy latency: {(time.time() - t0) / n1 * 1000:.2f} ms "
            "(synchronous round-trips; dominated by the dev tunnel's RPC RTT "
            "on this setup — on-device cost is a few ms)"
        )
    except Exception as e:
        log(f"single-image diagnostic failed: {type(e).__name__}: {e}")

    # diagnostic: train-step throughput (stderr only)
    try:
        import optax

        from myimagecaptioningmodel_tpu.parallel.train_step import build_steps
        from myimagecaptioningmodel_tpu.training import lr_schedules

        schedule = lr_schedules.constant(5e-5)
        optimizer = optax.adam(schedule)
        steps = build_steps(opts, optimizer, schedule, mesh=None, donate=True)
        opt_state = optimizer.init(params)
        step = jnp.zeros((), jnp.int32)
        caps = jnp.asarray(
            rng.randint(1, opts.dims.vocab_size, (BATCH, opts.sentence_length)),
            jnp.int32,
        )
        t0 = time.time()
        params, opt_state, state, step, loss, lr = steps.train_step(
            params, opt_state, state, step, images, caps
        )
        jax.block_until_ready(loss)
        log(f"train step compile+first run: {time.time() - t0:.1f}s, loss={float(loss):.3f}")
        n = 5
        t0 = time.time()
        for _ in range(n):
            params, opt_state, state, step, loss, lr = steps.train_step(
                params, opt_state, state, step, images, caps
            )
        jax.block_until_ready(loss)
        dt = time.time() - t0
        log(f"train: {BATCH * n / dt:.1f} images/s ({dt / n * 1000:.1f} ms/step)")
    except Exception as e:  # diagnostics must never break the benchmark line
        log(f"train-step diagnostic failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "greedy_captions_per_sec_per_chip",
                "value": round(captions_per_sec, 2),
                "unit": "captions/s",
                "vs_baseline": round(captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
