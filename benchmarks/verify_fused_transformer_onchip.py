#!/usr/bin/env python
"""On-chip verification + timing of the whole-decode fused transformer
kernel (ops/pallas/fused_transformer.py) at production dims.

Checks, on the real TPU in bf16 (the suite is CPU/interpret-only):
1. ids equality: fused whole-decode kernel == the XLA KV-cached scan path,
   id-for-id over a batch-128 decode (untrained weights => near-uniform
   logits, the adversarial case for argmax agreement);
2. sustained decode throughput, fused vs XLA (bench.py methodology).

Run: PYTHONPATH=/root/repo python benchmarks/verify_fused_transformer_onchip.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
ITERS = 50


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import measure_dispatch_rtt, sustained_captions_per_sec
    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models import transformer as TF
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    log(f"device: {jax.devices()[0]}")
    cfg = config_mod.replace_nested(
        config_mod.Config(), "model.decoder.arch", "transformer"
    )
    opts = ModelOptions.from_config(cfg)
    assert opts.use_pallas, "expected a TPU backend"
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)

    opts_xla = opts._replace(use_pallas=False)
    dec_fused = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts))
    dec_xla = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts_xla))

    t0 = time.time()
    ids_f = jax.block_until_ready(dec_fused(params, state, images))
    log(f"fused compile+first run: {time.time() - t0:.1f}s ids {ids_f.shape}")
    t0 = time.time()
    ids_x = jax.block_until_ready(dec_xla(params, state, images))
    log(f"xla compile+first run: {time.time() - t0:.1f}s")

    a, b = np.asarray(ids_f), np.asarray(ids_x)
    eq = (a == b).mean()
    log(f"ids equality fused vs XLA (bf16, untrained): {eq:.2%}")
    if not np.array_equal(a, b):
        idx = np.argwhere(a != b)
        log(f"  first mismatches (row, t): {idx[:5].tolist()}")

    rtt = measure_dispatch_rtt()
    log(f"measured RTT: {rtt * 1000:.2f} ms")
    cps_f, pb_f, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
        params, state, images, ITERS, rtt=rtt,
    )
    log(f"FUSED sustained: {cps_f:.1f} captions/s ({pb_f * 1000:.2f} ms/batch)")
    cps_x, pb_x, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts_xla),
        params, state, images, ITERS, rtt=rtt,
    )
    log(f"XLA   sustained: {cps_x:.1f} captions/s ({pb_x * 1000:.2f} ms/batch)")
    log(f"speedup: {cps_f / cps_x:.2f}x")
    print(
        f'{{"fused_captions_per_sec": {cps_f:.1f}, '
        f'"xla_captions_per_sec": {cps_x:.1f}, '
        f'"ids_equal_frac": {eq:.4f}}}'
    )


if __name__ == "__main__":
    main()
