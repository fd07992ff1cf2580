#!/usr/bin/env python
"""Measure the CPU greedy-decode baseline that grounds bench.py's
``vs_baseline`` ratio.

The reference publishes no throughput numbers (SURVEY §6), and its stack
(PaddlePaddle 1.8) is not installable here, so the documented proxy is:
**this same model (MobileNetV2 + 35-step adaptive-attention LSTM decode,
vocab 12295, hidden 1024), greedy decode, single CPU core, float32, XLA-CPU**
— i.e. what the reference workload costs per caption without an accelerator.
XLA-CPU is a *generous* stand-in for Paddle-1.8 CPU (modern fusing compiler
vs a 2020 framework), so the resulting baseline is conservative: the real
Paddle-CPU number would be lower and ``vs_baseline`` higher.

Run pinned to one core:

    taskset -c 0 python benchmarks/baseline_cpu.py

Prints captions/s for batch 1 and batch 8 (the batch-8 number, which is the
friendlier one for the baseline, feeds bench.py's BASELINE_CAPTIONS_PER_SEC).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# single-device CPU, before jax import (sitecustomize may pre-register TPU)
from myimagecaptioningmodel_tpu.utils.env import force_cpu_inprocess  # noqa: E402

force_cpu_inprocess()

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    cfg = config_mod.Config()
    opts = ModelOptions.from_config(cfg)._replace(
        compute_dtype="float32",  # CPU has no bf16 units; f32 is the fair path
        use_pallas=False,
    )
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    decode = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts))

    rng = np.random.RandomState(0)
    for batch, iters in ((1, 6), (8, 3)):
        images = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.float32)
        t0 = time.time()
        jax.block_until_ready(decode(params, state, images))
        print(f"batch {batch}: compile+first {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(iters):
            ids = decode(params, state, images)
        jax.block_until_ready(ids)
        dt = (time.time() - t0) / iters
        print(
            f"batch {batch}: {batch / dt:.2f} captions/s "
            f"({dt * 1000:.0f} ms/batch, {iters} iters, single core)"
        )


if __name__ == "__main__":
    main()
