#!/usr/bin/env python
"""A/B the subset-statistics BN train step on the real chip (VERDICT r3 #5).

The full-semantics BN train path is at its activation-pass floor (six passes
per conv output, dominant fusion at 93% of HBM peak —
benchmarks/train_roofline.md). ``model.bn_stat_rows = R`` changes the
computation instead of the schedule: batch stats + dscale/doffset estimates
from the first R images, stats constant in backward (ops/layers.py
``_bn_train_subset``). This measures the full batch-128 train step
(fwd+bwd+Adam) exact vs R in {32, 16}, with the same in-graph K-step
``lax.scan`` harness as ``bench.py``'s sustained train measurement.

Run:  python benchmarks/bench_bn_subset.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
ITERS = 8
REPS = 3


def sustained_train(opts, params, state, images, caps):
    import jax
    import jax.numpy as jnp
    import optax

    from myimagecaptioningmodel_tpu.models import captioner as cap_mod
    from myimagecaptioningmodel_tpu.training import lr_schedules

    schedule = lr_schedules.constant(5e-5)
    optimizer = optax.adam(schedule)
    opt_state = optimizer.init(params)

    def one_step(carry, k):
        p, o, s = carry

        def lf(pp):
            return cap_mod.loss_fn(
                pp, s, images + k.astype(jnp.float32) * 1e-6, caps, opts, True
            )

        (loss_k, ns), grads = jax.value_and_grad(lf, has_aux=True)(p)
        upd, no = optimizer.update(grads, o, p)
        return (optax.apply_updates(p, upd), no, ns), loss_k

    @partial(jax.jit, donate_argnums=(0,))
    def train_k(carry):
        return jax.lax.scan(one_step, carry, jnp.arange(ITERS))

    carry = (params, opt_state, state)
    t0 = time.time()
    carry, losses = train_k(carry)
    jax.block_until_ready(losses)
    print(f"  compile+first: {time.time() - t0:.1f}s "
          f"last-loss {float(losses[-1]):.4f}", file=sys.stderr)
    dt = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        carry, losses = train_k(carry)
        jax.block_until_ready(losses)
        dt = min(dt, time.time() - t0)
    return BATCH * ITERS / dt, dt / ITERS * 1000.0, float(losses[-1])


def main():
    import jax
    import jax.numpy as jnp

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    cfg = config_mod.Config()
    base = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), base)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)
    caps = jnp.asarray(
        rng.randint(1, base.dims.vocab_size, (BATCH, base.sentence_length)),
        jnp.int32,
    )

    results = {}
    for rows in (0, 32, 16):
        name = "exact" if rows == 0 else f"R={rows}"
        opts = base._replace(bn_stat_rows=rows)
        print(f"{name}:", file=sys.stderr)
        # fresh device copies: the scan harness donates its carry
        p = jax.tree_util.tree_map(jnp.array, params)
        s = jax.tree_util.tree_map(jnp.array, state)
        imgs_per_s, ms, loss = sustained_train(opts, p, s, images, caps)
        results[name] = (imgs_per_s, ms, loss)
        print(f"  sustained: {imgs_per_s:.1f} img/s ({ms:.2f} ms/step)")

    e = results["exact"]
    for name, r in results.items():
        if name == "exact":
            continue
        print(f"{name} vs exact: {e[1] / r[1]:.3f}x step-time "
              f"({e[1]:.2f} -> {r[1]:.2f} ms); loss delta {abs(e[2] - r[2]):.2e}")


if __name__ == "__main__":
    main()
