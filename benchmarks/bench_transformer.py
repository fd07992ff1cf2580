#!/usr/bin/env python
"""Transformer decoder family at production dims on one TPU chip.

Measures the second decoder family (models/transformer.py, vocab 12295 /
d_model 1024 / 4 layers / 8 heads) with the same sustained in-graph
methodology as bench.py, for comparison against the LSTM flagship numbers:

- greedy decode captions/s (batch 128, 35 KV-cached steps)
- beam-4 captions/s (batch 32)
- sustained train step images/s (in-graph 8-step scan, full fwd+bwd+Adam)

Run: PYTHONPATH=/root/repo python benchmarks/bench_transformer.py
Diagnostics to stderr; one JSON summary line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# running as `python benchmarks/bench_transformer.py` puts benchmarks/ on
# sys.path, not the repo root — add the root for the package + bench imports
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
BEAM_BATCH = 32
BEAM = 4
ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    from bench import sustained_captions_per_sec

    log(f"device: {jax.devices()[0]}")
    cfg = config_mod.replace_nested(
        config_mod.Config(), "model.decoder.arch", "transformer"
    )
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params["decoder"])
    )
    log(f"transformer decoder params: {n_params/1e6:.1f}M "
        f"(layers={opts.tdims.num_layers}, heads={opts.tdims.num_heads}, "
        f"d_model={opts.tdims.model_dim})")

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(BATCH, 224, 224, 3), jnp.float32)

    out = {}

    decode = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts))
    t0 = time.time()
    ids = jax.block_until_ready(decode(params, state, images))
    log(f"greedy compile+first run: {time.time()-t0:.1f}s, ids {ids.shape}")
    cps, pb, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
        params, state, images, ITERS,
    )
    out["greedy_captions_per_sec"] = round(cps, 1)
    log(f"greedy decode, sustained: {cps:.1f} captions/s "
        f"({pb*1000:.1f} ms / batch of {BATCH})")

    try:
        from myimagecaptioningmodel_tpu.inference.beam import beam_decode

        cps_b, pb_b, _ = sustained_captions_per_sec(
            lambda p, s, x: beam_decode(p, s, x, opts, BEAM)[0],
            params, state, images[:BEAM_BATCH], ITERS,
        )
        out["beam4_captions_per_sec"] = round(cps_b, 1)
        log(f"beam-{BEAM}, sustained: {cps_b:.1f} captions/s "
            f"({pb_b*1000:.1f} ms / batch of {BEAM_BATCH}); "
            f"{cps/max(cps_b,1e-9):.2f}x per caption vs greedy")
    except Exception as e:
        log(f"beam failed: {type(e).__name__}: {e}")

    # int8 weight storage: unlike the LSTM family (whose fused kernel keeps
    # weights VMEM-resident, making int8 moot in-decode), the transformer
    # decode re-streams ~134 MB of weights from HBM every step — int8 halves
    # that traffic on the streaming-bound path.
    try:
        from myimagecaptioningmodel_tpu.models.transformer import (
            quantize_transformer_decoder,
        )

        params_q = dict(params)
        params_q["decoder"] = quantize_transformer_decoder(params["decoder"])
        cps_q, pb_q, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
            params_q, state, images, ITERS,
        )
        out["int8_captions_per_sec"] = round(cps_q, 1)
        log(f"int8 greedy, sustained: {cps_q:.1f} captions/s "
            f"({pb_q*1000:.1f} ms / batch of {BATCH}; "
            f"{cps_q/max(cps,1e-9):.2f}x vs bf16)")
    except Exception as e:
        log(f"int8 failed: {type(e).__name__}: {e}")

    try:
        from bench import sustained_train_images_per_sec

        optimizer = optax.adam(5e-5)
        opt_state = optimizer.init(params)
        caps = jnp.asarray(
            rng.randint(1, opts.dims.vocab_size, (BATCH, opts.sentence_length)),
            jnp.int32,
        )
        t0 = time.time()
        ips, per_step, loss0 = sustained_train_images_per_sec(
            opts, optimizer, params, opt_state, state, images, caps,
            train_iters=8,
        )
        log(f"train compile+first+reps: {time.time()-t0:.1f}s, loss={loss0:.3f}")
        out["train_images_per_sec_sustained"] = round(ips, 1)
        log(f"train, sustained (in-graph 8-step scan): "
            f"{ips:.1f} images/s ({per_step*1000:.1f} ms/step)")
    except Exception as e:
        log(f"train failed: {type(e).__name__}: {e}")

    print(json.dumps({"arch": "transformer", **out}))


if __name__ == "__main__":
    main()
