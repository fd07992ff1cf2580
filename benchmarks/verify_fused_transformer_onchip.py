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

    def check_sane(pb_s):
        # The tunnel's block_until_ready intermittently returns before the
        # device finishes (train_roofline.md measurement caveat); when the
        # whole multi-decode dispatch "takes" ~= the measured RTT, the
        # subtraction leaves ~0 and the captions/s blows up. Flag it rather
        # than report a physically impossible number (a 35-step batch-128
        # decode cannot run in <1 ms on this chip).
        if pb_s * 1000 < 1.0:
            log("  WARNING: implausible (<1 ms/batch) — tunnel early-return "
                "artifact; rerun, and trust bench.py's forced-fetch numbers")

    cps_f, pb_f, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
        params, state, images, ITERS, rtt=rtt,
    )
    log(f"FUSED sustained: {cps_f:.1f} captions/s ({pb_f * 1000:.2f} ms/batch)")
    check_sane(pb_f)
    cps_x, pb_x, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts_xla),
        params, state, images, ITERS, rtt=rtt,
    )
    log(f"XLA   sustained: {cps_x:.1f} captions/s ({pb_x * 1000:.2f} ms/batch)")
    check_sane(pb_x)
    log(f"speedup: {cps_f / cps_x:.2f}x")

    # ---- in-kernel early stop (VERDICT r4 #2) ------------------------------
    # equality vs the XLA while_loop early-stop path in the never-stop
    # regime (untrained weights), plus the two timing brackets the bench
    # records: never-stop (overhead of the done bookkeeping) and
    # all-stop-at-step-1 (stop-biased bias; the in-kernel skip's best case).
    opts_es = opts._replace(early_stop_decode=True)
    opts_es_xla = opts_es._replace(use_pallas=False)
    dec_es = jax.jit(lambda p, s, x: captioner.greedy_decode(p, s, x, opts_es))
    dec_es_xla = jax.jit(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts_es_xla)
    )
    ids_e = jax.block_until_ready(dec_es(params, state, images))
    ids_ex = jax.block_until_ready(dec_es_xla(params, state, images))
    a, b = np.asarray(ids_e), np.asarray(ids_ex)
    eq_es = (a == b).mean()
    log(f"early-stop ids equality fused vs XLA (never-stop): {eq_es:.2%}")

    params_stop = dict(params)
    params_stop["decoder"] = dict(params["decoder"])
    params_stop["decoder"]["out_bias"] = (
        params["decoder"]["out_bias"].at[opts.stop_idx].add(1e4)
    )
    ids_s = np.asarray(
        jax.block_until_ready(dec_es(params_stop, state, images))
    )
    assert (ids_s[:, 0] == opts.stop_idx).all() and (ids_s[:, 1:] == 0).all(), (
        "all-stop ids wrong"
    )
    cps_es, pb_es, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts_es),
        params, state, images, ITERS, rtt=rtt,
    )
    log(f"FUSED early-stop never-stop: {cps_es:.1f} captions/s "
        f"({pb_es * 1000:.2f} ms/batch)")
    cps_as, pb_as, _ = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts_es),
        params_stop, state, images, ITERS, rtt=rtt,
    )
    log(f"FUSED early-stop all-stop: {cps_as:.1f} captions/s "
        f"({pb_as * 1000:.2f} ms/batch) — {cps_as / cps_f:.2f}x the "
        "fixed-scan number")

    # ---- whole-decode fused beam (VERDICT r4 #4) ---------------------------
    # ids equality fused vs the XLA beam scan in bf16 (untrained weights —
    # near-uniform logits, the adversarial argmax/top-k case; exactness is
    # pinned in f32 interpret by tests/test_fused_transformer.py), plus the
    # sustained device-time numbers for both.
    from myimagecaptioningmodel_tpu.inference.beam import beam_decode

    BEAM, BEAM_BATCH = 4, 32
    imgs_b = images[:BEAM_BATCH]
    dec_b = jax.jit(
        lambda p, s, x: beam_decode(p, s, x, opts, BEAM)[0]
    )
    dec_b_xla = jax.jit(
        lambda p, s, x: beam_decode(p, s, x, opts_xla, BEAM)[0]
    )
    t0 = time.time()
    ids_bf = jax.block_until_ready(dec_b(params, state, imgs_b))
    log(f"fused beam compile+first run: {time.time() - t0:.1f}s")
    ids_bx = jax.block_until_ready(dec_b_xla(params, state, imgs_b))
    a, b = np.asarray(ids_bf), np.asarray(ids_bx)
    eq_beam = (a == b).mean()
    log(f"beam ids equality fused vs XLA (bf16, untrained): {eq_beam:.2%}")
    cps_bf, pb_bf, _ = sustained_captions_per_sec(
        lambda p, s, x: beam_decode(p, s, x, opts, BEAM)[0],
        params, state, imgs_b, ITERS, rtt=rtt,
    )
    log(f"FUSED beam-{BEAM}: {cps_bf:.1f} captions/s "
        f"({pb_bf * 1000:.2f} ms/batch of {BEAM_BATCH})")
    cps_bx, pb_bx, _ = sustained_captions_per_sec(
        lambda p, s, x: beam_decode(p, s, x, opts_xla, BEAM)[0],
        params, state, imgs_b, ITERS, rtt=rtt,
    )
    log(f"XLA   beam-{BEAM}: {cps_bx:.1f} captions/s "
        f"({pb_bx * 1000:.2f} ms/batch; fused speedup "
        f"{cps_bf / cps_bx:.2f}x; per-caption vs fused greedy "
        f"{(pb_bf / BEAM_BATCH) / (pb_f / BATCH):.2f}x)")

    print(
        f'{{"fused_captions_per_sec": {cps_f:.1f}, '
        f'"xla_captions_per_sec": {cps_x:.1f}, '
        f'"ids_equal_frac": {eq:.4f}, '
        f'"early_stop_ids_equal_frac": {eq_es:.4f}, '
        f'"early_stop_neverstop_cps": {cps_es:.1f}, '
        f'"early_stop_allstop_cps": {cps_as:.1f}, '
        f'"beam_ids_equal_frac": {eq_beam:.4f}, '
        f'"fused_beam_captions_per_sec": {cps_bf:.1f}, '
        f'"xla_beam_captions_per_sec": {cps_bx:.1f}}}'
    )


if __name__ == "__main__":
    main()
