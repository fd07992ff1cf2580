#!/usr/bin/env python
"""Headline benchmark: batched greedy-decode captions/sec on one TPU chip.

Measures the flagship inference path (BASELINE.json config #1/#2 territory):
MobileNetV2 encoder + 35-step adaptive-attention LSTM greedy decode at real
model dims (vocab 12295, hidden 1024, 224x224 inputs), batch 128 — plus the
other serving variants (beam-4, int8-quantized, early-stop) and a train-step
diagnostic.

Prints ONE JSON line:
    {"metric": "greedy_captions_per_sec_per_chip", "value": N,
     "unit": "captions/s", "vs_baseline": R, "extra": {...}}

``vs_baseline`` is value / BASELINE_CAPTIONS_PER_SEC, which is **measured**,
not estimated: this same model's greedy decode on one CPU core via XLA-CPU
float32 (``benchmarks/baseline_cpu.py``; derivation in BASELINE.md). XLA-CPU
is a generous stand-in for the reference's PaddlePaddle-1.8 CPU runtime, so
the ratio is conservative. The BASELINE.json north star is >=10x CPU on one
v5e chip, i.e. vs_baseline >= 10.

Extra diagnostics go to stderr, never stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Measured: benchmarks/baseline_cpu.py, batch 8, single CPU core (this host),
# XLA-CPU f32 greedy decode of the identical model (2026-08-16: 3.39
# captions/s at batch 8; 0.49 at batch 1). See BASELINE.md for derivation.
BASELINE_CAPTIONS_PER_SEC = 3.39

# v5e per-chip peaks for the MFU / HBM-utilization diagnostics:
# 197 TFLOP/s bf16 (MXU), 819 GB/s HBM. FLOPs/bytes numerators come from
# XLA's compiled cost model (``compiled.cost_analysis()``), which includes
# the Pallas kernels via their explicit pl.CostEstimate. "bytes accessed"
# counts each post-fusion operand once — a fair HBM-traffic proxy, though
# it overcounts buffers XLA keeps VMEM-resident across ops (so hbm_util is
# an upper bound) and undercounts nothing.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9
BATCH = 128
BEAM_BATCH = 32  # x beam 4 = 128 decode rows (>=256-row compiles can wedge
#                  the dev-tunnel's remote compiler; see ROADMAP env notes)
BEAM = 4
WARMUP = 2
# 50 decodes per dispatch: the dev tunnel's per-dispatch RPC round-trip is
# ~25-30 ms (benchmarks/train_roofline.md); at 10 iters that constant was 35%
# of the measurement (the r2->r3 "regression" was exactly this artifact —
# VERDICT r3 Weak #1). At 50 iters it is <2%, and we additionally subtract a
# *measured* empty-dispatch RTT so the headline is on a device-time basis.
ITERS = 50


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_dispatch_rtt(reps=10):
    """Measured cost of one synchronous dispatch of a trivial program:
    tunnel/RPC round-trip + host dispatch + blocking sync. This constant is
    paid once per timed dispatch below regardless of how much device work the
    dispatch contains, so subtracting it yields a device-time basis.
    Best-of-``reps`` (the floor is the transport; spikes are host noise)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f(x))
        best = min(best, time.time() - t0)
    return best


def compiled_cost(compiled, per_calls=1):
    """(flops, bytes_accessed) per logical call from an XLA ``compiled``
    object's cost model, where the compiled program contains ``per_calls``
    calls (an in-graph scan). Pallas kernels contribute via their explicit
    ``pl.CostEstimate``. (0, 0) when the backend doesn't expose it."""
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return (
            float(c.get("flops", 0.0)) / per_calls,
            float(c.get("bytes accessed", 0.0)) / per_calls,
        )
    except Exception as e:
        log(f"cost analysis unavailable: {type(e).__name__}: {e}")
        return 0.0, 0.0


def record_util(extra, prefix, flops, bytes_, seconds):
    """Record {prefix}_mfu / {prefix}_hbm_util against v5e peaks (basis
    documented at V5E_PEAK_BF16_FLOPS)."""
    if seconds <= 0:
        return
    if flops:
        extra[f"{prefix}_mfu"] = round(flops / seconds / V5E_PEAK_BF16_FLOPS, 4)
    if bytes_:
        extra[f"{prefix}_hbm_util"] = round(
            bytes_ / seconds / V5E_HBM_BYTES_PER_S, 4
        )
    if flops or bytes_:
        log(
            f"{prefix}: {flops / 1e9:.2f} GFLOP, {bytes_ / 1e6:.1f} MB "
            f"accessed per call over {seconds * 1000:.2f} ms -> "
            f"MFU {extra.get(f'{prefix}_mfu', 0):.1%}, "
            f"HBM util <= {extra.get(f'{prefix}_hbm_util', 0):.1%}"
        )


def sustained_captions_per_sec(decode_fn, params, state, images, iters,
                               reps=3, rtt=0.0, cost_out=None):
    """Device-sustained throughput: ``iters`` decodes inside ONE dispatch
    (lax.scan), each on a perturbed batch so nothing is CSE'd.

    Returns ``(captions_per_sec_device, per_batch_device_s, per_batch_wall_s)``
    where the device basis subtracts the measured empty-dispatch ``rtt``
    (one constant per dispatch — the dev tunnel's RPC round-trip, absent on
    directly-attached chips) and the wall basis does not.

    ``cost_out``: optional dict; filled with per-decode ``flops`` /
    ``bytes_accessed`` from the compiled program's XLA cost model."""
    import jax
    import jax.numpy as jnp

    def decode_k_fn(p, s, x):
        def body(carry, k):
            xs = x + k.astype(jnp.float32) * 1e-6
            out = decode_fn(p, s, xs)
            return carry, out[:, 0]

        _, outs = jax.lax.scan(body, 0, jnp.arange(iters))
        return outs

    # AOT lower->compile: one compile, reused for execution, and its cost
    # model feeds the MFU/HBM-util diagnostics (no second compile)
    decode_k = jax.jit(decode_k_fn).lower(params, state, images).compile()
    if cost_out is not None:
        flops, bytes_ = compiled_cost(decode_k, per_calls=iters)
        cost_out["flops"] = flops
        cost_out["bytes_accessed"] = bytes_

    jax.block_until_ready(decode_k(params, state, images))
    # best-of-reps: each rep is one device-side dispatch of `iters` decodes;
    # taking the fastest rep rejects host-contention / tunnel hiccups that
    # would otherwise land between dispatches (observed 1.5x skew when a
    # CPU-heavy job shares this 1-core host)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(decode_k(params, state, images))
        best = min(best, time.time() - t0)
    wall_per = best / iters
    device_total = max(best - rtt, best * 0.5)  # guard: rtt can't be >50%
    device_per = device_total / iters
    batch = images.shape[0]
    return batch * iters / device_total, device_per, wall_per


def sustained_train_images_per_sec(
    opts, optimizer, params, opt_state, state, images, caps,
    train_iters=8, reps=3, cost_out=None,
):
    """Device-sustained train throughput: ``train_iters`` FULL train steps
    (fwd + bwd + optimizer update) inside ONE dispatch via ``lax.scan``, each
    on a perturbed batch so nothing is CSE'd; best-of-``reps`` to reject
    host-contention/tunnel hiccups (same methodology as the decode helper).
    -> (images/s, seconds/step, first-run last loss).

    ``cost_out``: optional dict; filled with per-step ``flops`` /
    ``bytes_accessed`` from the compiled program's XLA cost model.

    NOTE: the inner jit uses ``donate_argnums=(0,)`` on the (params,
    opt_state, state) carry, so the *caller's* buffers for those three
    arguments are invalidated by the first call. Callers that need the
    originals afterwards must copy them first (jax.tree.map(jnp.copy, ...))."""
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from myimagecaptioningmodel_tpu.models import captioner as cap_mod

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
    def train_k_fn(carry):
        return jax.lax.scan(one_step, carry, jnp.arange(train_iters))

    # AOT compile so the same executable serves execution AND the MFU/HBM
    # cost diagnostics (donation semantics are preserved by the jit wrapper)
    train_k = train_k_fn.lower((params, opt_state, state)).compile()
    if cost_out is not None:
        flops, bytes_ = compiled_cost(train_k, per_calls=train_iters)
        cost_out["flops"] = flops
        cost_out["bytes_accessed"] = bytes_

    carry, losses = train_k((params, opt_state, state))  # first run
    jax.block_until_ready(losses)
    first_loss = float(losses[-1])
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        carry, losses = train_k(carry)
        jax.block_until_ready(losses)
        dt = min(dt, time.time() - t0)
    batch = images.shape[0]
    return batch * train_iters / dt, dt / train_iters, first_loss


def main() -> None:
    import jax
    import jax.numpy as jnp

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.models import captioner
    from myimagecaptioningmodel_tpu.models.captioner import ModelOptions

    dev = jax.devices()[0]
    log(f"device: {dev}")

    rtt = measure_dispatch_rtt()
    log(f"measured empty-dispatch RTT: {rtt * 1000:.2f} ms "
        "(subtracted once per timed dispatch for the device-time basis)")

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

    # Sustained device throughput (serving number): see helper docstring.
    greedy_cost = {}
    captions_per_sec, per_batch, per_batch_wall = sustained_captions_per_sec(
        lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
        params, state, images, ITERS, rtt=rtt, cost_out=greedy_cost,
    )
    log(f"greedy decode, sustained: {captions_per_sec:.1f} captions/s "
        f"({per_batch * 1000:.2f} ms device / {per_batch_wall * 1000:.2f} ms "
        f"wall per batch of {BATCH})")

    extra = {
        "basis": f"device time: {ITERS}-decode in-graph scan per dispatch, "
                 "best-of-3 dispatches, minus measured empty-dispatch RTT; "
                 "mfu/hbm_util: XLA compiled cost model (flops & "
                 "bytes-accessed incl. Pallas CostEstimates) over the device "
                 "time — bytes-accessed counts each post-fusion operand "
                 "once, so hbm_util is an upper bound on true HBM traffic",
        "measured_rtt_ms": round(rtt * 1000, 2),
        "greedy_ms_per_batch_device": round(per_batch * 1000, 3),
        "greedy_ms_per_batch_wall": round(per_batch_wall * 1000, 3),
        "greedy_captions_per_sec_wall": round(BATCH / per_batch_wall, 2),
    }
    record_util(
        extra, "greedy", greedy_cost.get("flops", 0.0),
        greedy_cost.get("bytes_accessed", 0.0), per_batch,
    )

    # --- serving variant: beam-4 (BASELINE config #2) -----------------------
    try:
        from myimagecaptioningmodel_tpu.inference.beam import beam_decode

        beam_images = images[:BEAM_BATCH]
        cps, pb, _ = sustained_captions_per_sec(
            lambda p, s, x: beam_decode(p, s, x, opts, BEAM)[0],
            params, state, beam_images, ITERS, rtt=rtt,
        )
        extra["beam4_captions_per_sec"] = round(cps, 2)
        log(f"beam-{BEAM} decode, sustained: {cps:.1f} captions/s "
            f"({pb * 1000:.1f} ms / batch of {BEAM_BATCH}; "
            f"{BEAM_BATCH * BEAM} decode rows)")
        log(f"beam-{BEAM} kernel budget vs greedy: "
            f"{captions_per_sec / max(cps, 1e-9):.2f}x per caption")
    except Exception as e:
        log(f"beam diagnostic failed: {type(e).__name__}: {e}")

    # --- serving variant: int8-quantized decoder ------------------------------
    try:
        from myimagecaptioningmodel_tpu.ops.quantization import quantize_decoder

        params_q = dict(params)
        params_q["decoder"] = quantize_decoder(params["decoder"])
        cps, pb, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
            params_q, state, images, ITERS, rtt=rtt,
        )
        extra["int8_captions_per_sec"] = round(cps, 2)
        log(f"int8 greedy decode, sustained: {cps:.1f} captions/s "
            f"({pb * 1000:.1f} ms / batch of {BATCH})")
    except Exception as e:
        log(f"int8 diagnostic failed: {type(e).__name__}: {e}")

    # --- serving variant: early-stop decode ------------------------------------
    # Random weights never emit <stop>, so the realistic mid-caption win
    # (stop at ~10-20 tokens on trained models) cannot be measured here;
    # instead measure both brackets: all-rows-stop-at-step-1 (best case) —
    # via a stop-biased copy of the params — and never-stop (worst case,
    # pure while_loop overhead vs the fixed scan).
    try:
        opts_es = opts._replace(early_stop_decode=True)
        cps, pb, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_es),
            params, state, images, ITERS, rtt=rtt,
        )
        extra["early_stop_neverstop_captions_per_sec"] = round(cps, 2)
        log(f"early-stop decode (never stops; overhead check): {cps:.1f} "
            f"captions/s ({pb * 1000:.1f} ms / batch of {BATCH})")

        params_es = dict(params)
        params_es["decoder"] = dict(params["decoder"])
        params_es["decoder"]["out_bias"] = (
            params["decoder"]["out_bias"].at[opts.stop_idx].add(1e4)
        )
        cps, pb, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_es),
            params_es, state, images, ITERS, rtt=rtt,
        )
        extra["early_stop_allstop_captions_per_sec"] = round(cps, 2)
        log(f"early-stop decode (all stop at step 1; best case): {cps:.1f} "
            f"captions/s ({pb * 1000:.1f} ms / batch of {BATCH})")
    except Exception as e:
        log(f"early-stop diagnostic failed: {type(e).__name__}: {e}")

    # single-image greedy latency (BASELINE config #1). Two bases:
    # - device: ITERS sequential B=1 decodes in ONE dispatch minus the
    #   measured RTT — the honest on-chip latency (the B=1 batch is padded
    #   to the fused kernel's 8-row gate inside greedy_decode_ids, so this
    #   exercises the same fused Pallas step as serving batches);
    # - wall: synchronous round-trips (RTT-dominated on the dev tunnel).
    try:
        img1 = images[:1]
        _cps1, pb1, pb1_wall = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts),
            params, state, img1, ITERS, rtt=rtt,
        )
        extra["single_image_device_ms"] = round(pb1 * 1000, 3)
        log(
            f"single-image greedy latency: {pb1 * 1000:.2f} ms device / "
            f"{pb1_wall * 1000:.2f} ms wall (wall ~= device + tunnel RTT; "
            "fused-kernel path via pad-to-8)"
        )
    except Exception as e:
        log(f"single-image diagnostic failed: {type(e).__name__}: {e}")

    # --- second decoder family: transformer greedy decode -------------------
    # (models/transformer.py, arch="transformer"; 70.9M decoder params vs the
    # LSTM's ~10M — recorded so every round's BENCH covers both families; the
    # transformer's train numbers live in benchmarks/bench_transformer.py)
    try:
        cfg_t = config_mod.replace_nested(cfg, "model.decoder.arch", "transformer")
        opts_t = ModelOptions.from_config(cfg_t)
        params_t, state_t = captioner.init(jax.random.PRNGKey(0), opts_t)
        cost_t = {}
        cps, pb, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_t),
            params_t, state_t, images, ITERS, rtt=rtt, cost_out=cost_t,
        )
        extra["transformer_greedy_captions_per_sec"] = round(cps, 2)
        log(f"transformer greedy decode, sustained: {cps:.1f} captions/s "
            f"({pb * 1000:.1f} ms / batch of {BATCH})")
        record_util(
            extra, "transformer_greedy", cost_t.get("flops", 0.0),
            cost_t.get("bytes_accessed", 0.0), pb,
        )

        # single-image latency, second family (same basis as the LSTM's
        # single_image_device_ms line: B=1 pads to the whole-decode fused
        # kernel's 8-row gate inside greedy_decode_ids and is sliced back).
        # OPT-IN: the B=8 kernel specialization is a separate ~10+ min
        # remote compile on the dev tunnel — too slow for the default bench
        # run (the driver's end-of-round capture must not risk a hang).
        if os.environ.get("BENCH_TRANSFORMER_B1"):
            _c1t, pb1t, pb1t_wall = sustained_captions_per_sec(
                lambda p, s, x: captioner.greedy_decode(p, s, x, opts_t),
                params_t, state_t, images[:1], ITERS, rtt=rtt,
            )
            extra["transformer_single_image_device_ms"] = round(
                pb1t * 1000, 3
            )
            log(
                f"transformer single-image latency: {pb1t * 1000:.2f} ms "
                f"device / {pb1t_wall * 1000:.2f} ms wall (pad-to-8 fused "
                "path)"
            )

        # quantized serving modes: the fused decode is stream-bound, so the
        # int8 artifact halves the weight bytes in HBM (exact vs the XLA
        # int8 path) and quantize_kv halves the cross-attn memory stream
        # (opt-in approximate mode) — ops/pallas/fused_transformer.py
        from myimagecaptioningmodel_tpu.models.transformer import (
            quantize_transformer_decoder,
        )

        params_tq = dict(params_t)
        params_tq["decoder"] = quantize_transformer_decoder(
            params_t["decoder"]
        )
        cps8, pb8, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_t),
            params_tq, state_t, images, ITERS, rtt=rtt,
        )
        extra["transformer_greedy_int8_captions_per_sec"] = round(cps8, 2)
        log(f"transformer greedy int8, sustained: {cps8:.1f} captions/s "
            f"({pb8 * 1000:.1f} ms / batch of {BATCH})")
        opts_tkv = opts_t._replace(quantize_kv=True)
        cps8kv, pb8kv, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_tkv),
            params_tq, state_t, images, ITERS, rtt=rtt,
        )
        extra["transformer_greedy_int8kv_captions_per_sec"] = round(cps8kv, 2)
        log(f"transformer greedy int8+kv, sustained: {cps8kv:.1f} captions/s "
            f"({pb8kv * 1000:.1f} ms / batch of {BATCH})")
        del params_tq

        # in-kernel early stop (VERDICT r4 #2): same two brackets as the
        # LSTM family's — never-stop (bookkeeping overhead on top of the
        # fused fixed scan) and all-stop-at-step-1 (stop-biased bias; the
        # whole-decode kernel skips every remaining grid step's DMA+compute)
        opts_tes = opts_t._replace(early_stop_decode=True)
        cps_es, pb_es, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_tes),
            params_t, state_t, images, ITERS, rtt=rtt,
        )
        extra["transformer_early_stop_neverstop_captions_per_sec"] = round(
            cps_es, 2
        )
        log(f"transformer early-stop (never stops): {cps_es:.1f} captions/s "
            f"({pb_es * 1000:.2f} ms / batch of {BATCH})")
        params_tes = dict(params_t)
        params_tes["decoder"] = dict(params_t["decoder"])
        params_tes["decoder"]["out_bias"] = (
            params_t["decoder"]["out_bias"].at[opts_t.stop_idx].add(1e4)
        )
        cps_as, pb_as, _ = sustained_captions_per_sec(
            lambda p, s, x: captioner.greedy_decode(p, s, x, opts_tes),
            params_tes, state_t, images, ITERS, rtt=rtt,
        )
        extra["transformer_early_stop_allstop_captions_per_sec"] = round(
            cps_as, 2
        )
        log(f"transformer early-stop (all stop at step 1): {cps_as:.1f} "
            f"captions/s ({pb_as * 1000:.2f} ms / batch of {BATCH}; "
            f"{cps_as / max(cps, 1e-9):.2f}x the fixed scan)")
        del params_tes

        # transformer beam-4 (VERDICT r4 #4): same device-time basis and
        # row budget (32 x 4 = 128 decode rows) as the LSTM family's line
        from myimagecaptioningmodel_tpu.inference.beam import beam_decode

        cps_b, pb_b, _ = sustained_captions_per_sec(
            lambda p, s, x: beam_decode(p, s, x, opts_t, BEAM)[0],
            params_t, state_t, images[:BEAM_BATCH], ITERS, rtt=rtt,
        )
        extra["transformer_beam4_captions_per_sec"] = round(cps_b, 2)
        log(f"transformer beam-{BEAM}, sustained: {cps_b:.1f} captions/s "
            f"({pb_b * 1000:.1f} ms / batch of {BEAM_BATCH}; "
            f"{cps / max(cps_b, 1e-9):.2f}x per caption vs greedy)")

        # transformer train throughput (VERDICT r3 #6): same sustained
        # in-graph-scan methodology as the LSTM train diagnostic below
        import optax as optax_t

        caps_t = jnp.asarray(
            rng.randint(
                1, opts_t.tdims.vocab_size, (BATCH, opts_t.sentence_length)
            ),
            jnp.int32,
        )
        optimizer_t = optax_t.adam(5e-5)
        opt_state_t = optimizer_t.init(params_t)
        cost_tt = {}
        t_ips, t_per_step, _tl = sustained_train_images_per_sec(
            opts_t, optimizer_t, params_t, opt_state_t, state_t, images,
            caps_t, train_iters=8, cost_out=cost_tt,
        )
        extra["transformer_train_images_per_sec"] = round(t_ips, 1)
        log(f"transformer train, sustained (in-graph 8-step scan): "
            f"{t_ips:.1f} images/s ({t_per_step * 1000:.1f} ms/step)")
        record_util(
            extra, "transformer_train", cost_tt.get("flops", 0.0),
            cost_tt.get("bytes_accessed", 0.0), t_per_step,
        )
        del params_t, state_t, opt_state_t
    except Exception as e:
        log(f"transformer diagnostic failed: {type(e).__name__}: {e}")

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
        extra["train_images_per_sec"] = round(BATCH * n / dt, 1)
        log(f"train: {BATCH * n / dt:.1f} images/s ({dt / n * 1000:.1f} ms/step)")

        # Sustained device train throughput: K full steps (fwd+bwd+psum-free
        # Adam) inside ONE dispatch via lax.scan, mirroring the decode
        # sustained measurement — excludes the dev-tunnel RPC per-call cost
        # so the number reflects the chip, not the transport (VERDICT r2 #2).
        train_iters = 8
        cost_tr = {}
        cps, per_step, _loss = sustained_train_images_per_sec(
            opts, optimizer, params, opt_state, state, images, caps,
            train_iters=train_iters, cost_out=cost_tr,
        )
        extra["train_images_per_sec_sustained"] = round(cps, 1)
        log(
            f"train, sustained (in-graph {train_iters}-step scan): "
            f"{cps:.1f} images/s ({per_step * 1000:.1f} ms/step; "
            f"per-call gap = transport/dispatch overhead)"
        )
        record_util(
            extra, "train", cost_tr.get("flops", 0.0),
            cost_tr.get("bytes_accessed", 0.0), per_step,
        )
    except Exception as e:  # diagnostics must never break the benchmark line
        log(f"train-step diagnostic failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "greedy_captions_per_sec_per_chip",
                "value": round(captions_per_sec, 2),
                "unit": "captions/s",
                "vs_baseline": round(captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
