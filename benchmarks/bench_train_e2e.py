#!/usr/bin/env python
"""End-to-end training throughput: real shards -> feeder -> TPU train step.

`train_roofline.md` measures the device step alone (~4.2k img/s) and
`feed_roofline.md` the host feed alone; this runs them OVERLAPPED the way
`training/loop.py` does (prefetch thread + double-buffered device_put +
jitted step) and reports sustained images/s — the number an actual epoch
runs at.

Usage: python benchmarks/bench_train_e2e.py [--images 1536] [--batch 128]
       [--configs ref opt]
  ref = reference storage contract (gzip/float16, serial reads, host convert)
  opt = lzf/uint8 + reader_threads=4 + device_convert
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_feed import build_dataset  # synthetic shards at real dims

from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder
from myimagecaptioningmodel_tpu.data.reader import DataReader


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def run_config(root, name, codec, dtype, threads, device_convert,
               n_images, batch, steps_fn):
    import jax

    cfg, _names = build_dataset(root, n_images, codec, dtype)
    reader = DataReader(cfg)
    reader.init_hdf5()

    params, opt_state, state, step = steps_fn.fresh()
    feeder = PrefetchingFeeder(
        reader.get_reader(batch, "train", keep_float16=True,
                          reader_threads=threads),
        capacity=4,
        image_norm=reader.storage_norm,
        device_convert=device_convert,
    )

    done = warm = 0
    t0 = None
    loss = None
    for imgs, caps in feeder:
        caps = caps.astype(np.int32)
        params, opt_state, state, step, loss, _lr = steps_fn.step(
            params, opt_state, state, step, imgs, caps
        )
        if warm < 2:  # let compile + pipeline fill happen off the clock
            warm += 1
            jax.block_until_ready(loss)
            t0 = time.time()
            continue
        done += 1
    jax.block_until_ready(loss)
    dt = time.time() - t0
    rate = done * batch / dt
    log(f"{name} ({codec}/{dtype}, threads={threads}, "
        f"device_convert={device_convert}): {rate:.0f} img/s sustained "
        f"({done} steps of {batch})")
    return rate


class Steps:
    """Real-dims train step (same construction as bench.py's diagnostic)."""

    def __init__(self, batch):
        import jax
        import jax.numpy as jnp
        import optax

        from myimagecaptioningmodel_tpu import config as config_mod
        from myimagecaptioningmodel_tpu.models import captioner
        from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
        from myimagecaptioningmodel_tpu.parallel.train_step import build_steps
        from myimagecaptioningmodel_tpu.training import lr_schedules

        self.jnp = jnp
        self.jax = jax
        cfg = config_mod.Config()
        self.opts = ModelOptions.from_config(cfg)
        self.captioner = captioner
        schedule = lr_schedules.constant(5e-5)
        self.optimizer = optax.adam(schedule)
        # donate=False: params/opt_state re-used across feeder variants
        self.steps = build_steps(self.opts, self.optimizer, schedule,
                                 mesh=None, donate=False)

    def fresh(self):
        params, state = self.captioner.init(self.jax.random.PRNGKey(0), self.opts)
        return (params, self.optimizer.init(params), state,
                self.jnp.zeros((), self.jnp.int32))

    def step(self, params, opt_state, state, step, imgs, caps):
        return self.steps.train_step(params, opt_state, state, step, imgs, caps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1536)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--configs", nargs="*", default=["ref", "opt"])
    args = ap.parse_args()

    import jax

    log(f"device: {jax.devices()[0]}, host cores: {os.cpu_count()}")
    # caption length must match the real model's sentence_length
    steps_fn = Steps(args.batch)

    root = tempfile.mkdtemp(prefix="train_e2e_")
    try:
        if "ref" in args.configs:
            run_config(root, "reference-contract", "gzip", "float16",
                       threads=0, device_convert=False,
                       n_images=args.images, batch=args.batch,
                       steps_fn=steps_fn)
        if "opt" in args.configs:
            run_config(root, "optimized", "lzf", "uint8",
                       threads=4, device_convert=True,
                       n_images=args.images, batch=args.batch,
                       steps_fn=steps_fn)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
