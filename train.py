#!/usr/bin/env python
"""Training entry point (reference: `python train.py`).

Optionally pass a JSON config: `python train.py --config my_config.json`.

Multi-host (TPU pods / GKE: run the same command on every host):

    python train.py --config my_config.json --distributed

`--distributed` joins the `jax.distributed` cluster before training (on TPU
pods every argument is discovered from the environment; use
--coordinator/--num-processes/--process-id for manual clusters). The
training loop then shards the feed per host, writes checkpoints from
process 0 only, and reduces dev metrics across processes
(training/loop.py multi-host mode).
"""

import argparse

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.training import loop
from myimagecaptioningmodel_tpu.utils import env


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="path to a JSON config")
    ap.add_argument(
        "--distributed", action="store_true",
        help="join the jax.distributed cluster (multi-host training)",
    )
    ap.add_argument("--coordinator", default=None,
                    help="coordinator address host:port (default: discover)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()
    if args.distributed:
        from myimagecaptioningmodel_tpu.parallel import distributed

        distributed.initialize(
            args.coordinator, args.num_processes, args.process_id
        )
    cfg = config_mod.Config.from_json_file(args.config) if args.config else config_mod.default
    env.enable_compilation_cache()
    loop.train(cfg)


if __name__ == "__main__":
    main()
