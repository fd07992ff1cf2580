#!/usr/bin/env python
"""Offline BLEU-1..4 evaluation entry point (reference: `python evaluate.py`).

Multi-host (run the same command on every pod host): `--distributed` joins
the `jax.distributed` cluster first; evaluate() then decodes the host's
slice of each test batch on its local devices and reduces the scores, so
every process prints identical BLEU/diversity numbers.
"""

import argparse

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
from myimagecaptioningmodel_tpu.utils import env


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="path to a JSON config")
    ap.add_argument("--bundle", default="infer", help="inference bundle name")
    ap.add_argument("--mode", default="test", choices=["dev", "test"],
                    help="which split to score (reference evaluates test)")
    ap.add_argument("--beam", type=int, default=0, help="beam size (0/1 = greedy)")
    ap.add_argument("--quantize", action="store_true", help="int8 decoder weights")
    ap.add_argument(
        "--quantize-kv", action="store_true",
        help="stream cross-attention K/V as int8 (transformer + fused "
        "greedy decode; approximate serving mode)",
    )
    ap.add_argument(
        "--early-stop", action="store_true",
        help="greedy decode exits once every row emitted <stop> (same captions)",
    )
    ap.add_argument(
        "--length-norm", type=float, default=0.0,
        help="beam only: normalize final scores by len**alpha (0 = off)",
    )
    ap.add_argument(
        "--distributed", action="store_true",
        help="join the jax.distributed cluster (multi-host evaluation)",
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
    # mesh="auto": on a multi-chip host the decode batch shards over all
    # visible devices (the reference's eval ParallelExecutor behavior,
    # train.py:119-127); single-chip hosts run unsharded.
    evaluate_mod.evaluate(
        cfg, bundle=args.bundle, mode=args.mode, beam_size=args.beam,
        quantize=args.quantize, early_stop=args.early_stop, mesh="auto",
        length_norm=args.length_norm, quantize_kv=args.quantize_kv,
    )


if __name__ == "__main__":
    main()
