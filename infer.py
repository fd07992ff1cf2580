#!/usr/bin/env python
"""Single-image inference entry point (reference: `python infer.py "<url>"`)."""

import argparse

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.inference import infer as infer_mod
from myimagecaptioningmodel_tpu.utils import env


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("url", help="image URL or local path")
    ap.add_argument("--config", default=None, help="path to a JSON config")
    ap.add_argument("--bundle", default="infer",
                    help="inference bundle name (e.g. infer_ema)")
    ap.add_argument("--beam", type=int, default=0, help="beam size (0/1 = greedy)")
    ap.add_argument("--quantize", action="store_true", help="int8 decoder weights")
    ap.add_argument(
        "--early-stop", action="store_true",
        help="greedy decode exits once every row emitted <stop> (same caption)",
    )
    ap.add_argument(
        "--length-norm", type=float, default=0.0,
        help="beam only: normalize final scores by len**alpha (0 = off)",
    )
    args = ap.parse_args()
    cfg = config_mod.Config.from_json_file(args.config) if args.config else config_mod.default
    env.enable_compilation_cache()
    infer_mod.main(
        args.url, cfg, bundle=args.bundle, beam_size=args.beam,
        quantize=args.quantize, early_stop=args.early_stop,
        length_norm=args.length_norm,
    )


if __name__ == "__main__":
    main()
