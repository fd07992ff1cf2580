#!/usr/bin/env python
"""Training entry point (reference: `python train.py`).

Optionally pass a JSON config: `python train.py --config my_config.json`.
"""

import argparse

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.training import loop
from myimagecaptioningmodel_tpu.utils import env


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="path to a JSON config")
    args = ap.parse_args()
    cfg = config_mod.Config.from_json_file(args.config) if args.config else config_mod.default
    env.enable_compilation_cache()
    loop.train(cfg)


if __name__ == "__main__":
    main()
