"""Frozen serving artifact: serialized StableHLO of the decode program.

The reference exports a *frozen inference program* — graph plus weights in
one artifact, loadable without the training code (``save_inference_model``,
train.py:81-82; consumed by evaluate.py:49-51 and infer.py:29-31). The
rebuild's inference bundle (params + config + vocab) is the flexible
analog; this module is the frozen one: ``jax.export`` serializes the greedy
(or beam) decode as StableHLO with the weights baked in as constants, so a
serving process can run captions with nothing but jax and the artifact —
no model code, no pytrees, stable across JAX versions per StableHLO's
compatibility guarantees.

The exported function maps a raw image batch -> caption ids [B, T]:
``prepare_images`` semantics are baked in, so the serving caller may ship
float32 NHWC (the reference feed contract) or raw float16/uint8 NCHW
storage rows (uint8 needs the bundle's recorded image_norm, also baked in).

CLI:
    python -m myimagecaptioningmodel_tpu.inference.export_stablehlo \
        <ckpt>/infer out.shlo [--config cfg.json] [--batch 8] [--beam N] \
        [--platforms cpu,tpu] [--dtype float32|float16|uint8]

Loading (no framework code needed):
    from jax import export
    ids = export.deserialize(open("out.shlo","rb").read()).call(images)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_decode(
    cfg,
    bundle: str = "infer",
    batch_size: int = 8,
    beam_size: int = 0,
    platforms: Optional[Sequence[str]] = None,
    image_dtype: str = "float32",
    quantize: bool = False,
):
    """-> jax.export.Exported for the bundle's decode at fixed batch shape.

    ``image_dtype``: the input contract to freeze — "float32" (NHWC, the
    reference feed), or "float16"/"uint8" (raw NCHW storage rows; the
    on-device convert/normalize is part of the program).
    """
    from jax import export as jexport

    from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle

    params, state, _bcfg, opts, _decode = load_bundle(
        cfg, bundle, beam_size, quantize=quantize
    )
    # Pallas custom calls would pin the artifact to one libtpu; export the
    # portable XLA path (StableHLO-only, multi-platform serializable).
    opts = opts._replace(use_pallas=False)

    if beam_size and beam_size > 1:
        from myimagecaptioningmodel_tpu.inference.beam import beam_decode

        def fn(images):
            return beam_decode(params, state, images, opts, beam_size,
                               stop_idx=opts.stop_idx)[0]

    else:
        from myimagecaptioningmodel_tpu.models import captioner

        def fn(images):
            return captioner.greedy_decode(params, state, images, opts)

    shape_cfg = cfg.data.image_shape
    if image_dtype == "float32":  # reference feed contract: NHWC f32
        spec = jax.ShapeDtypeStruct(
            (batch_size, shape_cfg[0], shape_cfg[1], 3), jnp.float32
        )
    elif image_dtype in ("float16", "uint8"):  # raw storage rows: NCHW
        spec = jax.ShapeDtypeStruct(
            (batch_size, 3, shape_cfg[0], shape_cfg[1]), jnp.dtype(image_dtype)
        )
    else:
        raise ValueError(f"unsupported image_dtype {image_dtype!r}")

    kwargs = {}
    if platforms:
        kwargs["platforms"] = list(platforms)
    else:
        plat = jax.default_backend()
        if plat not in ("cpu", "tpu", "cuda", "rocm"):
            # tunneled/experimental platforms (e.g. "axon") expose TPU
            # devices under a custom backend name jax.export doesn't know;
            # lower for the canonical platform instead
            is_tpu = any("tpu" in str(d).lower() for d in jax.devices())
            kwargs["platforms"] = ["tpu" if is_tpu else "cpu"]
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def export_to_file(path: str, exported) -> int:
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    from myimagecaptioningmodel_tpu import config as config_mod

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("bundle_dir", help="inference bundle dir (…/infer)")
    ap.add_argument("out", help="output .shlo path")
    ap.add_argument("--config", help="JSON config file")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. cpu,tpu (default: current backend)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16", "uint8"],
                    help="frozen input contract (f32 NHWC or raw NCHW rows)")
    ap.add_argument("--quantize", action="store_true",
                    help="int8-quantize the decoder weights before freezing")
    args = ap.parse_args(argv)

    cfg = (
        config_mod.Config.from_json_file(args.config)
        if args.config
        else config_mod.default
    )
    # bundle_dir = <checkpoint_path>/<bundle name>
    bundle = os.path.basename(os.path.normpath(args.bundle_dir))
    ckpt_path = os.path.dirname(os.path.normpath(args.bundle_dir))
    if ckpt_path:
        cfg = config_mod.replace_nested(cfg, "train.checkpoint_path", ckpt_path)

    platforms = [p for p in args.platforms.split(",") if p] or None
    exported = export_decode(
        cfg, bundle, args.batch, args.beam, platforms, args.dtype,
        args.quantize,
    )
    n = export_to_file(args.out, exported)
    print(
        f"wrote {args.out}: {n} bytes, platforms={list(exported.platforms)}, "
        f"in={exported.in_avals}, out={exported.out_avals}"
    )


if __name__ == "__main__":
    main()
