"""Offline test-set BLEU-1..4 evaluator (reference evaluate.py:45-78).

Loads the exported inference bundle, streams the test split, greedy-decodes
on device, scores BLEU-1..4 (separate weight vectors) + their mean on the
host, and optionally counts distinct sentences (mode-collapse diagnostic).

The bundle is read from ONE canonical name (default ``infer``); the
reference hardcoded ``infer_meteor``, which no writer produced
(SURVEY §2.2 quirk 5).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from myimagecaptioningmodel_tpu.data import reader as reader_datamod
from myimagecaptioningmodel_tpu.data.reader import DataReader
from myimagecaptioningmodel_tpu.evaluation import metrics
from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt


def load_bundle(cfg, bundle: str = "infer", beam_size: int = 0, quantize: bool = False,
                early_stop: bool = False, mesh=None, length_norm: float = 0.0,
                quantize_kv: bool = False):
    """-> (params, model_state, bundle_cfg, opts, decode_fn).

    ``beam_size`` 0/1 -> greedy; >1 -> beam search (north-star addition).
    ``quantize`` stores the decoder weights as int8 (per-channel scales,
    ops/quantization.py): ~4x smaller serving footprint, captions unchanged
    up to quantization noise. ``quantize_kv`` (transformer + fused greedy
    decode only) additionally streams the cross-attention K/V as
    per-channel int8 — an approximate serving mode; captions can differ
    within the quantization grid. ``early_stop`` uses the while_loop greedy
    decode that exits when every row has emitted <stop>. ``length_norm``
    (beam only): GNMT-style final-score normalization by len**alpha —
    0 keeps the reference-flavored raw sum-log-prob pick. With a ``mesh``
    (SURVEY config #5: multi-chip evaluation), the batch shards over the
    ``data`` axis and params replicate — GSPMD splits the decode."""
    # Model options come from the bundle's OWN recorded config (the bundle is
    # a self-contained artifact — its dims/parity/dtype must not silently
    # change under a caller cfg; e.g. imported reference checkpoints pin
    # parity_mode on, compat/paddle_import.py). Paths/batching stay caller's.
    directory = os.path.join(cfg.train.checkpoint_path, bundle)
    from myimagecaptioningmodel_tpu.config import Config

    bundle_cfg_path = os.path.join(directory, "config.json")
    opts_cfg = (
        Config.from_json_file(bundle_cfg_path)
        if os.path.exists(bundle_cfg_path)
        else cfg
    )
    opts = ModelOptions.from_config(opts_cfg)
    if early_stop:
        # greedy: while_loop exit once all rows emitted <stop>; beam: exit
        # once every beam is finished (identical captions either way)
        opts = opts._replace(early_stop_decode=True)
    if quantize_kv:
        if opts.arch != "transformer":
            raise ValueError(
                "quantize_kv is a transformer-family serving mode (the LSTM "
                "decoder has no streamed cross-attention K/V)"
            )
        if beam_size and beam_size > 1:
            raise ValueError("quantize_kv covers greedy decode only")
        opts = opts._replace(quantize_kv=True)
    like_params, like_state = captioner.init(jax.random.PRNGKey(0), opts)
    params, model_state, bundle_cfg = ckpt.load_inference_bundle(
        directory, like_params, like_state
    )
    if quantize:
        params = dict(params)
        if opts.arch == "transformer":
            from myimagecaptioningmodel_tpu.models.transformer import (
                quantize_transformer_decoder,
            )

            params["decoder"] = quantize_transformer_decoder(params["decoder"])
        else:
            from myimagecaptioningmodel_tpu.ops.quantization import quantize_decoder

            params["decoder"] = quantize_decoder(params["decoder"])
    data_only_mesh = True
    if mesh is not None:
        from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod

        data_only_mesh = mesh.shape.get(mesh_mod.MODEL_AXIS, 1) == 1
        if not data_only_mesh:
            # Model-parallel mesh: GSPMD path below; Pallas kernels are not
            # annotated for the SPMD partitioner, use the XLA decode
            opts = opts._replace(use_pallas=False)

    if beam_size and beam_size > 1:
        from myimagecaptioningmodel_tpu.inference.beam import beam_decode

        decode_fn = lambda p, s, imgs: beam_decode(
            p, s, imgs, opts, beam_size, length_norm=length_norm,
            stop_idx=opts.stop_idx,
        )[0]
    else:
        decode_fn = lambda p, s, imgs: captioner.greedy_decode(p, s, imgs, opts)

    if mesh is not None:
        if data_only_mesh:
            # Data-only mesh: run the WHOLE decode per shard via shard_map —
            # each chip executes the full program (including the fused
            # Pallas kernels, which the SPMD partitioner can't split but a
            # manual per-shard program runs natively) on its local batch
            # rows. Decode is batch-parallel with zero collectives.
            from jax.sharding import PartitionSpec as P

            n_shards = mesh.shape[mesh_mod.DATA_AXIS]
            per_shard = cfg.train.batch_size // max(n_shards, 1)
            if per_shard < 8 or per_shard % 8:
                import warnings

                warnings.warn(
                    f"per-shard batch {per_shard} misses the fused-kernel "
                    "gate (needs a multiple of 8, >= 8); multi-chip decode "
                    "will run the unfused XLA path per shard",
                    stacklevel=2,
                )
            decode = jax.jit(
                jax.shard_map(
                    decode_fn,
                    mesh=mesh,
                    in_specs=(P(), P(), P(mesh_mod.DATA_AXIS)),
                    out_specs=P(mesh_mod.DATA_AXIS),
                    check_vma=False,
                )
            )
        else:
            # Model-parallel mesh (e.g. vocab-TP): params are sharded, so
            # fall back to GSPMD (use_pallas already off above). Per-chip
            # batches still saturate the chips.
            repl = mesh_mod.replicated(mesh)
            batch = mesh_mod.batch_sharding(mesh)
            decode = jax.jit(
                decode_fn, in_shardings=(repl, repl, batch), out_shardings=batch
            )
    else:
        decode = jax.jit(decode_fn)
    return params, model_state, bundle_cfg, opts, decode


def evaluate(
    cfg=None, bundle: str = "infer", mode: str = "test", beam_size: int = 0,
    quantize: bool = False, mesh=None, early_stop: bool = False,
    length_norm: float = 0.0, quantize_kv: bool = False,
) -> Dict[str, object]:
    """-> {'bleu': [b1,b2,b3,b4,mean], 'cider': float, 'distinct_sentences': int|None}.

    ``mesh``: a ``jax.sharding.Mesh`` for multi-chip evaluation (the batch
    shards over the data axis), or "auto" to build one when the batch
    divides the visible devices. ``early_stop``: greedy decode exits once
    every row has emitted <stop> (identical captions, ~2x average latency
    win on real captions shorter than infer_max_length).

    **Multi-host**: with ``jax.distributed`` initialized and a mesh spanning
    all processes, the DECODE distributes (each host feeds its slice of
    every global batch; that is the expensive part) and the decoded id
    arrays — tiny [B, T] int32s — are allgathered so every host scores the
    full corpus identically. Scoring is replicated, not sharded, which
    keeps CIDEr's corpus-global IDF exact and makes every process return
    the same numbers as a single-process run."""
    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.parallel import distributed

    cfg = cfg or config_mod.default
    n_proc = jax.process_count()
    if mesh == "auto":
        from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod

        n = len(jax.devices())
        mesh = (
            mesh_mod.make_mesh()
            if n > 1 and cfg.train.batch_size % n == 0
            else None
        )
    multihost = n_proc > 1 and mesh is not None
    if n_proc > 1 and mesh is None:
        raise ValueError(
            "multi-process evaluate requires a mesh spanning all processes"
        )
    params, model_state, _bcfg, opts, decode = load_bundle(
        cfg, bundle, beam_size, quantize, early_stop=early_stop, mesh=mesh,
        length_norm=length_norm, quantize_kv=quantize_kv,
    )
    if multihost:
        from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod

        if cfg.train.batch_size % n_proc:
            raise ValueError(
                f"batch_size {cfg.train.batch_size} must divide evenly over "
                f"{n_proc} processes for multi-host evaluate"
            )
        repl = mesh_mod.replicated(mesh)
        batch_sharding = mesh_mod.batch_sharding(mesh)
        params = distributed.put_tree(params, repl)
        model_state = distributed.put_tree(model_state, repl)
        proc_idx = jax.process_index()
        lb = cfg.train.batch_size // n_proc
        from jax.experimental import multihost_utils

    dr = DataReader(cfg)
    index_word = dr.index_word
    batch_size = cfg.train.batch_size
    dr.init_hdf5()
    # Feed raw storage rows (f16/u8 NCHW) when safe: the decode fn's
    # prepare_images converts on device (4-8x less H2D than f32 NHWC).
    # uint8 rows need the model's image_norm to match the shards' recorded
    # normalization; fall back to host normalization when it doesn't.
    info = dr._hdf5.storage_info
    raw_ok = bool(info.get("normalized", True))
    if not raw_ok and opts.image_norm is not None:
        mean, std = dr.storage_norm
        raw_ok = np.allclose(mean, opts.image_norm[0]) and np.allclose(
            std, opts.image_norm[1]
        )
    reader = dr.get_reader(
        batch_size, mode, keep_float16=raw_ok,
        reader_threads=cfg.train.reader_threads,
    )

    bleu_score = [0.0] * 5
    sentences = set()
    batches = 0
    cider_cands: list = []
    cider_refs: list = []

    # software-pipelined: device decodes batch i+1 while the host scores
    # batch i (4x NLTK-style BLEU per batch is the host hot loop)
    def score(ids_dev, refs, n):
        nonlocal batches
        if multihost:
            # distributed decode -> replicated scoring: gather every host's
            # slice of the decoded ids (process order == global row order)
            local = distributed.local_rows(ids_dev)
            ids = (
                np.asarray(multihost_utils.process_allgather(local))
                .reshape(-1, local.shape[-1])[:n]
            )
        else:
            ids = np.asarray(jax.device_get(ids_dev))[:n]
        for i, vec in enumerate(metrics.BLEU_WEIGHT_VECTORS):
            bleu_score[i] += metrics.calc_bleu(
                ids, refs, index_word, vec,
                stop_idx=cfg.data.stop_idx, padding_idx=cfg.data.padding_idx,
            )
        for row, r in zip(ids.tolist(), refs):
            words = metrics.filter_ids(
                row, index_word, cfg.data.stop_idx, cfg.data.padding_idx
            )
            cider_cands.append(words)
            cider_refs.append(list(r))
            if cfg.evaluate.sentence_statistics:
                sentences.add(metrics.words2sentence(words))
        batches += 1

    pending = None
    for batch in reader():
        imgs, refs = reader_datamod.as_image_batch(batch)
        n = len(imgs)
        if n < batch_size:
            pad = np.zeros((batch_size - n, *imgs.shape[1:]), imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        if multihost:
            # every process streams the SAME global batches (duplicate host
            # reads keep ordering trivially identical); each feeds only its
            # own contiguous slice of the globally-sharded decode input
            local = imgs[proc_idx * lb : (proc_idx + 1) * lb]
            imgs = jax.make_array_from_process_local_data(
                batch_sharding, local, (batch_size, *local.shape[1:])
            )
        ids_dev = decode(params, model_state, imgs)
        if pending is not None:
            score(*pending)
        pending = (ids_dev, refs, n)
    if pending is not None:
        score(*pending)

    for i in range(4):
        bleu_score[i] /= max(batches, 1)
    bleu_score[4] = sum(bleu_score[:4]) / 4

    from myimagecaptioningmodel_tpu.evaluation.cider import CiderD

    cider, _per_image = CiderD().score(cider_cands, cider_refs)

    print("BLEU [{:.7f}, {:.7f}, {:.7f}, {:.7f}] {:.7f}".format(*bleu_score))
    print(f"CIDEr-D: {cider:.7f}")
    distinct = None
    if cfg.evaluate.sentence_statistics:
        distinct = len(sentences)
        print(f"distinct sentences: {distinct}")
    return {"bleu": bleu_score, "cider": cider, "distinct_sentences": distinct}


if __name__ == "__main__":
    evaluate()
