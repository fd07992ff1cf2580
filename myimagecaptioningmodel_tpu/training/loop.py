"""Training driver (reference train.py:26-181, SURVEY §3.1).

Epoch loop with the reference's observable behavior:
- per-step NaN-loss guard (train.py:140-141) — checked with a one-step delay
  so the host never blocks the device pipeline on the current step;
- per-``log_every_n_step`` mean/step loss + LR logging (train.py:145-148);
- per-epoch dev-set greedy decode + BLEU + distinct-sentence count
  (train.py:152-169);
- checkpoint / optional backup / params export / inference-bundle export /
  best-BLEU copies (train.py:68-91);
- crash-resume at epoch granularity. Unlike the reference (which keys
  ``is_first_init`` off the Logger's side JSON and can re-init from scratch
  if it dies between "epoch 1 saved" and "epoch 2 started"), resume state
  here is carried in the checkpoint itself: ``meta.next_epoch``/``step``
  (SURVEY §5.3 rebuild note);
- the "encoder just unfroze -> reload its pretrained weights" transition
  (train.py:103-107).

Divergence: the final partial train batch of an epoch is dropped (static
shapes keep one compiled executable); the reference feeds it through. At the
reference scale that is 4 of 944,996 samples per epoch.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from myimagecaptioningmodel_tpu.data.feeder import PrefetchingFeeder
from myimagecaptioningmodel_tpu.data import reader as reader_mod
from myimagecaptioningmodel_tpu.data.reader import DataReader
from myimagecaptioningmodel_tpu.evaluation import metrics
from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.parallel import distributed
from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod
from myimagecaptioningmodel_tpu.parallel.train_step import build_steps, make_optimizer
from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
from myimagecaptioningmodel_tpu.training import lr_schedules
from myimagecaptioningmodel_tpu.training.logger import Logger
from myimagecaptioningmodel_tpu.utils.profiling import StepTimer


@jax.jit
def _all_finite(tree) -> jnp.ndarray:
    """Single-dispatch finiteness check over every float leaf of a pytree."""
    leaves = [
        jnp.all(jnp.isfinite(leaf))
        for leaf in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
    ]
    return jnp.all(jnp.stack(leaves)) if leaves else jnp.asarray(True)


def _dev_eval(decode_fn, params, model_state, reader_gen, index_word, batch_size,
              stop_idx, padding_idx, multihost=None):
    """Per-epoch dev greedy decode + BLEU + distinct sentences
    (reference train.py:152-167). Pads the final partial batch to keep one
    compiled decode executable; metrics only see the real rows.

    The loop is software-pipelined: the device decodes batch i+1 while the
    host scores batch i (host-side BLEU is the eval hot loop, SURVEY §7).

    ``multihost=(proc_idx, n_proc, batch_sharding)``: every process streams
    the SAME global dev batches (dev is ~5% of the data, so duplicate host
    reads are cheap and keep ordering trivially identical), feeds its own
    slice to the globally-sharded decode, scores only the rows it owns via
    the decomposable ``calc_bleu_rows``, and the per-row sums / sentence
    sets are reduced across processes at the end — bit-equal to the
    single-process number."""
    bleu_total, batches = 0.0, 0
    sentences = set()
    if multihost is not None:
        proc_idx, n_proc, batch_sharding = multihost
        lb = batch_size // n_proc

    def score(ids_dev, refs, n):
        nonlocal bleu_total, batches
        batches += 1
        if multihost is None:
            ids = np.asarray(jax.device_get(ids_dev))[:n]
            refs_here = refs
        else:
            lo, hi = proc_idx * lb, min(n, (proc_idx + 1) * lb)
            valid = max(0, hi - lo)
            ids = distributed.local_rows(ids_dev)[:valid]
            refs_here = refs[lo:hi]
        row_sum, _rows = metrics.calc_bleu_rows(
            ids, refs_here, index_word, stop_idx=stop_idx, padding_idx=padding_idx
        )
        bleu_total += row_sum / n
        for row in ids.tolist():
            sentences.add(
                metrics.words2sentence(
                    metrics.filter_ids(row, index_word, stop_idx, padding_idx)
                )
            )

    pending = None
    for batch in reader_gen():
        imgs, refs = reader_mod.as_image_batch(batch)
        n = len(imgs)
        # raw storage rows (f16/u8 NCHW) go to the device as-is: the decode
        # fn's prepare_images fuses transpose/convert/normalize on device,
        # cutting eval H2D traffic 4-8x vs a host-converted f32 NHWC batch
        if n < batch_size:
            pad = np.zeros((batch_size - n, *imgs.shape[1:]), imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        if multihost is not None:
            local = imgs[proc_idx * lb : (proc_idx + 1) * lb]
            imgs = jax.make_array_from_process_local_data(
                batch_sharding, local, (batch_size, *local.shape[1:])
            )
        ids_dev = decode_fn(params, model_state, imgs)  # async dispatch
        if pending is not None:
            score(*pending)
        pending = (ids_dev, refs, n)
    if pending is not None:
        score(*pending)
    if multihost is not None:
        bleu_total = float(distributed.sum_across_processes([bleu_total])[0])
        distinct = distributed.global_distinct_count(sentences)
    else:
        distinct = len(sentences)
    if batches == 0:
        return 0.0, 0
    return bleu_total / batches, distinct


def save_model(
    cfg, logger: Logger, params, opt_state, model_state, epoch: int, step: int,
    eval_bleu: Optional[float] = None,
) -> None:
    """Checkpoint/export policy, reference train.py:68-91."""
    p = cfg.train.checkpoint_path
    meta = {
        "next_epoch": epoch + 1,
        "step": int(step),
        "best_bleu": logger.best_bleu,
        "best_meteor": logger.best_meteor,
        "train_encoder": logger.train_encoder,
    }
    ckpt.save_checkpoint(os.path.join(p, "checkpoint"), params, opt_state, model_state, meta)

    n = cfg.train.checkpoint_backup_every_n_epoch
    if n and epoch % n == 0:
        ckpt.save_checkpoint(
            os.path.join(p, f"checkpoint{epoch}"), params, opt_state, model_state, meta
        )
    if cfg.train.export_params:
        ckpt.save_params(os.path.join(p, "params", ckpt.PARAMS_FILE), params)
    if cfg.train.export_infer_model:
        ckpt.export_inference_bundle(
            os.path.join(p, "infer"), params, model_state, cfg, cfg.data.dict_path
        )
        # EMA weights (train.ema_decay > 0): a second serving bundle with the
        # averaged params — evaluate/infer pick it via bundle="infer_ema"
        from myimagecaptioningmodel_tpu.parallel.train_step import (
            ema_params_from_opt_state,
        )

        ema = ema_params_from_opt_state(opt_state)
        if ema is not None:
            ckpt.export_inference_bundle(
                os.path.join(p, "infer_ema"), ema, model_state, cfg,
                cfg.data.dict_path,
            )
    if cfg.train.save_best_bleu_checkpoint and eval_bleu is not None:
        if eval_bleu > logger.best_bleu:
            logger.best_bleu = eval_bleu
            meta["best_bleu"] = eval_bleu
            ckpt.save_checkpoint(
                os.path.join(p, "checkpoint_best_bleu"),
                params, opt_state, model_state, meta,
            )
            if cfg.train.export_infer_model:
                ckpt.export_inference_bundle(
                    os.path.join(p, "infer_bleu"), params, model_state, cfg,
                    cfg.data.dict_path,
                )


def train(
    cfg=None,
    mesh="auto",
    max_steps_per_epoch: Optional[int] = None,
    fault_injection_step: Optional[int] = None,
) -> dict:
    """Run training to ``max_epoch``; returns a summary dict.

    ``mesh='auto'`` builds a mesh over all visible devices when the batch
    divides evenly — data-parallel by default, (data, model) when
    ``cfg.train.model_parallel > 1`` (vocab-TP). Pass an explicit Mesh, or
    None for single-device.

    **Multi-host**: when ``jax.distributed`` is initialized with more than
    one process (parallel/distributed.initialize on every host before
    calling this), the same call becomes a multi-host data-parallel run:
    ``cfg.train.batch_size`` stays the GLOBAL batch, each process reads only
    its rows of every global batch (reader ``process_shard``), the global
    batch array is assembled from process-local data (no cross-host feed
    traffic), gradient psum rides ICI/DCN via GSPMD, only process 0 writes
    checkpoints/exports/logs, and dev-eval metrics are reduced across
    processes (bit-equal to the single-process numbers). Requires a shared
    filesystem for checkpoint/resume, and per-step losses match the
    single-process DP run exactly (tests/test_multihost.py).

    ``fault_injection_step`` (testing, SURVEY §5.3: the reference has no
    fault injection) raises RuntimeError after that many global steps —
    used to validate mid-epoch crash-resume equivalence.
    """
    from myimagecaptioningmodel_tpu import config as config_mod

    cfg = cfg or config_mod.default
    opts = ModelOptions.from_config(cfg)
    accum = int(getattr(cfg.train, "grad_accum_steps", 1) or 1)
    if accum > 1 and cfg.train.batch_size % accum:
        raise ValueError(
            f"batch_size {cfg.train.batch_size} not divisible by "
            f"grad_accum_steps {accum}"
        )
    if mesh == "auto":
        mp = max(1, int(cfg.train.model_parallel))
        if mp > 1 and len(jax.devices()) % mp != 0:
            raise ValueError(
                f"model_parallel={mp} does not divide the "
                f"{len(jax.devices())} devices"
            )
    n_proc = jax.process_count()
    is_main = distributed.is_main_process()
    logger = Logger(cfg.log.log_path, opts.encoder_trainable, write=is_main)
    data_reader = DataReader(cfg)

    data_reader.init_hdf5()
    if not data_reader._hdf5.storage_info.get("normalized", True):
        # raw uint8 shards: the mean/std stamped into the shard attrs at
        # build time are authoritative (they define what the pixels mean).
        # Pin them into the model options so the device_convert path
        # (prepare_images) normalizes identically to the host path, even if
        # the current config's image_mean/std have drifted.
        shard_norm = data_reader.storage_norm
        if opts.image_norm is not None and not (
            np.allclose(shard_norm[0], opts.image_norm[0])
            and np.allclose(shard_norm[1], opts.image_norm[1])
        ):
            logger.log(
                "WARNING: config image_mean/std differ from the dataset's "
                f"recorded normalization; using the shard attrs {shard_norm}"
            )
        opts = opts._replace(image_norm=shard_norm)
        # pin the same normalization into the cfg that save_model exports:
        # every bundle consumer (evaluate, server, export_stablehlo --dtype
        # uint8 which FREEZES the norm into the serving program) must see
        # the normalization actually used in training, not the drifted
        # config values
        cfg = config_mod.replace_nested(
            cfg, "data.image_mean", tuple(float(v) for v in shard_norm[0])
        )
        cfg = config_mod.replace_nested(
            cfg, "data.image_std", tuple(float(v) for v in shard_norm[1])
        )

    if mesh == "auto":
        n = len(jax.devices())
        mp = max(1, int(cfg.train.model_parallel))
        data_size = n // mp
        mesh = (
            mesh_mod.make_mesh(model_parallel=mp)
            if n > 1 and cfg.train.batch_size % data_size == 0
            else None
        )
    if n_proc > 1 and mesh is None:
        raise ValueError(
            "multi-process training requires a device mesh spanning all "
            "processes (is the global batch divisible by the device count?)"
        )
    multihost = n_proc > 1 and mesh is not None
    if multihost and cfg.train.batch_size % n_proc != 0:
        raise ValueError(
            f"global batch {cfg.train.batch_size} must divide evenly over "
            f"{n_proc} processes"
        )

    schedule = lr_schedules.from_config(cfg)
    optimizer = make_optimizer(cfg, schedule)

    seed = cfg.train.seed
    params, model_state = captioner.init(jax.random.PRNGKey(seed or 0), opts)
    opt_state = optimizer.init(params)
    step = jnp.zeros((), jnp.int32)
    start_epoch = 1

    # vocab-TP shardings (model axis > 1): embedding table / out bias split
    # over the vocab dim, their Adam moments matched by tree path
    p_sh = o_sh = None
    if mesh is not None and mesh.shape.get(mesh_mod.MODEL_AXIS, 1) > 1:
        if multihost:
            raise NotImplementedError(
                "vocab-TP + multi-host in one run is not supported: "
                "checkpoint writes fetch TP-sharded params, which are not "
                "process-addressable (use TP within a host, DP across)"
            )
        mp = mesh.shape[mesh_mod.MODEL_AXIS]
        p_sh = mesh_mod.param_shardings(mesh, params)
        o_sh = mesh_mod.opt_state_shardings(mesh, opt_state, params, p_sh)
        vocab_rows = params["decoder"]["embedding"]["table"].shape[0]
        if vocab_rows % mp != 0:
            raise ValueError(
                f"padded vocab {vocab_rows} not divisible by model_parallel="
                f"{mp}; set model.decoder.vocab_pad_multiple to a multiple"
            )
    steps = build_steps(
        opts, optimizer, schedule, mesh, params_sharding=p_sh, opt_sharding=o_sh,
        grad_accum_steps=accum,
    )

    resume_skip_batches = 0  # mid-epoch resume fast-forward
    ckpt_dir = os.path.join(cfg.train.checkpoint_path, "checkpoint")
    if multihost:
        # crash-debris recovery (checkpoint._recover) mutates shared storage;
        # run it on process 0 alone, then barrier so the other processes see
        # a clean checkpoint dir before they look at it
        if is_main:
            ckpt.checkpoint_exists(ckpt_dir)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("checkpoint-recovery")
    if ckpt.checkpoint_exists(ckpt_dir):
        params, opt_state, model_state, meta = ckpt.load_checkpoint(
            ckpt_dir, params, opt_state, model_state
        )
        step = jnp.asarray(meta["step"], jnp.int32)
        start_epoch = meta["next_epoch"]
        resume_skip_batches = meta.get("mid_epoch_batches", 0)
        logger.log(
            f"Resumed from {ckpt_dir} at epoch {start_epoch}, step {int(step)}"
            + (f" (mid-epoch, skipping {resume_skip_batches} batches)"
               if resume_skip_batches else "")
        )
        # encoder freeze flipped since last run? reload pretrained encoder
        # (reference train.py:103-107)
        if logger.train_encoder != opts.encoder_trainable:
            logger.train_encoder = opts.encoder_trainable
            if opts.encoder_trainable and cfg.data.pretrained_mobilenet_path:
                params = ckpt.graft_subtree(
                    params, cfg.data.pretrained_mobilenet_path, "encoder"
                )
                logger.log("Encoder unfroze: reloaded pretrained encoder weights")
    else:
        if cfg.data.pretrained_mobilenet_path:
            params = ckpt.graft_subtree(
                params, cfg.data.pretrained_mobilenet_path, "encoder"
            )
            logger.log("Loaded pretrained MobileNetV2 encoder")

    if mesh is not None:  # place once so donation doesn't re-transfer
        repl = mesh_mod.replicated(mesh)
        if multihost:
            # device_put can't target non-addressable devices; assemble the
            # global (replicated) arrays from each process's host copy
            params = distributed.put_tree(params, repl)
            opt_state = distributed.put_tree(opt_state, repl)
            model_state = distributed.put_tree(model_state, repl)
            step = distributed.put_tree(step, repl)
        else:
            params = jax.device_put(params, p_sh if p_sh is not None else repl)
            opt_state = jax.device_put(opt_state, o_sh if o_sh is not None else repl)
            model_state, step = jax.device_put((model_state, step), repl)

    batch_size = cfg.train.batch_size
    ckpt_writer = ckpt.AsyncCheckpointWriter()  # rolling saves off the hot loop
    batch_sharding = mesh_mod.batch_sharding(mesh) if mesh is not None else None
    proc_idx = jax.process_index()
    local_batch = batch_size // n_proc  # == batch_size when single-process
    last_bleu = 0.0
    mean_loss = float("nan")  # stays NaN when resume finds nothing to run

    for epoch in range(start_epoch, cfg.train.max_epoch + 1):
        logger.epoch = epoch
        begin = time.time()
        logger.log(f"Epoch {epoch}")
        epoch_loss, nsteps = 0.0, 0
        prev_loss = None  # one-step-delayed NaN check
        timer = StepTimer("train_step")

        skip = resume_skip_batches if epoch == start_epoch else 0
        nsteps = skip  # resumed epochs continue the in-epoch step count
        executed = 0  # steps actually run this process (mean-loss denominator)
        shuffle_seed = (
            (cfg.train.seed or 0) * 100003 + epoch
            if cfg.train.shuffle_each_epoch
            else None
        )
        feeder = PrefetchingFeeder(
            data_reader.get_reader(
                local_batch, "train", keep_float16=True,
                shuffle_seed=shuffle_seed,
                skip_samples=skip * batch_size,  # global-sample skip
                reader_threads=cfg.train.reader_threads,
                process_shard=(proc_idx, n_proc) if multihost else None,
            ),
            capacity=cfg.train.data_loader_capacity,
            drop_remainder=True,
            sharding=batch_sharding,
            image_norm=data_reader.storage_norm,
            device_convert=cfg.train.device_convert,
            process_local=multihost,
        )
        every_n = cfg.train.checkpoint_every_n_steps
        try:
            for imgs, caps in feeder:
                with timer:
                    params, opt_state, model_state, step, loss, lr = steps.train_step(
                        params, opt_state, model_state, step, imgs, caps
                    )
                if prev_loss is not None:
                    lval = float(prev_loss)
                    if np.isnan(lval):
                        raise FloatingPointError(
                            f"Epoch:{epoch} Step:{nsteps} loss is NaN"
                        )
                    epoch_loss += lval
                prev_loss = loss
                nsteps += 1
                executed += 1
                if every_n and nsteps % every_n == 0:
                    # Validate the EXACT state being saved before overwriting the
                    # only rolling checkpoint. The loss alone is not enough: it
                    # is computed from the step's *incoming* params, so a finite
                    # loss can coexist with a NaN/Inf *post-update* params tree
                    # (NaN gradients, optimizer overflow) — checkpointing that
                    # would atomically replace the last good state with poisoned
                    # params and resume would restart from them.
                    lval = float(loss)
                    if np.isnan(lval) or not bool(_all_finite(params)):
                        raise FloatingPointError(
                            f"Epoch:{epoch} Step:{nsteps} loss or updated params "
                            "are NaN/Inf; refusing to overwrite the checkpoint"
                        )
                    if is_main:  # one writer on shared storage
                        # async: the host snapshot happens here (donation-
                        # safe); msgpack + the atomic swap overlap the next
                        # steps' device work. Any write error surfaces at
                        # the next save/wait.
                        ckpt_writer.save(
                            ckpt_dir, params, opt_state, model_state,
                            {
                                "next_epoch": epoch,
                                "step": int(step),
                                "mid_epoch_batches": nsteps,
                                "best_bleu": logger.best_bleu,
                                "best_meteor": logger.best_meteor,
                                "train_encoder": logger.train_encoder,
                            },
                        )
                if fault_injection_step is not None and int(step) >= fault_injection_step:
                    raise RuntimeError(
                        f"fault injection at global step {int(step)}"
                    )
                if nsteps % cfg.train.log_every_n_step == 0:
                    lval = float(loss)  # sync point, every N steps only
                    # epoch_loss holds steps 1..executed-1 (one-step-delayed NaN
                    # fold); adding the current step's loss makes this the true
                    # mean over all `executed` steps (reference train.py:145-148)
                    logger.log(
                        f"    Step {nsteps} Mean loss: {(epoch_loss + lval) / executed:6f} "
                        f"Step loss: {lval:6f}, lr: {float(lr)}"
                    )
                if max_steps_per_epoch and nsteps >= max_steps_per_epoch:
                    break
        finally:
            # Capture the in-flight exception BEFORE wait(): inside the
            # `except` below, sys.exc_info() would report `werr` itself and
            # the guard would always swallow background write failures.
            unwinding = sys.exc_info()[1] is not None
            feeder.close()
            # land any in-flight rolling checkpoint before epoch-end writes
            # touch the same directory (and before a crash unwinds past it).
            # If the loop body is ALREADY unwinding with the real failure
            # (NaN guard, fault injection), a stale background write error
            # must not replace it — log it and let the original propagate.
            try:
                ckpt_writer.wait()
            except Exception as werr:
                if unwinding:
                    logger.log(
                        "WARNING: background checkpoint write failed while "
                        f"handling another error: {type(werr).__name__}: {werr}"
                    )
                else:
                    raise
        if prev_loss is not None:
            lval = float(prev_loss)
            if np.isnan(lval):
                raise FloatingPointError(f"Epoch:{epoch} Step:{nsteps} loss is NaN")
            epoch_loss += lval
        mean_loss = epoch_loss / max(executed, 1)
        logger.log(f"Epoch loss: {mean_loss:7f}")
        logger.log_scalars("epoch_loss", epoch=epoch, loss=mean_loss, steps=nsteps)
        logger.log_scalars("step_times", epoch=epoch, **timer.summary())

        eval_begin = time.time()
        bleu, distinct = _dev_eval(
            steps.decode_step,
            params,
            model_state,
            data_reader.get_reader(
                batch_size, "dev", keep_float16=cfg.train.device_convert,
                reader_threads=cfg.train.reader_threads,
            ),
            data_reader.index_word,
            batch_size,
            cfg.data.stop_idx,
            cfg.data.padding_idx,
            multihost=(proc_idx, n_proc, batch_sharding) if multihost else None,
        )
        last_bleu = bleu
        logger.log(
            f"Dev set: BLEU {bleu:.7f} distinct sentences: {distinct} "
            f"took: {time.time() - eval_begin:.2f}s"
        )
        logger.log_scalars("dev_bleu", epoch=epoch, bleu=bleu, distinct=distinct)

        if is_main:  # one writer; every process tracks best_bleu via logger
            save_model(
                cfg, logger, params, opt_state, model_state, epoch, int(step), bleu
            )
        elif (
            cfg.train.save_best_bleu_checkpoint
            and bleu is not None
            and bleu > logger.best_bleu
        ):
            logger.best_bleu = bleu  # in-memory only (write=False)
        logger.log(f"Epoch took {time.time() - begin:2f}s")

    return {
        "epochs": cfg.train.max_epoch,
        "final_step": int(step),
        "last_dev_bleu": last_bleu,
        "best_bleu": logger.best_bleu,
        "last_epoch_loss": mean_loss,
    }
