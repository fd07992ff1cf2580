"""Training-feature knobs: label smoothing (train.label_smoothing) and
gradient accumulation (train.grad_accum_steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.parallel.train_step import build_steps

F32 = jnp.float32


def _tiny_cfg(**train_over):
    cfg = config_mod.Config()
    for path, v in [
        ("model.decoder.vocab_size", 12),
        ("model.decoder.embedding_size", 8),
        ("model.decoder.hidden_dim", 16),
        ("model.decoder.sentence_length", 6),
        ("model.decoder.infer_max_length", 5),
        ("model.decoder.vocab_pad_multiple", 4),
        ("model.compute_dtype", "float32"),
    ]:
        cfg = config_mod.replace_nested(cfg, path, v)
    for k, v in train_over.items():
        cfg = config_mod.replace_nested(cfg, f"train.{k}", v)
    return cfg


def _batch(rng, n):
    images = jnp.asarray(rng.rand(n, 32, 32, 3), F32)
    caps = jnp.asarray(rng.randint(4, 12, (n, 6)), jnp.int32)
    caps = caps.at[:, 0].set(2).at[:, -2].set(3).at[:, -1].set(0)
    return images, caps


def test_label_smoothing_matches_manual_formula():
    """loss_fn(ε) == (1-ε)·hard-CE + ε·(logz - mean real-vocab logit), token-
    masked — recomputed from the model's own logits."""
    cfg = _tiny_cfg(label_smoothing=0.1)
    opts = ModelOptions.from_config(cfg)
    assert opts.label_smoothing == 0.1
    opts0 = opts._replace(label_smoothing=0.0)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    rng = np.random.RandomState(0)
    images, caps = _batch(rng, 2)

    loss_s, _ = captioner.loss_fn(params, state, images, caps, opts)
    loss_h, _ = captioner.loss_fn(params, state, images, caps, opts0)
    assert float(loss_s) != float(loss_h)

    # recompute from logits
    img_embed, _f, gfeat, _s = captioner.img2feature(
        params, state, images, opts, train=True
    )
    pre = decoder_mod.precompute(params["decoder"], img_embed, gfeat, opts.dtype)
    logits = np.asarray(
        decoder_mod.teacher_forcing_logits(
            params["decoder"], pre, caps[:, :-1], opts.parity_mode,
            opts.padding_idx, opts.dtype,
        ),
        np.float64,
    )
    target = np.asarray(caps[:, 1:])
    mask = (target != 0).astype(np.float64)
    logz = np.log(np.sum(np.exp(logits), axis=-1))
    gold = np.take_along_axis(logits, target[..., None], axis=-1)[..., 0]
    mean_logit = np.mean(logits[..., : opts.dims.vocab_size], axis=-1)
    eps = 0.1
    ce = (1 - eps) * (logz - gold) + eps * (logz - mean_logit)
    want = np.sum(ce * mask) / np.sum(mask)
    np.testing.assert_allclose(float(loss_s), want, rtol=1e-5)

    # ε=0 reproduces the reference-exact hard CE bit path
    ce0 = logz - gold
    want0 = np.sum(ce0 * mask) / np.sum(mask)
    np.testing.assert_allclose(float(loss_h), want0, rtol=1e-5)


def test_grad_accum_matches_manual_accumulation():
    """train_step(grad_accum_steps=2) == a hand-rolled accumulation over the
    SAME microbatch split: mean grads (recovered exactly via SGD(1.0) —
    Adam's scale invariance would mask accumulator-scaling bugs), threaded
    BN state, one optimizer update.

    Runs at the encoder's design resolution (224px): at tiny inputs the
    one-pass BN E[x²]−mean² statistics are f32-cancellation-sensitive for
    near-constant channels, so cross-compilation comparisons are meaningless
    there (measured: jit-vs-eager loss diff 0.038 at 32px, 0.0 at 224px)."""
    cfg = _tiny_cfg()
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    optimizer = optax.sgd(1.0)
    opt_state = optimizer.init(params)
    schedule = lambda step: 1.0

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(4, 224, 224, 3), F32)
    caps = jnp.asarray(rng.randint(4, 12, (4, 6)), jnp.int32)
    caps = caps.at[:, 0].set(2).at[:, -2].set(3).at[:, -1].set(0)
    # UNEQUAL token counts across microbatches: rows 2-3 are mostly <pad>,
    # so microbatch means differ from the global token-mean — pinning that
    # accumulation weights by token count, not by microbatch
    caps = caps.at[2:, 2:].set(0)
    step0 = jnp.zeros((), jnp.int32)

    # manual oracle over microbatches [0:2], [2:4] — JITTED: an eager oracle
    # compiles differently and its BN backward diverges at f32 noise scale.
    # The whole-batch token-mean objective = sum of per-micro CE sums over
    # the GLOBAL token count.
    def lsum(p, s, im, cp):
        ce, n, ns = captioner.loss_terms(p, s, im, cp, opts, True)
        return ce, (n, ns)

    @jax.jit
    def oracle(params, state):
        (ce0, (n0, s_mid)), g0 = jax.value_and_grad(lsum, has_aux=True)(
            params, state, images[:2], caps[:2]
        )
        (ce1, (n1, s_end)), g1 = jax.value_and_grad(lsum, has_aux=True)(
            params, s_mid, images[2:], caps[2:]
        )
        n = n0 + n1
        grads = jax.tree_util.tree_map(lambda a, b: (a + b) / n, g0, g1)
        return grads, (ce0 + ce1) / n, s_end

    grads_ref, loss_ref_a, s_end = oracle(params, state)
    loss_ref = float(loss_ref_a)

    acc = build_steps(opts, optimizer, schedule, mesh=None, donate=False,
                      grad_accum_steps=2)
    p2, _o2, s2, _st, loss2, _lr = acc.train_step(
        params, opt_state, state, step0, images, caps
    )
    # SGD(1.0): params_new = params - grads, so grads recover exactly
    grads_acc = jax.tree_util.tree_map(jnp.subtract, params, p2)

    assert abs(float(loss2) - loss_ref) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_ref), jax.tree_util.tree_leaves(grads_acc)
    ):
        a, b = np.asarray(a), np.asarray(b)
        # rtol covers real gradients; atol floors the near-zero leaves and
        # the residual cross-program f32 noise of the BN backward (scan and
        # loop compile to different fusion orders; measured <= 5e-6 abs)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_end), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grad_accum_under_dp_mesh_matches_mesh_oracle():
    """accum=2 on a 4-device data mesh == a manual two-microbatch oracle ON
    THE SAME MESH (each micro leading-axis sharded): same token-weighted
    grads, threaded BN state, one update.

    The oracle must share the mesh: a single-device reference is NOT
    comparable here — at 1 row/shard the partitioning-induced f32 noise,
    amplified backward through the 53-layer BN chain, reaches ~4% on the
    stem conv's gradient even with NO accumulation involved (measured;
    losses still agree to 1e-5). The DP-vs-single contract at sane
    rows-per-shard is pinned by test_parallel.py / the transformer DP test."""
    import optax
    import pytest as _pytest

    from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 4:
        _pytest.skip("needs >= 4 virtual devices")
    cfg = _tiny_cfg()
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    optimizer = optax.sgd(1.0)
    opt_state = optimizer.init(params)
    schedule = lambda step: 1.0

    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.rand(8, 224, 224, 3), F32)
    caps = jnp.asarray(rng.randint(4, 12, (8, 6)), jnp.int32)
    caps = caps.at[:, 0].set(2).at[4:, 2:].set(0)  # unequal micro token counts
    step0 = jnp.zeros((), jnp.int32)
    mesh = mesh_mod.make_mesh(jax.devices()[:4])

    # mesh oracle: two independent jitted grad computations, micros sharded
    # over the data axis, token-weighted combination
    def lsum(p, s, im, cp):
        ce, n, ns = captioner.loss_terms(p, s, im, cp, opts, True)
        return ce, (n, ns)

    gfun = jax.jit(jax.value_and_grad(lsum, has_aux=True))
    im0, cp0 = mesh_mod.shard_batch(mesh, images[:4], caps[:4])
    im1, cp1 = mesh_mod.shard_batch(mesh, images[4:], caps[4:])
    (ce0, (n0, s_mid)), g0 = gfun(params, state, im0, cp0)
    (ce1, (n1, s_end)), g1 = gfun(params, s_mid, im1, cp1)
    ntot = float(n0) + float(n1)
    loss_ref = (float(ce0) + float(ce1)) / ntot
    grads_ref = jax.tree_util.tree_map(lambda a, b: (a + b) / ntot, g0, g1)

    dp = build_steps(opts, optimizer, schedule, mesh=mesh, donate=False,
                     grad_accum_steps=2)
    imgs_sh, caps_sh = mesh_mod.shard_batch(mesh, images, caps)
    p2, _o2, s2, _st2, loss2, _lr2 = dp.train_step(
        params, opt_state, state, step0, imgs_sh, caps_sh
    )
    grads_acc = jax.tree_util.tree_map(jnp.subtract, params, p2)

    assert abs(float(loss2) - loss_ref) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_ref), jax.tree_util.tree_leaves(grads_acc)
    ):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.linalg.norm(a - b)
        scale = np.linalg.norm(a) + 1e-8
        assert diff <= max(1e-3 * scale, 1e-4), (diff, scale)
    for a, b in zip(jax.tree_util.tree_leaves(s_end), jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def _build_tiny_dataset(tmp_path, suffix="ds", n_images=12, **train_over):
    """Synthetic build_all dataset + a loop.train-ready config (the
    test_midepoch_resume recipe, shared here for loop-level feature tests)."""
    import json

    from PIL import Image

    from myimagecaptioningmodel_tpu.data import dataset_gen

    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(3)
    phrases = ["一个 男人 在 打 篮球", "一只 猫 在 睡觉", "一个 女人 在 跑步"]
    records = []
    for i in range(n_images):
        name = f"img_{i:02d}.jpg"
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)).save(
            img_dir / name
        )
        records.append({"image_id": name, "caption": [phrases[i % 3]]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = tmp_path / "dataset"
    cfg = config_mod.Config.from_dict(
        {
            "build_dataset": {
                "image_paths": [str(img_dir)],
                "annotation_path": str(ann),
                "output_path": str(out),
                "h5_name2idx": str(out / "name2idx.json"),
            },
            "data": {
                "image_shape": [32, 32],
                "dict_path": str(out),
                "h5_path": [str(out)],
                "h5_name2idx": str(out / "name2idx.json"),
            },
            "train": {
                "seed": 0,
                "learning_rate": 1e-3,
                "batch_size": 2,
                "max_epoch": 1,
                "checkpoint_path": str(tmp_path / suffix / "save"),
                "export_infer_model": False,
                **train_over,
            },
            "model": {
                "decoder": {
                    "vocab_size": 0, "embedding_size": 8,
                    "sentence_length": 0, "hidden_dim": 16,
                    "infer_max_length": 6, "vocab_pad_multiple": 1,
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(tmp_path / suffix / "log")},
        }
    )
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    return config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )


def test_grad_accum_through_loop(tmp_path):
    """loop.train validates divisibility, and the happy path (accum=2 with
    rolling async checkpoints) trains to completion and writes a resumable
    checkpoint."""
    import os

    import pytest

    from myimagecaptioningmodel_tpu.training import loop

    cfg = _tiny_cfg(grad_accum_steps=3, batch_size=4)
    with pytest.raises(ValueError, match="divisible"):
        loop.train(cfg, mesh=None)

    cfg = _build_tiny_dataset(
        tmp_path, batch_size=4, grad_accum_steps=2, checkpoint_every_n_steps=1
    )
    loop.train(cfg, mesh=None)
    ckpt_dir = os.path.join(cfg.train.checkpoint_path, "checkpoint")
    assert os.path.exists(os.path.join(ckpt_dir, "COMMITTED"))


def test_background_ckpt_write_failure_surfaces(tmp_path, monkeypatch):
    """A background rolling-checkpoint write failure must fail the run even
    when the epoch otherwise completes normally (regression: the old finally
    block read sys.exc_info() *inside* its own except handler, which always
    reported the writer's error and silently swallowed it)."""
    import pytest

    from myimagecaptioningmodel_tpu.training import checkpoint as ckpt
    from myimagecaptioningmodel_tpu.training import loop

    def failing_save(self, directory, params, opt_state, model_state, meta):
        self._error = RuntimeError("simulated background write failure")

    monkeypatch.setattr(ckpt.AsyncCheckpointWriter, "save", failing_save)
    cfg = _build_tiny_dataset(tmp_path, checkpoint_every_n_steps=1)
    with pytest.raises(RuntimeError, match="simulated background write"):
        loop.train(cfg, mesh=None)


def test_ema_tracker_matches_manual_recursion():
    """params_ema_tracker: after k updates, the shadowed tree equals the
    manual ema = d*ema + (1-d)*params recursion; updates pass through
    unchanged (same trained params as without EMA)."""
    from myimagecaptioningmodel_tpu.parallel.train_step import (
        ema_params_from_opt_state,
        make_optimizer,
    )

    cfg = _tiny_cfg(ema_decay=0.9)
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    schedule = lambda step: 1e-3
    opt = make_optimizer(cfg, schedule)
    opt_plain = make_optimizer(_tiny_cfg(), schedule)
    o = opt.init(params)
    o_plain = opt_plain.init(params)

    rng = np.random.RandomState(5)
    images, caps = _batch(rng, 2)

    def grads_of(p, s):
        return jax.grad(
            lambda pp: captioner.loss_fn(pp, s, images, caps, opts)[0]
        )(p)

    p_ema, p_plain = params, params
    manual = params
    for _ in range(3):
        g = grads_of(p_ema, state)
        upd, o = opt.update(g, o, p_ema)
        p_ema = jax.tree_util.tree_map(jnp.add, p_ema, upd)
        upd_p, o_plain = opt_plain.update(g, o_plain, p_plain)
        p_plain = jax.tree_util.tree_map(jnp.add, p_plain, upd_p)
        manual = jax.tree_util.tree_map(
            lambda e, p: 0.9 * e + 0.1 * p, manual, p_ema
        )

    # EMA must not perturb the actual training trajectory
    for a, b in zip(jax.tree_util.tree_leaves(p_ema),
                    jax.tree_util.tree_leaves(p_plain)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ema = ema_params_from_opt_state(o)
    assert ema is not None
    for a, b in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # no tracker -> None
    assert ema_params_from_opt_state(o_plain) is None


def test_ema_state_gets_tp_shardings():
    """The EMA tree mirrors the param paths, so opt_state_shardings gives its
    vocab-head leaves the SAME model-axis sharding as the params."""
    import pytest as _pytest

    from jax.sharding import PartitionSpec as P

    from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod
    from myimagecaptioningmodel_tpu.parallel.train_step import (
        EmaState,
        make_optimizer,
    )

    if len(jax.devices()) < 2:
        _pytest.skip("needs >= 2 virtual devices")
    cfg = _tiny_cfg(ema_decay=0.99)
    cfg = config_mod.replace_nested(cfg, "model.decoder.vocab_pad_multiple", 2)
    opts = ModelOptions.from_config(cfg)
    params, _state = captioner.init(jax.random.PRNGKey(0), opts)
    opt = make_optimizer(cfg, lambda s: 1e-3)
    o = opt.init(params)
    mesh = mesh_mod.make_mesh(jax.devices()[:2], model_parallel=2)
    p_sh = mesh_mod.param_shardings(mesh, params)
    o_sh = mesh_mod.opt_state_shardings(mesh, o, params, p_sh)
    ema_sh = [s for s in o_sh if isinstance(s, EmaState)]
    assert len(ema_sh) == 1
    assert ema_sh[0].ema["decoder"]["embedding"]["table"].spec == P("model", None)
    assert ema_sh[0].ema["decoder"]["out_bias"].spec == P("model")


def test_ema_bundle_exported_and_evaluable(tmp_path):
    """loop.train with ema_decay exports an 'infer_ema' bundle alongside
    'infer', and evaluate() can score from it."""
    import json

    from PIL import Image

    from myimagecaptioningmodel_tpu.data import dataset_gen
    from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
    from myimagecaptioningmodel_tpu.training import loop

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(11)
    records = []
    for i in range(12):
        name = f"img_{i:02d}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(img_dir / name)
        records.append({"image_id": name, "caption": ["一只 猫 在 睡觉"]})
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")
    out = tmp_path / "ds"
    cfg = config_mod.Config.from_dict({
        "build_dataset": {
            "image_paths": [str(img_dir)], "annotation_path": str(ann),
            "output_path": str(out), "h5_name2idx": str(out / "name2idx.json"),
        },
        "data": {
            "image_shape": [32, 32], "dict_path": str(out),
            "h5_path": [str(out)], "h5_name2idx": str(out / "name2idx.json"),
        },
        "train": {
            "seed": 0, "batch_size": 4, "max_epoch": 1, "ema_decay": 0.5,
            "checkpoint_path": str(tmp_path / "save"),
        },
        "model": {
            "decoder": {
                "vocab_size": 0, "embedding_size": 8, "sentence_length": 0,
                "hidden_dim": 16, "infer_max_length": 6,
                "vocab_pad_multiple": 1,
            },
            "compute_dtype": "float32",
        },
        "log": {"log_path": str(tmp_path / "log")},
    })
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )
    loop.train(cfg, mesh=None)
    import os

    assert os.path.exists(
        os.path.join(cfg.train.checkpoint_path, "infer_ema", "params.msgpack")
    )
    res = evaluate_mod.evaluate(cfg, bundle="infer_ema", mode="test")
    assert len(res["bleu"]) == 5
    # EMA params differ from the live params after 1 epoch (decay 0.5 lags)
    res_live = evaluate_mod.evaluate(cfg, bundle="infer", mode="test")
    assert all(0.0 <= b <= 1.0 for b in res["bleu"] + res_live["bleu"])


def test_label_smoothing_transformer_path():
    """Smoothing applies identically through the transformer family's loss."""
    cfg = _tiny_cfg(label_smoothing=0.2)
    cfg = config_mod.replace_nested(cfg, "model.decoder.arch", "transformer")
    cfg = config_mod.replace_nested(cfg, "model.decoder.num_layers", 1)
    cfg = config_mod.replace_nested(cfg, "model.decoder.num_heads", 2)
    opts = ModelOptions.from_config(cfg)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    rng = np.random.RandomState(2)
    images, caps = _batch(rng, 2)
    loss_s, _ = captioner.loss_fn(params, state, images, caps, opts)
    loss_h, _ = captioner.loss_fn(
        params, state, images, caps, opts._replace(label_smoothing=0.0)
    )
    assert np.isfinite(float(loss_s)) and float(loss_s) != float(loss_h)
