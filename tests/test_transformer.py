"""Transformer decoder family (models/transformer.py): KV-cache correctness,
memorization, beam/greedy/early-stop agreement, facade dispatch, int8."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from myimagecaptioningmodel_tpu.config import Config, replace_nested
from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models import transformer as tr
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.models.transformer import TransformerDims

F32 = jnp.float32

DIMS = TransformerDims(
    vocab_size=12, embedding_size=8, model_dim=32, num_layers=2,
    num_heads=4, mlp_ratio=2, max_positions=8,
)


def _pre(params, key=0, batch=2, k=4):
    rng = np.random.RandomState(key)
    img_embed = jnp.asarray(rng.randn(batch, k, DIMS.model_dim), F32)
    global_feat = jnp.asarray(rng.randn(batch, DIMS.model_dim), F32)
    return tr.precompute(params, img_embed, global_feat, DIMS.num_heads, F32)


def test_cached_decode_matches_full_pass():
    """The KV-cached incremental decode must produce the SAME logits as the
    all-steps-at-once causal teacher-forcing pass — the core cache-
    correctness invariant."""
    params = tr.init(jax.random.PRNGKey(0), DIMS)
    pre = _pre(params)
    source = jnp.asarray([[2, 4, 5, 6, 3, 0], [2, 7, 8, 9, 3, 0]], jnp.int32)
    T = source.shape[1]

    full = tr.teacher_forcing_logits(params, pre, source, DIMS,
                                     compute_dtype=F32)  # [B,T,V]

    caches = tr._init_cache(DIMS, source.shape[0], T, F32)
    step_logits = []
    for t in range(T):
        x_last, caches = tr._decode_step(
            params, pre, DIMS, source[:, t], caches, jnp.int32(t), 0, F32
        )
        step_logits.append(tr.head_logits(params, x_last, F32))
    inc = jnp.stack(step_logits, axis=1)  # [B,T,V]

    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_transformer_overfits_tiny_captions():
    params = tr.init(jax.random.PRNGKey(0), DIMS)
    pre = _pre(params)
    caps = jnp.asarray([[2, 4, 5, 6, 3, 0], [2, 7, 8, 9, 3, 0]], jnp.int32)
    source, target = caps[:, :-1], caps[:, 1:]
    mask = (target != 0).astype(F32)

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            logits = tr.teacher_forcing_logits(p, pre, source, DIMS,
                                               compute_dtype=F32)
            logz = jax.nn.logsumexp(logits, -1)
            gold = jnp.take_along_axis(logits, target[..., None], -1)[..., 0]
            return jnp.sum((logz - gold) * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for _ in range(300):
        params, opt_state, loss = train_step(params, opt_state)
    assert float(loss) < 0.05, f"did not converge: {float(loss)}"

    pre2 = _pre(params)
    ids = np.asarray(
        tr.greedy_decode_ids(params, pre2, DIMS, 5, compute_dtype=F32)
    )
    np.testing.assert_array_equal(ids[0][:4], [4, 5, 6, 3])
    np.testing.assert_array_equal(ids[1][:4], [7, 8, 9, 3])

    # beam search agrees on a memorized distribution; beam_size=1 == greedy
    ids_b, _ = tr.beam_search_ids(params, pre2, DIMS, 5, beam_size=3,
                                  compute_dtype=F32)
    np.testing.assert_array_equal(np.asarray(ids_b)[:, :4], ids[:, :4])
    # beam_size=1 == greedy up to <stop> (a finished beam pads; the fixed-
    # length greedy scan free-runs past <stop> — same contract as the LSTM
    # family, captions identical after detokenizer truncation)
    ids_b1, _ = tr.beam_search_ids(params, pre2, DIMS, 5, beam_size=1,
                                   compute_dtype=F32)
    np.testing.assert_array_equal(np.asarray(ids_b1)[:, :4], ids[:, :4])

    # early-stop while_loop: identical ids (post-stop positions are <pad>,
    # and here the memorized captions emit <pad> after <stop> anyway)
    ids_es = np.asarray(
        tr.greedy_decode_ids(params, pre2, DIMS, 5, compute_dtype=F32,
                             early_stop=True)
    )
    stop_pos = [list(row).index(3) for row in ids]
    for r, (row_es, row) in enumerate(zip(ids_es, ids)):
        np.testing.assert_array_equal(row_es[: stop_pos[r] + 1],
                                      row[: stop_pos[r] + 1])
        assert all(w == 0 for w in row_es[stop_pos[r] + 1 :])

    # int8 serving quantization preserves the memorized captions
    qparams = tr.quantize_transformer_decoder(params)
    ids_q = np.asarray(
        tr.greedy_decode_ids(qparams, _pre(qparams), DIMS, 5, compute_dtype=F32)
    )
    np.testing.assert_array_equal(ids_q[:, :4], ids[:, :4])


def _tiny_transformer_cfg():
    cfg = Config()
    for path, v in [
        ("model.decoder.arch", "transformer"),
        ("model.decoder.vocab_size", 12),
        ("model.decoder.embedding_size", 8),
        ("model.decoder.hidden_dim", 32),
        ("model.decoder.num_layers", 2),
        ("model.decoder.num_heads", 4),
        ("model.decoder.mlp_ratio", 2),
        ("model.decoder.sentence_length", 6),
        ("model.decoder.infer_max_length", 5),
        ("model.decoder.vocab_pad_multiple", 1),
        ("model.compute_dtype", "float32"),
    ]:
        cfg = replace_nested(cfg, path, v)
    return cfg


def test_captioner_dispatch_and_config_roundtrip():
    """arch='transformer' flows config -> ModelOptions -> init/loss/decode
    through the SAME facade the trainer/evaluator/server use."""
    cfg = _tiny_transformer_cfg()
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.model.decoder.arch == "transformer"
    assert cfg2.model.decoder.num_layers == 2

    opts = ModelOptions.from_config(cfg)
    assert opts.arch == "transformer"
    assert opts.tdims == TransformerDims.from_config(cfg.model)

    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    assert "layers" in params["decoder"] and "lstm" not in params["decoder"]

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 224, 224, 3), F32)
    caps = jnp.asarray([[2, 4, 5, 6, 3, 0], [2, 7, 8, 9, 3, 0]], jnp.int32)

    loss, new_state = captioner.loss_fn(params, state, images, caps, opts)
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda p: captioner.loss_fn(p, state, images, caps, opts)[0]
    )(params)
    gmax = max(
        float(jnp.max(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gmax) and gmax > 0

    ids = captioner.greedy_decode(params, new_state, images, opts)
    assert ids.shape == (2, 5) and ids.dtype == jnp.int32

    from myimagecaptioningmodel_tpu.inference.beam import beam_decode

    ids_b, scores = beam_decode(params, new_state, images, opts, beam_size=3)
    assert ids_b.shape == (2, 5) and scores.shape == (2,)


def test_unknown_arch_rejected():
    cfg = replace_nested(Config(), "model.decoder.arch", "gru")
    with pytest.raises(ValueError, match="arch"):
        ModelOptions.from_config(cfg)


def test_transformer_beam_early_stop_matches_fixed():
    """early_stop beam == fixed-length beam on a model whose captions finish
    (random init never emits <stop>, so bias the head to stop at step 2)."""
    params = tr.init(jax.random.PRNGKey(0), DIMS)
    params = dict(params)
    # bias so every row emits a non-stop word at t=0 (start feeds in), then
    # <stop>: make stop's bias dominate only once the position embedding of
    # t>=1 is in play — simplest robust recipe: big stop bias; beams finish
    # at t=0/1 and the early exit trips well before max_length
    params["out_bias"] = params["out_bias"].at[3].add(50.0)
    pre = _pre(params)
    kw = dict(max_length=6, beam_size=3, compute_dtype=F32)
    ids_fix, sc_fix = tr.beam_search_ids(params, pre, DIMS, **kw)
    ids_es, sc_es = tr.beam_search_ids(params, pre, DIMS, early_stop=True, **kw)
    np.testing.assert_array_equal(np.asarray(ids_fix), np.asarray(ids_es))
    np.testing.assert_allclose(np.asarray(sc_fix), np.asarray(sc_es),
                               rtol=1e-5, atol=1e-5)


def test_transformer_beam_fused_head_matches_xla():
    """Fused top-k Pallas head (interpret mode) == the XLA beam path, at dims
    that actually pass the production gate (V >= 2048, E % 128 == 0) so the
    kernel path genuinely engages."""
    dims = TransformerDims(
        vocab_size=2048, embedding_size=128, model_dim=64, num_layers=1,
        num_heads=2, mlp_ratio=1, max_positions=5,
    )
    params = tr.init(jax.random.PRNGKey(4), dims)
    assert tr._pallas_head_ok(params)
    rng = np.random.RandomState(7)
    B = 2
    img_embed = jnp.asarray(rng.randn(B, 3, dims.model_dim), F32)
    gfeat = jnp.asarray(rng.randn(B, dims.model_dim), F32)
    pre = tr.precompute(params, img_embed, gfeat, dims.num_heads, F32)
    kw = dict(max_length=5, beam_size=4, compute_dtype=F32)
    ids_xla, sc_xla = tr.beam_search_ids(params, pre, dims, **kw)
    ids_pl, sc_pl = tr.beam_search_ids(
        params, pre, dims, use_pallas=True, interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(ids_xla), np.asarray(ids_pl))
    np.testing.assert_allclose(np.asarray(sc_xla), np.asarray(sc_pl),
                               rtol=1e-4, atol=1e-4)


def test_transformer_dp_train_step_matches_single_device():
    """8-way data-parallel train step == single-device step for the
    transformer family (the DP contract test_parallel.py pins for the LSTM)."""
    import optax

    from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod
    from myimagecaptioningmodel_tpu.parallel.train_step import build_steps

    if len(jax.devices()) != 8:
        pytest.skip("conftest must force 8 virtual CPU devices")
    opts = ModelOptions.from_config(_tiny_transformer_cfg())
    # SGD: updates linear in grads, so only reduction-order noise separates
    # DP from single-device (same rationale as test_parallel.py)
    optimizer = optax.sgd(1e-3)
    schedule = lambda step: 1e-3
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    opt_state = optimizer.init(params)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(8, 224, 224, 3), F32)
    caps = jnp.asarray(rng.randint(4, 12, (8, 6)), jnp.int32)
    step0 = jnp.zeros((), jnp.int32)

    single = build_steps(opts, optimizer, schedule, mesh=None, donate=False)
    p1, _o1, s1, _st, loss1, _lr = single.train_step(
        params, opt_state, state, step0, images, caps
    )
    ids1 = np.asarray(single.decode_step(p1, s1, images))

    mesh = mesh_mod.make_mesh()
    dp = build_steps(opts, optimizer, schedule, mesh=mesh, donate=False)
    imgs_sh, caps_sh = mesh_mod.shard_batch(mesh, images, caps)
    p8, _o8, s8, _st8, loss8, _lr8 = dp.train_step(
        params, opt_state, state, step0, imgs_sh, caps_sh
    )
    ids8 = np.asarray(dp.decode_step(p8, s8, imgs_sh))

    assert float(loss1) == pytest.approx(float(loss8), rel=1e-5)
    # norm-relative with an absolute floor — same rationale as
    # test_parallel.py: f32 psum reduction grouping through the BN stack
    # wobbles encoder grads; zero-init leaves are one lr-sized update
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.linalg.norm(a - b)
        scale = np.linalg.norm(a) + 1e-8
        assert diff <= max(2e-3 * scale, 5e-4), (diff, scale)
    np.testing.assert_array_equal(ids1, ids8)


def test_vocab_tp_shardings_cover_transformer_tree():
    """parallel/mesh.param_shardings targets decoder.embedding.table /
    decoder.out_bias by key path — the transformer tree keeps those names."""
    from jax.sharding import PartitionSpec as P

    from myimagecaptioningmodel_tpu.parallel import mesh as mesh_mod

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    mesh = mesh_mod.make_mesh(jax.devices()[:2], model_parallel=2)
    opts = ModelOptions.from_config(_tiny_transformer_cfg())._replace(
        tdims=DIMS._replace(vocab_pad_multiple=2)
    )
    params, _ = captioner.init(jax.random.PRNGKey(0), opts)
    sh = mesh_mod.param_shardings(mesh, params)
    assert sh["decoder"]["embedding"]["table"].spec == P("model", None)
    assert sh["decoder"]["out_bias"].spec == P("model")
    assert sh["decoder"]["layers"][0]["attn"]["wq"]["w"].spec == P()
