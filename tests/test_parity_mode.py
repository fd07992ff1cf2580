"""Parity-mode (degenerate reference attention, SURVEY §2.2-1) path tests."""

import jax
import jax.numpy as jnp
import numpy as np

from myimagecaptioningmodel_tpu.models import captioner, decoder as decoder_mod
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

F32 = jnp.float32


def opts_pair():
    base = dict(
        dims=DecoderDims(vocab_size=21, embedding_size=8, hidden_dim=16,
                         feat_channels=1280),
        sentence_length=5,
        infer_max_length=5,
        compute_dtype="float32",
    )
    return (
        ModelOptions(**base, parity_mode=False),
        ModelOptions(**base, parity_mode=True),
    )


def test_parity_context_is_uniform_mean():
    """Parity attention == mean over [spatial values; sentinel] slots."""
    from myimagecaptioningmodel_tpu.ops.attention import adaptive_attention

    rng = np.random.RandomState(0)
    k, H = 5, 16
    img_k = jnp.asarray(rng.randn(2, k, H), F32)
    img_v = jnp.asarray(rng.randn(2, k, H), F32)
    sent_key = jnp.asarray(rng.randn(2, H), F32)
    sentinel = jnp.asarray(rng.randn(2, H), F32)
    hid = jnp.asarray(rng.randn(2, H), F32)
    p = {"score": {"w": jnp.zeros((H, 1)), "b": jnp.zeros(1)}}
    ctx, alpha = adaptive_attention(p, img_k, img_v, sent_key, sentinel, hid,
                                    parity_mode=True, compute_dtype=F32)
    expect = (np.asarray(img_v).sum(1) + np.asarray(sentinel)) / (k + 1)
    np.testing.assert_allclose(np.asarray(ctx), expect, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(alpha), np.ones((2, k + 1)))


def test_parity_mode_trains_and_decodes():
    real, parity = opts_pair()
    params, state = captioner.init(jax.random.PRNGKey(0), parity)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), F32)
    caps = jnp.asarray([[2, 5, 7, 3, 0], [2, 9, 3, 0, 0]], jnp.int32)

    loss_p, _ = captioner.loss_fn(params, state, images, caps, parity)
    loss_r, _ = captioner.loss_fn(params, state, images, caps, real)
    assert np.isfinite(float(loss_p)) and np.isfinite(float(loss_r))
    assert float(loss_p) != float(loss_r)  # the modes genuinely differ

    ids = captioner.greedy_decode(params, state, images, parity)
    assert ids.shape == (2, 5)

    # grads flow (attention score params get zero grads in parity mode — unused)
    grads = jax.grad(lambda p: captioner.loss_fn(p, state, images, caps, parity)[0])(params)
    score_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["decoder"]["attention"])
    )
    assert score_norm == 0.0
    lstm_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["decoder"]["lstm"])
    )
    assert lstm_norm > 0.0
