"""Learning-dynamics tests: the decoder must be able to memorize a tiny
caption set (teacher-forcing CE -> greedy decode reproduces the captions)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myimagecaptioningmodel_tpu.models import decoder as decoder_mod
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims

F32 = jnp.float32


def test_decoder_overfits_tiny_captions():
    dims = DecoderDims(vocab_size=12, embedding_size=8, hidden_dim=32,
                       feat_channels=16)
    params = decoder_mod.init(jax.random.PRNGKey(0), dims)
    rng = np.random.RandomState(0)

    # two fixed "images" (feature maps) with distinct captions
    p_img_feat = jnp.asarray(rng.randn(2, 4, dims.hidden_dim), F32)
    global_feat = jnp.asarray(rng.randn(2, dims.hidden_dim), F32)
    # <start> a b c <stop> ; <start> d e f <stop>  (pad to 6)
    caps = jnp.asarray([[2, 4, 5, 6, 3, 0], [2, 7, 8, 9, 3, 0]], jnp.int32)
    source, target = caps[:, :-1], caps[:, 1:]
    mask = (target != 0).astype(F32)

    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            pre = decoder_mod.precompute(p, p_img_feat, global_feat, F32)
            logits = decoder_mod.teacher_forcing_logits(p, pre, source,
                                                        compute_dtype=F32)
            logz = jax.nn.logsumexp(logits, -1)
            gold = jnp.take_along_axis(logits, target[..., None], -1)[..., 0]
            return jnp.sum((logz - gold) * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = None
    for i in range(300):
        params, opt_state, loss = train_step(params, opt_state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.05, f"did not converge: {float(loss)} (start {loss0})"

    pre = decoder_mod.precompute(params, p_img_feat, global_feat, F32)
    ids = np.asarray(decoder_mod.greedy_decode_ids(params, pre, 5, compute_dtype=F32))
    np.testing.assert_array_equal(ids[0][:4], [4, 5, 6, 3])
    np.testing.assert_array_equal(ids[1][:4], [7, 8, 9, 3])

    # beam search agrees on a memorized distribution
    from myimagecaptioningmodel_tpu.inference import beam as beam_mod

    ids_b, _ = beam_mod.beam_search_ids(params, pre, 5, beam_size=3,
                                        compute_dtype=F32)
    np.testing.assert_array_equal(np.asarray(ids_b)[:, :4], ids[:, :4])
