"""bfloat16 compute-path tests: the default config trains in bf16 on TPU, so
forward AND backward must be well-typed and finite in bf16 (a conv-VJP dtype
bug once lived here; this pins it)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims
from myimagecaptioningmodel_tpu.parallel.train_step import build_steps
from myimagecaptioningmodel_tpu.training import lr_schedules


def bf16_opts():
    return ModelOptions(
        dims=DecoderDims(vocab_size=17, embedding_size=8, hidden_dim=16,
                         feat_channels=1280),
        sentence_length=5,
        infer_max_length=5,
        compute_dtype="bfloat16",
    )


def test_bf16_train_step_and_decode():
    opts = bf16_opts()
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    schedule = lr_schedules.constant(1e-3)
    optimizer = optax.adam(schedule)
    steps = build_steps(opts, optimizer, schedule, mesh=None, donate=False)
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    caps = jnp.asarray(rng.randint(1, 17, (2, 5)), jnp.int32)

    p, o, s, st, loss, lr = steps.train_step(
        params, opt_state, state, jnp.zeros((), jnp.int32), images, caps
    )
    assert np.isfinite(float(loss))
    # params stay float32 master copies
    for leaf in jax.tree_util.tree_leaves(p):
        assert leaf.dtype == jnp.float32 or leaf.dtype == jnp.int32, leaf.dtype
    # a second step keeps training
    p2, *_rest, loss2, _ = steps.train_step(p, o, s, st, images, caps)
    assert np.isfinite(float(loss2))

    ids = steps.decode_step(p, s, images)
    assert ids.shape == (2, 5) and ids.dtype == jnp.int32
