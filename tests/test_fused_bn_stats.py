"""Fused 1x1-conv+BN-stats kernel (ops/pallas/matmul_bn.py): numerics must
match the unfused conv2d + _bn_train path exactly — forward, gradients, and
moving-stat updates — on the full encoder train step (interpret mode on the
CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from myimagecaptioningmodel_tpu.models import captioner
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims
from myimagecaptioningmodel_tpu.ops.pallas import matmul_bn as MB

F32 = jnp.float32


def test_matmul_stats_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(512, 16), F32)
    w = jnp.asarray(rng.randn(16, 24) * 0.1, F32)
    y, s, q = MB._matmul_stats(x, w, interpret=True)
    y_ref = x @ w
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(y_ref.sum(0)), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(q), np.asarray((y_ref * y_ref).sum(0)), rtol=1e-4
    )


def test_matmul_stats_tail_block():
    """M not divisible by any pow2 block -> runs as one block."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(6272, 8), F32)  # 128*7*7
    w = jnp.asarray(rng.randn(8, 16) * 0.1, F32)
    y, s, q = MB._matmul_stats(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), rtol=1e-5)


def test_conv1x1_bn_matches_unfused_fwd_bwd():
    """Value AND gradients of the fused op == conv2d + _bn_train."""
    from myimagecaptioningmodel_tpu.ops import layers as L

    rng = np.random.RandomState(2)
    B, H, W, Cin, Cout = 2, 8, 8, 8, 16
    x = jnp.asarray(rng.randn(B, H, W, Cin), F32)
    conv_p = {"w": jnp.asarray(rng.randn(1, 1, Cin, Cout) * 0.2, F32)}
    bn_p = {
        "scale": jnp.asarray(rng.rand(Cout) + 0.5, F32),
        "offset": jnp.asarray(rng.randn(Cout) * 0.1, F32),
    }
    tgt = jnp.asarray(rng.randn(B, H, W, Cout), F32)

    def fused_loss(conv_p, bn_p, x):
        y, mean, var = MB.conv1x1_bn_train(conv_p, bn_p, x, F32)
        return jnp.mean((y - tgt) ** 2) + 0.0 * (mean.sum() + var.sum()), (mean, var)

    def unfused_loss(conv_p, bn_p, x):
        y = L.conv2d(conv_p, x, 1, 0, 1, F32)
        y, mean, var = L._bn_train(bn_p["scale"], bn_p["offset"], y)
        return jnp.mean((y - tgt) ** 2) + 0.0 * (mean.sum() + var.sum()), (mean, var)

    (lf, (mf, vf)), gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2),
                                            has_aux=True)(conv_p, bn_p, x)
    (lu, (mu, vu)), gu = jax.value_and_grad(unfused_loss, argnums=(0, 1, 2),
                                            has_aux=True)(conv_p, bn_p, x)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mu), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vu), rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_full_encoder_equivalent_with_flag_f64():
    """The full 53-layer encoder forward with fuse_bn_stats on vs off, in
    float64: outputs and moving stats agree to ~1e-9.

    Why f64: in f32, BOTH paths compute stats in f32 but with different
    summation orders (jnp.mean vs block-accumulated sums); the ~1e-7
    relative stats noise gets amplified ~1e5x through 53 BN
    renormalizations of this random tiny-batch net (the same chaos class as
    DP-vs-single gradients, test_parallel.py). f64 stats (stat dtype
    follows f64 inputs, ops/layers._stat_dtype) push the noise floor low
    enough that semantic differences would stand out by ~6 orders of
    magnitude."""
    from myimagecaptioningmodel_tpu.models import mobilenet_v2 as M

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(3)
        params, state = M.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), params
        )
        state = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), state
        )
        # batch 8 / 64x64 keeps late-layer stats over >=32 values:
        # tinier regimes amplify even f64 summation-order noise ~1e10x
        x = jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float64)
        outs = {}
        for fuse in (False, True):
            y, ns = M.apply(
                params, state, x, train=True, compute_dtype=jnp.float64,
                fuse_bn_stats=fuse,
            )
            outs[fuse] = (np.asarray(y), ns)
        np.testing.assert_allclose(outs[True][0], outs[False][0], atol=1e-7)
        for a, b in zip(
            jax.tree_util.tree_leaves(outs[False][1]),
            jax.tree_util.tree_leaves(outs[True][1]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-7
            )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_full_train_step_runs_with_flag():
    """The flagged path drives a full captioner train step end-to-end (f32):
    finite loss, finite grads; value-level equivalence is pinned per-layer
    (above) and in f64 for the full encoder."""
    dims = DecoderDims(vocab_size=12, embedding_size=8, hidden_dim=16,
                       feat_channels=1280)
    opts = ModelOptions(dims=dims, sentence_length=5, infer_max_length=5,
                        compute_dtype="float32", fuse_bn_stats=True)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), F32)
    caps = jnp.asarray(rng.randint(1, 12, (2, 5)), jnp.int32)
    tx = optax.adam(1e-3)
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    opt_state = tx.init(params)

    def lf(p):
        return captioner.loss_fn(p, state, images, caps, opts, True)

    (loss, _new_state), grads = jax.value_and_grad(lf, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
    updates, _ = tx.update(grads, opt_state, params)
    optax.apply_updates(params, updates)
