"""Fused inverted-residual Pallas kernel vs XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from myimagecaptioningmodel_tpu.models import mobilenet_v2
from myimagecaptioningmodel_tpu.ops.pallas import fused_irb as F


def make_folded(rng, cin, cexp, cout):
    return F.FoldedIRB(
        we=jnp.asarray(rng.randn(cin, cexp) * 0.3, jnp.float32),
        be=jnp.asarray(rng.randn(1, cexp) * 0.1, jnp.float32),
        wd=jnp.asarray(rng.randn(9, cexp) * 0.3, jnp.float32),
        bd=jnp.asarray(rng.randn(1, cexp) * 0.1, jnp.float32),
        wp=jnp.asarray(rng.randn(cexp, cout) * 0.3, jnp.float32),
        bp=jnp.asarray(rng.randn(1, cout) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize(
    "h,cin,cexp,cout,stride,shortcut",
    [
        (8, 8, 24, 8, 1, True),
        (8, 8, 24, 16, 1, False),
        (8, 8, 24, 16, 2, False),
        (14, 16, 48, 16, 1, True),
        (14, 16, 48, 24, 2, False),
    ],
)
def test_fused_irb_matches_reference(h, cin, cexp, cout, stride, shortcut):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, h, cin) * 0.5, jnp.float32)
    folded = make_folded(rng, cin, cexp, cout)
    ref = F.reference_irb(x, folded, stride, shortcut)
    with pltpu.force_tpu_interpret_mode():
        out = F.fused_inverted_residual(x, folded, stride, shortcut)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fold_bn_math():
    """Folded conv+BN (eval) must equal conv followed by eval-mode BN."""
    from myimagecaptioningmodel_tpu.ops import layers as L

    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(1, 1, 4, 6), jnp.float32)
    bn_p = {"scale": jnp.asarray(rng.rand(6) + 0.5, jnp.float32),
            "offset": jnp.asarray(rng.randn(6), jnp.float32)}
    bn_s = {"mean": jnp.asarray(rng.randn(6), jnp.float32),
            "var": jnp.asarray(rng.rand(6) + 0.5, jnp.float32)}
    x = jnp.asarray(rng.randn(2, 5, 5, 4), jnp.float32)

    y_ref = L.conv2d({"w": w}, x, 1, 0, 1, jnp.float32)
    y_ref, _ = L.batch_norm(bn_p, bn_s, y_ref, train=False)

    wf, bf = F.fold_bn(w, bn_p, bn_s)
    y_fold = L.conv2d({"w": wf}, x, 1, 0, 1, jnp.float32) + bf
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref), atol=1e-5)


def test_full_encoder_fused_eval_matches_unfused():
    """Whole-encoder fused (pallas, interpret) vs unfused eval forward."""
    params, state = mobilenet_v2.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    ref, _ = mobilenet_v2.apply(params, state, x, train=False, compute_dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, out_state = mobilenet_v2.apply(
            params, state, x, train=False, compute_dtype=jnp.float32, use_fused_irb=True
        )
    assert out.shape == ref.shape
    assert out_state is state  # eval: no BN state change
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fold_irb_matches_unfused_model_block():
    """fold_irb of real model params == the model's own eval-mode block."""
    params, state = mobilenet_v2.init(jax.random.PRNGKey(0))
    # stage conv3 block 2: stride 1, shortcut, cin=24, cexp=144
    name = "conv3_2"
    bp = {k: params[name + "_" + k] for k in ("expand", "dwise", "linear")}
    bs = {k: state[name + "_" + k] for k in ("expand", "dwise", "linear")}
    folded = F.fold_irb(bp, bs)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 24) * 0.5, jnp.float32)

    # unfused eval path: expand -> dwise -> linear (+shortcut)
    y, _ = mobilenet_v2._apply_conv_bn(bp["expand"], bs["expand"], x, 1, 0, 1, True, False, jnp.float32)
    y, _ = mobilenet_v2._apply_conv_bn(bp["dwise"], bs["dwise"], y, 1, 1, y.shape[-1], True, False, jnp.float32)
    y, _ = mobilenet_v2._apply_conv_bn(bp["linear"], bs["linear"], y, 1, 0, 1, False, False, jnp.float32)
    y = y + x

    out = F.reference_irb(x, folded, 1, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y), atol=1e-4)
