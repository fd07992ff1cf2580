"""Reference (Paddle) checkpoint import: format round-trip, layout
conversions, and caption-level parity.

The headline test fabricates a complete ``save_persistables`` directory with
the reference's variable names (reference train.py:73 output), imports it,
and checks that ``parity_mode`` greedy decode matches a NumPy oracle that
consumes the *paddle-named* variables directly and implements the reference
decode step (model_adaAttention_aic.py:77-127, SURVEY §3.5) — including
Paddle ``lstm_unit``'s (i, f, o, g) gate order and the degenerate
uniform-attention context. Conv-layout conversion (OIHW->HWIO, dense and
depthwise) is pinned by separate NumPy convolution oracles, since the
end-to-end test feeds both sides the same encoder output.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from myimagecaptioningmodel_tpu.compat import paddle_fmt, paddle_import  # noqa: E402
from myimagecaptioningmodel_tpu.models import captioner, mobilenet_v2  # noqa: E402
from myimagecaptioningmodel_tpu.models.captioner import ModelOptions  # noqa: E402
from myimagecaptioningmodel_tpu.models.decoder import DecoderDims  # noqa: E402
from myimagecaptioningmodel_tpu.ops import layers as L  # noqa: E402

E, H, V, C = 8, 16, 64, 1280
STEPS = 10


# ---------------------------------------------------------------- format ----


def test_lod_tensor_round_trip(tmp_path):
    rng = np.random.RandomState(0)
    cases = [
        rng.randn(3, 5).astype(np.float32),
        rng.randn(7).astype(np.float64),
        rng.randint(-9, 9, (2, 3, 4, 5)).astype(np.int64),
        rng.randn(4, 1).astype(np.float16),
        rng.randint(0, 2, (6,)).astype(np.int32),
    ]
    for i, arr in enumerate(cases):
        p = str(tmp_path / f"var_{i}")
        paddle_fmt.write_lod_tensor(p, arr)
        out = paddle_fmt.read_lod_tensor(p)
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


def test_persistables_dir_round_trip(tmp_path):
    d = str(tmp_path / "ckpt")
    tensors = {
        "word_embedding": np.arange(12, dtype=np.float32).reshape(4, 3),
        "fc_0.w_0": np.ones((2, 2), np.float32),
    }
    paddle_fmt.write_persistables_dir(d, tensors)
    out = paddle_fmt.read_persistables_dir(d)
    assert set(out) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])


def test_persistables_dir_skips_non_tensor_files(tmp_path):
    """A __model__ program desc (save_inference_model dirs) or stray
    metadata must be skipped and reported, not abort the import."""
    d = str(tmp_path / "ckpt")
    tensors = {"word_embedding": np.ones((4, 3), np.float32)}
    paddle_fmt.write_persistables_dir(d, tensors)
    with open(os.path.join(d, "__model__"), "wb") as f:
        f.write(b"\x01\x02 program desc bytes, not a LoDTensor")
    with open(os.path.join(d, "notes.txt"), "wb") as f:
        f.write(b"experiment notes")
    skipped = []
    out = paddle_fmt.read_persistables_dir(d, skipped=skipped)
    assert set(out) == {"word_embedding"}
    assert sorted(skipped) == ["__model__", "notes.txt"]


# ------------------------------------------------------- layout conversions ----


def test_gate_permutation():
    h = 2
    # paddle blocks (i, f, o, g) labeled 0..3
    arr = np.repeat(np.arange(4), h)[None, :].astype(np.float32)
    out = paddle_import.permute_lstm_gates(arr, h)
    np.testing.assert_array_equal(out[0], np.repeat([0, 1, 3, 2], h))


def _np_conv_nchw(x, w, stride, pad, groups=1):
    """Direct NCHW/OIHW convolution oracle (loops over taps)."""
    B, Cin, Hh, Ww = x.shape
    O, Ig, k, _ = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    Ho = (Hh + 2 * pad - k) // stride + 1
    Wo = (Ww + 2 * pad - k) // stride + 1
    out = np.zeros((B, O, Ho, Wo), np.float32)
    og = O // groups
    for g in range(groups):
        xg = xp[:, g * Ig : (g + 1) * Ig]
        wg = w[g * og : (g + 1) * og]
        for dy in range(k):
            for dx in range(k):
                tap = xg[:, :, dy : dy + Ho * stride : stride, dx : dx + Wo * stride : stride]
                out[:, g * og : (g + 1) * og] += np.einsum(
                    "bchw,oc->bohw", tap, wg[:, :, dy, dx]
                )
    return out


@pytest.mark.parametrize("groups", [1, 6])
def test_conv_import_matches_numpy_oracle(groups):
    rng = np.random.RandomState(1)
    Cin, k, stride, pad = 6, 3, 2, 1
    O = Cin if groups > 1 else 4
    w_oihw = rng.randn(O, Cin // groups, k, k).astype(np.float32) * 0.3
    x_nchw = rng.randn(2, Cin, 8, 8).astype(np.float32)

    ref = _np_conv_nchw(x_nchw, w_oihw, stride, pad, groups)
    w_hwio = paddle_import.conv_oihw_to_hwio(w_oihw)
    y = L.conv2d(
        {"w": jnp.asarray(w_hwio)},
        jnp.asarray(x_nchw.transpose(0, 2, 3, 1)),
        stride,
        pad,
        groups,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


# ----------------------------------------------------- end-to-end parity ----


def _paddle_var_shapes(enc_params):
    """Every variable the reference checkpoint contains, with its shape."""
    shapes = {
        "word_embedding": (V, E),
        "out_fc_bias": (V,),
        "lstm_w": (E + H + H, 4 * H),
        "lstm_b": (4 * H,),
        "fc_0.w_0": (C, H), "fc_0.b_0": (H,),
        "fc_1.w_0": (C, H), "fc_1.b_0": (H,),
        "fc_2.w_0": (H, H), "fc_2.b_0": (H,),
        "fc_3.w_0": (H, H), "fc_3.b_0": (H,),
        "fc_4.w_0": (E + H, H), "fc_4.b_0": (H,),
        "fc_5.w_0": (H, H), "fc_5.b_0": (H,),
        "fc_6.w_0": (H, H), "fc_6.b_0": (H,),
        "fc_7.w_0": (H, H), "fc_7.b_0": (H,),
        "fc_8.w_0": (H, H), "fc_8.b_0": (H,),
        "fc_9.w_0": (H, 1), "fc_9.b_0": (1,),
        "fc_10.w_0": (H, H), "fc_10.b_0": (H,),
        "fc_11.w_0": (H, E), "fc_11.b_0": (E,),
    }
    for layer, p in enc_params.items():
        kh, kw, ig, o = p["conv"]["w"].shape
        shapes[f"{layer}_weights"] = (o, ig, kh, kw)
        for s in ("scale", "offset", "mean", "variance"):
            shapes[f"{layer}_bn_{s}"] = (o,)
    return shapes


def _make_paddle_vars(enc_params, seed=7):
    rng = np.random.RandomState(seed)
    out = {}
    for name, shape in _paddle_var_shapes(enc_params).items():
        fan_in = shape[0] if len(shape) == 2 else int(np.prod(shape[1:])) or 1
        if name.endswith("_bn_variance"):
            arr = rng.uniform(0.8, 1.2, shape)
        elif name.endswith("_bn_scale"):
            arr = rng.uniform(0.9, 1.1, shape)
        elif name.endswith(("_bn_mean", "_bn_offset", ".b_0")) or name == "lstm_b":
            arr = rng.randn(*shape) * 0.05
        elif name == "out_fc_bias":
            arr = rng.randn(*shape) * 0.1
        elif name == "word_embedding":
            arr = rng.uniform(-0.5, 0.5, shape)
        else:
            arr = rng.randn(*shape) * (1.0 / np.sqrt(fan_in))
        out[name] = arr.astype(np.float32)
    return out


def _oracle_greedy(v, feat, steps, start=2, pad=0):
    """NumPy oracle of the reference eval decode (degenerate attention),
    consuming the paddle-named variables directly."""

    def fc(n, x, act=None):
        y = x @ v[f"{n}.w_0"] + v[f"{n}.b_0"]
        if act == "relu":
            return np.maximum(y, 0.0)
        if act == "tanh":
            return np.tanh(y)
        return y

    def sig(z):
        return 1.0 / (1.0 + np.exp(-z))

    img_embed = fc("fc_0", feat, "relu")  # [B,k,H] (:197)
    global_feat = fc("fc_1", feat.mean(1), "relu")  # [B,H]   (:199)
    img_feat = fc("fc_2", img_embed, "tanh")  # [B,k,H] (:52)
    # fc_3 (img_feat_emb) feeds only the degenerate alpha -> no output effect
    B = feat.shape[0]
    h = np.zeros((B, H), np.float32)
    c = np.zeros((B, H), np.float32)
    word = np.full((B,), start, np.int64)
    ids = []
    k1 = img_feat.shape[1] + 1
    for _ in range(steps):
        wemb = v["word_embedding"][word] * (word != pad)[:, None]
        xt = np.concatenate([wemb, global_feat], axis=-1)  # (:86)
        z = np.concatenate([xt, h], axis=-1) @ v["lstm_w"] + v["lstm_b"]
        i_, f_, o_, g_ = np.split(z, 4, axis=-1)  # paddle gate order (:87-88)
        c_new = sig(f_) * c + sig(i_) * np.tanh(g_)
        h_new = sig(o_) * np.tanh(c_new)
        gate = sig(fc("fc_4", xt) + fc("fc_5", h))  # PREVIOUS hid (:89-91)
        sentinel = gate * np.tanh(c_new)  # NEW cell (:92)
        h, c = h_new, c_new
        p_hid = fc("fc_6", h, "tanh")  # NEW hid (:99)
        ctx = (img_feat.sum(1) + sentinel) / k1  # alpha==1 + reduce_mean (:107-113)
        out = fc("fc_10", ctx + p_hid, "tanh")  # (:115)
        proj = fc("fc_11", out)
        logits = proj @ v["word_embedding"].T + v["out_fc_bias"]  # tying (:15-25)
        word = logits.argmax(-1)
        ids.append(word.astype(np.int32))
    return np.stack(ids, axis=1)


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    opts = ModelOptions(
        dims=DecoderDims(vocab_size=V, embedding_size=E, hidden_dim=H,
                         feat_channels=C),
        sentence_length=STEPS,
        infer_max_length=STEPS,
        parity_mode=True,
        compute_dtype="float32",
        use_pallas=False,
    )
    params, state = captioner.init(jax.random.PRNGKey(0), opts)
    variables = _make_paddle_vars(params["encoder"])
    d = str(tmp_path_factory.mktemp("paddle_ckpt") / "persistables")
    # include optimizer-state files the reference checkpoint also contains
    extra = dict(variables)
    extra["fc_0.w_0_moment1_0"] = np.zeros((C, H), np.float32)
    extra["@LR_DECAY_COUNTER@"] = np.zeros((1,), np.int64)
    paddle_fmt.write_persistables_dir(d, extra)
    params, state, report = paddle_import.import_persistables(
        d, opts, params=params, state=state
    )
    return opts, params, state, variables, report


def test_import_report_clean(imported):
    _, _, _, variables, report = imported
    assert not report.missing
    assert not report.unknown
    assert len(report.skipped) == 2
    assert len(report.imported) == len(variables)


def test_parity_decode_matches_paddle_oracle(imported):
    opts, params, state, variables, _ = imported
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)

    ids = np.asarray(captioner.greedy_decode(params, state, images, opts))

    feat, _ = mobilenet_v2.apply(
        params["encoder"], state["encoder"], images,
        train=False, compute_dtype=jnp.float32,
    )
    feat = np.asarray(feat, np.float32).reshape(2, -1, C)
    oracle_ids = _oracle_greedy(
        variables, feat, STEPS, start=opts.start_idx, pad=opts.padding_idx
    )
    np.testing.assert_array_equal(ids, oracle_ids)


def test_import_into_padded_vocab(imported):
    """word_embedding/out_fc_bias graft into rows [:V] of a padded table and
    the padded rows keep their -1e9 mask bias."""
    opts_pad = ModelOptions(
        dims=DecoderDims(vocab_size=V, embedding_size=E, hidden_dim=H,
                         feat_channels=C, vocab_pad_multiple=128),
        sentence_length=STEPS,
        infer_max_length=STEPS,
        parity_mode=True,
        compute_dtype="float32",
        use_pallas=False,
    )
    _, _, _, variables, _ = imported
    params, state = captioner.init(jax.random.PRNGKey(1), opts_pad)
    report = paddle_import.graft(variables, params, state)
    assert not report.missing
    table = np.asarray(params["decoder"]["embedding"]["table"])
    assert table.shape[0] == 128
    np.testing.assert_array_equal(table[:V], variables["word_embedding"])
    bias = np.asarray(params["decoder"]["out_bias"])
    np.testing.assert_array_equal(bias[:V], variables["out_fc_bias"])
    assert (bias[V:] <= -1e8).all()


def test_bundle_config_pins_model_options(imported, tmp_path):
    """A bundle exported with parity_mode/custom dims must decode with ITS
    recorded model options even when the caller's cfg says otherwise
    (regression: imported reference checkpoints pin parity_mode on)."""
    import dataclasses

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle
    from myimagecaptioningmodel_tpu.training import checkpoint as ckpt

    opts, params, state, _, _ = imported
    bundle_cfg = config_mod.Config()
    bundle_cfg = dataclasses.replace(
        bundle_cfg,
        model=dataclasses.replace(
            bundle_cfg.model,
            parity_mode=True,
            compute_dtype="float32",
            decoder=dataclasses.replace(
                bundle_cfg.model.decoder,
                vocab_size=V, embedding_size=E, hidden_dim=H,
                sentence_length=STEPS, infer_max_length=STEPS,
            ),
        ),
    )
    ckpt.export_inference_bundle(str(tmp_path / "infer"), params, state, bundle_cfg)

    caller_cfg = dataclasses.replace(
        config_mod.Config(),
        train=dataclasses.replace(
            config_mod.Config().train, checkpoint_path=str(tmp_path)
        ),
    )  # caller cfg says full dims + parity off — the bundle must win
    p2, s2, _bcfg, opts2, decode = load_bundle(caller_cfg, "infer")
    assert opts2.parity_mode is True
    assert opts2.dims.vocab_size == V and opts2.dims.hidden_dim == H
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
    ids = np.asarray(decode(p2, s2, images))
    ref = np.asarray(captioner.greedy_decode(params, state, images, opts))
    np.testing.assert_array_equal(ids, ref)


def test_strict_rejects_unknown(imported, tmp_path):
    opts, _, _, variables, _ = imported
    d = str(tmp_path / "bad")
    bad = dict(variables)
    bad["mystery_var"] = np.zeros((3,), np.float32)
    paddle_fmt.write_persistables_dir(d, bad)
    with pytest.raises(ValueError, match="strict"):
        paddle_import.import_persistables(d, opts, strict=True)


def test_import_cli_subprocess(imported, tmp_path):
    """`python -m myimagecaptioningmodel_tpu.compat.paddle_import` converts a
    persistables dir to a bundle that the standard serving path loads."""
    import json
    import os
    import subprocess
    import sys

    from myimagecaptioningmodel_tpu.utils.env import cpu_subprocess_env

    _, _, _, variables, _ = imported
    d = str(tmp_path / "persistables")
    paddle_fmt.write_persistables_dir(d, variables)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": {
            "decoder": {
                "vocab_size": V, "embedding_size": E, "hidden_dim": H,
                "sentence_length": STEPS, "infer_max_length": STEPS,
                "vocab_pad_multiple": 1,
            },
            "compute_dtype": "float32",
        },
    }))
    out = str(tmp_path / "ckpt" / "infer")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = cpu_subprocess_env()
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "myimagecaptioningmodel_tpu.compat.paddle_import",
         d, out, "--config", str(cfg_path), "--strict"],
        env=env, capture_output=True, text=True, timeout=420, cwd=repo,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "0 unknown, 0 missing" in r.stdout

    import dataclasses

    from myimagecaptioningmodel_tpu import config as config_mod
    from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle

    cfg = dataclasses.replace(
        config_mod.Config(),
        train=dataclasses.replace(
            config_mod.Config().train, checkpoint_path=str(tmp_path / "ckpt")
        ),
    )
    p, s, bcfg, opts2, decode = load_bundle(cfg, "infer")
    assert opts2.parity_mode is True  # the importer pins parity mode on
    rng = np.random.RandomState(5)
    ids = np.asarray(
        decode(p, s, jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32))
    )
    assert ids.shape == (2, STEPS)
