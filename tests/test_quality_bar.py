"""Pipeline QUALITY bar (VERDICT r2 #3 / weak #6): the full build -> train ->
export -> evaluate path must reach a BLEU bar on a learnable synthetic
corpus — a regression that silently degrades captions (while loss still
falls) now fails. Also pins that every decode variant (greedy / beam /
early-stop / int8 / server) agrees on the trained bundle.

The corpus is *learnable*, not memorization-only: each image is a noisy
solid color keyed to its caption class, so held-out dev/test images are
classifiable and exact-caption BLEU-4 = 1.0 is reachable through the same
metric path as reference evaluate.py:57-72."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = [pytest.mark.slow, pytest.mark.quality]

from myimagecaptioningmodel_tpu import config as config_mod
from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.evaluation import evaluate as evaluate_mod
from myimagecaptioningmodel_tpu.training import loop

# Short captions and 3 well-separated classes: free-running (argmax-
# feedback) decode is exposure-bias-brittle at tiny scale, and longer
# captions/more classes plateau at BLEU~0.4 (probed in round 3); this recipe
# reaches dev/test BLEU 1.0 with loss ~0.04 in ~50 epochs.
CLASSES = [
    ((230, 40, 40), "一个 男人 在 打 篮球"),
    ((40, 230, 40), "一只 猫 在 睡觉"),
    ((40, 40, 230), "一个 女人 在 跑步"),
]


# Both decoder families run the identical pipeline bar. Per-arch LR: the
# transformer overshoots at the LSTM's 8e-3 (probed: loss converges but
# free-running decode collapses to one class on a split; 3e-3/2e-3 are
# borderline — one split flips per run); 1e-3 reaches dev AND test
# BLEU-4 = 1.0 with the widest margin.
ARCHS = {
    "lstm": {"learning_rate": 8e-3, "decoder": {}},
    "transformer": {
        "learning_rate": 1e-3,
        "decoder": {"arch": "transformer", "num_layers": 2, "num_heads": 4,
                    "mlp_ratio": 2},
    },
}


@pytest.fixture(scope="module", params=sorted(ARCHS))
def memorized(request, tmp_path_factory):
    arch = request.param
    root = tmp_path_factory.mktemp(f"quality_{arch}")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(23)
    records = []
    for i in range(24):
        color, phrase = CLASSES[i % 3]
        arr = np.clip(
            np.asarray(color, np.int16)[None, None, :]
            + rng.randint(-15, 15, (48, 48, 3)),
            0, 255,
        ).astype(np.uint8)
        name = f"img_{i:03d}.jpg"
        Image.fromarray(arr).save(img_dir / name, quality=95)
        records.append({"image_id": name, "caption": [phrase]})
    ann = root / "ann.json"
    ann.write_text(json.dumps(records, ensure_ascii=False), encoding="utf-8")

    out = root / "ds"
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
                "sample_count": 24,  # cosine schedule's steps-per-epoch base
            },
            "train": {
                "seed": 0,
                "learning_rate": ARCHS[arch]["learning_rate"],
                "batch_size": 4,
                "max_epoch": 50,
                "lr_decay_strategy": "cosine_decay",
                "decay_epoch": 50,
                "log_every_n_step": 50,
                "checkpoint_path": str(root / "save"),
            },
            "model": {
                "decoder": {
                    "vocab_size": 0, "embedding_size": 16,
                    "sentence_length": 0, "hidden_dim": 48,
                    "infer_max_length": 8,
                    **ARCHS[arch]["decoder"],
                },
                "compute_dtype": "float32",
            },
            "log": {"log_path": str(root / "log")},
        }
    )
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.vocab_size", summary["tokenize"]["vocab_size"]
    )
    cfg = config_mod.replace_nested(
        cfg, "model.decoder.sentence_length", summary["tokenize"]["max_len"]
    )
    result = loop.train(cfg, mesh=None)
    return cfg, result, img_dir


def test_full_pipeline_reaches_bleu_bar(memorized):
    """dev AND test BLEU-4 >= 0.9 through the full evaluate() path (exported
    bundle -> decode -> detokenize -> NLTK-method4 BLEU)."""
    cfg, result, _img_dir = memorized
    assert result["last_epoch_loss"] < 0.3  # sanity: training converged
    for mode in ("dev", "test"):
        res = evaluate_mod.evaluate(cfg, bundle="infer", mode=mode)
        assert res["bleu"][3] >= 0.9, (mode, res["bleu"])
        assert res["bleu"][4] >= 0.9, (mode, res["bleu"])  # mean BLEU too


def test_decode_variants_agree_on_trained_bundle(memorized):
    """greedy / beam-3 / early-stop / int8 / server captions all match on the
    trained (confident) model — any decode-path regression that changes
    captions fails here."""
    cfg, _result, img_dir = memorized

    def caption_map(**kw):
        res = evaluate_mod.evaluate(cfg, bundle="infer", mode="test", **kw)
        return res["bleu"][3], res["bleu"][4]

    base = caption_map()
    for kw in ({"beam_size": 3}, {"early_stop": True}, {"quantize": True}):
        got = caption_map(**kw)
        np.testing.assert_allclose(got, base, atol=1e-6, err_msg=str(kw))

    # the resident server yields the same caption as the offline path
    from myimagecaptioningmodel_tpu.evaluation import metrics
    from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle
    from myimagecaptioningmodel_tpu.inference import server as server_mod

    params, state, _bcfg, opts, decode = load_bundle(cfg, "infer")
    svc = server_mod.CaptionService(cfg, batch_size=2, max_wait_ms=1.0)
    try:
        from myimagecaptioningmodel_tpu.data import image as image_mod

        for i in (0, 1):
            path = os.path.join(str(img_dir), f"img_{i:03d}.jpg")
            with open(path, "rb") as f:
                served = svc.caption_bytes(f.read())
            img = Image.open(path).convert("RGB")
            arr = image_mod.process_image(
                img, tuple(cfg.data.image_shape),
                cfg.data.image_mean, cfg.data.image_std,
            )
            x = image_mod.chw_to_nhwc(arr[None])
            ids = np.asarray(decode(params, state, x))[0]
            words = metrics.filter_ids(
                ids.tolist(), svc.index_word, cfg.data.stop_idx,
                cfg.data.padding_idx,
            )
            assert served["caption"] == metrics.words2sentence(words)
            # the trained model emits SOME class phrase verbatim (dev/test
            # exactness per-image is already pinned by the BLEU-1.0 bar;
            # individual train-split images may flip class in eval mode)
            assert served["caption"] in {p for _c, p in CLASSES}
    finally:
        svc.close()
