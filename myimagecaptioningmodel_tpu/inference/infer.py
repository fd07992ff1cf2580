"""Single-image inference (reference infer.py:14-41).

``python -m myimagecaptioningmodel_tpu.inference.infer <url-or-path>``:
fetch an image (http(s) URL via requests, else local path), preprocess,
load the exported inference bundle, greedy-decode, print the raw id list
and the detokenized sentence — the reference CLI contract.
"""

from __future__ import annotations

import sys
from io import BytesIO
from typing import List, Tuple

import numpy as np
from PIL import Image

from myimagecaptioningmodel_tpu.data import image as image_mod
from myimagecaptioningmodel_tpu.evaluation import metrics
from myimagecaptioningmodel_tpu.evaluation.evaluate import load_bundle


def fetch_image(url_or_path: str) -> Image.Image:
    if url_or_path.startswith(("http://", "https://")):
        import requests

        resp = requests.get(url_or_path)
        if resp.status_code != 200:
            raise ConnectionError(
                f"failed to download image {url_or_path}: {resp.status_code}"
            )
        return Image.open(BytesIO(resp.content))
    return Image.open(url_or_path)


def caption_image(
    cfg, img: Image.Image, bundle: str = "infer", beam_size: int = 0,
    quantize: bool = False, early_stop: bool = False,
    length_norm: float = 0.0,
) -> Tuple[List[int], str]:
    """-> (raw id list, detokenized sentence). ``beam_size>1`` = beam search;
    ``quantize`` = int8 decoder weights; ``early_stop`` = while_loop greedy
    decode that exits at all-<stop> (same caption, lower latency);
    ``length_norm`` = GNMT-style beam score normalization by len**alpha."""
    arr = image_mod.process_image(
        img, cfg.data.image_shape, cfg.data.image_mean, cfg.data.image_std
    )
    if arr is None:
        raise ValueError("image is not a 3-channel RGB image")
    batch = image_mod.chw_to_nhwc(arr[None])

    params, model_state, _bcfg, _opts, decode = load_bundle(
        cfg, bundle, beam_size, quantize, early_stop=early_stop,
        length_norm=length_norm,
    )

    from myimagecaptioningmodel_tpu.data.reader import DataReader

    index_word = DataReader(cfg).index_word
    ids = np.asarray(decode(params, model_state, batch))[0].tolist()
    words = metrics.filter_ids(
        ids, index_word, cfg.data.stop_idx, cfg.data.padding_idx
    )
    return ids, metrics.words2sentence(words)


def main(
    url: str, cfg=None, bundle: str = "infer", beam_size: int = 0,
    quantize: bool = False, early_stop: bool = False,
    length_norm: float = 0.0,
) -> str:
    from myimagecaptioningmodel_tpu import config as config_mod

    cfg = cfg or config_mod.default
    ids, sentence = caption_image(
        cfg, fetch_image(url), bundle=bundle, beam_size=beam_size,
        quantize=quantize, early_stop=early_stop, length_norm=length_norm,
    )
    print(ids)
    print(sentence)
    return sentence


if __name__ == "__main__":
    assert len(sys.argv) == 2, "usage: infer.py <image-url-or-path>"
    main(sys.argv[1])
