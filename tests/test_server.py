"""Caption server (inference/server.py): dynamic batching, HTTP surface,
and agreement with the direct decode path."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from myimagecaptioningmodel_tpu.data import dataset_gen
from myimagecaptioningmodel_tpu.inference import server as server_mod
from myimagecaptioningmodel_tpu.training import loop

from test_feed_pipeline import build_corpus, make_cfg, patch_vocab


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    root = tmp_path_factory.mktemp("server")
    img_dir, ann = build_corpus(root)
    cfg = make_cfg(root, img_dir, ann, "srv", export_infer_model=True)
    summary = dataset_gen.build_all(cfg, segmenter="space", split_seed=0)
    cfg = patch_vocab(cfg, summary)
    loop.train(cfg, mesh=None)
    svc = server_mod.CaptionService(cfg, batch_size=4, max_wait_ms=30.0)
    yield cfg, svc, img_dir
    svc.close()


def jpeg_bytes(rng, size=40):
    buf = io.BytesIO()
    Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


def test_caption_bytes_matches_direct_decode(service):
    cfg, svc, _img_dir = service
    rng = np.random.RandomState(0)
    data = jpeg_bytes(rng)

    out = svc.caption_bytes(data)
    assert isinstance(out["ids"], list) and isinstance(out["caption"], str)

    # direct decode of the same prepared row through the service's own jit
    row = svc.prepare(data)
    imgs = np.zeros((svc.batch_size, *row.shape), np.float32)
    imgs[0] = row
    ids = np.asarray(svc.decode(svc.params, svc.state, imgs))[0]
    assert out["ids"] == [int(v) for v in ids]


def test_concurrent_requests_batch_together(service):
    _cfg, svc, _ = service
    rng = np.random.RandomState(1)
    payloads = [jpeg_bytes(rng) for _ in range(4)]
    results = [None] * 4
    errors = []

    def worker(i):
        try:
            results[i] = svc.caption_bytes(payloads[i])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert all(r is not None and r["ids"] for r in results)


def test_http_surface(service):
    _cfg, svc, _ = service
    httpd = server_mod.make_server(svc, port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batch"] == 4
        assert health["served"] >= 1 and health["dispatches"] >= 1
        assert health["decode_ms_p50"] is None or health["decode_ms_p50"] > 0

        rng = np.random.RandomState(2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=jpeg_bytes(rng),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert "ids" in out and "caption" in out

        # malformed body -> 400 with an error message, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/caption", data=b"not an image",
            method="POST",
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        httpd.shutdown()


def test_server_beam_mode(service):
    cfg, _svc, _ = service
    svc2 = server_mod.CaptionService(cfg, batch_size=2, beam_size=2,
                                     max_wait_ms=5.0)
    try:
        rng = np.random.RandomState(7)
        out = svc2.caption_bytes(jpeg_bytes(rng))
        assert out["ids"] and isinstance(out["caption"], str)
    finally:
        svc2.close()


def test_http_body_cap(service):
    _cfg, svc, _ = service
    httpd = server_mod.make_server(svc, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        # oversized Content-Length is rejected before reading the body
        conn.putrequest("POST", "/caption")
        conn.putheader("Content-Length", str(64 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "error" in json.loads(resp.read())
        conn.close()

        # zero-length body also rejected
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/caption", body=b"")
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()
    finally:
        httpd.shutdown()


def test_caption_after_close_fails_fast(service):
    """A request issued during/after shutdown must fail immediately, not
    block out the full wait timeout (round-2 race: enqueue after close's
    drain left the caller waiting 60 s)."""
    import time

    cfg, _svc, _img_dir = service
    svc2 = server_mod.CaptionService(cfg, batch_size=2, max_wait_ms=1.0)
    rng = np.random.RandomState(7)
    data = jpeg_bytes(rng)
    assert "caption" in svc2.caption_bytes(data)
    svc2.close()
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="shutting down"):
        svc2.caption_bytes(data, timeout=30.0)
    assert time.monotonic() - t0 < 5.0


def test_concurrency_soak_counters_reconcile(service):
    """Soak the dynamic batcher: many client threads x mixed-size requests,
    greedy and early-stop services, asserting no deadlock, correct
    per-request routing (every thread gets a caption for ITS image), and
    /healthz counters reconciling with requests served."""
    import threading as th

    cfg, _svc, _img_dir = service
    for early_stop in (False, True):
        svc = server_mod.CaptionService(
            cfg, batch_size=4, max_wait_ms=2.0, early_stop=early_stop
        )
        base = svc.stats()["served"]
        n_threads, per_thread = 6, 8
        rng0 = np.random.RandomState(123)
        # distinct image per (thread, i) so routing mixups are detectable:
        # decode determinism means identical bytes must yield identical ids
        payloads = {}
        for t in range(n_threads):
            for i in range(per_thread):
                rng = np.random.RandomState(1000 + t * 100 + i)
                payloads[(t, i)] = jpeg_bytes(rng, size=int(rng0.choice([24, 40, 64])))
        expected = {
            k: svc.caption_bytes(v)["ids"] for k, v in list(payloads.items())[:4]
        }
        errors, results = [], {}
        lock = th.Lock()

        def client(t):
            try:
                for i in range(per_thread):
                    out = svc.caption_bytes(payloads[(t, i)], timeout=120.0)
                    with lock:
                        results[(t, i)] = out["ids"]
            except Exception as e:  # pragma: no cover - failure reporting
                with lock:
                    errors.append((t, repr(e)))

        threads = [th.Thread(target=client, args=(t,)) for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive(), "soak client deadlocked"
        assert not errors, errors
        assert len(results) == n_threads * per_thread
        for k, ids in expected.items():  # routing: same bytes -> same ids
            assert results[k] == ids, k
        stats = svc.stats()
        assert stats["served"] - base == n_threads * per_thread + len(expected)
        # mean fill * dispatches == served (counters internally consistent)
        assert stats["dispatches"] > 0
        np.testing.assert_allclose(
            stats["mean_batch_fill"] * stats["dispatches"],
            stats["served"],
            atol=0.01 * stats["dispatches"] + 0.5,  # mean rounded to 2dp
        )
        svc.close()
