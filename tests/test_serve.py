"""Serving subsystem: dynamic batcher, caption service, HTTP front-end.

The reference has no serving layer (its inference story is one notebook
cell); these tests pin the framework's own contract: same-key coalescing,
power-of-two bucket padding that never changes results, error isolation,
and the stdlib HTTP surface end to end.
"""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from klab_multimodalmodel_tpu.serve.batcher import DynamicBatcher
from klab_multimodalmodel_tpu.serve.service import pow2_batch


# ---------------------------------------------------------------------------
# DynamicBatcher (model-free)
# ---------------------------------------------------------------------------

def _echo_batcher(batches, **kw):
    def run(key, payloads):
        batches.append((key, list(payloads)))
        return [f"{key}:{p}" for p in payloads]
    return DynamicBatcher(run, **kw)


def test_batcher_single_request_roundtrip():
    batches = []
    b = _echo_batcher(batches, max_batch=4, window_ms=1.0)
    try:
        assert b.submit("k", "x", timeout=10) == "k:x"
        assert batches == [("k", ["x"])]
        snap = b.stats.snapshot()
        assert snap["requests"] == 1 and snap["batches"] == 1
        assert snap["errors"] == 0
    finally:
        b.close()


def test_batcher_coalesces_concurrent_same_key():
    """Concurrent same-key submits share batches; order preserved within
    a batch; every caller gets its own row back."""
    batches = []
    b = _echo_batcher(batches, max_batch=8, window_ms=200.0)
    results = {}
    try:
        def worker(i):
            results[i] = b.submit("k", i, timeout=30)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == {i: f"k:{i}" for i in range(8)}
        # 8 requests inside a 200ms window with max_batch=8: far fewer
        # batches than requests (the first may dispatch alone, but the rest
        # must coalesce).
        assert sum(len(p) for _, p in batches) == 8
        assert len(batches) <= 4
    finally:
        b.close()


def test_batcher_full_batch_dispatches_before_window():
    """max_batch arrivals dispatch immediately — no pointless window wait."""
    batches = []
    b = _echo_batcher(batches, max_batch=2, window_ms=60_000.0)
    try:
        t0 = time.perf_counter()
        out = []

        def worker(i):
            out.append(b.submit("k", i, timeout=30))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # A 60s window would time this out; full batches must not wait.
        assert time.perf_counter() - t0 < 10
        assert all(len(p) == 2 for _, p in batches)
    finally:
        b.close()


def test_batcher_keys_never_share_a_batch():
    batches = []
    b = _echo_batcher(batches, max_batch=8, window_ms=100.0)
    try:
        def worker(key, i, res):
            res.append(b.submit(key, i, timeout=30))

        res_a, res_b = [], []
        threads = ([threading.Thread(target=worker, args=("a", i, res_a))
                    for i in range(3)] +
                   [threading.Thread(target=worker, args=("b", i, res_b))
                    for i in range(3)])
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for key, payloads in batches:
            assert len({key}) == 1  # run_batch key is the group key
        assert sorted(res_a) == [f"a:{i}" for i in range(3)]
        assert sorted(res_b) == [f"b:{i}" for i in range(3)]
        for key, payloads in batches:
            # every payload in a batch was submitted under that key
            expect = res_a if key == "a" else res_b
            assert all(f"{key}:{p}" in expect for p in payloads)
    finally:
        b.close()


def test_batcher_error_fails_batch_and_keeps_serving():
    calls = {"n": 0}

    def run(key, payloads):
        calls["n"] += 1
        if key == "boom":
            raise ValueError("kernel exploded")
        return list(payloads)

    b = DynamicBatcher(run, max_batch=4, window_ms=1.0)
    try:
        with pytest.raises(ValueError, match="kernel exploded"):
            b.submit("boom", 1, timeout=10)
        assert b.stats.snapshot()["errors"] == 1
        # The dispatcher survived; the next request is served.
        assert b.submit("ok", 2, timeout=10) == 2
    finally:
        b.close()


def test_batcher_result_count_mismatch_is_an_error():
    b = DynamicBatcher(lambda k, p: [], max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="returned 0 results"):
            b.submit("k", "x", timeout=10)
    finally:
        b.close()


def test_batcher_rejects_after_close():
    b = _echo_batcher([], max_batch=2, window_ms=1.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit("k", "x", timeout=1)


def test_pow2_batch():
    assert [pow2_batch(n, 8) for n in (1, 2, 3, 4, 5, 7, 8)] == [
        1, 2, 4, 4, 8, 8, 8]
    assert pow2_batch(9, 8) == 8  # cap wins
    assert pow2_batch(3, 4) == 4


# ---------------------------------------------------------------------------
# CaptionService + HTTP end to end (micro model)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def micro_service():
    import jax

    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.serve.service import CaptionService
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    register_t5_size("t5-serve-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-serve-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))
    cfg = Config(language_model_name="t5-serve-micro",
                 transformer_model_name="t5-serve-micro",
                 image_model_name="swin-serve-micro",
                 max_source_length=32, generate_max_length=6,
                 compute_dtype="float32", scan_unroll=1)
    model = MultiModalModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, cfg.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]
    service = CaptionService(cfg, params, ByteTokenizer(), max_batch=4,
                             window_ms=30.0)
    yield service
    service.close()


def _png_bytes(rng, size=40):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_service_matches_direct_captioner(micro_service, rng):
    """The batched/padded serving path returns exactly what a direct
    Captioner call returns — bucket padding must be invisible."""
    from klab_multimodalmodel_tpu.data.datasets import (
        COCO_PROMPT, load_image_bytes_resized)

    png = _png_bytes(rng)
    served = micro_service.caption_bytes(png)
    img = load_image_bytes_resized(png, micro_service.config.swin.image_size)
    direct = micro_service.captioner.caption(img[None], [COCO_PROMPT])
    assert served == direct[0]


def test_service_concurrent_requests_batch_and_match(micro_service, rng):
    """5 concurrent requests (distinct images) through the 4-wide batcher:
    every caller gets the caption a solo run of its image produces."""
    from klab_multimodalmodel_tpu.data.datasets import (
        COCO_PROMPT, load_image_bytes_resized)

    pngs = [_png_bytes(rng) for _ in range(5)]
    served = [None] * 5

    def worker(i):
        served[i] = micro_service.caption_bytes(pngs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    size = micro_service.config.swin.image_size
    for i, png in enumerate(pngs):
        img = load_image_bytes_resized(png, size)
        assert served[i] == micro_service.captioner.caption(
            img[None], [COCO_PROMPT])[0]
    snap = micro_service.stats.snapshot()
    assert snap["requests"] >= 5
    assert snap["batches"] < snap["requests"]  # some coalescing happened


def test_service_warmup_covers_every_bucket(micro_service):
    assert micro_service.warmup() == [1, 2, 4]


def test_http_server_end_to_end(micro_service, rng):
    """healthz gating, POST /caption, /stats, and 400/404 handling over a
    real socket."""
    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(micro_service, host="127.0.0.1", port=0)
    base = f"http://127.0.0.1:{server.port}"

    def get(path):
        try:
            with urllib.request.urlopen(base + path, timeout=30) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        server.start(warmup=False)  # buckets already warm (module fixture)
        code, body = get("/healthz")
        assert (code, body) == (200, {"status": "ok"})

        png = _png_bytes(rng)
        code, body = post("/caption", {
            "image_b64": base64.b64encode(png).decode()})
        assert code == 200 and isinstance(body["caption"], str)

        # Identical to the direct service path.
        assert body["caption"] == micro_service.caption_bytes(png)

        # Per-request generation overrides route through GenParams.
        code, _ = post("/caption", {
            "image_b64": base64.b64encode(png).decode(), "max_length": 3})
        assert code == 200

        code, body = get("/stats")
        assert code == 200 and body["requests"] >= 2

        code, body = post("/caption", {"image_b64": "!!!not-base64!!!"})
        assert code == 400 and "bad request" in body["error"]

        code, body = post("/caption", {
            "image_b64": base64.b64encode(b"not an image").decode()})
        assert code == 400 and "bad image" in body["error"]

        code, body = post("/caption", {})
        assert code == 400

        code, body = get("/nope")
        assert code == 404
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_http_healthz_503_before_ready(micro_service):
    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(micro_service, host="127.0.0.1", port=0)
    try:
        # Serve without flipping ready: healthz must gate.
        t = threading.Thread(target=server.httpd.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.port}/healthz"
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                code = r.status
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 503
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


# ---------------------------------------------------------------------------
# Review hardening (r3): cap clamping, param validation, cancellation,
# keep-alive correctness
# ---------------------------------------------------------------------------

def test_pow2_batch_never_exceeds_non_pow2_cap():
    """--max_batch need not be a power of two; the top bucket is the cap
    itself, never the next power of two above it."""
    from klab_multimodalmodel_tpu.serve.service import batch_buckets

    assert pow2_batch(5, 6) == 6
    assert pow2_batch(6, 6) == 6
    assert pow2_batch(3, 6) == 4
    assert batch_buckets(6) == [1, 2, 4, 6]
    assert batch_buckets(8) == [1, 2, 4, 8]
    assert batch_buckets(1) == [1]


def test_batcher_timed_out_request_is_cancelled_not_executed():
    """A submit() that times out while queued must never reach run_batch:
    timed-out clients must not keep consuming device work."""
    release = threading.Event()
    seen = []

    def run(key, payloads):
        seen.extend(payloads)
        release.wait(30)  # hold the dispatcher so the next item queues
        return ["r"] * len(payloads)

    b = DynamicBatcher(run, max_batch=1, window_ms=1.0)
    try:
        t = threading.Thread(target=lambda: b.submit("k", "first",
                                                     timeout=30))
        t.start()
        while not seen:  # dispatcher is now inside run_batch("first")
            time.sleep(0.005)
        with pytest.raises(TimeoutError):
            b.submit("k", "doomed", timeout=0.05)
        release.set()
        t.join(timeout=30)
        # A later request flushes the queue past the abandoned item.
        assert b.submit("k", "after", timeout=30) == "r"
        assert "doomed" not in seen
        assert b.stats.snapshot()["abandoned"] == 1
    finally:
        release.set()
        b.close()


def test_normalize_gen_params_bounds_and_coalescing():
    from klab_multimodalmodel_tpu.serve.service import (GenParams,
                                                        normalize_gen_params)

    base = GenParams(max_length=8, num_beams=1)
    # Greedy requests with cosmetically different (unused) sampling fields
    # normalize to ONE group key, so they share a batch + compiled program.
    noisy = GenParams(max_length=8, num_beams=1, temperature=0.5, top_k=7,
                      top_p=0.3)
    assert normalize_gen_params(noisy, 16) == normalize_gen_params(base, 16)
    # Sampling keeps its warper fields.
    samp = GenParams(max_length=8, num_beams=1, do_sample=True,
                     temperature=0.5)
    assert normalize_gen_params(samp, 16).temperature == 0.5
    for bad in (
            GenParams(max_length=0, num_beams=1),
            GenParams(max_length=999, num_beams=1),
            GenParams(max_length=8, num_beams=0),
            GenParams(max_length=8, num_beams=64),
            GenParams(max_length=8, num_beams=4, do_sample=True),
            GenParams(max_length=8, num_beams=1, min_length=9),
            GenParams(max_length=8, num_beams=1, repetition_penalty=0.0),
            GenParams(max_length=8, num_beams=1, do_sample=True,
                      temperature=0.0),
            GenParams(max_length=8, num_beams=1, do_sample=True, top_p=0.0),
            GenParams(max_length=8, num_beams=1, do_sample=True, top_k=-1),
    ):
        with pytest.raises(ValueError):
            normalize_gen_params(bad, 16)


def test_http_keep_alive_survives_error_responses(micro_service, rng):
    """HTTP/1.1 keep-alive: an errored POST (404 route / 400 body / 503)
    must drain the request body, so the SAME connection serves the next
    request correctly."""
    import http.client

    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(micro_service, host="127.0.0.1", port=0)
    try:
        server.start(warmup=False)
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=60)
        png = _png_bytes(rng)
        good = json.dumps(
            {"image_b64": base64.b64encode(png).decode()}).encode()

        # 404 with a body on a persistent connection...
        conn.request("POST", "/captions", body=good,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # ...must not corrupt the next request on the same socket.
        conn.request("POST", "/caption", body=good,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert isinstance(json.loads(r.read())["caption"], str)

        # Same after a 400 (bad params).
        bad = json.dumps({"image_b64": base64.b64encode(png).decode(),
                          "max_length": 100000}).encode()
        conn.request("POST", "/caption", body=bad,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        assert b"max_length" in r.read()
        conn.request("POST", "/caption", body=good,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        r.read()
        conn.close()
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_http_oversized_body_is_refused(micro_service):
    import http.client

    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(micro_service, host="127.0.0.1", port=0)
    try:
        server.start(warmup=False)
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=30)
        # Claim a huge body; the server must answer 413 without reading it.
        conn.putrequest("POST", "/caption")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(1 << 31))
        conn.endheaders()
        r = conn.getresponse()
        assert r.status == 413
        conn.close()
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_batcher_pipelined_launch_finalize_overlap():
    """Pipelined mode: run_batch launches (returns a handle), finalize
    completes on the completer thread; results are correct, errors in
    either stage fail only their batch, and the pipeline actually admits
    a second launch while the first is unfinalized."""
    import queue as q

    launched = q.Queue()
    gate = threading.Event()

    def launch(key, payloads):
        if payloads[0] == "boom-launch":
            raise RuntimeError("launch failed")
        launched.put(list(payloads))
        return ("handle", list(payloads))

    def finalize(key, handle, payloads):
        tag, items = handle
        assert tag == "handle" and items == list(payloads)
        gate.wait(30)  # hold finalize so a second batch can launch
        if payloads[0] == "boom-finalize":
            raise RuntimeError("finalize failed")
        return [f"{key}:{p}!" for p in payloads]

    b = DynamicBatcher(launch, max_batch=2, window_ms=1.0,
                       finalize=finalize, pipeline_depth=2)
    try:
        results = {}
        threads = [threading.Thread(
            target=lambda i=i: results.update({i: b.submit("k", f"p{i}",
                                                           timeout=30)}))
            for i in range(2)]
        for t in threads:
            t.start()
        # Both submits launch (possibly as 1 or 2 batches) BEFORE any
        # finalize completes — proves overlap.
        seen = launched.get(timeout=10)
        total = list(seen)
        while len(total) < 2:
            total += launched.get(timeout=10)
        gate.set()
        for t in threads:
            t.join(timeout=30)
        assert results == {0: "k:p0!", 1: "k:p1!"}

        with pytest.raises(RuntimeError, match="launch failed"):
            b.submit("k", "boom-launch", timeout=30)
        with pytest.raises(RuntimeError, match="finalize failed"):
            b.submit("k", "boom-finalize", timeout=30)
        # Still serving after both failure modes.
        assert b.submit("k", "alive", timeout=30) == "k:alive!"
        snap = b.stats.snapshot()
        assert snap["errors"] == 2
    finally:
        gate.set()
        b.close()
