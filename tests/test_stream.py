"""Streaming generation: chunked resumable decode, the batcher call lane,
and the SSE serving surface.

No reference analogue (the reference's inference is one notebook cell);
the contract pinned here is the framework's own: a stream's chunks
concatenate to EXACTLY the monolithic decode's tokens (greedy and
sampling share `_sequential_body` with the streaming loop by
construction), streams ride the single device dispatcher one chunk at a
time, and the HTTP layer speaks well-formed server-sent events.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.infer import (greedy_decode, sample_decode,
                                            stream_decode)
from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration
from klab_multimodalmodel_tpu.serve.batcher import DynamicBatcher

TINY = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
              num_decoder_layers=2, num_heads=4, vocab_size=64,
              relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)


@pytest.fixture(scope="module")
def tiny_t5():
    model = T5ForConditionalGeneration(TINY)
    params = model.init(
        jax.random.PRNGKey(0), input_ids=jnp.zeros((3, 5), jnp.int32),
        labels=jnp.zeros((3, 4), jnp.int32))["params"]
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.normal(size=(3, 5, 32)).astype(np.float32))
    return model, params, enc


# ---------------------------------------------------------------------------
# generate.stream_decode vs the monolithic loops
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("chunk", [1, 3, 5, 20])
def test_stream_matches_greedy_any_chunk(tiny_t5, chunk):
    """Final stream tokens == greedy_decode for every chunk size, every
    intermediate yield is a prefix of the final sequence, and the yield
    count is ceil((L-1-1)/chunk) + 1 short of early-eos."""
    model, params, enc = tiny_t5
    ref = np.asarray(greedy_decode(model, params, enc, None, 12))
    outs = list(stream_decode(model, params, enc, None, 12,
                              chunk_size=chunk))
    tokens, n_valid, done = outs[-1]
    assert done and np.array_equal(tokens, ref)
    assert all(not d for *_, d in outs[:-1])
    for t, n, _ in outs:
        assert np.array_equal(t[:, :n], ref[:, :n])
    # n_valid grows by exactly chunk per yield (no early eos in this
    # random model at these lengths — guarded by the count check).
    valids = [n for _, n, _ in outs]
    assert valids[0] == 2 and valids[-1] == 12
    assert all(b - a <= chunk for a, b in zip(valids, valids[1:]))


def test_stream_matches_sampling_same_rng(tiny_t5):
    """Chunked sampling draws the same threefry stream (keys fold on the
    ABSOLUTE step), so any chunking is token-identical to sample_decode."""
    model, params, enc = tiny_t5
    key = jax.random.PRNGKey(7)
    ref = np.asarray(sample_decode(model, params, enc, None, 12, key,
                                   1.3, 5, 0.9))
    for chunk in (1, 4):
        outs = list(stream_decode(model, params, enc, None, 12,
                                  chunk_size=chunk, do_sample=True,
                                  temperature=1.3, top_k=5, top_p=0.9,
                                  rng=key))
        assert np.array_equal(outs[-1][0], ref)


def test_stream_rejects_bad_chunk(tiny_t5):
    model, params, enc = tiny_t5
    with pytest.raises(ValueError, match="chunk_size"):
        next(stream_decode(model, params, enc, None, 12, chunk_size=0))


def test_stream_accepts_quantized_params(tiny_t5):
    """Streaming under int8 weight-only decode (the `--int8 --stream_chunk`
    serving combination) matches the monolithic int8 greedy loop."""
    from klab_multimodalmodel_tpu.infer.quantize import quantize_for_decode

    model, params, enc = tiny_t5
    qp = quantize_for_decode(params, cast_dtype=None)
    ref = np.asarray(greedy_decode(model, qp, enc, None, 12))
    outs = list(stream_decode(model, qp, enc, None, 12, chunk_size=3))
    assert np.array_equal(outs[-1][0], ref)


# ---------------------------------------------------------------------------
# DynamicBatcher.submit_call (model-free)
# ---------------------------------------------------------------------------

def test_submit_call_runs_on_dispatcher_and_returns():
    b = DynamicBatcher(lambda key, payloads: [f"{key}:{p}" for p in payloads],
                       max_batch=4, window_ms=1.0)
    try:
        names = []

        def job():
            names.append(threading.current_thread().name)
            return 42

        assert b.submit_call(job, timeout=10) == 42
        assert names == ["klab-serve-dispatch"]
        assert b.stats.snapshot()["calls"] == 1
    finally:
        b.close()


def test_submit_call_interleaves_with_batches():
    """Call jobs and batched submits flow through one dispatcher without
    merging: every submit gets its batch result, every call its return."""
    b = DynamicBatcher(lambda key, payloads: [f"{key}:{p}" for p in payloads],
                       max_batch=4, window_ms=5.0)
    results = {}
    try:
        def submit_worker(i):
            results[f"s{i}"] = b.submit("k", i, timeout=30)

        def call_worker(i):
            results[f"c{i}"] = b.submit_call(lambda: i * 10, timeout=30)

        threads = ([threading.Thread(target=submit_worker, args=(i,))
                    for i in range(4)] +
                   [threading.Thread(target=call_worker, args=(i,))
                    for i in range(4)])
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert {results[f"s{i}"] for i in range(4)} == {
            f"k:{i}" for i in range(4)}
        assert all(results[f"c{i}"] == i * 10 for i in range(4))
    finally:
        b.close()


def test_submit_call_error_propagates_and_keeps_serving():
    b = DynamicBatcher(lambda key, payloads: list(payloads),
                       max_batch=2, window_ms=1.0)
    try:
        def boom():
            raise RuntimeError("stream exploded")

        with pytest.raises(RuntimeError, match="stream exploded"):
            b.submit_call(boom, timeout=10)
        assert b.stats.snapshot()["errors"] == 1
        # Dispatcher survives: both lanes still serve.
        assert b.submit_call(lambda: "ok", timeout=10) == "ok"
        assert b.submit("k", "x", timeout=10) == "x"
    finally:
        b.close()


def test_submit_call_closed_raises():
    b = DynamicBatcher(lambda key, payloads: list(payloads), max_batch=2)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit_call(lambda: 1)


# ---------------------------------------------------------------------------
# CaptionService streaming + SSE end to end (micro model)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def micro_service():
    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.serve.service import CaptionService
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    register_t5_size("t5-stream-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-stream-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))
    cfg = Config(language_model_name="t5-stream-micro",
                 transformer_model_name="t5-stream-micro",
                 image_model_name="swin-stream-micro",
                 max_source_length=32, generate_max_length=6,
                 compute_dtype="float32", scan_unroll=1)
    model = MultiModalModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, cfg.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]
    service = CaptionService(cfg, params, ByteTokenizer(), max_batch=2,
                             window_ms=5.0, stream_chunk=2)
    yield service
    service.close()


def _png_bytes(rng, size=40):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_service_stream_matches_blocking_caption(micro_service, rng):
    png = _png_bytes(rng)
    events = list(micro_service.caption_stream_bytes(png, chunk_size=2))
    captions = [c for c, _ in events]
    dones = [d for _, d in events]
    assert dones[-1] and not any(dones[:-1])
    # Cumulative text grows monotonically and ends at the blocking result.
    assert all(len(a) <= len(b) for a, b in zip(captions, captions[1:]))
    assert captions[-1] == micro_service.caption_bytes(png)


def test_service_stream_rejects_beams_and_bad_chunk(micro_service, rng):
    from klab_multimodalmodel_tpu.serve.service import GenParams

    png = _png_bytes(rng)
    with pytest.raises(ValueError, match="greedy/sampling"):
        next(micro_service.caption_stream_bytes(
            png, gen=GenParams(max_length=6, num_beams=2)))
    with pytest.raises(ValueError, match="chunk_size"):
        next(micro_service.caption_stream_bytes(png, chunk_size=0))


def test_service_stream_interleaves_with_batched_requests(micro_service,
                                                          rng):
    """A stream and concurrent batched requests share the dispatcher;
    everyone gets the same answer a solo run produces."""
    pngs = [_png_bytes(rng) for _ in range(3)]
    stream_png = _png_bytes(rng)
    results = {}

    def stream_worker():
        results["stream"] = [
            c for c, _ in micro_service.caption_stream_bytes(
                stream_png, chunk_size=1)][-1]

    def batch_worker(i):
        results[i] = micro_service.caption_bytes(pngs[i])

    threads = ([threading.Thread(target=stream_worker)] +
               [threading.Thread(target=batch_worker, args=(i,))
                for i in range(3)])
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results["stream"] == micro_service.caption_bytes(stream_png)
    for i in range(3):
        assert results[i] == micro_service.caption_bytes(pngs[i])


def test_http_sse_stream_end_to_end(micro_service, rng):
    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(micro_service, host="127.0.0.1", port=0)
    base = f"http://127.0.0.1:{server.port}"
    try:
        server.start(warmup=False)
        png = _png_bytes(rng)

        def post(path, payload):
            req = urllib.request.Request(
                base + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            return urllib.request.urlopen(req, timeout=60)

        with post("/caption_stream", {
                "image_b64": base64.b64encode(png).decode(),
                "chunk_size": 2}) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "text/event-stream"
            body = r.read().decode()
        events = [json.loads(line[len("data: "):])
                  for line in body.split("\n\n") if line.startswith("data: ")]
        assert len(events) >= 2  # first token + at least one chunk
        assert events[-1]["done"] and not any(
            e["done"] for e in events[:-1])
        # SSE final text == the blocking endpoint's caption.
        with post("/caption", {
                "image_b64": base64.b64encode(png).decode()}) as r:
            blocking = json.loads(r.read())["caption"]
        assert events[-1]["caption"] == blocking

        # Pre-stream validation errors stay ordinary JSON responses.
        try:
            post("/caption_stream", {
                "image_b64": base64.b64encode(png).decode(),
                "num_beams": 4})
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "greedy/sampling" in json.loads(e.read())["error"]
        try:
            post("/caption_stream", {
                "image_b64": base64.b64encode(png).decode(),
                "chunk_size": "two"})
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()
