"""Replica scale-out serving (serve/replicas.py).

No reference analogue; the framework's multi-chip serving surface. The
virtual 8-device CPU mesh (conftest) stands in for a multi-chip host:
each replica's params and inputs must actually live on its own device,
results must bit-match the single-service path, and the router must
spread concurrent load.
"""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def replicated():
    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.serve.replicas import \
        ReplicatedCaptionService
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    register_t5_size("t5-rep-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-rep-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))
    cfg = Config(language_model_name="t5-rep-micro",
                 transformer_model_name="t5-rep-micro",
                 image_model_name="swin-rep-micro",
                 max_source_length=32, generate_max_length=6,
                 compute_dtype="float32", scan_unroll=1)
    model = MultiModalModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, cfg.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]
    devices = jax.devices()[:2]
    assert len(devices) == 2, "conftest must provide >= 2 virtual devices"
    service = ReplicatedCaptionService(cfg, params, ByteTokenizer(),
                                       devices, max_batch=2, window_ms=5.0,
                                       stream_chunk=2)
    yield service
    service.close()


def _png_bytes(rng, size=40):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_replica_params_pinned_to_their_devices(replicated):
    """Each replica's params (and therefore its compiled programs) live on
    exactly its assigned device — scale-out means zero cross-chip traffic."""
    for service, device in zip(replicated.replicas, replicated.devices):
        leaf = jax.tree_util.tree_leaves(service.captioner.params)[0]
        assert leaf.devices() == {device}


def test_replicas_bitmatch_each_other_and_spread_load(replicated, rng):
    """Every replica computes the same function; concurrent requests land
    on more than one replica."""
    pngs = [_png_bytes(rng) for _ in range(6)]
    # Direct per-replica answers agree (same params, different chips).
    for png in pngs[:2]:
        a = replicated.replicas[0].caption_bytes(png)
        b = replicated.replicas[1].caption_bytes(png)
        assert a == b

    results = {}

    def worker(i):
        results[i] = replicated.caption_bytes(pngs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, png in enumerate(pngs):
        assert results[i] == replicated.replicas[0].caption_bytes(png)
    per = replicated.stats.snapshot()["per_replica"]
    assert all(p["requests"] > 0 for p in per), per


def test_replica_router_prefers_least_loaded(replicated):
    """With replica 0 marked busy, new requests go to replica 1."""
    with replicated._lock:
        replicated._inflight[0] += 5
    try:
        idx = [replicated._acquire() for _ in range(3)]
        for i in idx:
            replicated._release(i)
        assert idx == [1, 1, 1]
    finally:
        with replicated._lock:
            replicated._inflight[0] -= 5


def test_replicated_stream_matches_blocking(replicated, rng):
    png = _png_bytes(rng)
    events = list(replicated.caption_stream_bytes(png, chunk_size=2))
    assert events[-1][1] is True
    assert events[-1][0] == replicated.caption_bytes(png)
    # The stream released its replica slot.
    assert replicated._inflight == [0, 0]


def test_http_server_over_replicated_service(replicated, rng):
    """CaptionHTTPServer serves the router interchangeably with the
    single-chip service (same duck-typed surface)."""
    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(replicated, host="127.0.0.1", port=0)
    base = f"http://127.0.0.1:{server.port}"
    try:
        server.start(warmup=False)
        png = _png_bytes(rng)
        req = urllib.request.Request(
            base + "/caption",
            data=json.dumps(
                {"image_b64": base64.b64encode(png).decode()}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            caption = json.loads(r.read())["caption"]
        assert caption == replicated.caption_bytes(png)
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            snap = json.loads(r.read())
        assert snap["replicas"] == 2 and len(snap["per_replica"]) == 2
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_replicated_warmup_and_rejects_empty():
    from klab_multimodalmodel_tpu.serve.replicas import \
        ReplicatedCaptionService

    with pytest.raises(ValueError, match="non-empty"):
        ReplicatedCaptionService(None, None, None, [])
