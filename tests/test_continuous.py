"""Continuous-batching caption service (serve/continuous.py).

Pins the service-level contract on a micro model: engine-path results are
identical to a direct Captioner greedy call, concurrent and staggered
arrivals all match their solo results, ineligible requests transparently
fall back to the dynamic batcher, and the HTTP surface works unchanged.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cont_service():
    import jax

    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.serve.continuous import (
        ContinuousCaptionService)
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    register_t5_size("t5-cont-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-cont-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))
    cfg = Config(language_model_name="t5-cont-micro",
                 transformer_model_name="t5-cont-micro",
                 image_model_name="swin-cont-micro",
                 max_source_length=32, generate_max_length=6,
                 compute_dtype="float32", scan_unroll=1)
    model = MultiModalModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, cfg.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]
    service = ContinuousCaptionService(cfg, params, ByteTokenizer(),
                                       max_batch=4, window_ms=10.0,
                                       slots=4, engine_chunk=2,
                                       max_prefill=4)
    yield service
    service.close()


def _png_bytes(rng, size=40):
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _direct(service, png):
    from klab_multimodalmodel_tpu.data.datasets import (
        COCO_PROMPT, load_image_bytes_resized)

    img = load_image_bytes_resized(png, service.config.swin.image_size)
    return service.captioner.caption(img[None], [COCO_PROMPT])[0]


def test_engine_path_matches_direct_captioner(cont_service, rng):
    png = _png_bytes(rng)
    served = cont_service.caption_bytes(png)
    assert served == _direct(cont_service, png)
    # The default greedy request must have gone through the ENGINE, not
    # the fallback batcher.
    snap = cont_service.stats.snapshot()
    assert snap["requests"] >= 1
    assert snap["fallback"]["requests"] == 0


def test_concurrent_requests_share_the_resident_batch(cont_service, rng):
    pngs = [_png_bytes(rng) for _ in range(6)]
    served = [None] * len(pngs)

    def worker(i):
        served[i] = cont_service.caption_bytes(pngs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(pngs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, png in enumerate(pngs):
        assert served[i] == _direct(cont_service, png), f"request {i}"


def test_staggered_arrivals_match_solo(cont_service, rng):
    """Late arrivals join slots mid-decode and still match their solo
    captions (the engine-parity property, exercised at service level)."""
    import time

    pngs = [_png_bytes(rng) for _ in range(4)]
    served = [None] * len(pngs)

    def worker(i):
        time.sleep(0.03 * i)  # stagger admissions across chunk boundaries
        served[i] = cont_service.caption_bytes(pngs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(pngs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, png in enumerate(pngs):
        assert served[i] == _direct(cont_service, png), f"request {i}"


def test_ineligible_requests_fall_back(cont_service, rng):
    from klab_multimodalmodel_tpu.serve.service import GenParams

    png = _png_bytes(rng)
    before = cont_service.stats.snapshot()["fallback"]["requests"]
    # Beam search is engine-ineligible -> dynamic batcher.
    beam = cont_service.caption_bytes(
        png, gen=GenParams(max_length=6, num_beams=2))
    after = cont_service.stats.snapshot()["fallback"]["requests"]
    assert after == before + 1
    assert isinstance(beam, str)
    # max_length beyond the engine buffer -> fallback too (and must equal
    # the engine-width-free direct result).
    long_len = cont_service._scheduler.max_length + 2
    out = cont_service.caption_bytes(
        png, gen=GenParams(max_length=long_len, num_beams=1))
    assert isinstance(out, str)
    assert cont_service.stats.snapshot()["fallback"]["requests"] == after + 1


def test_http_end_to_end_continuous(cont_service, rng):
    from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

    server = CaptionHTTPServer(cont_service, host="127.0.0.1", port=0)
    base = f"http://127.0.0.1:{server.port}"
    try:
        server.start(warmup=False)
        png = _png_bytes(rng)
        import base64

        req = urllib.request.Request(
            base + "/caption",
            data=json.dumps(
                {"image_b64": base64.b64encode(png).decode()}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert r.status == 200
        assert body["caption"] == _direct(cont_service, png)
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert "engine_slots" in stats and "fallback" in stats
    finally:
        server.stop()


def test_sampling_engine_routes_and_falls_back(rng):
    """A sampling-configured engine serves matching sampled requests on
    the engine path (zero fallback) and routes greedy/mismatched-warper
    requests to the dynamic batcher."""
    import jax

    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.serve.continuous import (
        ContinuousCaptionService)
    from klab_multimodalmodel_tpu.serve.service import GenParams
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    register_t5_size("t5-cont-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-cont-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))
    cfg = Config(language_model_name="t5-cont-micro",
                 transformer_model_name="t5-cont-micro",
                 image_model_name="swin-cont-micro",
                 max_source_length=32, generate_max_length=6,
                 compute_dtype="float32", scan_unroll=1)
    model = MultiModalModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, cfg.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]
    service = ContinuousCaptionService(
        cfg, params, ByteTokenizer(), max_batch=4, window_ms=10.0,
        slots=4, engine_chunk=2, max_prefill=4,
        engine_do_sample=True, engine_temperature=0.8)
    try:
        png = _png_bytes(rng)
        sampled = GenParams(max_length=6, num_beams=1, do_sample=True,
                            temperature=0.8)
        out = service.caption_bytes(png, gen=sampled)
        assert isinstance(out, str)
        snap = service.stats.snapshot()
        assert snap["requests"] >= 1
        assert snap["fallback"]["requests"] == 0  # engine path

        # Greedy no longer matches the sampling tick -> fallback; so does
        # a different temperature.
        service.caption_bytes(png, gen=GenParams(max_length=6,
                                                 num_beams=1))
        service.caption_bytes(png, gen=GenParams(
            max_length=6, num_beams=1, do_sample=True, temperature=0.5))
        assert service.stats.snapshot()["fallback"]["requests"] == 2

        # Seed hygiene (ADVICE r4): explicit seeds are validated — not
        # silently wrapped by np.uint32 — and reproducible per seed.
        from klab_multimodalmodel_tpu.data.datasets import (
            COCO_PROMPT, load_image_bytes_resized)

        img = load_image_bytes_resized(png, cfg.swin.image_size)
        ids, mask, fits = service._tokenize_for_engine(COCO_PROMPT)
        assert fits
        for bad in (-1, 1 << 32):
            with pytest.raises(ValueError, match="seed"):
                service._scheduler.submit(img, ids, mask, 6, 30.0, seed=bad)
        a = service._scheduler.submit(img, ids, mask, 6, 30.0, seed=7)
        b = service._scheduler.submit(img, ids, mask, 6, 30.0, seed=7)
        np.testing.assert_array_equal(a[0][:a[1]], b[0][:b[1]])
    finally:
        service.close()
