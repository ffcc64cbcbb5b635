#!/usr/bin/env python
"""Serving throughput/latency under concurrent load (BASELINE.md).

Drives the dynamic-batching :class:`CaptionService` (t5-base towers,
random-init params — throughput is caption-content-independent) with N
closed-loop client threads, each submitting encoded JPEG bytes exactly the
way `klab-serve` request handlers do, and reports sustained captions/s,
p50/p90 end-to-end latency, and mean batch occupancy per concurrency level.

The sweep shows the batcher's core trade: concurrency 1 gives the batch-1
latency floor; concurrency >= max_batch fills buckets and multiplies
throughput. ``--http`` routes the same load through the loopback stdlib
HTTP server to price the transport layer.

Usage:
  KLAB_TEST_PLATFORM=tpu python tools/bench_serve.py [--max_batch 8]
      [--concurrency 1,4,8,16] [--seconds 20] [--http]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jpeg_payloads(n: int, size: int) -> list[bytes]:
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        arr = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        out.append(buf.getvalue())
    return out


def _drive(submit, payloads: list[bytes], concurrency: int,
           seconds: float) -> dict:
    """Closed-loop load: each client thread fires its next request the
    moment the previous one returns. Latencies recorded per request."""
    stop = time.perf_counter() + seconds
    lock = threading.Lock()
    latencies: list[float] = []
    errors = [0]

    def client(i: int) -> None:
        k = i
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                submit(payloads[k % len(payloads)], k)
            except Exception:
                with lock:
                    errors[0] += 1
                continue
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
            k += concurrency

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    lat = sorted(latencies)
    pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0  # noqa: E731
    return {
        "concurrency": concurrency,
        "captions_per_s": round(len(lat) / elapsed, 2),
        "p50_ms": round(pct(0.50) * 1e3, 1),
        "p90_ms": round(pct(0.90) * 1e3, 1),
        "completed": len(lat),
        "errors": errors[0],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--concurrency", default="1,4,8,16")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--max_length", type=int, default=20,
                    help="decode length (HF default 20, BASELINE metric 3)")
    ap.add_argument("--mixed_lengths", default="",
                    help="comma list (e.g. 20,64,128): request k uses the "
                         "k-th length of the mix as its max_length — the "
                         "heterogeneous workload where continuous "
                         "batching's admission advantage can show "
                         "(uniform lengths structurally favor the "
                         "dynamic batcher; BASELINE.md r3)")
    ap.add_argument("--http", action="store_true",
                    help="drive through the loopback HTTP server instead "
                         "of the in-process service")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only decode (infer/quantize.py)")
    ap.add_argument("--continuous", action="store_true",
                    help="continuous-batching service (serve/continuous.py) "
                         "instead of the dynamic batcher")
    ap.add_argument("--slots", type=int, default=16,
                    help="resident decode-batch rows for --continuous")
    ap.add_argument("--engine_chunk", type=int, default=4,
                    help="decode steps per admission/reap boundary for "
                         "--continuous")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.data.image_ops import normalize_images
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.serve.service import CaptionService
    from klab_multimodalmodel_tpu.text import ByteTokenizer
    from klab_multimodalmodel_tpu.utils import enable_compile_cache

    enable_compile_cache()
    mixed = ([int(x) for x in args.mixed_lengths.split(",")]
             if args.mixed_lengths else [])
    cfg = Config(language_model_name="t5-base",
                 transformer_model_name="t5-base",
                 max_source_length=64, compute_dtype="bfloat16",
                 generate_max_length=(max(mixed) if mixed
                                      else args.max_length))
    model = MultiModalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))
    src = jnp.asarray(rng.integers(2, 1000, (1, 64)), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), normalize_images(img, dtype=jnp.bfloat16),
        src, jnp.zeros((1, 4), jnp.int32),
        source_mask=jnp.ones((1, 64), jnp.int32))["params"]
    tokenizer = ByteTokenizer(vocab_size=cfg.transformer_t5.vocab_size)

    if args.continuous:
        from klab_multimodalmodel_tpu.serve.continuous import (
            ContinuousCaptionService)

        service = ContinuousCaptionService(
            cfg, params, tokenizer, max_batch=args.max_batch,
            window_ms=args.window_ms, decode_int8=args.int8,
            slots=args.slots, engine_chunk=args.engine_chunk)
    else:
        service = CaptionService(cfg, params, tokenizer,
                                 max_batch=args.max_batch,
                                 window_ms=args.window_ms,
                                 decode_int8=args.int8)
    print(f"warmup (buckets 1..{args.max_batch}, "
          f"max_length={args.max_length})...", file=sys.stderr)
    t0 = time.perf_counter()
    service.warmup()
    print(f"warmup done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    payloads = _jpeg_payloads(64, cfg.swin.image_size)

    if args.http:
        import base64
        import urllib.request

        from klab_multimodalmodel_tpu.serve.http import CaptionHTTPServer

        server = CaptionHTTPServer(service, host="127.0.0.1", port=0)
        server.start(warmup=False)
        url = f"http://127.0.0.1:{server.port}/caption"

        def submit(data: bytes, k: int = 0) -> None:
            payload = {"image_b64": base64.b64encode(data).decode()}
            if mixed:
                payload["max_length"] = mixed[k % len(mixed)]
            body = json.dumps(payload).encode()
            req = urllib.request.Request(
                url, data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                json.loads(r.read())
    else:
        from klab_multimodalmodel_tpu.serve.service import GenParams

        def submit(data: bytes, k: int = 0) -> None:
            gen = (GenParams(max_length=mixed[k % len(mixed)],
                             num_beams=1)
                   if mixed else None)
            service.caption_bytes(data, gen=gen)

    if mixed:
        # Pre-compile every length in the mix (max_length is a static of
        # the decode programs) so the timed window measures steady state.
        print(f"warming mixed lengths {mixed}...", file=sys.stderr)
        for i in range(len(mixed)):
            submit(payloads[0], i)

    results = []
    for c in (int(x) for x in args.concurrency.split(",")):
        before = service.stats.snapshot()
        r = _drive(submit, payloads, c, args.seconds)
        after = service.stats.snapshot()
        d_rows = (after["mean_batch_occupancy"] * after["batches"]
                  - before["mean_batch_occupancy"] * before["batches"])
        d_batches = after["batches"] - before["batches"]
        r["mean_batch_occupancy"] = round(
            d_rows / d_batches if d_batches else 0.0, 2)
        r["transport"] = "http" if args.http else "inproc"
        if args.continuous:
            r["mode"] = f"continuous(slots={args.slots}," \
                        f"chunk={args.engine_chunk})"
        if mixed:
            r["mixed_lengths"] = mixed
        results.append(r)
        print(json.dumps(r))

    best = max(results, key=lambda r: r["captions_per_s"])
    print(json.dumps({"metric": "serve_captions_per_s", "best": best}))


if __name__ == "__main__":
    main()
