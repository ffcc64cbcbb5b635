#!/usr/bin/env python
"""Streaming-decode latency on the real chip: TTFB and total caption time
vs chunk size, against the blocking loop (BASELINE.md serving section).

What streaming buys and costs on TPU: the blocking ``greedy_decode`` is
ONE device program (lowest total latency, but the first byte arrives with
the last), while ``stream_chunk`` pays one host dispatch + token read per
chunk. This bench quantifies that trade at the bench geometry so
``--stream_chunk`` ships with a measured default.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.data.image_ops import normalize_images
    from klab_multimodalmodel_tpu.infer import greedy_decode, stream_decode
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.utils import enable_compile_cache

    enable_compile_cache()
    model_name = os.environ.get("KLAB_DECODE_MODEL", "t5-base")
    src_len = int(os.environ.get("KLAB_DECODE_SRC", "64"))
    max_len = int(os.environ.get("KLAB_STREAM_MAX_LENGTH", "20"))
    cfg = Config(language_model_name=model_name,
                 transformer_model_name=model_name,
                 max_source_length=src_len, compute_dtype="bfloat16",
                 scan_unroll=1)
    model = MultiModalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))
    src = jnp.asarray(rng.integers(2, 1000, (1, src_len)), jnp.int32)
    mask = jnp.ones((1, src_len), jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize_images(img, dtype=jnp.bfloat16),
        src, jnp.zeros((1, 4), jnp.int32), source_mask=mask)["params"]
    dec_params = params["transformer"]
    t5 = model.transformer_module()

    @jax.jit
    def encode(params, img, src, mask):
        return model.apply({"params": params},
                           normalize_images(img, dtype=jnp.bfloat16), src,
                           mask, method=model.encode_for_generation)

    enc, enc_mask = encode(params, img, src, mask)
    np.asarray(enc)  # sync

    out = {"metric": "streaming caption decode (batch 1)", "unit": "ms",
           "model": model_name, "max_length": max_len}

    # Blocking reference: encode cached above, decode-only timing.
    def blocking():
        return np.asarray(greedy_decode(t5, dec_params, enc, enc_mask,
                                        max_len))

    blocking()  # compile
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        blocking()
        lat.append((time.perf_counter() - t0) * 1e3)
    out["blocking_p50_ms"] = round(sorted(lat)[len(lat) // 2], 2)

    for chunk in (1, 2, 4, 8):
        # Compile both stream programs for this chunk size first.
        for _ in stream_decode(t5, dec_params, enc, enc_mask, max_len,
                               chunk_size=chunk):
            pass
        ttfb, total = [], []
        for _ in range(20):
            t0 = time.perf_counter()
            first = None
            for _tokens, _n, _done in stream_decode(
                    t5, dec_params, enc, enc_mask, max_len,
                    chunk_size=chunk):
                if first is None:
                    first = time.perf_counter()
            ttfb.append((first - t0) * 1e3)
            total.append((time.perf_counter() - t0) * 1e3)
        out[f"chunk{chunk}_ttfb_p50_ms"] = round(
            sorted(ttfb)[len(ttfb) // 2], 2)
        out[f"chunk{chunk}_total_p50_ms"] = round(
            sorted(total)[len(total) // 2], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
