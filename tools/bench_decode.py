#!/usr/bin/env python
"""p50/p90 caption-decode latency on the real chip (BASELINE.md metric 3).

Measures the full inference path at batch 1: multimodal encode (SwinV2 +
frozen T5 encoder + main T5 encoder over the concat) and the KV-cache decode
loop at the reference's HF-default max_length=20 — greedy AND beam search
(num_beams=4; the cache-reorder gathers cost something, VERDICT r1 item 6).
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
    from klab_multimodalmodel_tpu.infer import (beam_search_decode,
                                                greedy_decode)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.utils import enable_compile_cache

    enable_compile_cache()
    # Decode levers (measured in BASELINE.md):
    #   KLAB_DECODE_UNROLL=0 unrolls the layer scan (fewer, larger kernels
    #     per decode step at higher compile cost);
    #   KLAB_DECODE_BF16=1 casts params to bf16 (halves per-step weight
    #     streaming — inference-only, frozen-tower-safe);
    #   KLAB_DECODE_FUSED=1 runs encode+decode as ONE jit program (one
    #     host->device dispatch per caption instead of two).
    #   KLAB_DECODE_INT8=1 int8 weight-only decode (infer/quantize.py):
    #     dense kernels + tied head stored int8, rest bf16 — the decode
    #     loop's params; the encode prefill keeps the bf16/fp32 params.
    unroll = int(os.environ.get("KLAB_DECODE_UNROLL", "1"))
    bf16_params = os.environ.get("KLAB_DECODE_BF16", "0") == "1"
    fused = os.environ.get("KLAB_DECODE_FUSED", "0") == "1"
    int8 = os.environ.get("KLAB_DECODE_INT8", "0") == "1"
    #   KLAB_DECODE_MODEL / KLAB_DECODE_SRC: tower size and padded source
    #     width — default = bench geometry (t5-base, 64); flagship =
    #     t5-large + 256 (the reference's default config).
    model_name = os.environ.get("KLAB_DECODE_MODEL", "t5-base")
    src_len = int(os.environ.get("KLAB_DECODE_SRC", "64"))
    cfg = Config(language_model_name=model_name,
                 transformer_model_name=model_name,
                 max_source_length=src_len, compute_dtype="bfloat16",
                 scan_unroll=unroll)
    model = MultiModalModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))
    src = jnp.asarray(rng.integers(2, 1000, (1, src_len)), jnp.int32)
    mask = jnp.ones((1, src_len), jnp.int32)
    # Jit the init: eager init dispatches one op per parameter, which over
    # the tunneled backend costs ~minutes at t5-base and much worse at
    # flagship t5-large; one compiled init program takes seconds.
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize_images(img, dtype=jnp.bfloat16),
        src, jnp.zeros((1, 4), jnp.int32), source_mask=mask)["params"]

    if bf16_params:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    dec_params = params["transformer"]
    if int8:
        from klab_multimodalmodel_tpu.infer.quantize import \
            quantize_for_decode

        # KLAB_DECODE_INT8_HEAD=1 additionally int8-quantizes the tied
        # LM head (off by default — measured neutral on greedy and a
        # beam regression at t5-base, BASELINE.md int8 table).
        head = os.environ.get("KLAB_DECODE_INT8_HEAD", "0") == "1"
        dec_params = quantize_for_decode(dec_params, int8_head=head)

    t5 = model.transformer_module()

    @jax.jit
    def encode(params, img, src, mask):
        return model.apply({"params": params},
                           normalize_images(img, dtype=jnp.bfloat16), src,
                           mask, method=model.encode_for_generation)

    from functools import partial

    @partial(jax.jit, static_argnums=(5,))
    def caption_fused(params, dparams, img, src, mask, num_beams):
        enc, enc_mask = model.apply(
            {"params": params}, normalize_images(img, dtype=jnp.bfloat16),
            src, mask, method=model.encode_for_generation)
        if num_beams == 1:
            return greedy_decode(t5, dparams, enc, enc_mask,
                                 cfg.generate_max_length)
        return beam_search_decode(t5, dparams, enc, enc_mask,
                                  cfg.generate_max_length, num_beams, 1.0)

    def caption_once(num_beams: int):
        if fused:
            return np.asarray(caption_fused(params, dec_params, img, src,
                                            mask, num_beams))
        enc, enc_mask = encode(params, img, src, mask)
        if num_beams == 1:
            ids = greedy_decode(t5, dec_params, enc, enc_mask,
                                cfg.generate_max_length)
        else:
            ids = beam_search_decode(t5, dec_params, enc,
                                     enc_mask, cfg.generate_max_length,
                                     num_beams, 1.0)
        return np.asarray(ids)  # host read = sync

    out = {"metric": "caption decode latency (batch 1, max_length 20)",
           "unit": "ms", "model": model_name, "src": src_len,
           "int8": int8}
    for label, beams in (("greedy", 1), ("beam4", 4)):
        caption_once(beams)  # compile
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            caption_once(beams)
            lat.append(time.perf_counter() - t0)
        lat_ms = sorted(x * 1e3 for x in lat)
        out[f"{label}_p50_ms"] = round(lat_ms[len(lat_ms) // 2], 2)
        out[f"{label}_p90_ms"] = round(lat_ms[int(len(lat_ms) * 0.9)], 2)

    # Bucketed prompt (what infer/captioner.py feeds for the ~10-token COCO
    # prompt: pad columns trimmed to the 16-wide power-of-two bucket instead
    # of the padded max_source_length) — same encode/decode programs at the
    # narrower static shape.
    bsrc16 = src[:, :16]
    bmask16 = jnp.ones((1, 16), jnp.int32)

    def caption_bucketed():
        enc, enc_mask = encode(params, img, bsrc16, bmask16)
        return np.asarray(greedy_decode(t5, dec_params, enc,
                                        enc_mask, cfg.generate_max_length))

    caption_bucketed()  # compile
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        caption_bucketed()
        lat.append(time.perf_counter() - t0)
    lat_ms = sorted(x * 1e3 for x in lat)
    out["greedy_bucketed16_p50_ms"] = round(lat_ms[len(lat_ms) // 2], 2)
    out["greedy_bucketed16_p90_ms"] = round(lat_ms[int(len(lat_ms) * 0.9)],
                                            2)
    print(json.dumps(out))

    # Batched decode THROUGHPUT — what sizes the full-val CIDEr run
    # (evaluation/evaluate.py greedy-decodes val2017 ~5k images batch-32):
    # img/s here x 5000 predicts its wall-clock.
    out_b = {"metric": "batched greedy decode throughput (max_length 20)",
             "unit": "images/sec", "model": model_name, "src": src_len,
             "int8": int8}
    for B in (8, 32):
        bimg = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                        dtype=np.uint8))
        for tag, w in (("", src.shape[1]), ("_bucketed16", 16)):
            bsrc = jnp.broadcast_to(src[:, :w], (B, w))
            bmask = jnp.ones((B, w), jnp.int32)

            def caption_batch():
                enc, enc_mask = encode(params, bimg, bsrc, bmask)
                return np.asarray(greedy_decode(
                    t5, dec_params, enc, enc_mask,
                    cfg.generate_max_length))

            caption_batch()  # compile
            n_rep = 10
            t0 = time.perf_counter()
            for _ in range(n_rep):
                caption_batch()
            dt = time.perf_counter() - t0
            out_b[f"batch{B}{tag}_img_s"] = round(B * n_rep / dt, 1)
    out_b["val2017_predicted_minutes"] = round(
        5000 / out_b["batch32_bucketed16_img_s"] / 60, 1)
    print(json.dumps(out_b))


if __name__ == "__main__":
    main()
