#!/usr/bin/env python
"""Speculative greedy decode on the real chip (infer/speculative.py).

Two measurements, printed as JSON lines:

1. **Mechanism cost** — ms per decoder pass at verification width T =
   1..8: a jitted ``fori_loop`` of N cached decode steps, each feeding a
   (1, T) chunk (exactly the speculative verify step, minus drafting). At
   batch 1 the step is weight-stream-bound, so the curve should be nearly
   flat — this is the number that makes speculation pay. The implied
   break-even acceptance is derived directly from it:
   speculation with draft K wins iff the mean accepted-per-pass ``E[a]``
   satisfies ``1 + E[a] > cost(T=K+1) / cost(T=1)``.

2. **End-to-end p50** — full caption decode (encode once; decode-only
   timed) greedy vs speculative at several draft lengths, with the
   accepted-draft totals the run actually achieved. CAVEAT, recorded so
   nobody reads the headline naively: random-weight models emit highly
   repetitive (n-gram-predictable) streams, so the measured acceptance
   here is an UPPER bound for trained-model captioning; the honest
   transferable claim is the mechanism-cost curve + the break-even
   formula. With real weights, prompt-lookup acceptance on COCO captions
   is workload-dependent (repeated articles/phrases help; novel content
   words don't).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.data.image_ops import normalize_images
    from klab_multimodalmodel_tpu.infer import (
        greedy_decode, speculative_greedy_decode_with_stats)
    from klab_multimodalmodel_tpu.infer.generate import _init_cache
    from klab_multimodalmodel_tpu.infer.speculative import _chunk_step
    from klab_multimodalmodel_tpu.utils import enable_compile_cache
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel

    enable_compile_cache()
    model_name = os.environ.get("KLAB_DECODE_MODEL", "t5-base")
    src_len = int(os.environ.get("KLAB_DECODE_SRC", "64"))
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
    t5 = model.transformer_module()
    dec_params = params["transformer"]
    # KLAB_DECODE_INT8=1: combine with weight-only int8 (infer/quantize.py)
    # — int8 shrinks the per-pass weight stream, speculation cuts the pass
    # count; the two levers are independent and multiply.
    int8 = os.environ.get("KLAB_DECODE_INT8", "0") == "1"
    if int8:
        from klab_multimodalmodel_tpu.infer.quantize import \
            quantize_for_decode

        dec_params = quantize_for_decode(dec_params)

    @jax.jit
    def encode(params, img, src, mask):
        return model.apply({"params": params},
                           normalize_images(img, dtype=jnp.bfloat16), src,
                           mask, method=model.encode_for_generation)

    enc, enc_mask = encode(params, img, src, mask)
    enc, enc_mask = jax.block_until_ready(enc), jax.block_until_ready(enc_mask)

    # -- 1. mechanism cost: N chunked decode passes at width T ------------
    N = 20

    @partial(jax.jit, static_argnums=(0, 4, 5, 6))
    def nstep_probe(t5, dec_params, enc, enc_mask, T, N, L):
        size = t5.size
        B = enc.shape[0]
        start = jnp.full((B, 1), size.decoder_start_token_id, jnp.int32)
        logits0, cache = _init_cache(t5, dec_params, enc, enc_mask, start, L)
        tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)

        def body(i, carry):
            cache, tok = carry
            chunk = jnp.broadcast_to(tok[:, None], (B, T))
            logits, cache = _chunk_step(t5, dec_params, cache, chunk,
                                        1 + i * T, enc, enc_mask, L)
            return cache, jnp.argmax(logits[:, -1], axis=-1).astype(
                jnp.int32)

        _, tok = jax.lax.fori_loop(0, N, body, (cache, tok))
        return tok

    costs = {}
    for T in (1, 2, 3, 4, 5, 6, 8):
        L = N * T + 2
        np.asarray(nstep_probe(t5, dec_params, enc, enc_mask, T, N, L))
        lat = []
        for _ in range(15):
            t0 = time.perf_counter()
            np.asarray(nstep_probe(t5, dec_params, enc, enc_mask, T, N, L))
            lat.append(time.perf_counter() - t0)
        lat.sort()
        costs[T] = lat[len(lat) // 2] * 1e3 / N  # p50 ms per pass
    out = {"metric": "cached decode pass cost vs verification width "
                     "(batch 1, N=20 passes, p50)",
           "unit": "ms/pass", "model": model_name, "int8": int8,
           "ms_per_pass": {str(t): round(c, 3) for t, c in costs.items()},
           "breakeven_mean_accept": {
               str(t): round(costs[t] / costs[1] - 1.0, 3)
               for t in costs if t > 1}}
    print(json.dumps(out))

    # -- 2. end-to-end decode-only p50: greedy vs speculative -------------
    for max_length in (20, 64):
        res = {"metric": "speculative vs greedy decode p50 (batch 1, "
                         f"max_length {max_length})",
               "unit": "ms", "model": model_name,
               "caveat": "random weights -> repetitive streams; "
                         "acceptance is an upper bound (see docstring)"}

        def run_greedy():
            return np.asarray(greedy_decode(t5, dec_params, enc, enc_mask,
                                            max_length))

        run_greedy()
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            run_greedy()
            lat.append(time.perf_counter() - t0)
        lat.sort()
        res["greedy_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 2)

        for K in (2, 4, 6):
            # Stats come from ONE un-timed call; the timed loop fetches
            # only the token array — each extra device->host read is a
            # tunnel RTT (~20 ms here) that would swamp the 4-pass loop.
            tokens, iters, acc = speculative_greedy_decode_with_stats(
                t5, dec_params, enc, enc_mask, max_length,
                draft_len=K, ngram=2)
            tokens, iters, acc = (np.asarray(tokens), int(iters),
                                  int(np.asarray(acc)[0]))
            assert np.array_equal(tokens, run_greedy()), (
                "speculative output diverged from greedy")

            def run_spec():
                t, _, _ = speculative_greedy_decode_with_stats(
                    t5, dec_params, enc, enc_mask, max_length,
                    draft_len=K, ngram=2)
                return np.asarray(t)

            run_spec()
            lat = []
            for _ in range(30):
                t0 = time.perf_counter()
                run_spec()
                lat.append(time.perf_counter() - t0)
            lat.sort()
            res[f"spec_k{K}_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 2)
            res[f"spec_k{K}_passes"] = iters
            res[f"spec_k{K}_accepted"] = acc
        print(json.dumps(res))

    # -- 3. batched decode throughput (what klab-eval's val loop pays) ----
    # Per-row positions let rows accept independently; the loop runs until
    # the SLOWEST row finishes, so the batched win depends on the spread
    # of per-row pass counts, not just the mean — measure, don't model.
    res_b = {"metric": "batched speculative vs greedy decode throughput "
                       "(max_length 20)",
             "unit": "images/sec", "model": model_name,
             "caveat": "same upper-bound acceptance caveat as above"}
    for B in (8, 32):
        bimg = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                        dtype=np.uint8))
        bsrc = jnp.asarray(rng.integers(2, 1000, (B, src_len)), jnp.int32)
        bmask = jnp.ones((B, src_len), jnp.int32)
        benc, benc_mask = encode(params, bimg, bsrc, bmask)
        benc = jax.block_until_ready(benc)

        def g_run():
            return np.asarray(greedy_decode(t5, dec_params, benc,
                                            benc_mask, 20))

        ref = g_run()
        n_rep = 10
        t0 = time.perf_counter()
        for _ in range(n_rep):
            g_run()
        res_b[f"batch{B}_greedy_img_s"] = round(
            B * n_rep / (time.perf_counter() - t0), 1)

        for K in (4,):
            def s_run():
                t, _, _ = speculative_greedy_decode_with_stats(
                    t5, dec_params, benc, benc_mask, 20, draft_len=K,
                    ngram=2)
                return np.asarray(t)

            tokens = s_run()
            assert np.array_equal(tokens, ref), (
                "batched speculative diverged from greedy")
            t0 = time.perf_counter()
            for _ in range(n_rep):
                s_run()
            res_b[f"batch{B}_spec_k{K}_img_s"] = round(
                B * n_rep / (time.perf_counter() - t0), 1)
    print(json.dumps(res_b))


if __name__ == "__main__":
    main()
