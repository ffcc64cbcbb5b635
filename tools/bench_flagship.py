#!/usr/bin/env python
"""Flagship-geometry training benchmark: the reference's DEFAULT config
(t5-large transformer + frozen t5-large text encoder + swinv2-base) on ONE
chip — possible because of adafactor (factored second moments) and bf16
frozen towers. The reference needs 4 GPUs for this model.

vs_baseline divides by the flagship A100 FLOP-model baseline derived in
BASELINE.md ("Flagship-geometry baseline", r3): ~394 GF/image at the 64/32
benchmark sequence lengths (an upper bound on the reference's actual token
work — its max_source_length=256 default is inert, quirk #4: no truncation
+ 'longest' padding over ~10-token caption prompts), 15-20% MFU eager HF
+ per-step host work -> adopted 120 img/s/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGSHIP_BASELINE_IMG_S = 120.0  # BASELINE.md r3 flagship model (64/32)

# Bucketed (COCO-realistic) baseline: the reference's `padding='longest'`
# (/root/reference/train.py:56, quirk #4 — max_source_length inert) means
# it actually computes ~10-token prompts and ~15-token captions, not the
# 64/32 the padded bench grants it. Re-deriving the BASELINE.md flagship
# FLOP model at those lengths: swin 40 GF + frozen t5-large enc fwd
# 2x302Mx10 = 6 GF + main enc fwd+bwd 2x302Mx(64+10)x3 = 134 GF + decoder
# fwd+bwd 2x403Mx15x3 = 36 GF + LM head 2x1024x32128x15x3 = 3 GF
# = ~219 GF/image (vs 394 at 64/32). Same 15-20% eager-HF MFU + host-work
# discount as the 64/32 derivation -> 120 x 394/219 = ~216 img/s/chip.
FLAGSHIP_BUCKETED_BASELINE_IMG_S = 216.0


def main() -> None:
    if os.environ.get("KLAB_FLAGSHIP_SKIP_PADDED"):
        bucketed_main()
        return
    import jax

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.train import Trainer
    from klab_multimodalmodel_tpu.utils import enable_compile_cache, make_mesh

    enable_compile_cache()
    B = int(os.environ.get("KLAB_FLAGSHIP_BATCH", "16"))
    cfg = Config(  # reference defaults: t5-large towers + swinv2-base
        max_source_length=64, max_target_length=32, batch_size=B,
        compute_dtype="bfloat16", optimizer="adafactor",
        frozen_param_dtype="bfloat16", remat="dots_saveable",
        scan_unroll=1, mesh_shape=(-1, 1, 1), data_dir="synthetic")
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), B)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))

    S = cfg.swin.image_size
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8),
        "source_ids": rng.integers(
            2, 1000, (B, cfg.max_source_length)).astype(np.int32),
        "source_mask": np.ones((B, cfg.max_source_length), np.int32),
        "target_ids": rng.integers(
            2, 1000, (B, cfg.max_target_length)).astype(np.int32),
        "target_mask": np.ones((B, cfg.max_target_length), np.int32),
    }
    db = trainer.device_put_batch(batch)
    k = jax.random.key(1, impl=cfg.dropout_rng_impl)

    state, loss = trainer.train_step(state, db, k)
    float(loss)  # host read = true sync (see BASELINE.md measurement note)
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = trainer.train_step(state, db, k)
    float(loss)
    dt = time.perf_counter() - t0
    full_rate = B * n_steps / dt
    print(json.dumps({
        "metric": "flagship train throughput (swinv2-base + t5-large x2, "
                  f"adafactor, bf16-frozen, batch {B}/chip)",
        "value": round(full_rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(full_rate / FLAGSHIP_BASELINE_IMG_S, 2),
        "params": n_params,
    }))

    # Steady-state path of the reference's 50-epoch frozen-tower recipe:
    # frozen swin + t5-large text-encoder forwards come from the
    # cache_frozen_features cache; the step is t5-large grad + adafactor.
    fstate, _, (img_feats, lang_feats) = trainer.train_step_with_features(
        state, db, k)
    state = fstate
    cached = {kk: v for kk, v in db.items() if kk != "images"}
    cached["image_features"] = img_feats
    cached["language_features"] = lang_feats
    state, loss = trainer.train_step(state, cached, k)  # compile
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = trainer.train_step(state, cached, k)
    float(loss)
    dt = time.perf_counter() - t0
    cached_rate = B * n_steps / dt
    print(json.dumps({
        "metric": "flagship train throughput, cached frozen features "
                  f"(steady state, batch {B}/chip)",
        "value": round(cached_rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(cached_rate / FLAGSHIP_BASELINE_IMG_S, 2),
    }))

    # Free the padded-config state before the bucketed trainer allocates
    # its own 1.16B-param state on the same 16 GB chip.
    del state, fstate, db, cached, img_feats, lang_feats, trainer
    jax.clear_caches()

    if os.environ.get("KLAB_FLAGSHIP_SKIP_BUCKETED"):
        return
    bucketed_main()


def bucketed_main() -> None:
    """The apples-to-apples configuration: --bucket_lengths semantics with
    COCO-realistic text (9-token prompts / 15-token captions — what the
    reference's `padding='longest'` actually computes, quirk #4) instead
    of granting ourselves 64/32 padded token work. Loss-identity of the
    trim is pinned by test_bucket_lengths_loss_equivalence; here it is
    the throughput at the config users actually run."""
    import jax

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.train import Trainer
    from klab_multimodalmodel_tpu.utils import make_mesh
    from klab_multimodalmodel_tpu.utils.bucketing import pow2_bucket_width

    B = int(os.environ.get("KLAB_FLAGSHIP_BUCKET_BATCH", "64"))
    remat = os.environ.get("KLAB_FLAGSHIP_REMAT", "dots_saveable")
    cfg = Config(
        max_source_length=64, max_target_length=32, batch_size=B,
        bucket_lengths=True, compute_dtype="bfloat16",
        optimizer="adafactor", frozen_param_dtype="bfloat16",
        remat=remat, scan_unroll=1, mesh_shape=(-1, 1, 1),
        data_dir="synthetic")
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), B)

    S = cfg.swin.image_size
    rng = np.random.default_rng(0)
    src_real, tgt_real = 9, 15  # COCO prompt / caption token counts
    full = {
        "images": rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8),
        "source_ids": rng.integers(
            2, 1000, (B, cfg.max_source_length)).astype(np.int32),
        "source_mask": (np.arange(cfg.max_source_length)[None, :]
                        < src_real).astype(np.int32).repeat(B, axis=0),
        "target_ids": rng.integers(
            2, 1000, (B, cfg.max_target_length)).astype(np.int32),
        "target_mask": (np.arange(cfg.max_target_length)[None, :]
                        < tgt_real).astype(np.int32).repeat(B, axis=0),
    }
    # train/loop.py bucket_batch semantics: pow-2 bucket >= longest row.
    sb = pow2_bucket_width(full["source_mask"], 16)
    tb = pow2_bucket_width(full["target_mask"], 8)
    batch = dict(full)
    for key, w in (("source_ids", sb), ("source_mask", sb),
                   ("target_ids", tb), ("target_mask", tb)):
        batch[key] = np.ascontiguousarray(full[key][:, :w])
    db = trainer.device_put_batch(batch)
    k = jax.random.key(1, impl=cfg.dropout_rng_impl)

    state, loss = trainer.train_step(state, db, k)
    float(loss)
    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = trainer.train_step(state, db, k)
    float(loss)
    dt = time.perf_counter() - t0
    rate = B * n_steps / dt
    print(json.dumps({
        "metric": "flagship train throughput, bucketed lengths "
                  f"({sb}/{tb} COCO-realistic, batch {B}/chip, "
                  f"remat={remat or 'off'})",
        "value": round(rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(rate / FLAGSHIP_BUCKETED_BASELINE_IMG_S, 2),
    }))

    fstate, _, (img_feats, lang_feats) = trainer.train_step_with_features(
        state, db, k)
    state = fstate
    cached = {kk: v for kk, v in db.items() if kk != "images"}
    cached["image_features"] = img_feats
    cached["language_features"] = lang_feats
    state, loss = trainer.train_step(state, cached, k)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = trainer.train_step(state, cached, k)
    float(loss)
    dt = time.perf_counter() - t0
    cached_rate = B * n_steps / dt
    print(json.dumps({
        "metric": "flagship train throughput, bucketed + cached frozen "
                  f"features (steady state, batch {B}/chip)",
        "value": round(cached_rate, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(cached_rate / FLAGSHIP_BUCKETED_BASELINE_IMG_S,
                             2),
    }))


if __name__ == "__main__":
    main()
