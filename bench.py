#!/usr/bin/env python
"""Benchmark: caption-training throughput, images/sec/chip on real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Config: the reference's MSCOCO caption workload (SURVEY.md §6) — SwinV2-base
256px vision tower + frozen T5 text encoder + T5 enc-dec transformer — with
bf16 compute, device-side normalization, synthetic in-memory data (isolates
device throughput; the host pipeline is prefetched and overlapped in real
training).

The headline value is the STEADY-STATE step of the reference's own recipe
(run_scripts/caption/*: 50 epochs, frozen towers): with
``cache_frozen_features`` the frozen SwinV2/T5-encoder forwards run once
(epoch 1, which fills the cache as a free aux output at full-step speed) and
later epochs train from cached features with bit-identical losses
(test_train.py pins the equivalence). The JSON also carries the
full-recompute rate and the 50-epoch amortized rate.

Baseline: the reference publishes no numbers (BASELINE.md), so the baseline
is the FLOP-model estimate of the reference on A100 recorded in BASELINE.md
(see "Estimated reference baseline"): 240 images/sec/chip for the
t5-base-geometry benchmark workload (matches
BASELINE_IMAGES_PER_SEC_PER_CHIP below).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


# FLOP-model estimate for the reference implementation on one A100 for THIS
# benchmark's geometry (t5-base towers + swinv2-base, batch 32, seq 64+64/32).
# Full derivation in BASELINE.md ("Estimated reference baseline"): ~123
# GFLOP/image, HF-eager MFU ~15-20% on A100 (312 TF/s bf16 peak), plus the
# reference's per-step host preprocessing (quirk #5 double image processing +
# hot-path tokenization, train.py:55-57) and per-step .item() sync.
BASELINE_IMAGES_PER_SEC_PER_CHIP = 240.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.train import Trainer
    from klab_multimodalmodel_tpu.utils import enable_compile_cache, make_mesh

    enable_compile_cache()

    n_dev = len(jax.devices())
    # Batch 64/chip: the full (recompute) step is batch-insensitive
    # (compute-bound, 487 img/s at 32 or 64), but the cached steady-state
    # step gains ~13% at 64 (941.7 vs 831.9 img/s — transformer-grad MFU
    # rises with more rows; 128 regresses to 905, past the HBM sweet spot).
    batch_per_chip = int(os.environ.get("KLAB_BENCH_BATCH", "64"))
    # TPU-optimized frozen-tower mode (BASELINE.md "SwinV2 levers"): the
    # vision/text towers are FROZEN, so training adapts to their features —
    # bf16 softmax (bounded cosine logits), tanh GELU, and bf16 storage for
    # the frozen towers change those features by ~1% mean rel while cutting
    # the dominant VPU cost. The trainable transformer keeps fp32
    # softmax/loss and exact Adam semantics. Default-config (HF-parity
    # numerics) throughput is recorded alongside in BASELINE.md.
    cfg = Config(language_model_name="t5-base",
                 transformer_model_name="t5-base",
                 max_source_length=64, max_target_length=32,
                 batch_size=batch_per_chip, compute_dtype="bfloat16",
                 mesh_shape=(-1, 1, 1), data_dir="synthetic",
                 swin_softmax_dtype="bfloat16", swin_gelu_approximate=True,
                 frozen_param_dtype="bfloat16")

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch_per_chip * n_dev)

    B = batch_per_chip * n_dev
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
    device_batch = trainer.device_put_batch(batch)

    step_rng = jax.random.key(1, impl=cfg.dropout_rng_impl)
    # Warmup / compile. NOTE: timing syncs via an explicit host read of the
    # loss — on relayed/async PJRT backends block_until_ready can return
    # before execution finishes, which inflates throughput.
    state, loss = trainer.train_step(state, device_batch, step_rng)
    float(loss)

    def timed(step_fn, batch, n_steps=20):
        nonlocal state
        t0 = time.perf_counter()
        s = state
        for i in range(n_steps):
            out = step_fn(s, batch, step_rng)
            s, loss = out[0], out[1]
        float(loss)  # host read forces completion of the dependent chain
        state = s
        return B * n_steps / (time.perf_counter() - t0) / n_dev

    # Epoch-1 path: full step (all three towers + feature extraction aux).
    full_per_chip = timed(trainer.train_step, device_batch)

    # Steady-state path (epochs 2..N of the reference's 50-epoch frozen-tower
    # caption recipe): the frozen towers' features come from the
    # cache_frozen_features cache — bit-identical losses, tower forwards
    # skipped (see BASELINE.md "Frozen-feature cache"). Features produced the
    # same way training produces them: by the towers themselves.
    fstate, _, feats = trainer.train_step_with_features(
        state, device_batch, step_rng)
    state = fstate
    img_feats, lang_feats = feats
    cached_batch = {k: v for k, v in device_batch.items() if k != "images"}
    cached_batch["image_features"] = img_feats
    cached_batch["language_features"] = lang_feats
    state, loss = trainer.train_step(state, cached_batch, step_rng)  # compile
    float(loss)
    cached_per_chip = timed(trainer.train_step, cached_batch)

    # 50-epoch recipe: 1 fill epoch at the full rate + 49 cached epochs.
    amortized = 50.0 / (1.0 / full_per_chip + 49.0 / cached_per_chip)
    print(json.dumps({
        "metric": "caption train throughput, steady state (swinv2-base+"
                  f"t5-base, bf16, batch {batch_per_chip}/chip, frozen-tower"
                  " opt mode + frozen-feature cache; epoch-1 cache fill runs"
                  f" at {round(full_per_chip, 1)} img/s/chip, 50-epoch"
                  f" recipe amortized {round(amortized, 1)})",
        "value": round(cached_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            cached_per_chip / BASELINE_IMAGES_PER_SEC_PER_CHIP, 3),
        "full_recompute_value": round(full_per_chip, 2),
        "amortized_50_epoch_value": round(amortized, 2),
    }))


if __name__ == "__main__":
    main()
