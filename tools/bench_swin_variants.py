#!/usr/bin/env python
"""Measure the SwinV2 frozen-forward levers on the real chip (BASELINE.md).

Variants of the dominant step cost (VERDICT r1 item 4): fp32 vs bf16
softmax-chain dtype for the vision tower. Reports the isolated Swin forward
time, the full train-step throughput, and the numerical deviation of the
bf16 variant against fp32 on identical params (the quality-risk bound).
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
    from klab_multimodalmodel_tpu.models.swinv2 import SwinV2Encoder
    from klab_multimodalmodel_tpu.train import Trainer
    from klab_multimodalmodel_tpu.utils import enable_compile_cache, make_mesh

    enable_compile_cache()
    B = int(os.environ.get("KLAB_BENCH_BATCH", "32"))
    cfg = Config(language_model_name="t5-base",
                 transformer_model_name="t5-base")
    S = cfg.swin.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8))
    x = normalize_images(images, dtype=jnp.bfloat16)

    results: dict = {}

    # -- isolated frozen Swin forward --------------------------------------
    outs = {}
    for name, sm in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = SwinV2Encoder(cfg.swin, dtype=jnp.bfloat16, softmax_dtype=sm)
        if "params" not in outs:
            outs["params"] = jax.jit(
                lambda: model.init(jax.random.PRNGKey(0), x)["params"])()
        params = outs["params"]

        # NOTE: sync via a host read of a dependent scalar — on the relayed
        # PJRT backend block_until_ready returns before execution finishes.
        @jax.jit
        def fwd_sum(p, x):
            out = model.apply({"params": p}, x)
            return out, out.astype(jnp.float32).sum()

        out, s = fwd_sum(params, x)
        float(s)
        t0 = time.perf_counter()
        for _ in range(20):
            out, s = fwd_sum(params, x)
        float(s)
        dt = (time.perf_counter() - t0) / 20
        results[f"swin_fwd_{name}_ms"] = round(dt * 1e3, 2)
        outs[name] = np.asarray(out, np.float32)

    dev = np.abs(outs["bf16"] - outs["fp32"])
    scale = np.abs(outs["fp32"]).mean()
    results["bf16_max_abs_dev"] = float(dev.max())
    results["bf16_mean_rel_dev"] = float(dev.mean() / scale)

    # -- full train step ----------------------------------------------------
    for name, sm in (("fp32", "float32"), ("bf16", "bfloat16")):
        tcfg = Config(language_model_name="t5-base",
                      transformer_model_name="t5-base",
                      max_source_length=64, max_target_length=32,
                      batch_size=B, compute_dtype="bfloat16",
                      mesh_shape=(-1, 1, 1), data_dir="synthetic",
                      swin_softmax_dtype=sm)
        mesh = make_mesh(tcfg.mesh_shape, tcfg.mesh_axis_names)
        trainer = Trainer(tcfg, mesh, num_epochs=1)
        state = trainer.init_state(jax.random.PRNGKey(0), B)
        batch = {
            "images": rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8),
            "source_ids": rng.integers(
                2, 1000, (B, tcfg.max_source_length)).astype(np.int32),
            "source_mask": np.ones((B, tcfg.max_source_length), np.int32),
            "target_ids": rng.integers(
                2, 1000, (B, tcfg.max_target_length)).astype(np.int32),
            "target_mask": np.ones((B, tcfg.max_target_length), np.int32),
        }
        db = trainer.device_put_batch(batch)
        step_rng = jax.random.key(1, impl=tcfg.dropout_rng_impl)
        state, loss = trainer.train_step(state, db, step_rng)
        assert np.isfinite(float(loss))
        t0 = time.perf_counter()
        for _ in range(20):
            state, loss = trainer.train_step(state, db, step_rng)
        float(loss)
        dt = time.perf_counter() - t0
        results[f"train_{name}_img_per_sec"] = round(B * 20 / dt, 2)

    results["train_speedup"] = round(
        results["train_bf16_img_per_sec"] / results["train_fp32_img_per_sec"],
        4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
