#!/usr/bin/env python
"""MoE vs dense step throughput on the real chip.

Measures the full cached-mode train step (the bench.py headline path) for
the dense t5-base transformer and for ``--moe_experts E`` Switch variants
at the same geometry: top-1 routing keeps per-token FLOPs ~equal to dense
while the transformer's MLP parameter count scales Ex, so the gap between
the rows is the honest cost of routing + dense dispatch on one chip
(single-chip runs have an expert axis of 1 — no collectives; multi-chip EP
additionally pays/saves the token-exchange vs the larger HBM footprint).
Records for BASELINE.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, n=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def run(batch, experts, top_k):
    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.train import Trainer
    from klab_multimodalmodel_tpu.utils import enable_compile_cache, make_mesh

    enable_compile_cache()

    cfg = Config(language_model_name="t5-base",
                 transformer_model_name="t5-base",
                 max_source_length=64, max_target_length=32,
                 batch_size=batch, compute_dtype="bfloat16",
                 mesh_shape=(1, 1, 1), data_dir="synthetic",
                 cache_frozen_features=True,
                 moe_experts=experts, moe_top_k=top_k)
    rng = np.random.default_rng(0)
    mesh = make_mesh(cfg.mesh_shape, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree.leaves(state.params["transformer"]))

    vis_tokens = cfg.swin.num_patches_out
    vis_dim = cfg.swin.num_features
    batch_np = {
        "image_features": rng.standard_normal(
            (batch, vis_tokens, vis_dim)).astype(np.float32),
        "language_features": rng.standard_normal(
            (batch, cfg.max_source_length,
             cfg.language_t5.d_model)).astype(np.float32),
        "source_ids": rng.integers(2, 1000, (batch, cfg.max_source_length),
                                   dtype=np.int64).astype(np.int32),
        "source_mask": np.ones((batch, cfg.max_source_length), np.int32),
        "target_ids": rng.integers(2, 1000, (batch, cfg.max_target_length),
                                   dtype=np.int64).astype(np.int32),
        "target_mask": np.ones((batch, cfg.max_target_length), np.int32),
    }
    db = trainer.device_put_batch(batch_np)
    db["image_features"] = db["image_features"].astype(jnp.bfloat16)
    db["language_features"] = db["language_features"].astype(jnp.bfloat16)
    k = jax.random.key(1, impl=cfg.dropout_rng_impl)
    step = trainer.train_step

    def sync(x):
        np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[:1]

    def one():
        nonlocal state
        state, loss = step(state, db, k)
        return loss

    tag = "dense" if experts == 0 else f"E={experts} top{top_k}"
    try:
        t = timeit(one, sync)
    except Exception as e:  # noqa: BLE001 - jax raises XlaRuntimeError
        if "RESOURCE_EXHAUSTED" not in str(e):
            raise
        print(f"{tag:12s} batch {batch:4d}: OOM on this chip "
              f"(transformer params {n_params/1e6:.1f}M + Adam moments) — "
              f"shard over the mesh expert axis")
        return 0.0
    print(f"{tag:12s} batch {batch:4d}: {t*1e3:7.2f} ms/step  "
          f"{batch/t:8.1f} img/s/chip  "
          f"(transformer params {n_params/1e6:7.1f}M)")
    return batch / t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--experts", type=int, nargs="+", default=[0, 4, 8])
    p.add_argument("--top_k", type=int, default=1)
    args = p.parse_args()
    for e in args.experts:
        run(args.batch, e, 1 if e == 0 else args.top_k)


if __name__ == "__main__":
    main()
