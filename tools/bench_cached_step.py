#!/usr/bin/env python
"""Steady-state cached-step perf sweep on the real chip.

The bench.py headline path (frozen-feature cache, BASELINE.md) spends its
time purely in the trainable transformer grad + optimizer update. This tool
sweeps the remaining levers there:

  * batch size (cached mode frees the frozen-tower activations, so bigger
    batches may lift transformer MFU),
  * Adam first-moment dtype (``--adam_mu_dtype bfloat16`` halves mu HBM
    traffic on the update),

and prints ms/step + img/s/chip per combination.
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


def run(batch, mu_dtype):
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
                 adam_mu_dtype=mu_dtype)
    rng = np.random.default_rng(0)
    mesh = make_mesh(cfg.mesh_shape, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

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

    t = timeit(one, sync)
    print(f"batch {batch:4d}  mu_dtype {mu_dtype or 'fp32':8s}: "
          f"{t*1e3:7.2f} ms/step  {batch/t:8.1f} img/s/chip")

    if os.environ.get("KLAB_CACHED_SPLIT", "0") == "1":
        # grad-only (no optimizer update): isolates the Adam+donation cost.
        import jax as _jax

        grad_fn = _jax.jit(_jax.value_and_grad(
            lambda p, b, r: trainer._loss_fn(p, b, r, False)))
        loss, g = grad_fn(state.params, db, k)
        sync(loss)
        tg = timeit(lambda: grad_fn(state.params, db, k)[0], sync)
        print(f"  grad-only: {tg*1e3:7.2f} ms  "
              f"(update+overhead: {(t-tg)*1e3:6.2f} ms)")
    return batch / t


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--mu_dtypes", nargs="+", default=["float32", "bfloat16"])
    args = p.parse_args()
    for mu in args.mu_dtypes:
        for b in args.batches:
            run(b, mu)


if __name__ == "__main__":
    main()
