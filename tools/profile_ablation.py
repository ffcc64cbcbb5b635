#!/usr/bin/env python
"""Component-level wall-clock ablation on the real chip.

Times each tower in isolation (host-read sync) to locate the MFU sinks:
swin fwd, frozen T5 text-encoder fwd, transformer fwd+bwd, full train step.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, n=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.models.swinv2 import SwinV2Encoder
    from klab_multimodalmodel_tpu.models.t5 import (T5Encoder,
                                                    T5ForConditionalGeneration)
    from klab_multimodalmodel_tpu.train import Trainer
    from klab_multimodalmodel_tpu.utils import make_mesh

    B = 32
    cfg = Config(language_model_name="t5-base",
                 transformer_model_name="t5-base",
                 max_source_length=64, max_target_length=32,
                 batch_size=B, compute_dtype="bfloat16",
                 mesh_shape=(1, 1, 1), data_dir="synthetic")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        np.asarray(jax.device_get(leaf)).ravel()[:1]

    # --- swin fwd ---
    swin = SwinV2Encoder(cfg.swin, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.standard_normal((B, 256, 256, 3)), jnp.bfloat16)
    sp = swin.init(key, img)["params"]
    f = jax.jit(lambda p, x: swin.apply({"params": p}, x))
    t = timeit(lambda: f(sp, img), sync)
    print(f"swin fwd            : {t*1e3:8.2f} ms  ({B/t:7.1f} img/s)")

    # --- frozen text encoder fwd ---
    enc = T5Encoder(cfg.language_t5, dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.integers(2, 1000, (B, 64)), jnp.int32)
    ep = enc.init(key, input_ids=ids)["params"]
    f2 = jax.jit(lambda p, i: enc.apply({"params": p}, input_ids=i))
    t = timeit(lambda: f2(ep, ids), sync)
    print(f"t5 text-encoder fwd : {t*1e3:8.2f} ms  ({B/t:7.1f} img/s)")

    # --- transformer fwd+bwd (128 enc tokens, 32 dec) ---
    lm = T5ForConditionalGeneration(cfg.transformer_t5, dtype=jnp.bfloat16)
    embeds = jnp.asarray(rng.standard_normal((B, 128, 768)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(2, 1000, (B, 32)), jnp.int32)
    lp = lm.init(key, inputs_embeds=embeds, labels=labels)["params"]

    def loss_fn(p, e, l):
        return lm.apply({"params": p}, inputs_embeds=e, labels=l).loss

    g = jax.jit(jax.grad(loss_fn))
    t = timeit(lambda: g(lp, embeds, labels), sync)
    print(f"transformer fwd+bwd : {t*1e3:8.2f} ms  ({B/t:7.1f} img/s)")

    fwd = jax.jit(loss_fn)
    t = timeit(lambda: fwd(lp, embeds, labels), sync)
    print(f"transformer fwd     : {t*1e3:8.2f} ms  ({B/t:7.1f} img/s)")

    # --- full train step ---
    mesh = make_mesh(cfg.mesh_shape, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), B)
    batch = {
        "images": rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8),
        "source_ids": np.asarray(ids), "source_mask": np.ones((B, 64), np.int32),
        "target_ids": np.asarray(labels), "target_mask": np.ones((B, 32), np.int32),
    }
    db = trainer.device_put_batch(batch)
    k = jax.random.PRNGKey(1)

    def step():
        nonlocal state
        state, loss = trainer.train_step(state, db, k)
        return loss

    t = timeit(step, sync)
    print(f"full train step     : {t*1e3:8.2f} ms  ({B/t:7.1f} img/s)")


if __name__ == "__main__":
    main()
