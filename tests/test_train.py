"""Training stack tests: schedules vs torch, sharded end-to-end training,
freezing semantics, checkpoint/resume. Runs on the 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                             register_swin_size,
                                             register_t5_size)
from klab_multimodalmodel_tpu.data import DataLoader, SyntheticCaptionDataset
from klab_multimodalmodel_tpu.text import ByteTokenizer
from klab_multimodalmodel_tpu.train import (Trainer, make_lr_schedule, train,
                                            trainable_labels)
from klab_multimodalmodel_tpu.utils import make_mesh

register_t5_size("t5-micro", T5Size(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
    num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
    relative_attention_max_distance=16, dropout_rate=0.0))
register_swin_size("swin-micro", SwinV2Size(
    image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
    num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    pretrained_window_sizes=(0, 0)))


def micro_config(tmp_path, **kw):
    defaults = dict(
        language_model_name="t5-micro", transformer_model_name="t5-micro",
        image_model_name="swin-micro", max_source_length=48,
        max_target_length=24, batch_size=1, lr=1e-3,
        result_dir=str(tmp_path / "results"), data_dir="synthetic",
        compute_dtype="float32", num_epochs=1, mesh_shape=(-1, 1, 1),
        scan_unroll=1)  # micro models: fast compile; unroll equivalence is
    # covered by test_scan_unroll_equivalence
    defaults.update(kw)
    return Config(**defaults)


# ---------------------------------------------------------------------------
# LR schedules vs torch (reference train.py:29-36 + per-step stepping quirk)
# ---------------------------------------------------------------------------


def test_lr_schedules_match_torch(tmp_path):
    torch = pytest.importorskip("torch")
    num_epochs = 10
    lr0 = 0.5
    for name in ("cosine", "linear", "exponential", "step"):
        cfg = micro_config(tmp_path, lr=lr0, lr_scheduler=name,
                           num_epochs=num_epochs)
        sched = make_lr_schedule(cfg, num_epochs)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=lr0)
        if name == "cosine":
            ts = torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=num_epochs, eta_min=0)
        elif name == "linear":
            ts = torch.optim.lr_scheduler.LambdaLR(
                opt, lr_lambda=lambda e: 1 - (e / num_epochs))
        elif name == "exponential":
            ts = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.9)
        else:
            ts = torch.optim.lr_scheduler.StepLR(opt, step_size=10, gamma=0.1)
        # scheduler.step() fires per optimizer step (train.py:69);
        # cosine is compared past T_max too (torch's closed form oscillates)
        horizon = 2 * num_epochs + 3 if name == "cosine" else num_epochs
        for step in range(horizon):
            np.testing.assert_allclose(float(sched(step)),
                                       opt.param_groups[0]["lr"],
                                       rtol=1e-6, atol=1e-9,
                                       err_msg=f"{name} @ step {step}")
            opt.step()
            ts.step()


# ---------------------------------------------------------------------------
# Freezing labels (quirk #1 semantics)
# ---------------------------------------------------------------------------


def test_trainable_labels(tmp_path):
    params = {"language_model": {"w": 0}, "image_model": {"w": 0},
              "transformer": {"w": 0}, "vision_projection": {"kernel": 0}}
    # default: image tower frozen (not --image_model_train)
    labels = trainable_labels(params, micro_config(tmp_path))
    assert labels["language_model"]["w"] == "frozen"
    assert labels["image_model"]["w"] == "frozen"
    assert labels["transformer"]["w"] == "train"
    assert labels["vision_projection"]["kernel"] == "train"
    # --image_model_train: image tower joins the optimizer (quirk #1 FIXED)
    labels = trainable_labels(
        params, micro_config(tmp_path, image_model_train=True))
    assert labels["image_model"]["w"] == "train"
    # bit-parity mode: reference never updates Swin (train.py:28)
    labels = trainable_labels(
        params, micro_config(tmp_path, image_model_train=True,
                             freeze_image_model_updates=True))
    assert labels["image_model"]["w"] == "frozen"


# ---------------------------------------------------------------------------
# End-to-end sharded training
# ---------------------------------------------------------------------------


def _make_loader(cfg, n=16, n_dev=8):
    ds = SyntheticCaptionDataset(n=n, image_size=cfg.swin.image_size)
    return DataLoader(ds, ByteTokenizer(), global_batch_size=cfg.batch_size
                      * n_dev, max_source_length=cfg.max_source_length,
                      max_target_length=cfg.max_target_length, seed=0)


@pytest.mark.slow
def test_train_step_dp_fsdp(tmp_path):
    """One update on a (2,2,2) data/fsdp/tensor mesh: loss finite, frozen
    towers unchanged, transformer moves."""
    cfg = micro_config(tmp_path, mesh_shape=(2, 2, 2), batch_size=1)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)
    loader = _make_loader(cfg)
    batch = next(iter(loader))
    device_batch = trainer.device_put_batch(batch)

    before = jax.device_get(state.params)
    state, loss = trainer.train_step(state, device_batch,
                                     jax.random.PRNGKey(1))
    after = jax.device_get(state.params)
    assert np.isfinite(float(loss))

    def delta(tree_a, tree_b):
        return sum(float(np.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)))

    assert delta(before["language_model"], after["language_model"]) == 0.0
    assert delta(before["image_model"], after["image_model"]) == 0.0
    assert delta(before["transformer"], after["transformer"]) > 0.0

    # eval step agrees in magnitude
    vloss = trainer.eval_step(state.params, device_batch)
    assert np.isfinite(float(vloss))


@pytest.mark.slow
def test_grad_accumulation_equivalence(tmp_path):
    """accum=2 over a batch == accum=1 over the same batch (mean grads)."""
    cfg1 = micro_config(tmp_path, accumulation_steps=1)
    cfg2 = micro_config(tmp_path, accumulation_steps=2)
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    loader = _make_loader(cfg1, n_dev=8)
    batch = next(iter(loader))

    losses = []
    params_after = []
    for cfg in (cfg1, cfg2):
        trainer = Trainer(cfg, mesh, num_epochs=1)
        state = trainer.init_state(jax.random.PRNGKey(0), 8)
        db = trainer.device_put_batch(batch)
        state, loss = trainer.train_step(state, db, jax.random.PRNGKey(1))
        losses.append(float(loss))
        params_after.append(jax.device_get(state.params))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_after[0]),
                    jax.tree.leaves(params_after[1])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_frozen_feature_cache_unit(tmp_path):
    """Cache round trip + restart persistence + geometry invalidation."""
    from klab_multimodalmodel_tpu.train import FrozenFeatureCache
    path = str(tmp_path / "c" / "train.feat")
    cache = FrozenFeatureCache(path, 8, (4, 6), dtype="float32")
    assert not cache.has(np.array([0, 3]))
    feats = np.arange(2 * 4 * 6, dtype=np.float32).reshape(2, 4, 6)
    cache.put(np.array([0, 3]), feats)
    assert cache.has(np.array([0, 3])) and not cache.has(np.array([0, 1]))
    np.testing.assert_array_equal(cache.get(np.array([3, 0])), feats[::-1])
    cache.flush()
    # restart: data + mask survive
    cache2 = FrozenFeatureCache(path, 8, (4, 6), dtype="float32")
    assert cache2.has(np.array([0, 3]))
    np.testing.assert_array_equal(cache2.get(np.array([0, 3])), feats)
    # geometry change invalidates
    cache3 = FrozenFeatureCache(path, 8, (4, 8), dtype="float32")
    assert not cache3.has(np.array([0]))
    # ...and the invalidation removes the OLD fill mask immediately: if the
    # run died here (no flush after the recreate), a restart with the new
    # geometry must not see the pre-invalidation mask over zeroed data.
    del cache3  # simulate crash before flush
    cache4 = FrozenFeatureCache(path, 8, (4, 8), dtype="float32")
    assert not cache4.has(np.array([0, 3]))


def test_frozen_feature_cache_dtype_change_invalidates(tmp_path):
    """A resumed run whose compute_dtype changed must not serve stale
    features: the dtype is part of the cache metadata, so a mismatch
    recreates the cache from scratch."""
    from klab_multimodalmodel_tpu.train import FrozenFeatureCache
    path = str(tmp_path / "c" / "train.feat")
    cache = FrozenFeatureCache(path, 4, (2, 3), dtype="float32")
    cache.put(np.array([0, 1]), np.ones((2, 2, 3), np.float32))
    cache.flush()
    re_f32 = FrozenFeatureCache(path, 4, (2, 3), dtype="float32")
    assert re_f32.has(np.array([0, 1]))  # same dtype: kept
    re_bf16 = FrozenFeatureCache(path, 4, (2, 3), dtype="bfloat16")
    assert not re_bf16.has(np.array([0, 1]))  # dtype change: invalidated


def test_frozen_feature_cache_crash_before_flush_serves_nothing(tmp_path):
    """A crash between put() and flush() must not let a restarted run read
    zeros (or partial data) as 'filled': the fill mask is only persisted at
    flush, strictly AFTER the data flush."""
    from klab_multimodalmodel_tpu.train import FrozenFeatureCache
    path = str(tmp_path / "c" / "train.feat")
    cache = FrozenFeatureCache(path, 8, (2, 2), dtype="float32")
    cache.put(np.arange(4), np.ones((4, 2, 2), np.float32))
    assert cache.has(np.arange(4))
    del cache  # crash: no flush — in-memory mask lost
    restarted = FrozenFeatureCache(path, 8, (2, 2), dtype="float32")
    assert not restarted.has(np.array([0]))  # nothing served as filled

    # half-filled + flushed, then crash after MORE un-flushed puts: only
    # the flushed rows are served on restart
    restarted.put(np.array([0, 1]), np.full((2, 2, 2), 7, np.float32))
    restarted.flush()
    restarted.put(np.array([2, 3]), np.full((2, 2, 2), 9, np.float32))
    del restarted  # crash before second flush
    again = FrozenFeatureCache(path, 8, (2, 2), dtype="float32")
    assert again.has(np.array([0, 1]))
    assert not again.has(np.array([2]))
    np.testing.assert_array_equal(again.get(np.array([0]))[0],
                                  np.full((2, 2), 7, np.float32))


def test_cached_features_training_equivalence(tmp_path):
    """cache_frozen_features must not change training: same seed, same data
    -> same per-epoch losses as the uncached run (epoch 1 fills the cache,
    epochs 2-3 train from it)."""
    losses = {}
    for cached in (False, True):
        cfg = micro_config(tmp_path / ("c" if cached else "u"),
                           num_epochs=3, cache_frozen_features=cached)
        loader = _make_loader(cfg, n=16)
        val_loader = _make_loader(cfg, n=8)
        out = train(cfg, train_loader=loader, val_loader=val_loader,
                    resume=False)
        losses[cached] = (out["losses"]["train"], out["losses"]["val"])
        if cached:
            import glob
            assert glob.glob(str(tmp_path / "c" / "results" /
                                 "feature_cache" / "train.img.feat*"))
            assert glob.glob(str(tmp_path / "c" / "results" /
                                 "feature_cache" / "train.lang.feat*"))
    np.testing.assert_allclose(losses[True][0], losses[False][0],
                               rtol=2e-6)
    np.testing.assert_allclose(losses[True][1], losses[False][1],
                               rtol=2e-6)


@pytest.mark.slow
def test_cached_features_dynamic_source_equivalence(tmp_path):
    """Span-corruption pretraining re-masks per epoch: the language tower
    must NOT be cached (no lang cache file), the image cache still applies,
    and losses still match the uncached run."""
    losses = {}
    for cached in (False, True):
        cfg = micro_config(tmp_path / ("c" if cached else "u"),
                           num_epochs=2, cache_frozen_features=cached)
        ds = SyntheticCaptionDataset(n=16, image_size=cfg.swin.image_size,
                                     pretrain=True)
        loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                            max_source_length=cfg.max_source_length,
                            max_target_length=cfg.max_target_length, seed=0)
        val_ds = SyntheticCaptionDataset(n=8, image_size=cfg.swin.image_size,
                                         pretrain=True)
        val_loader = DataLoader(val_ds, ByteTokenizer(), global_batch_size=8,
                                max_source_length=cfg.max_source_length,
                                max_target_length=cfg.max_target_length,
                                seed=0)
        out = train(cfg, train_loader=loader, val_loader=val_loader,
                    resume=False)
        losses[cached] = out["losses"]["train"]
        if cached:
            import glob
            cache_dir = tmp_path / "c" / "results" / "feature_cache"
            assert glob.glob(str(cache_dir / "train.img.feat*"))
            assert not glob.glob(str(cache_dir / "train.lang.feat*"))
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-6)


def test_logger_repoints_file_handler_across_result_dirs(tmp_path):
    """Two train()-style get_logger calls with different result dirs in ONE
    process must each produce their own {result_dir}/train.log (regression:
    the handler cache used to pin the file to the first run's dir)."""
    from klab_multimodalmodel_tpu.obs.logger import get_logger
    import os
    d1, d2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    log1 = get_logger(d1)
    log1.info("first run")
    log2 = get_logger(d2)
    log2.info("second run")
    assert os.path.exists(os.path.join(d1, "train.log"))
    assert os.path.exists(os.path.join(d2, "train.log"))
    with open(os.path.join(d2, "train.log")) as f:
        assert "second run" in f.read()
    # same dir again: handler retained, file NOT truncated
    get_logger(d2).info("still second run")
    with open(os.path.join(d2, "train.log")) as f:
        content = f.read()
    assert "second run" in content and "still second run" in content


def test_full_train_loop_and_resume(tmp_path):
    """Two-epoch driver run: losses recorded, best checkpoint written,
    resume restores and continues."""
    cfg = micro_config(tmp_path, num_epochs=2, save_interval=1)
    loader = _make_loader(cfg, n=16)
    val_loader = _make_loader(cfg, n=8)
    out = train(cfg, train_loader=loader, val_loader=val_loader,
                resume=False)
    assert len(out["losses"]["train"]) == 2
    assert all(np.isfinite(v) for v in out["losses"]["val"])
    import os
    ckpt_dir = os.path.join(cfg.result_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_2"))
    assert os.path.exists(os.path.join(cfg.result_dir, "loss.png"))
    assert os.path.exists(os.path.join(cfg.result_dir, "train.log"))

    # resume: runs only the remaining epochs (none -> immediately done),
    # then extend to 3 epochs and confirm it continues from epoch 3. The
    # restored loss history covers epochs 1-2, so the full curve is 3 long
    # but matches the first run on the restored prefix.
    cfg3 = micro_config(tmp_path, num_epochs=3, save_interval=1)
    out2 = train(cfg3, train_loader=loader, val_loader=val_loader,
                 resume=True)
    assert len(out2["losses"]["train"]) == 3  # epochs 1-2 restored + 3 ran
    assert out2["losses"]["train"][:2] == out["losses"]["train"]
    assert int(out2["steps"]) == 3 * len(loader)


register_t5_size("t5-micro-dropout", T5Size(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
    num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
    relative_attention_max_distance=16, dropout_rate=0.1))


def test_bit_exact_midepoch_resume(tmp_path):
    """Kill training at step k of epoch e, resume, final state BIT-identical
    to the uninterrupted run — with live dropout, so the restored RNG
    stream, within-epoch cursor and loss partials are all load-bearing
    (SURVEY.md §5 checkpoint row)."""

    def run(tag, halt):
        cfg = micro_config(
            tmp_path, result_dir=str(tmp_path / tag), num_epochs=2,
            language_model_name="t5-micro-dropout",
            transformer_model_name="t5-micro-dropout",
            halt_after_steps=halt)
        loader = _make_loader(cfg, n=16)   # 2 update groups per epoch
        val_loader = _make_loader(cfg, n=8)
        return train(cfg, train_loader=loader, val_loader=val_loader,
                     resume=True)

    out_a = run("uninterrupted", 0)
    assert not out_a["halted"]

    out_b1 = run("interrupted", 3)  # dies mid-epoch-2 (cursor 1 of 2)
    assert out_b1["halted"]
    assert int(out_b1["steps"]) == 3
    # Resume by rerunning the SAME command (halt flag still set — the
    # documented workflow): a threshold the restored counter already
    # passed is spent, so the run continues to completion.
    out_b2 = run("interrupted", 3)  # resumes at epoch 2, batch 2
    assert not out_b2["halted"]

    pa = jax.device_get(out_a["state"].params)
    pb = jax.device_get(out_b2["state"].params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(pa)[0],
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(pb)[0],
                   key=lambda kv: str(kv[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))
    assert out_a["losses"] == out_b2["losses"]
    assert out_a["min_val_loss"] == out_b2["min_val_loss"]
    assert int(out_a["steps"]) == int(out_b2["steps"]) == 4


def test_adafactor_and_frozen_bf16(tmp_path):
    """Adafactor optimizer + bf16 frozen towers: step runs, frozen params
    stay bf16 and unchanged, transformer updates."""
    cfg = micro_config(tmp_path, optimizer="adafactor",
                       frozen_param_dtype="bfloat16")
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)
    frozen_leaf = jax.tree.leaves(state.params["language_model"])[0]
    assert frozen_leaf.dtype == jnp.bfloat16
    loader = _make_loader(cfg)
    batch = next(iter(loader))
    db = trainer.device_put_batch(batch)
    before = jax.device_get(state.params)
    state, loss = trainer.train_step(state, db, jax.random.PRNGKey(1))
    after = jax.device_get(state.params)
    assert np.isfinite(float(loss))
    d_frozen = sum(float(np.abs(a.astype(np.float32)
                                - b.astype(np.float32)).sum())
                   for a, b in zip(jax.tree.leaves(before["language_model"]),
                                   jax.tree.leaves(after["language_model"])))
    d_train = sum(float(np.abs(a - b).sum())
                  for a, b in zip(jax.tree.leaves(before["transformer"]),
                                  jax.tree.leaves(after["transformer"])))
    assert d_frozen == 0.0
    assert d_train > 0.0


def test_scan_unroll_equivalence(tmp_path):
    """scan (unroll=1) and full unroll (0) produce identical updates."""
    loader = _make_loader(micro_config(tmp_path), n_dev=8)
    batch = next(iter(loader))
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    results = []
    for unroll in (1, 0):
        cfg = micro_config(tmp_path, scan_unroll=unroll)
        trainer = Trainer(cfg, mesh, num_epochs=1)
        state = trainer.init_state(jax.random.PRNGKey(0), 8)
        db = trainer.device_put_batch(batch)
        state, loss = trainer.train_step(state, db, jax.random.PRNGKey(1))
        results.append((float(loss), jax.device_get(state.params)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(results[0][1]),
                    jax.tree.leaves(results[1][1])):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Ragged-tail accumulation (reference train.py:61-67 partial final update)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_accumulation_tail_zero_weight_rows_have_no_influence(tmp_path):
    """The pad path's guarantee: rows with target_mask == 0 contribute
    exactly zero gradient, so the padded content is irrelevant."""
    cfg = micro_config(tmp_path, accumulation_steps=4)
    mesh = make_mesh((1, 1, 1), devices=jax.devices()[:1])
    loader = _make_loader(cfg, n_dev=8)
    batch = next(iter(loader))  # 8 rows; 2 real + 6 padding below

    def padded(fill_from):
        idx = np.concatenate([np.arange(2), fill_from])
        out = {k: v[idx] for k, v in batch.items()}
        out["target_mask"] = out["target_mask"].copy()
        out["target_mask"][2:] = 0
        return out

    results = []
    for fill in (np.arange(6) % 2, 2 + np.arange(6) % 6):  # cycled vs other
        trainer = Trainer(cfg, mesh, num_epochs=1)
        state = trainer.init_state(jax.random.PRNGKey(0), 8)
        db = trainer.device_put_batch(padded(fill))
        state, loss = trainer.train_step(state, db, jax.random.PRNGKey(1))
        results.append((float(loss), jax.device_get(state.params)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(results[0][1]),
                    jax.tree.leaves(results[1][1])):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_accumulation_tail_modes(tmp_path):
    """len(loader)=3, accum=2: 'pad' runs the ragged final update
    (2 opt steps/epoch), 'drop' skips it (1), 'error' refuses upfront."""
    def run(mode, subdir):
        cfg = micro_config(tmp_path, accumulation_steps=2,
                           accumulation_tail=mode,
                           result_dir=str(tmp_path / subdir))
        loader = _make_loader(cfg, n=24)  # 24 / (1*8) = 3 microbatches
        val_loader = _make_loader(cfg, n=8)
        assert len(loader) == 3
        return train(cfg, train_loader=loader, val_loader=val_loader,
                     resume=False)

    out_pad = run("pad", "r_pad")
    assert int(out_pad["steps"]) == 2
    assert all(np.isfinite(v) for v in out_pad["losses"]["train"])
    out_drop = run("drop", "r_drop")
    assert int(out_drop["steps"]) == 1
    with pytest.raises(ValueError, match="accumulation_tail"):
        run("error", "r_err")


def test_accumulation_tail_pad_rejected_with_pad_quirks(tmp_path):
    cfg = micro_config(tmp_path, accumulation_steps=2,
                       accumulation_tail="pad", reference_pad_quirks=True)
    loader = _make_loader(cfg, n=24)
    val_loader = _make_loader(cfg, n=8)
    with pytest.raises(ValueError, match="reference_pad_quirks"):
        train(cfg, train_loader=loader, val_loader=val_loader, resume=False)


def test_init_checkpoint_pretrained_params(tmp_path):
    """--init_checkpoint: a converted pretrained checkpoint (the converter's
    --output layout) initializes matching subtrees of a fresh run; subtrees
    absent from the checkpoint keep their fresh init; a subtree the model
    doesn't have raises. Covers the reference's startup from_pretrained
    pulls (models/model.py:14-17)."""
    import orbax.checkpoint as ocp

    from klab_multimodalmodel_tpu.checkpoint.io import load_pretrained_params
    from klab_multimodalmodel_tpu.utils import make_mesh

    cfg = micro_config(tmp_path)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axis_names)
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)

    # Build a "pretrained" checkpoint holding perturbed transformer +
    # image_model subtrees only (the converter emits top-level subtrees).
    host = jax.device_get(state.params)
    pre = {
        "transformer": jax.tree.map(lambda x: x + 1.0, host["transformer"]),
        "image_model": jax.tree.map(lambda x: x * 2.0 + 3.0,
                                    host["image_model"]),
    }
    out_dir = tmp_path / "converted"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(out_dir / "checkpoints" / "pretrained"), pre)
    ckptr.wait_until_finished()

    merged = load_pretrained_params(str(out_dir), state.params)
    got = jax.device_get(merged)
    for a, b in zip(jax.tree.leaves(got["transformer"]),
                    jax.tree.leaves(pre["transformer"])):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(got["language_model"]),
                    jax.tree.leaves(host["language_model"])):
        np.testing.assert_allclose(a, b)  # untouched fresh init

    # Shardings preserved on restored leaves.
    lt = jax.tree.leaves(merged["transformer"])[0]
    assert lt.sharding is not None

    # End-to-end: the driver consumes it via config.init_checkpoint.
    cfg2 = micro_config(tmp_path, init_checkpoint=str(out_dir),
                        result_dir=str(tmp_path / "results_init"))
    loader = _make_loader(cfg2, n=8)
    out = train(cfg2, train_loader=loader, val_loader=loader, resume=False)
    assert np.isfinite(out["losses"]["train"][0])

    # Unknown subtree -> loud error.
    bad = {"not_a_tower": {"w": np.zeros((2,), np.float32)}}
    ckptr.save(str(tmp_path / "bad" / "checkpoints" / "pretrained"), bad)
    ckptr.wait_until_finished()
    with pytest.raises(ValueError, match="not_a_tower"):
        load_pretrained_params(str(tmp_path / "bad"), state.params)


def test_tensorboard_scalars_written(tmp_path):
    """--tensorboard writes event files with per-epoch scalars (SURVEY §5
    optional-TensorBoard row); off by default (no tb dir)."""
    import glob
    import os

    cfg = micro_config(tmp_path, tensorboard=True)
    loader = _make_loader(cfg, n=8)
    train(cfg, train_loader=loader, val_loader=loader, resume=False)
    events = glob.glob(os.path.join(cfg.result_dir, "tb", "events.*"))
    assert events, "no tensorboard event files written"

    cfg2 = micro_config(tmp_path, result_dir=str(tmp_path / "no_tb"))
    train(cfg2, train_loader=loader, val_loader=loader, resume=False)
    assert not os.path.isdir(os.path.join(cfg2.result_dir, "tb"))


def test_train_end_to_end_real_coco_layout(tmp_path):
    """Full driver run with data_dir pointing at a real MSCOCO-layout
    directory (annotations JSON + JPEG files): exercises the loader-factory
    dispatch, the COCO index, host JPEG decode/resize, and tokenization on
    the way into the jit step — the reference's actual launch path
    (train.py:43, modules/loader.py:79-89) rather than the synthetic
    dataset the other loop tests use."""
    import json
    import os

    from PIL import Image

    d = tmp_path / "mscoco2017"
    (d / "annotations").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for phase, n in (("train", 8), ("val", 8)):
        (d / f"{phase}2017").mkdir()
        images, annotations = [], []
        for i in range(n):
            name = f"{i:012d}.jpg"
            arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{phase}2017" / name)
            images.append({"id": i, "file_name": name})
            annotations.append({"id": 10 + i, "image_id": i,
                                "caption": f"caption number {i}"})
        with open(d / "annotations" / f"captions_{phase}2017.json",
                  "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)

    cfg = micro_config(tmp_path, data_dir=str(d), num_epochs=1,
                       result_dir=str(tmp_path / "coco_results"),
                       eval_captions_every=1, eval_captions_limit=4,
                       generate_max_length=6)
    out = train(cfg, resume=False)  # loaders built by get_dataloader
    assert np.isfinite(out["losses"]["train"][0])
    assert np.isfinite(out["losses"]["val"][0])
    assert os.path.exists(os.path.join(cfg.result_dir, "train.log"))
    # training-time caption-quality tracking ran and was recorded
    rows = [json.loads(line) for line in
            open(os.path.join(cfg.result_dir, "metrics.jsonl"))]
    assert "cider_d" in rows[-1] and "bleu4" in rows[-1]
    assert np.isfinite(rows[-1]["cider_d"])


def test_skip_image_decode_when_fully_cached(tmp_path, monkeypatch):
    """Fully image-cached epochs must not decode JPEGs at all (the step
    ignores the image tensor), and losses must match the cache-off run
    exactly. Partial-cache epochs keep decoding (fallback needs pixels)."""
    import json
    import os

    from PIL import Image

    import klab_multimodalmodel_tpu.data.datasets as dsmod

    d = tmp_path / "mscoco2017"
    (d / "annotations").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for phase, n in (("train", 8), ("val", 8)):
        (d / f"{phase}2017").mkdir()
        images, annotations = [], []
        for i in range(n):
            name = f"{i:012d}.jpg"
            arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{phase}2017" / name)
            images.append({"id": i, "file_name": name})
            annotations.append({"id": 10 + i, "image_id": i,
                                "caption": f"caption number {i}"})
        with open(d / "annotations" / f"captions_{phase}2017.json",
                  "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)

    decoded: list = []  # list.append is atomic under worker threads
    real = dsmod.load_image_resized

    def counting(path, size=256):
        decoded.append(path)
        return real(path, size)

    monkeypatch.setattr(dsmod, "load_image_resized", counting)

    def run(cache, subdir):
        cfg = micro_config(tmp_path, data_dir=str(d), num_epochs=3,
                           cache_frozen_features=cache,
                           result_dir=str(tmp_path / subdir))
        return train(cfg, resume=False)

    out = run(True, "cached")
    # Epoch 1 decodes 16 images (8 train + 8 val); epochs 2-3 decode none.
    assert len(decoded) == 16, f"decoded {len(decoded)} images, expected 16"

    decoded.clear()
    out_ref = run(False, "nocache")
    assert len(decoded) == 48  # cache off: every epoch decodes everything
    np.testing.assert_allclose(out["losses"]["train"],
                               out_ref["losses"]["train"], rtol=1e-6)
    np.testing.assert_allclose(out["losses"]["val"],
                               out_ref["losses"]["val"], rtol=1e-6)


def test_async_checkpoint_survives_donation(tmp_path):
    """checkpoint saves are ASYNC (io.py): control returns before the write
    is durable, and the train loop immediately donates the state buffers to
    the next step. Orbax must have snapshotted the values — the restored
    checkpoint equals the pre-save state bit-for-bit."""
    cfg = micro_config(tmp_path)
    mesh = make_mesh((-1, 1, 1))
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)
    batch = trainer.device_put_batch(
        {k: v for k, v in trainer.example_batch(8).items()})
    from klab_multimodalmodel_tpu.checkpoint.io import CheckpointManager
    ck = CheckpointManager(cfg.result_dir)

    snapshot = jax.device_get(state.params)
    ck.save("step_1", state, {"steps": 1})
    # donate the just-saved buffers before the async write finishes
    state2, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    ck.wait()
    restored = ck.restore("step_1", state2)
    for a, b in zip(jax.tree.leaves(snapshot),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bucket_lengths_loss_equivalence(tmp_path):
    """--bucket_lengths (power-of-two trim of pad columns, the static-shape
    'longest' padding of train.py:56) must not change training: pads are
    masked out of attention and loss, so per-epoch losses match the
    full-padding run exactly; the frozen-feature cache stays equivalent
    too (zero-padded cached language features are mask-equivalent)."""
    losses = {}
    for tag, kw in (
            ("full", {}),
            ("bucketed", {"bucket_lengths": True}),
            ("bucketed_cached", {"bucket_lengths": True,
                                 "cache_frozen_features": True})):
        cfg = micro_config(tmp_path / tag, num_epochs=2,
                           max_source_length=48, max_target_length=24, **kw)
        loader = _make_loader(cfg, n=16)
        val_loader = _make_loader(cfg, n=8)
        out = train(cfg, train_loader=loader, val_loader=val_loader,
                    resume=False)
        losses[tag] = (out["losses"]["train"], out["losses"]["val"])
    np.testing.assert_allclose(losses["full"][0], losses["bucketed"][0],
                               rtol=1e-6)
    np.testing.assert_allclose(losses["full"][1], losses["bucketed"][1],
                               rtol=1e-6)
    np.testing.assert_allclose(losses["bucketed"][0],
                               losses["bucketed_cached"][0], rtol=1e-6)
    np.testing.assert_allclose(losses["bucketed"][1],
                               losses["bucketed_cached"][1], rtol=1e-6)


def test_bucket_lengths_rejects_pad_quirks(tmp_path):
    with pytest.raises(ValueError):
        micro_config(tmp_path, bucket_lengths=True,
                     reference_pad_quirks=True)


def test_sigterm_preemption_save_and_resume(tmp_path, monkeypatch):
    """SIGTERM (what TPU preemption delivers) finishes the in-flight update,
    saves a step_N preemption checkpoint, and the resumed run bit-matches
    the uninterrupted one — driving the actual signal-handler path (the
    halt_after_steps variant is covered separately)."""
    import os
    import signal as _signal

    from klab_multimodalmodel_tpu.obs import profiler

    def run(tag, sigterm_at):
        cfg = micro_config(tmp_path, result_dir=str(tmp_path / tag),
                           num_epochs=2,
                           language_model_name="t5-micro-dropout",
                           transformer_model_name="t5-micro-dropout")
        loader = _make_loader(cfg, n=16)     # 2 update groups per epoch
        val_loader = _make_loader(cfg, n=8)
        calls = {"n": 0}
        orig = profiler.StepWindowTrace.tick

        def tick(self):
            calls["n"] += 1
            if calls["n"] == sigterm_at:
                # same-thread kill: the handler runs at the next bytecode,
                # i.e. BEFORE this update completes -> halt fires right
                # after it, deterministically
                os.kill(os.getpid(), _signal.SIGTERM)
            return orig(self)

        if sigterm_at:
            monkeypatch.setattr(profiler.StepWindowTrace, "tick", tick)
        else:
            monkeypatch.setattr(profiler.StepWindowTrace, "tick", orig)
        return train(cfg, train_loader=loader, val_loader=val_loader,
                     resume=True)

    out_a = run("uninterrupted", 0)
    out_b1 = run("sigterm", 3)          # killed mid-epoch-2
    assert out_b1["halted"] and int(out_b1["steps"]) == 3
    out_b2 = run("sigterm", 0)          # restart the same command
    assert not out_b2["halted"]

    pa = jax.device_get(out_a["state"].params)
    pb = jax.device_get(out_b2["state"].params)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert out_a["losses"] == out_b2["losses"]


def test_drop_tail_zero_update_epochs_rejected(tmp_path):
    """accumulation_tail='drop' with fewer loader batches than
    accumulation_steps would silently train NOTHING every epoch (zero
    updates, loss 0.0 logged, untrained 'best' saved) — refused loudly."""
    cfg = micro_config(tmp_path, accumulation_steps=8,
                       accumulation_tail="drop")
    with pytest.raises(ValueError, match="ZERO optimizer updates"):
        train(cfg, train_loader=_make_loader(cfg, n=16),
              val_loader=_make_loader(cfg, n=8), resume=False)


def test_latest_falls_back_to_name_when_meta_missing(tmp_path):
    """A checkpoint whose sidecar .meta.json is missing (failed metadata
    write, partial rsync) must not rank below every older meta-bearing
    checkpoint: latest() falls back to the name's N, not -1."""
    import json as _json
    import os as _os

    from klab_multimodalmodel_tpu.checkpoint.io import CheckpointManager

    mgr = CheckpointManager(str(tmp_path))
    _os.makedirs(mgr.path("epoch_3"))
    with open(_os.path.join(mgr.base, "epoch_3.meta.json"), "w") as f:
        _json.dump({"steps": 30}, f)
    _os.makedirs(mgr.path("step_50"))  # no sidecar meta
    assert mgr.latest() == "step_50"
    # With its meta present and recording fewer steps, ordering follows
    # the recorded step count again.
    with open(_os.path.join(mgr.base, "step_50.meta.json"), "w") as f:
        _json.dump({"steps": 20}, f)
    assert mgr.latest() == "epoch_3"


def test_metrics_jsonl_written(tmp_path):
    """Each epoch appends a machine-readable line to metrics.jsonl."""
    import json as _json
    import os as _os

    cfg = micro_config(tmp_path, num_epochs=2)
    out = train(cfg, train_loader=_make_loader(cfg, n=16),
                val_loader=_make_loader(cfg, n=8), resume=False)
    path = _os.path.join(cfg.result_dir, "metrics.jsonl")
    rows = [_json.loads(line) for line in open(path)]
    assert [r["epoch"] for r in rows] == [1, 2]
    assert rows[-1]["train_loss"] == out["losses"]["train"][-1]
    for key in ("val_loss", "img_per_sec", "lr", "epoch_seconds", "steps"):
        assert key in rows[0]
