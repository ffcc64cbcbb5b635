"""The training driver — epoch loop, validation, checkpointing, logging.

Control-flow parity with ``/root/reference/train.py:11-106``:
  * epochs resolved from ``num_steps`` as ``int(num_steps/len(loader)) + 1``
    (train.py:45-46);
  * ``min_val_loss`` initialized to the literal 100 (train.py:48, quirk #7);
  * best-model save on val-loss improvement, interval saves named
    ``epoch_N`` / ``step_N`` — step-mode checked once per epoch exactly like
    the reference (train.py:94-104);
  * per-epoch mean train/val losses logged and plotted to ``loss.png``.

TPU-native differences: one jit-compiled step (grad accumulation inside),
device-side metrics (no per-step host sync), epoch-seeded shuffling, and
full-train-state checkpoints with automatic resume (the reference cannot
resume at all — SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import signal
import time
from typing import Optional

import jax
import numpy as np

from ..checkpoint.io import CheckpointManager, load_pretrained_params
from ..config import Config
from ..data.pipeline import DataLoader, get_dataloader
from ..obs import profiler
from ..obs.logger import get_logger
from ..obs.metrics import LossCounter
from ..obs.tb import ScalarWriter
from ..text.tokenizer import load_tokenizer
from ..utils.bucketing import pow2_bucket_width
from ..utils.cache import enable_compile_cache
from ..utils.mesh import make_mesh, maybe_init_distributed
from .feature_cache import FrozenFeatureCache, swin_feature_shape
from .optim import make_lr_schedule
from .trainer import Trainer

# Coordination-service barrier ids are single-use; see the train-start
# barrier below.
_TRAIN_BARRIER_SEQ = 0


def train(config: Config,
          train_loader: Optional[DataLoader] = None,
          val_loader: Optional[DataLoader] = None,
          resume: bool = True) -> dict:
    """Run training; returns a summary dict (final state, loss history)."""
    maybe_init_distributed()
    enable_compile_cache()
    if config.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if config.debug_transfer_guard:
        jax.config.update("jax_transfer_guard", "disallow")
    mesh = make_mesh(config.mesh_shape, config.mesh_axis_names,
                     dcn_mesh_shape=config.dcn_mesh_shape)
    is_main = jax.process_index() == 0

    logger = get_logger(config.result_dir)
    if is_main:
        config.save()
        logger.info(config)

    tokenizer = load_tokenizer(config.tokenizer_path)
    if train_loader is None:
        train_loader = get_dataloader(config, "train", tokenizer)
    if val_loader is None:
        val_loader = get_dataloader(config, "val", tokenizer)

    if config.eval_captions_every and jax.process_count() > 1:
        raise ValueError(
            "eval_captions_every supports single-process runs only "
            "(caption decode is not sharded across processes); run "
            "klab-eval after training instead")
    eval_refs = None  # (paths, references), loaded once on first use

    num_epochs = config.num_epochs
    if num_epochs is None:
        num_epochs = int(config.num_steps / len(train_loader)) + 1

    accum = max(config.accumulation_steps, 1)
    tail = len(train_loader) % accum
    if tail and config.accumulation_tail == "error":
        raise ValueError(
            f"len(train_loader)={len(train_loader)} is not divisible by "
            f"accumulation_steps={accum} and accumulation_tail='error'; "
            "use 'pad' (gradient-exact partial update) or 'drop'")
    if tail and config.accumulation_tail == "pad" and config.reference_pad_quirks:
        raise ValueError(
            "accumulation_tail='pad' zero-weights the padding rows, but "
            "reference_pad_quirks keeps every position in the loss — the "
            "combination cannot be bit-exact. Use accumulation_tail='drop' "
            "or make len(train_loader) divisible by accumulation_steps")
    if config.accumulation_tail == "drop" and len(train_loader) < accum:
        raise ValueError(
            f"len(train_loader)={len(train_loader)} < accumulation_steps="
            f"{accum} with accumulation_tail='drop': every epoch would "
            "drop all its batches and perform ZERO optimizer updates "
            "(while still logging losses and saving 'best' checkpoints). "
            "Use accumulation_tail='pad', lower accumulation_steps, or "
            "grow the dataset/batch split")
    if config.accumulation_tail == "pad":
        opt_steps_per_epoch = max(-(-len(train_loader) // accum), 1)
    else:
        opt_steps_per_epoch = max(len(train_loader) // accum, 1)

    trainer = Trainer(config, mesh, num_epochs=num_epochs)
    state = trainer.init_state(jax.random.PRNGKey(config.seed),
                               train_loader.global_batch_size)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    logger.info(f"model parameters: {n_params:,}")

    ckpt = CheckpointManager(config.result_dir)
    start_epoch = 1
    steps = 0
    min_val_loss = 100  # literal parity with train.py:48
    resume_meta: dict = {}
    if resume and ckpt.latest() is not None:
        name = ckpt.latest()
        state = ckpt.restore(name, state)
        resume_meta = ckpt.load_metadata(name) or {}
        start_epoch = int(resume_meta.get("epoch", 0)) + 1
        steps = int(resume_meta.get("steps", int(state.step)))
        min_val_loss = float(resume_meta.get("min_val_loss", 100))
        logger.info(
            f"resumed from {name} (epoch {start_epoch - 1}, "
            f"cursor {int(resume_meta.get('epoch_cursor', 0))})")
    elif config.init_checkpoint:
        state = state.replace(params=load_pretrained_params(
            config.init_checkpoint, state.params))
        logger.info(
            f"initialized params from pretrained {config.init_checkpoint}")

    loss_counter = LossCounter(opt_steps_per_epoch, max(len(val_loader), 1))
    # rbg keys use the TPU hardware generator — threefry dropout bits cost
    # ~50% extra wall-clock on the transformer grad step.
    dropout_rng = jax.random.key(config.seed + 1,
                                 impl=config.dropout_rng_impl)
    # Bit-exact resume (SURVEY.md §5 checkpoint row: "params, opt state,
    # step, RNG, data-iterator state"): restore the dropout RNG stream, the
    # within-epoch update cursor, and the loss-counter partials that every
    # save records — a resumed run replays exactly the uninterrupted one
    # (test_train.py::test_bit_exact_midepoch_resume).
    resume_cursor = int(resume_meta.get("epoch_cursor", 0))
    if resume_meta.get("dropout_rng") is not None:
        dropout_rng = jax.random.wrap_key_data(
            np.asarray(resume_meta["dropout_rng"], np.uint32),
            impl=resume_meta.get("dropout_rng_impl",
                                 config.dropout_rng_impl))
    if resume_meta.get("loss_counter") is not None:
        loss_counter.load_state_dict(resume_meta["loss_counter"])

    tb = ScalarWriter(os.path.join(config.result_dir, "tb")
                      if (config.tensorboard and is_main) else None)
    lr_schedule = make_lr_schedule(config, max(num_epochs or 1, 1))

    if config.profile_server_port and is_main:
        profiler.start_server(config.profile_server_port)
    prof = profiler.StepWindowTrace(
        config.result_dir, config.profile_steps if is_main else 0)

    # Frozen-feature caches (cache_frozen_features): epoch 1 fills them as
    # free aux outputs of the normal step; later epochs skip the frozen
    # vision-tower forward entirely — and the frozen language tower too when
    # the dataset's source text is static (caption prompts; span corruption
    # re-masks per epoch and is never language-cached). Bit-identical losses
    # (the towers are deterministic) — equivalence pinned by test_train.py.
    train_cache = val_cache = None
    if config.cache_frozen_features:
        img_shape = swin_feature_shape(config)
        lang_shape = (config.max_source_length,
                      config.language_t5.d_model)
        cache_dir = os.path.join(config.result_dir, "feature_cache")
        # Multi-process runs share result_dir (the collective orbax saves
        # require it), but memmap + np.save have no multi-writer story —
        # concurrent flushes from N hosts would interleave pages and
        # corrupt the fill mask. Each process owns its own cache files;
        # rows that migrate to another host's shard on reshuffle simply
        # miss there and refill via the full step (dispatch consensus
        # below keeps the program choice global).
        proc_tag = (f".p{jax.process_index()}"
                    if jax.process_count() > 1 else "")

        def make_caches(tag, loader):
            caches = {"img": FrozenFeatureCache(
                os.path.join(cache_dir, f"{tag}.img.feat{proc_tag}"),
                len(loader.dataset), img_shape,
                dtype=config.compute_dtype)}
            if getattr(loader.dataset, "source_is_static", False):
                caches["lang"] = FrozenFeatureCache(
                    os.path.join(cache_dir, f"{tag}.lang.feat{proc_tag}"),
                    len(loader.dataset), lang_shape,
                    dtype=config.compute_dtype)
            return caches

        train_cache = make_caches("train", train_loader)
        val_cache = make_caches("val", val_loader)

    def cache_lookup(caches, batch, index):
        """Cached-feature batch if fully cached, else None."""
        if not caches["img"].has(index):
            return None
        fb = {k: v for k, v in batch.items() if k != "images"}
        fb["image_features"] = caches["img"].get(index)
        if "lang" in caches:
            if not caches["lang"].has(index):
                return None
            # cache stores full max_source_length rows; follow the batch's
            # (possibly bucketed) source width
            fb["language_features"] = (
                caches["lang"].get(index)[:, :fb["source_mask"].shape[1]])
        return fb

    def bucket_batch(batch):
        """Trim source/target pad columns to the smallest power-of-two
        bucket >= the longest real row (bucket_lengths; the static-shape
        'longest' padding of /root/reference/train.py:56 — one cached XLA
        program per bucket, loss-identical since pads are masked out)."""
        if not config.bucket_lengths:
            return batch

        sb = pow2_bucket_width(batch["source_mask"], 16)
        tb = pow2_bucket_width(batch["target_mask"], 8)
        if jax.process_count() > 1:
            # Each host sees only its own rows of the global batch; the
            # bucket is a GLOBAL shape decision (every host must assemble
            # and compile the same (B, width) step), so take the max width
            # over hosts — same mechanism as the halt consensus above.
            from jax.experimental import multihost_utils

            widths = multihost_utils.process_allgather(
                np.array([sb, tb], np.int32))
            sb = int(np.max(widths[..., 0]))
            tb = int(np.max(widths[..., 1]))
        out = dict(batch)
        for k, b in (("source_ids", sb), ("source_mask", sb),
                     ("target_ids", tb), ("target_mask", tb)):
            out[k] = np.ascontiguousarray(batch[k][:, :b])
        return out

    def cache_fill(caches, index, feats):
        # index holds THIS host's dataset rows; fetch only this host's
        # addressable rows of the batch-sharded global feature arrays
        # (a plain device_get would fail across processes).
        img_feats, lang_feats = feats
        caches["img"].put(index, trainer.host_local_rows(img_feats))
        if "lang" in caches:
            rows = trainer.host_local_rows(lang_feats)
            full = caches["lang"].feature_shape[0]
            if rows.shape[1] < full:
                # bucket_lengths trimmed pad columns; store zeros there —
                # pad positions are masked out of every attention read, so
                # zeros are exactly equivalent to the recomputed values
                rows = np.pad(rows,
                              ((0, 0), (0, full - rows.shape[1]), (0, 0)))
            caches["lang"].put(index, rows)

    # Fill writebacks are deferred by one step: jax dispatch is async, so
    # draining the PREVIOUS step's features after dispatching the next step
    # overlaps the blocking device_get + memmap write with device compute
    # (a synchronous fill would idle the chip every epoch-1 step).
    pending_fill: list = []

    def drain_fills():
        while pending_fill:
            cache_fill(*pending_fill.pop(0))

    def flush_caches():
        """Drain deferred fills, then persist data + fill masks — the one
        shared path for the epoch end and preemption save."""
        drain_fills()
        if train_cache is not None:
            for c in (*train_cache.values(), *val_cache.values()):
                c.flush()

    def all_hosts_agree(flag: bool) -> bool:
        """Global AND of a per-host boolean. Which jit program a step
        dispatches (cached vs full) is a GLOBAL decision — every process
        must launch the same SPMD program or their collective schedules
        diverge and the job deadlocks — the same consensus rule
        ``bucket_batch`` applies to shapes and ``should_halt`` to
        preemption."""
        if jax.process_count() == 1:
            return flag
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.array([1 if flag else 0], np.int32))
        return bool(int(np.min(flags)) == 1)

    def step_with_cache(caches, batch, index, run_cached, run_full):
        """Shared cached-dispatch: run from the cache when every sample is
        present ON EVERY HOST (the per-epoch reshuffle migrates rows across
        host shards, so one host can miss while another hits — the
        program choice must be unanimous), else all hosts run the
        with-features step and defer the writeback (drained AFTER the next
        dispatch so the device stays busy)."""
        if caches is not None and index is not None:
            fb = cache_lookup(caches, batch, index)
            if not all_hosts_agree(fb is not None):
                fb = None
            if fb is not None:
                loss = run_cached(trainer.device_put_batch(fb))
                drain_fills()
                return loss
            loss, feats = run_full(trainer.device_put_batch(batch))
            drain_fills()  # previous step's feats, device now busy
            pending_fill.append((caches, index, feats))
            return loss
        return run_cached(trainer.device_put_batch(batch))

    def set_skip_image_load(caches, loader):
        """Fully image-cached epochs skip the host JPEG decode entirely —
        the cached step never touches the image tensor, and decode is the
        dominant host cost (~131 img/s/core vs ~940 img/s/chip device).
        Gates on the epoch index shard of EVERY host (call after
        set_epoch): if any host has an uncached row, the dispatch
        consensus above will run FULL steps — which need real pixels — on
        all hosts, so skipping decode must also be unanimous."""
        if caches is not None:
            # EVERY cache must cover every row this host will draw: a full
            # img cache with a partial lang cache still falls back to the
            # full step, which needs real pixels.
            shard = loader.epoch_indices().reshape(-1)
            loader.dataset.skip_image_load = all_hosts_agree(all(
                c.has(shard) for c in caches.values()))

    # -- preemption / halt machinery ---------------------------------------
    # "local": this process saw SIGTERM. "global": every process agreed to
    # halt. Checkpoint saves are COLLECTIVE, so in multi-process runs a
    # lone process must never enter preempt_save — consensus is reached by
    # all-gathering the local flag every preempt_sync_steps updates (the
    # signal may land on one host only). Single-process: local == global.
    halt_flag = {"local": False, "global": False}
    prev_sigterm = None
    if config.save_on_sigterm:
        try:
            prev_sigterm = signal.signal(
                signal.SIGTERM,
                lambda *_: halt_flag.__setitem__("local", True))
        except ValueError:
            prev_sigterm = None  # not the main thread — opt out

    def sync_halt_consensus() -> None:
        if jax.process_count() == 1:
            halt_flag["global"] = halt_flag["local"]
            return
        if steps % max(config.preempt_sync_steps, 1) == 0:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.array([1 if halt_flag["local"] else 0], np.int32))
            halt_flag["global"] = bool(int(np.sum(flags)) > 0)

    # A threshold the resumed step counter has ALREADY passed is spent:
    # rerunning the same command (the documented resume workflow,
    # MIGRATION.md) must continue to completion, not re-halt after one
    # update per relaunch.
    halt_threshold = (config.halt_after_steps
                      if config.halt_after_steps > steps else 0)

    def should_halt() -> bool:
        sync_halt_consensus()
        return bool((halt_threshold and steps >= halt_threshold)
                    or halt_flag["global"])

    def resume_state_meta() -> dict:
        """RNG + loss-partial fields added to EVERY checkpoint's metadata so
        any resume — epoch-granular or mid-epoch — is bit-exact."""
        return {
            "dropout_rng": np.asarray(
                jax.random.key_data(dropout_rng), np.uint32).tolist(),
            "dropout_rng_impl": config.dropout_rng_impl,
            "loss_counter": loss_counter.state_dict(),
        }

    def finish(summary_extra: dict) -> dict:
        ckpt.wait()  # drain any in-flight async save before returning
        prof.close()
        tb.close()
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
        return {"state": state, "losses": loss_counter.losses,
                "min_val_loss": min_val_loss, "steps": steps,
                "trainer": trainer, **summary_extra}

    if jax.process_count() > 1:
        # Align hosts before the first collective execution. Model init and
        # (cache-hit) compiles above run at different speeds per host; on
        # CPU rigs the cross-process gloo context init has a fixed 30 s
        # key-exchange window, so accumulated skew must be reset through
        # the coordination service (plain TCP barrier, generous timeout)
        # rather than paid inside the first all-reduce. Free on TPU pods
        # (one RPC; ICI collectives have no such window). Best-effort: the
        # client handle is a private jax API, so a missing attribute after
        # an upgrade degrades to no barrier, never to a crash. Barrier ids
        # are single-use per coordination service; the counter keeps
        # repeated train() calls in one distributed process in step
        # (every process runs the same call sequence).
        try:
            from jax._src import distributed

            client = distributed.global_state.client
        except Exception:
            client = None
        if client is not None:
            global _TRAIN_BARRIER_SEQ
            _TRAIN_BARRIER_SEQ += 1
            client.wait_at_barrier(
                f"klab_train_start_{_TRAIN_BARRIER_SEQ}",
                timeout_in_ms=600_000)

    for epoch in range(start_epoch, num_epochs + 1):
        train_loader.set_epoch(epoch)
        set_skip_image_load(train_cache, train_loader)
        epoch_t0 = time.perf_counter()
        images_seen = 0
        groups_done = 0
        start_batch = 0
        if epoch == start_epoch and resume_cursor:
            # Mid-epoch resume: replay this epoch's deterministic order from
            # the saved cursor (consumed groups are never re-run).
            groups_done = resume_cursor
            start_batch = resume_cursor * accum

        def run_update(merged, n_real_images):
            nonlocal state, dropout_rng, steps, images_seen
            prof.tick()
            merged = bucket_batch(merged)
            index = merged.pop("index", None)
            dropout_rng, step_rng = jax.random.split(dropout_rng)

            def run_cached(db):
                nonlocal state
                name = ("train_step_cached" if "image_features" in db
                        else "train_step")
                with profiler.annotate(name):
                    state, loss = trainer.train_step(state, db, step_rng)
                return loss

            def run_full(db):
                nonlocal state
                with profiler.annotate("train_step"):
                    state, loss, feats = trainer.train_step_with_features(
                        state, db, step_rng)
                return loss, feats

            loss = step_with_cache(train_cache, merged, index,
                                   run_cached, run_full)
            loss_counter.add_loss("train", loss)
            steps += 1
            # n_real_images counts THIS host's loader rows; the logged
            # img/s and metrics.jsonl rates are global (divided by the
            # GLOBAL device count below), so scale by process_count —
            # every host draws an equal slice of each global batch.
            images_seen += n_real_images * max(jax.process_count(), 1)
            if (is_main and config.log_every_steps
                    and steps % config.log_every_steps == 0):
                dt_so_far = time.perf_counter() - epoch_t0
                logger.info(
                    f"step {steps}: {images_seen / dt_so_far:.1f} img/s "
                    f"({images_seen / dt_so_far / max(jax.device_count(), 1):.1f}"
                    f" img/s/chip)")

        def preempt_save() -> dict:
            """Save a step_N checkpoint carrying the full mid-epoch cursor
            (groups done this epoch, RNG, loss partials) and stop. The
            notion matches a torchrun job killed mid-epoch — except here the
            run continues bit-exactly."""
            flush_caches()
            meta = {"epoch": epoch - 1, "steps": steps,
                    "min_val_loss": min_val_loss,
                    "epoch_cursor": groups_done, **resume_state_meta()}
            ckpt.save(f"step_{steps}", state, meta)
            if is_main:
                logger.info(
                    f"halt: saved step_{steps} (epoch {epoch} cursor "
                    f"{groups_done}) — resume continues bit-exactly")
            return finish({"halted": True})

        micro_group: list = []
        for batch in train_loader.iter_from(start_batch):
            micro_group.append(batch)
            if len(micro_group) < accum:
                continue
            merged = {k: np.concatenate([m[k] for m in micro_group])
                      for k in micro_group[0]}
            micro_group = []
            run_update(merged, merged["images"].shape[0])
            groups_done += 1
            if should_halt():
                return preempt_save()
        if micro_group and config.accumulation_tail == "pad":
            # Ragged final update (reference parity, train.py:61-67): pad
            # the leftover microbatches to the full accum group by cycling
            # real rows with BOTH masks zeroed. Zero target weights make
            # the CE loss and gradients exactly zero; zero source masks
            # (plus the row-validity image mask, models/multimodal.py, and
            # nonempty-group aux normalization, ops/moe.py) keep the
            # phantom rows out of MoE routing statistics — so this is
            # gradient-exact equivalent to the reference's smaller final
            # group (which also scales each microbatch by
            # 1/accumulation_steps). Phantom index rows are set to -1 so
            # the feature cache never writes their (masked, now different)
            # features over the real rows they duplicate.
            real = {k: np.concatenate([m[k] for m in micro_group])
                    for k in micro_group[0]}
            n_real = real["images"].shape[0]
            micro_rows = n_real // len(micro_group)
            n_total = accum * micro_rows
            idx = np.arange(n_total) % n_real
            merged = {k: v[idx] for k, v in real.items()}
            for k in ("target_mask", "source_mask"):
                merged[k] = merged[k].copy()
                merged[k][n_real:] = 0
            if "index" in merged:
                merged["index"] = merged["index"].copy()
                merged["index"][n_real:] = -1
            run_update(merged, n_real)
            groups_done += 1
            if should_halt():
                return preempt_save()
        # (accumulation_tail == 'drop': leftovers skipped; changes step
        # counts vs the reference — PARITY.md.)

        set_skip_image_load(val_cache, val_loader)
        for batch in val_loader:
            batch = bucket_batch(batch)
            index = batch.pop("index", None)
            loss = step_with_cache(
                val_cache, batch, index,
                lambda db: trainer.eval_step(state.params, db),
                lambda db: trainer.eval_step_with_features(state.params, db))
            loss_counter.add_loss("val", loss)
        flush_caches()

        train_loss, val_loss = loss_counter.count_and_get_loss()
        dt = time.perf_counter() - epoch_t0
        ips = images_seen / dt if dt > 0 else 0.0

        caption_scores = None
        if (config.eval_captions_every
                and epoch % config.eval_captions_every == 0):
            from ..evaluation.evaluate import (coco_references,
                                               evaluate_captions)

            if eval_refs is None:
                eval_refs = coco_references(config.data_dir, "val")
            with profiler.annotate("eval_captions"):
                caption_scores = evaluate_captions(
                    config, state.params, tokenizer, eval_refs[0],
                    eval_refs[1], limit=config.eval_captions_limit)
            if is_main:
                logger.info(
                    f"[Epoch ({epoch}/{num_epochs})] CIDEr-D : "
                    f"{caption_scores['CIDEr-D']:.3f}, BLEU-4 : "
                    f"{caption_scores['BLEU-4']:.4f}, ROUGE-L : "
                    f"{caption_scores['ROUGE-L']:.4f} "
                    f"({caption_scores['num_images']} images)")
            if tb.enabled:
                tb.scalar("quality/cider_d",
                          caption_scores["CIDEr-D"], epoch)
                tb.scalar("quality/bleu4", caption_scores["BLEU-4"], epoch)
                tb.scalar("quality/rouge_l",
                          caption_scores["ROUGE-L"], epoch)
        if tb.enabled:
            tb.scalar("loss/train", train_loss, epoch)
            tb.scalar("loss/val", val_loss, epoch)
            tb.scalar("throughput/img_per_sec", ips, epoch)
            # LR applied at this epoch's LAST update (optimizer-step count
            # was steps-1 when it fired).
            tb.scalar("lr", float(lr_schedule(max(steps - 1, 0))), epoch)
        if is_main:
            logger.info(
                f"[Epoch ({epoch}/{num_epochs})] Train loss : {train_loss}, "
                f"Val loss : {val_loss} "
                f"({ips:.1f} img/s, {ips / max(jax.device_count(), 1):.1f} "
                f"img/s/chip)")
            # Machine-readable training curve (one JSON line per epoch),
            # appended so resumed runs extend the same file.
            row = {"epoch": epoch, "steps": steps,
                   "train_loss": train_loss, "val_loss": val_loss,
                   "img_per_sec": round(ips, 2),
                   "img_per_sec_per_chip": round(
                       ips / max(jax.device_count(), 1), 2),
                   "lr": float(lr_schedule(max(steps - 1, 0))),
                   "epoch_seconds": round(dt, 2)}
            if caption_scores is not None:
                row["cider_d"] = caption_scores["CIDEr-D"]
                row["bleu4"] = caption_scores["BLEU-4"]
            with open(os.path.join(config.result_dir,
                                   "metrics.jsonl"), "a") as f:
                f.write(json.dumps(row) + "\n")

        # Checkpoint saves are collective (every process participates in the
        # sharded write); the decisions below are identical on all hosts
        # because val_loss is the jit-computed global mean. Only logging is
        # rank-0-gated.
        meta = {"epoch": epoch, "steps": steps,
                "min_val_loss": min_val_loss, "epoch_cursor": 0,
                "train_loss": train_loss, "val_loss": val_loss,
                **resume_state_meta()}
        if val_loss < min_val_loss:
            min_val_loss = val_loss
            meta["min_val_loss"] = min_val_loss
            if is_main:
                logger.info("Best Model saving...")
            ckpt.save("best", state, meta)
            if is_main:
                logger.info("Best Model saved")

        if config.save_interval is not None:
            if config.num_steps is None:
                if epoch % config.save_interval == 0:
                    ckpt.save(f"epoch_{epoch}", state, meta)
                    if is_main:
                        logger.info(f"Model epoch_{epoch} saved")
            else:
                # step-mode quirk preserved: checked once per epoch
                # (train.py:101-104).
                if steps % config.save_interval == 0:
                    ckpt.save(f"step_{steps}", state, meta)
                    if is_main:
                        logger.info(f"Model step_{steps} saved")

    if is_main:
        loss_counter.plot_loss(config.result_dir)
    return finish({"halted": False})
