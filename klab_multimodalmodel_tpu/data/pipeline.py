"""Host input pipeline: sharded, shuffled, prefetching batch assembly.

TPU-native replacement for the reference's ``DataLoader +
DistributedSampler`` (``/root/reference/modules/loader.py:87-88``):

  * per-host sharding keyed on ``jax.process_index()`` (the reference keys on
    the *local device count* — a single-node assumption);
  * epoch-seeded shuffling (the reference never calls ``set_epoch`` so its
    shuffle order repeats every epoch — fixed here, reproducible via seed);
  * ``drop_last`` semantics as in the reference (sampler ``drop_last=True``);
  * worker threads decode+resize images while batches are assembled, and a
    background prefetcher keeps ``prefetch`` batches ready so the TPU step
    never waits on the host;
  * tokenization to **fixed** max lengths (XLA static shapes) instead of the
    reference's per-batch 'longest' padding (``/root/reference/train.py:56``).

Batches are plain numpy dicts: images uint8 (B,H,W,3) — normalization happens
on-device (``image_ops``) — plus source/target ids and masks, int32 (B,L).
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Iterator

import numpy as np

from ..text.tokenizer import TokenizerBase
from .datasets import DatasetBase

# -- decode-worker process plumbing (worker_mode="process") -----------------
# The dataset is shipped once per worker via the pool initializer (spawn,
# pickled), not re-pickled per batch; workers only run PIL decode + resize,
# never jax. Spawn, NOT fork: the pool is created lazily from inside a live
# training process whose XLA/PJRT runtime and async-checkpoint threads hold
# locks — fork() of a multithreaded process can clone a held mutex into the
# child and deadlock its first allocation. Spawned workers start clean; the
# pool persists across epochs (one startup cost per run), so per-epoch
# dataset state (epoch reseed, skip_image_load) is shipped with each task.
_WORKER_DATASET = None


def _init_decode_worker(dataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _decode_worker_getitem(task):
    i, epoch, skip = task
    if getattr(_WORKER_DATASET, "epoch", None) != epoch:
        _WORKER_DATASET.set_epoch(epoch)  # no-op for epoch-free datasets
    _WORKER_DATASET.skip_image_load = skip
    return _WORKER_DATASET[i]


class Batch(dict):
    @property
    def size(self) -> int:
        return self["images"].shape[0]


class DataLoader:
    def __init__(self, dataset: DatasetBase, tokenizer: TokenizerBase,
                 global_batch_size: int, max_source_length: int = 256,
                 max_target_length: int = 128, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 num_workers: int | None = None, prefetch: int = 2,
                 process_index: int = 0, process_count: int = 1,
                 native_encoder=None, worker_mode: str = "thread"):
        if global_batch_size % process_count != 0:
            raise ValueError(
                f"global batch {global_batch_size} % hosts {process_count}")
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // process_count
        self.max_source_length = max_source_length
        self.max_target_length = max_target_length
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers or max((os.cpu_count() or 4) // 4, 1)
        # "thread" (default): ThreadPoolExecutor — PIL releases the GIL for
        # jpeg decode, so threads scale for decode-bound loads. "process":
        # spawned decode workers (the torch num_workers equivalent,
        # /root/reference/modules/loader.py:88) — full-core scaling when
        # per-sample Python work (span corruption, transforms) would
        # otherwise serialize on the GIL.
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode {worker_mode!r}")
        self.worker_mode = worker_mode
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        # Optional native.NativeUnigramEncoder (--native_tokenizer): C++
        # batch encode with the same chain/ids as `tokenizer` (parity
        # pinned by tests/test_native.py); decode stays on `tokenizer`.
        self.native_encoder = native_encoder
        self.epoch = 0
        self._pool = None  # lazily created, persists across epochs

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return -(-n // self.global_batch_size)

    def epoch_indices(self) -> np.ndarray:
        """(num_batches, local_batch_size) dataset indices THIS host draws
        for the current epoch (set via ``set_epoch``). Deterministic, so
        resumable mid-epoch and usable for cache-coverage checks."""
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        num_batches = len(self)
        usable = num_batches * self.global_batch_size
        # drop_last=True truncates the tail; drop_last=False wraps indices
        # from the start of the epoch order to fill the final batch (torch
        # DistributedSampler's pad semantics — every batch keeps the static
        # global shape XLA needs, some samples repeat within the epoch).
        order = np.resize(order, usable)
        # contiguous per-batch blocks; this host takes its slice of each
        local = order.reshape(num_batches, self.process_count,
                              self.local_batch_size)[:, self.process_index]
        return local  # (num_batches, local_batch_size)

    _epoch_indices = epoch_indices  # back-compat alias

    def _encode(self, texts: list, max_length: int):
        if self.native_encoder is not None:
            ids, mask = self.native_encoder.encode_batch(
                texts, max_length, pad_id=self.tokenizer.pad_id,
                eos_id=self.tokenizer.eos_id)
            return ids, mask
        enc = self.tokenizer(texts, max_length=max_length)
        return enc.input_ids, enc.attention_mask

    def _get_pool(self):
        """The decode pool, created once and reused across epochs (see the
        spawn rationale at the top of this module)."""
        if self._pool is None:
            if self.worker_mode == "process":
                self._pool = ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=multiprocessing.get_context("spawn"),
                    initializer=_init_decode_worker,
                    initargs=(self.dataset,))
            else:
                self._pool = ThreadPoolExecutor(
                    max_workers=self.num_workers)
        return self._pool

    def close(self) -> None:
        """Shut the decode pool down (optional — interpreter exit also
        reaps it; call when constructing many short-lived loaders)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def _assemble(self, idxs: np.ndarray, pool) -> Batch:
        if self.worker_mode == "process":
            skip = bool(getattr(self.dataset, "skip_image_load", False))
            tasks = [(int(i), self.epoch, skip) for i in idxs.tolist()]
            items = list(pool.map(_decode_worker_getitem, tasks))
        else:
            items = list(pool.map(self.dataset.__getitem__, idxs.tolist()))
        images = np.stack([it[0] for it in items])
        src_ids, src_mask = self._encode([it[1] for it in items],
                                         self.max_source_length)
        tgt_ids, tgt_mask = self._encode([it[2] for it in items],
                                         self.max_target_length)
        return Batch(images=images,
                     source_ids=src_ids, source_mask=src_mask,
                     target_ids=tgt_ids, target_mask=tgt_mask,
                     # dataset-index of each row: keys the frozen-feature
                     # cache; popped from the batch before device transfer
                     index=np.asarray(idxs, np.int64))

    def __iter__(self) -> Iterator[Batch]:
        return self.iter_from(0)

    def iter_from(self, start_batch: int) -> Iterator[Batch]:
        """Iterate the current epoch starting at batch ``start_batch`` —
        mid-epoch resume (preemption checkpoints) replays the tail of the
        deterministic epoch order without decoding the consumed prefix."""
        batches = self.epoch_indices()[start_batch:]
        pool = self._get_pool()
        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, 1))
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that keeps observing ``stop``: a consumer that
            abandons iteration mid-epoch (preemption halt) must not leave
            the producer blocked forever on a full prefetch queue."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    if not put_or_stop(self._assemble(b, pool)):
                        return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def get_dataloader(config, phase: str, tokenizer: TokenizerBase,
                   num_devices: int | None = None) -> DataLoader:
    """Factory mirroring the reference's ``get_dataloader(args, phase, rank)``
    (``/root/reference/modules/loader.py:79-89``): per-chip ``batch_size``
    times the device count gives the global batch."""
    import jax

    from .datasets import build_dataset

    dataset = build_dataset(config.data_dir, phase, config.swin.image_size,
                            config.seed)
    n_dev = num_devices if num_devices is not None else jax.device_count()
    native_encoder = None
    if config.native_tokenizer:
        if not config.tokenizer_path:
            raise ValueError("--native_tokenizer requires --tokenizer_path "
                             "(the byte fallback has no native core)")
        from ..native import NativeUnigramEncoder, available

        if not available():
            raise RuntimeError(
                "--native_tokenizer: native library unavailable "
                "(run `make -C native` in the repo root)")
        native_encoder = NativeUnigramEncoder(config.tokenizer_path)
    return DataLoader(
        dataset, tokenizer,
        global_batch_size=config.batch_size * n_dev,
        max_source_length=config.max_source_length,
        max_target_length=config.max_target_length,
        shuffle=(phase == "train"), seed=config.seed,
        num_workers=config.num_workers or None,
        prefetch=config.prefetch_batches,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        native_encoder=native_encoder,
        worker_mode=config.decode_workers)
