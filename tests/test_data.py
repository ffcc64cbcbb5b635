"""Data layer tests: COCO index parity, dataset behavior, pipeline sharding.

Reference behavior: /root/reference/modules/loader.py, modules/coco.py.
"""

import json
import os

import numpy as np
import pytest

from klab_multimodalmodel_tpu.data import (COCO_PROMPT, CocoCaptionDataset,
                                           CocoIndex, DataLoader,
                                           RedCapsDataset,
                                           SyntheticCaptionDataset,
                                           build_dataset, normalize_images)
from klab_multimodalmodel_tpu.text import ByteTokenizer


@pytest.fixture
def coco_dir(tmp_path):
    """Tiny MSCOCO-layout directory with 3 images, 2 captions each."""
    from PIL import Image

    d = tmp_path / "mscoco2017"
    (d / "annotations").mkdir(parents=True)
    (d / "train2017").mkdir()
    images, annotations = [], []
    for i in range(3):
        name = f"{i:012d}.jpg"
        Image.new("RGB", (64, 48), color=(i * 40, 10, 200)).save(
            d / "train2017" / name)
        images.append({"id": 100 + i, "file_name": name})
        annotations.append({"id": 1000 + 2 * i, "image_id": 100 + i,
                            "caption": f"first caption {i}"})
        annotations.append({"id": 1001 + 2 * i, "image_id": 100 + i,
                            "caption": f"second caption {i}"})
    with open(d / "annotations" / "captions_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    return str(d)


@pytest.fixture
def redcaps_dir(tmp_path):
    from PIL import Image

    d = tmp_path / "redcaps"
    (d / "annotations").mkdir(parents=True)
    (d / "images" / "foo").mkdir(parents=True)
    anns = []
    for i in range(4):
        img_id = f"img{i}"
        Image.new("RGB", (32, 32), color=(0, i * 50, 0)).save(
            d / "images" / "foo" / f"{img_id}.jpg")
        anns.append({"subreddit": "foo", "image_id": img_id,
                     "raw_caption": f"a photo number {i} of something nice"})
    with open(d / "annotations" / "foo.json", "w") as f:
        json.dump({"annotations": anns}, f)
    return str(d)


def test_coco_index_matches_pycocotools_semantics(coco_dir):
    idx = CocoIndex(os.path.join(coco_dir, "annotations",
                                 "captions_train2017.json"))
    assert idx.getImgIds() == [100, 101, 102]
    assert idx.loadImgs(100)[0]["file_name"] == "000000000000.jpg"
    anns = idx.loadAnns(idx.getAnnIds(101))
    assert anns[0]["caption"] == "first caption 1"  # file order preserved


def test_coco_dataset_first_caption_and_prompt(coco_dir):
    ds = CocoCaptionDataset(coco_dir, "train", image_size=64)
    assert len(ds) == 3
    img, src, tgt = ds[1]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert src == COCO_PROMPT  # typo'd prompt preserved (loader.py:38)
    assert tgt == "first caption 1"  # loadAnns(...)[0] (loader.py:35)


def test_redcaps_dynamic_corruption(redcaps_dir):
    ds = RedCapsDataset(redcaps_dir, "train", image_size=32)
    assert len(ds) == 4
    img, src, tgt = ds[0]
    assert "<extra_id_0>" in src and tgt.startswith("<extra_id_0>")
    # deterministic per (epoch, idx); changes across epochs
    src2 = ds[0][1]
    assert src2 == src
    ds.set_epoch(1)
    src3 = ds[0][1]
    assert isinstance(src3, str)  # may coincide, but must not crash


def test_build_dataset_dispatch(coco_dir, redcaps_dir):
    assert isinstance(build_dataset(coco_dir, "train"), CocoCaptionDataset)
    assert isinstance(build_dataset(redcaps_dir, "train"), RedCapsDataset)
    assert isinstance(build_dataset("synthetic", "train"),
                      SyntheticCaptionDataset)
    with pytest.raises(NotImplementedError):
        build_dataset("/data/unknown", "train")


def test_dataloader_batches_and_sharding():
    ds = SyntheticCaptionDataset(n=32, image_size=32)
    tok = ByteTokenizer()
    dl = DataLoader(ds, tok, global_batch_size=8, max_source_length=48,
                    max_target_length=24, seed=0)
    assert len(dl) == 4
    batches = list(dl)
    assert len(batches) == 4
    b = batches[0]
    assert b["images"].shape == (8, 32, 32, 3)
    assert b["source_ids"].shape == (8, 48)
    assert b["target_ids"].shape == (8, 24)
    assert b["source_mask"].dtype == np.int32

    # two hosts see disjoint halves of each global batch
    dl0 = DataLoader(ds, tok, global_batch_size=8, process_index=0,
                     process_count=2, max_source_length=48,
                     max_target_length=24, seed=0)
    dl1 = DataLoader(ds, tok, global_batch_size=8, process_index=1,
                     process_count=2, max_source_length=48,
                     max_target_length=24, seed=0)
    i0 = dl0._epoch_indices()
    i1 = dl1._epoch_indices()
    assert i0.shape == (4, 4) and i1.shape == (4, 4)
    assert set(i0.ravel()).isdisjoint(set(i1.ravel()))


def test_dataloader_drop_last_false_wraps():
    """drop_last=False keeps the static batch shape by wrapping indices
    from the epoch start into the final batch (torch DistributedSampler's
    pad semantics) instead of crashing on the non-divisible tail."""
    ds = SyntheticCaptionDataset(n=10, image_size=32)
    tok = ByteTokenizer()
    dl = DataLoader(ds, tok, global_batch_size=4, max_source_length=48,
                    max_target_length=24, seed=0, drop_last=False)
    assert len(dl) == 3
    idx = dl.epoch_indices()
    assert idx.shape == (3, 4)
    flat = idx.ravel()
    assert set(flat) == set(range(10))  # every sample appears
    assert np.array_equal(flat[10:], flat[:2])  # tail wraps the start
    batches = list(dl)
    assert len(batches) == 3
    assert all(b["images"].shape[0] == 4 for b in batches)


def test_dataloader_epoch_reshuffle():
    ds = SyntheticCaptionDataset(n=32, image_size=32)
    tok = ByteTokenizer()
    dl = DataLoader(ds, tok, global_batch_size=8, seed=0)
    a = dl._epoch_indices()
    dl.set_epoch(1)
    b = dl._epoch_indices()
    assert not np.array_equal(a, b)  # fixed: reference repeats every epoch
    dl.set_epoch(0)
    np.testing.assert_array_equal(a, dl._epoch_indices())  # reproducible


def test_normalize_images_device_op():
    import jax.numpy as jnp

    img = np.full((1, 4, 4, 3), 255, np.uint8)
    out = np.asarray(normalize_images(jnp.asarray(img)))
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)
    # reference double-rescale quirk reproduces (x/255 - m)/s on [0,1] input
    out_q = np.asarray(normalize_images(jnp.asarray(img),
                                        reference_double_rescale=True))
    expected_q = (1.0 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225])
    np.testing.assert_allclose(out_q[0, 0, 0], expected_q, rtol=1e-5)


def test_process_decode_workers_match_threads():
    """worker_mode='process' (spawned decode workers, the torch
    num_workers equivalent) yields byte-identical batches to the thread
    pool — including epoch-dependent per-sample state, which is shipped
    with each task since the pool persists across epochs."""
    from klab_multimodalmodel_tpu.data import DataLoader, SyntheticCaptionDataset
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    ds = SyntheticCaptionDataset(n=16, image_size=32)

    def batches(mode):
        dl = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                        max_source_length=24, max_target_length=16,
                        seed=0, num_workers=2, worker_mode=mode)
        dl.set_epoch(1)
        return list(dl)

    for a, b in zip(batches("thread"), batches("process")):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_abandoned_iteration_releases_producer():
    """Abandoning iteration mid-epoch (the preemption halt path) must not
    leave the producer thread blocked in q.put on a full prefetch queue."""
    import threading
    import time

    from klab_multimodalmodel_tpu.data import (DataLoader,
                                               SyntheticCaptionDataset)
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    ds = SyntheticCaptionDataset(n=64, image_size=32)
    dl = DataLoader(ds, ByteTokenizer(), global_batch_size=4,
                    max_source_length=24, max_target_length=16,
                    seed=0, num_workers=1, prefetch=1)
    dl.set_epoch(1)
    before = threading.active_count()
    it = iter(dl)
    next(it)          # producer now prefetching ahead on a full queue
    it.close()        # abandon mid-epoch (what preempt_save does)
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_process_workers_see_epoch_state():
    """The persistent spawn pool must observe per-epoch dataset reseeds:
    epoch 1 and epoch 2 batches differ for an epoch-seeded dataset and
    match the thread pool's epoch-2 output exactly."""
    from klab_multimodalmodel_tpu.data import (DataLoader,
                                               SyntheticCaptionDataset)
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    # pretrain mode re-corrupts spans per epoch — source text is dynamic
    ds = SyntheticCaptionDataset(n=8, image_size=32, seed=0, pretrain=True)

    def batch(mode, epoch):
        dl = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                        max_source_length=24, max_target_length=16,
                        seed=0, num_workers=2, worker_mode=mode,
                        shuffle=False)
        dl.set_epoch(epoch)
        out = next(iter(dl))
        dl.close()
        return out

    p1, p2 = batch("process", 1), batch("process", 2)
    t2 = batch("thread", 2)
    assert (p1["source_ids"] != p2["source_ids"]).any()
    for k in t2:
        np.testing.assert_array_equal(p2[k], t2[k], err_msg=k)
