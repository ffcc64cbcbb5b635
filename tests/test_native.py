"""Tests for the C++ host runtime (native/klab_host.cpp via ctypes)."""

import numpy as np
import pytest

from klab_multimodalmodel_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_resize_matches_pillow_bicubic(rng):
    from PIL import Image

    img = rng.integers(0, 256, (123, 217, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((64, 64)))  # PIL default
    out = native.resize_batch([img], 64, filter=native.BICUBIC)[0]
    # identical convolution plan; Pillow rounds through 8-bit fixed-point
    # coefficients while we keep doubles -> off-by-one on ~16% of pixels.
    assert out.shape == ref.shape
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_resize_matches_pillow_bilinear(rng):
    from PIL import Image

    img = rng.integers(0, 256, (80, 50, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(img).resize(
        (32, 32), resample=Image.Resampling.BILINEAR))
    out = native.resize_batch([img], 32, filter=native.BILINEAR)[0]
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1


def test_resize_batch_mixed_sizes(rng):
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(64, 64), (100, 40), (30, 200)]]
    out = native.resize_batch(imgs, 48)
    assert out.shape == (3, 48, 48, 3)


def test_native_unigram_matches_python(tmp_path, rng):
    from klab_multimodalmodel_tpu.text import train_unigram_tokenizer

    texts = ["a man rides a moped down the road",
             "a dog jumps over the fence",
             "the cat sits on the mat"] * 50
    path = str(tmp_path / "tok.json")
    pytok = train_unigram_tokenizer(texts, path, vocab_size=300)
    enc = native.NativeUnigramEncoder(path)

    samples = ["a dog on the road", "the cat and the moped",
               "a man jumps over the mat"]
    ids, mask = enc.encode_batch(samples, max_len=16,
                                 pad_id=pytok.pad_id, eos_id=pytok.eos_id)
    ref = pytok(samples, max_length=16)
    np.testing.assert_array_equal(ids, ref.input_ids)
    np.testing.assert_array_equal(mask, ref.attention_mask)


def test_epoch_indices_shard_disjoint():
    a = native.epoch_indices(64, 16, seed=3, epoch=1, process_index=0,
                             process_count=2)
    b = native.epoch_indices(64, 16, seed=3, epoch=1, process_index=1,
                             process_count=2)
    assert a.shape == (4, 8) and b.shape == (4, 8)
    assert set(a.ravel()).isdisjoint(set(b.ravel()))
    # deterministic per (seed, epoch); different across epochs
    a2 = native.epoch_indices(64, 16, seed=3, epoch=1, process_index=0,
                              process_count=2)
    np.testing.assert_array_equal(a, a2)
    a3 = native.epoch_indices(64, 16, seed=3, epoch=2, process_index=0,
                              process_count=2)
    assert not np.array_equal(a, a3)
