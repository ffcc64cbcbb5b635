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


def _synthetic_spiece(tmp_path, charsmap: bytes) -> str:
    """A tiny T5-layout spiece.model proto (what the reference's
    AutoTokenizer loads, /root/reference/train.py:40) with a precompiled
    charsmap, built via transformers' bundled pb2."""
    pytest.importorskip("transformers")
    from transformers.convert_slow_tokenizer import import_protobuf

    spm_pb2 = import_protobuf()
    m = spm_pb2.ModelProto()
    m.trainer_spec.model_type = 1  # UNIGRAM
    m.trainer_spec.unk_id = 2
    m.trainer_spec.byte_fallback = False
    m.normalizer_spec.precompiled_charsmap = charsmap

    def piece(t, s, ty):
        p = m.pieces.add()
        p.piece, p.score, p.type = t, s, ty

    C = spm_pb2.ModelProto.SentencePiece.CONTROL
    N = spm_pb2.ModelProto.SentencePiece.NORMAL
    U = spm_pb2.ModelProto.SentencePiece.UNKNOWN
    piece("<pad>", 0.0, C)
    piece("</s>", 0.0, C)
    piece("<unk>", 0.0, U)
    words = ["▁a", "▁b", "▁cat", "▁dog", "▁the", "▁fi", "▁le", "le", "▁1",
             "/4", "1", "4", "▁A", "A", "a", "b", "c", "t", "d", "o", "g",
             "e", "h", "i", "s", "▁", "file", "▁what", "▁does", "th",
             "▁image", "▁describe", "?", "▁?", "."]
    for i, w in enumerate(words):
        piece(w, -1.0 - 0.1 * i, N)
    path = str(tmp_path / "spiece.model")
    with open(path, "wb") as f:
        f.write(m.SerializeToString())
    return path


def test_native_chain_matches_python_on_spiece(tmp_path):
    """The C++ core's FULL chain — precompiled charsmap (darts trie),
    right-strip, multi-space collapse, metaspace, raw-text sentinel
    extraction, per-codepoint unk + fuse_unk — is token-exact vs the
    production Python path (UnigramTokenizer over the same spiece proto,
    i.e. HF's exact T5 normalizer chain, text/tokenizer.py:199-208)."""
    from klab_multimodalmodel_tpu.text.charsmap import build_charsmap
    from klab_multimodalmodel_tpu.text.tokenizer import UnigramTokenizer

    charsmap = build_charsmap({
        "Ａ": "A", "①": "1", "　": " ", "ﬁ": "fi", "¼": " 1/4", "é": "e"})
    path = _synthetic_spiece(tmp_path, charsmap)
    pytok = UnigramTokenizer(path)
    enc = native.NativeUnigramEncoder(path)

    corpus = [
        # plain text incl. the reference's typo'd prompt
        "a cat", "the dog .", "What does th image describe ?",
        # charsmap normalization (fullwidth, ligature, ideographic space)
        "Ａ cat", "x①y", "a　b", "ﬁle", "¼ cup", "cafés", "héllo", "éx",
        # whitespace: multi-space collapse, strip-right, tabs/newlines
        "a  b", "  a", "a ", "", " ", "a\tb", "a\nb", "tab\t",
        # unknown codepoints: fuse_unk, leading/trailing
        "ZZZ", "aZZb", "Z",
        # sentinels extracted from raw text (span-corruption path)
        "<extra_id_0> cat", "a <extra_id_0> b <extra_id_1>",
        "a<extra_id_0>b", "the cat <extra_id_0>", "dog  <extra_id_1>  cat",
        # literal metaspace char in input
        "▁x", "th e",
    ]
    ids, mask = enc.encode_batch(corpus, max_len=24,
                                 pad_id=pytok.pad_id, eos_id=pytok.eos_id)
    ref = pytok(corpus, max_length=24)
    np.testing.assert_array_equal(ids, ref.input_ids)
    np.testing.assert_array_equal(mask, ref.attention_mask)


def test_charsmap_builder_accepted_by_hf():
    """build_charsmap emits blobs HF's Rust Precompiled normalizer parses
    and applies with the expected per-grapheme semantics (incl. the darts
    exclusive-base invariant: no false transitions between sibling sets)."""
    tokenizers = pytest.importorskip("tokenizers")
    from klab_multimodalmodel_tpu.text.charsmap import (build_charsmap,
                                                        parse_charsmap)

    mapping = {"A": "q", "AB": "ab", "é": "e", "①": "1"}
    blob = build_charsmap(mapping)
    cm = parse_charsmap(blob)
    assert cm.longest_prefix(b"ABC") == (2, b"ab")  # darts longest
    assert cm.longest_prefix(b"zz") is None
    n = tokenizers.normalizers.Precompiled(blob)
    assert n.normalize_str("A") == "q"
    # per-grapheme: 'A' then 'B' — the multi-grapheme "AB" entry never
    # applies, and 'B' must NOT falsely match through a shared base
    assert n.normalize_str("AB") == "qB"
    assert n.normalize_str("B") == "B"
    assert n.normalize_str("x①é") == "x1e"


def test_native_tokenizer_in_dataloader(tmp_path):
    """--native_tokenizer end to end: a DataLoader with the native encoder
    yields byte-identical batches to the Python-tokenizer loader."""
    from klab_multimodalmodel_tpu.data import (DataLoader,
                                               SyntheticCaptionDataset)
    from klab_multimodalmodel_tpu.text.tokenizer import UnigramTokenizer

    path = _synthetic_spiece(tmp_path, b"")
    pytok = UnigramTokenizer(path)
    enc = native.NativeUnigramEncoder(path)
    ds = SyntheticCaptionDataset(n=16, image_size=32)

    def batches(native_encoder):
        dl = DataLoader(ds, pytok, global_batch_size=8,
                        max_source_length=24, max_target_length=16, seed=0,
                        native_encoder=native_encoder)
        dl.set_epoch(1)
        return list(dl)

    for a, b in zip(batches(None), batches(enc)):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_native_tokenizer_end_to_end_train(tmp_path):
    """--native_tokenizer through the REAL train() path (get_dataloader
    builds the C++ encoder from config): losses bit-match the
    Python-tokenizer run."""
    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.text import train_unigram_tokenizer
    from klab_multimodalmodel_tpu.train import train

    register_t5_size("t5-micro-nat", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-micro-nat", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))

    tok_path = str(tmp_path / "tok.json")
    train_unigram_tokenizer(
        ["a man rides a moped down the road",
         "a dog jumps over the fence",
         "What does th image describe ?"] * 40, tok_path, vocab_size=300)

    losses = {}
    for tag, nat in (("py", False), ("nat", True)):
        cfg = Config(
            language_model_name="t5-micro-nat",
            transformer_model_name="t5-micro-nat",
            image_model_name="swin-micro-nat",
            max_source_length=16, max_target_length=16, batch_size=1,
            num_epochs=1, compute_dtype="float32", scan_unroll=1,
            data_dir="synthetic", tokenizer_path=tok_path,
            native_tokenizer=nat, result_dir=str(tmp_path / tag))
        out = train(cfg, resume=False)
        losses[tag] = out["losses"]
    assert losses["py"] == losses["nat"]
