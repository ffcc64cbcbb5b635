"""Weight/vocab provenance tests (VERDICT r1 item 5).

The reference's quality story rides on ``from_pretrained`` weights
(/root/reference/models/model.py:14-17) and the real T5 sentencepiece vocab
(/root/reference/train.py:40). The offline hub makes the official artifacts
unreachable, so provenance is proven structurally:
  * the HF->flax converter is exercised at FULL t5-base geometry (real
    d_model/layers/vocab — not the tiny shards of test_convert_cli) with a
    token-exact greedy-generation golden;
  * the training stack runs end-to-end through ``UnigramTokenizer`` with a
    T5-layout subword vocab (sentinels at the top, pad/eos/unk layout) —
    the production tokenizer path, not the ByteTokenizer fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from klab_multimodalmodel_tpu.text import (UnigramTokenizer,
                                           train_unigram_tokenizer)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.mark.slow
def test_t5_base_full_geometry_conversion_greedy_golden():
    """Convert a full-geometry t5-base HF checkpoint (random weights — the
    official ones are unreachable offline; geometry is what's under test:
    d_model 768, 12+12 layers, 12 heads, vocab 32128) and require
    token-exact greedy generation vs HF."""
    from klab_multimodalmodel_tpu.checkpoint import convert_t5_lm
    from klab_multimodalmodel_tpu.config import T5_SIZES
    from klab_multimodalmodel_tpu.infer import greedy_decode
    from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration

    size = T5_SIZES["t5-base"]
    torch.manual_seed(0)
    hf_cfg = transformers.T5Config(
        vocab_size=size.vocab_size, d_model=size.d_model, d_kv=size.d_kv,
        d_ff=size.d_ff, num_layers=size.num_layers,
        num_decoder_layers=size.num_decoder_layers, num_heads=size.num_heads,
        relative_attention_num_buckets=size.relative_attention_num_buckets,
        relative_attention_max_distance=size.relative_attention_max_distance,
        dropout_rate=0.0, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1, tie_word_embeddings=True)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    model = T5ForConditionalGeneration(size)
    params = convert_t5_lm(hf.state_dict(), size)

    rng = np.random.default_rng(7)
    ids = rng.integers(2, 2000, size=(2, 8))
    max_length = 8
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids), max_length=max_length,
                          num_beams=1, do_sample=False).numpy()
        hf_enc = hf.encoder(input_ids=torch.tensor(ids)).last_hidden_state
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    # full-geometry encoder agreement first (localizes conversion bugs)
    np.testing.assert_allclose(np.asarray(enc), hf_enc.numpy(), rtol=2e-3,
                               atol=2e-4)
    ours = np.asarray(greedy_decode(model, params, enc, None, max_length))
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)


def _caption_corpus():
    return [
        "A man with a red helmet on a small moped on a dirt road.",
        "A dog jumps over a wooden fence in a park.",
        "Two cats sit on a sunny window sill.",
        "A plate of food with rice and vegetables on a table.",
        "What does th image describe ?",
    ] * 30


def test_unigram_tokenizer_end_to_end_training(tmp_path):
    """Full train() driver through the production UnigramTokenizer path
    (T5-layout subword vocab) instead of the ByteTokenizer fallback."""
    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.train import train

    register_t5_size("t5-micro-prov", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-micro-prov", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))

    vocab_path = str(tmp_path / "tokenizer.json")
    tok = train_unigram_tokenizer(_caption_corpus(), vocab_path,
                                  vocab_size=384)
    # T5 layout invariants the model relies on
    assert tok.sentinel_id(0) == tok.vocab_size - 1
    assert tok.pad_id == 0 or tok.pad_id is not None

    cfg = Config(language_model_name="t5-micro-prov",
                 transformer_model_name="t5-micro-prov",
                 image_model_name="swin-micro-prov",
                 max_source_length=48, max_target_length=24, batch_size=1,
                 num_epochs=1, data_dir="synthetic",
                 result_dir=str(tmp_path / "results"),
                 tokenizer_path=vocab_path, compute_dtype="float32",
                 mesh_shape=(-1, 1, 1), scan_unroll=1)
    out = train(cfg, resume=False)
    assert all(np.isfinite(v) for v in out["losses"]["train"])
    assert all(np.isfinite(v) for v in out["losses"]["val"])

    # decode path: generated-id rows decode to clean text via the subword
    # vocab (the inference surface of the production tokenizer)
    ids = tok(["A dog jumps over a wooden fence in a park."], 24).input_ids
    text = tok.decode(ids[0], skip_special_tokens=True)
    assert "dog" in text and "<pad>" not in text


def test_unigram_tokenizer_span_corruption_sentinels(tmp_path):
    """Span corruption through the subword vocab: sentinels must map to the
    top-of-vocab ids and survive an encode/decode round trip."""
    from klab_multimodalmodel_tpu.text.span_corruption import span_corrupt

    vocab_path = str(tmp_path / "tok.json")
    tok = train_unigram_tokenizer(_caption_corpus(), vocab_path,
                                  vocab_size=384)
    rng = np.random.default_rng(0)
    src, tgt = span_corrupt("A dog jumps over a wooden fence in a park.",
                            rng)
    enc = tok([src], 48).input_ids[0]
    sentinel_ids = [i for i in enc if i >= tok.vocab_size - 100]
    assert sentinel_ids, "no sentinel tokens survived encoding"
    assert tok.sentinel_id(0) in sentinel_ids
    decoded = tok.decode(enc, skip_special_tokens=False)
    assert "<extra_id_0>" in decoded
