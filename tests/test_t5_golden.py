"""Golden-value tests: framework T5 vs HuggingFace torch T5.

A tiny random HF T5 is constructed offline, its weights converted with
``checkpoint.convert_hf``, and encoder outputs / logits / loss compared
numerically. This validates relative-position bucketing, RMSNorm, the tied
LM head scale, shift-right and CE-loss semantics against the exact
implementation the reference uses (/root/reference/models/model.py:4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from klab_multimodalmodel_tpu.checkpoint import convert_t5_encoder, convert_t5_lm
from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.models import (T5Encoder,
                                             T5ForConditionalGeneration)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
              num_heads=4, vocab_size=128, relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)


def _hf_config():
    return transformers.T5Config(
        vocab_size=TINY.vocab_size, d_model=TINY.d_model, d_kv=TINY.d_kv,
        d_ff=TINY.d_ff, num_layers=TINY.num_layers,
        num_decoder_layers=TINY.num_decoder_layers, num_heads=TINY.num_heads,
        relative_attention_num_buckets=TINY.relative_attention_num_buckets,
        relative_attention_max_distance=TINY.relative_attention_max_distance,
        dropout_rate=0.0, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1, tie_word_embeddings=True)


@pytest.fixture(scope="module")
def hf_lm():
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(_hf_config())
    model.eval()
    return model


def test_relative_position_bucket_matches_hf():
    from klab_multimodalmodel_tpu.models import relative_position_bucket
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    rel = np.arange(-40, 41).reshape(1, -1)
    for bidir in (True, False):
        ours = relative_position_bucket(jnp.asarray(rel), bidirectional=bidir,
                                        num_buckets=8, max_distance=16)
        theirs = HFT5Attention._relative_position_bucket(
            torch.tensor(rel), bidirectional=bidir, num_buckets=8,
            max_distance=16)
        np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())


def test_encoder_golden(hf_lm, rng):
    hf_enc = transformers.T5EncoderModel(_hf_config())
    hf_enc.load_state_dict(
        {k: v for k, v in hf_lm.state_dict().items()
         if k.startswith(("shared", "encoder"))}, strict=False)
    hf_enc.eval()

    ids = rng.integers(2, TINY.vocab_size, size=(2, 9))
    mask = np.ones((2, 9), np.int32)
    mask[1, 6:] = 0

    with torch.no_grad():
        ref = hf_enc(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state

    model = T5Encoder(TINY)
    params = convert_t5_encoder(hf_enc.state_dict(), TINY)
    out = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out)[mask.astype(bool)],
                               ref.numpy()[mask.astype(bool)],
                               rtol=2e-4, atol=2e-5)


def test_lm_logits_and_loss_golden(hf_lm, rng):
    ids = rng.integers(2, TINY.vocab_size, size=(2, 7))
    labels = rng.integers(2, TINY.vocab_size, size=(2, 5))

    with torch.no_grad():
        ref = hf_lm(input_ids=torch.tensor(ids), labels=torch.tensor(labels))

    model = T5ForConditionalGeneration(TINY)
    params = convert_t5_lm(hf_lm.state_dict(), TINY)
    out = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      labels=jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out.logits), ref.logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    # Reference semantics: no -100 masking -> mean over every position
    # (quirk #3); HF with plain labels does the same.
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)


def test_v11_gated_gelu_untied_head_golden(rng):
    """T5 v1.1/Flan recipe: gated tanh-GELU MLPs (wi_0/wi_1) + untied
    LM head — logits/loss golden vs HF torch, plus a greedy-decode
    token-exactness check against HF generate."""
    import dataclasses as _dc

    size = _dc.replace(TINY, feed_forward_proj="gated-gelu",
                       tie_word_embeddings=False)
    cfg = transformers.T5Config(
        vocab_size=size.vocab_size, d_model=size.d_model, d_kv=size.d_kv,
        d_ff=size.d_ff, num_layers=size.num_layers,
        num_decoder_layers=size.num_decoder_layers, num_heads=size.num_heads,
        relative_attention_num_buckets=size.relative_attention_num_buckets,
        relative_attention_max_distance=size.relative_attention_max_distance,
        dropout_rate=0.0, decoder_start_token_id=0, pad_token_id=0,
        eos_token_id=1, tie_word_embeddings=False,
        feed_forward_proj="gated-gelu")
    assert cfg.is_gated_act and cfg.dense_act_fn == "gelu_new"
    torch.manual_seed(3)
    hf = transformers.T5ForConditionalGeneration(cfg)
    hf.eval()

    ids = rng.integers(2, size.vocab_size, size=(2, 7))
    labels = rng.integers(2, size.vocab_size, size=(2, 5))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), labels=torch.tensor(labels))

    model = T5ForConditionalGeneration(size)
    params = convert_t5_lm(hf.state_dict(), size)
    assert "wi_0" in params["encoder"]["layers"]["block"]["mlp"]
    out = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      labels=jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out.logits), ref.logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)

    # Greedy decode through the KV-cache loop (exercises the gated MLP in
    # the incremental path + the untied head at every step).
    from klab_multimodalmodel_tpu.infer import greedy_decode

    mask = np.ones((2, 7), np.int32)
    with torch.no_grad():
        hf_tokens = hf.generate(input_ids=torch.tensor(ids),
                                attention_mask=torch.tensor(mask),
                                max_length=10, num_beams=1,
                                do_sample=False)
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      attention_mask=jnp.asarray(mask),
                      method=model.encode)
    ours = np.asarray(greedy_decode(model, params, enc, jnp.asarray(mask),
                                    10))
    for b in range(2):
        h = hf_tokens[b].numpy()
        np.testing.assert_array_equal(ours[b][:len(h)], h)

    # Round-trip: export back to an HF state_dict and reload.
    from klab_multimodalmodel_tpu.checkpoint.export_hf import export_t5_lm

    sd = export_t5_lm(params, size)
    hf2 = transformers.T5ForConditionalGeneration(cfg)
    hf2.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    with torch.no_grad():
        ref2 = hf2(input_ids=torch.tensor(ids), labels=torch.tensor(labels))
    np.testing.assert_allclose(ref2.logits.numpy(), ref.logits.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_lm_inputs_embeds_golden(hf_lm, rng):
    embeds = rng.standard_normal((2, 6, TINY.d_model)).astype(np.float32)
    labels = rng.integers(2, TINY.vocab_size, size=(2, 4))

    with torch.no_grad():
        ref = hf_lm(inputs_embeds=torch.tensor(embeds),
                    labels=torch.tensor(labels))

    model = T5ForConditionalGeneration(TINY)
    params = convert_t5_lm(hf_lm.state_dict(), TINY)
    out = model.apply({"params": params}, inputs_embeds=jnp.asarray(embeds),
                      labels=jnp.asarray(labels))
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)


def test_label_weight_masking(hf_lm, rng):
    """Pad-masked loss equals HF's -100 convention."""
    ids = rng.integers(2, TINY.vocab_size, size=(2, 7))
    labels = rng.integers(2, TINY.vocab_size, size=(2, 5))
    labels[:, 3:] = 0  # pad

    hf_labels = torch.tensor(labels)
    hf_labels = torch.where(hf_labels == 0, torch.tensor(-100), hf_labels)
    with torch.no_grad():
        ref = hf_lm(input_ids=torch.tensor(ids), labels=hf_labels)

    model = T5ForConditionalGeneration(TINY)
    params = convert_t5_lm(hf_lm.state_dict(), TINY)
    out = model.apply(
        {"params": params}, input_ids=jnp.asarray(ids),
        labels=jnp.asarray(labels),
        decoder_input_ids=jnp.asarray(
            np.concatenate([np.zeros((2, 1), labels.dtype), labels[:, :-1]],
                           axis=1)),
        label_weights=jnp.asarray((labels != 0).astype(np.float32)))
    np.testing.assert_allclose(float(out.loss), float(ref.loss), rtol=1e-5)


def test_decode_step_chunked_prefill_matches_sequential(hf_lm, rng):
    """decode_step with a (B, T>1) chunk (prompt prefill) must produce the
    same logits and leave the same cache as T sequential (B, 1) steps —
    the cache validity mask is causal PER QUERY ROW, so a chunk's j-th
    query sees cache positions <= step + j only."""
    import jax

    from klab_multimodalmodel_tpu.checkpoint import convert_t5_lm
    from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration

    model = T5ForConditionalGeneration(TINY)
    params = convert_t5_lm(hf_lm.state_dict(), TINY)
    ids = rng.integers(2, TINY.vocab_size, size=(2, 5))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    prompt = jnp.asarray(rng.integers(2, TINY.vocab_size, size=(2, 4)),
                         jnp.int32)
    max_len = 8

    # fp32 matmuls: the chunked and sequential programs fuse differently,
    # so bf16-default backends see ~1e-2 drift with no logic difference.
    # Sequential: 4 single-token steps.
    seq_logits = []
    cache = {}
    with jax.default_matmul_precision("float32"):
        for t in range(prompt.shape[1]):
            logits, mods = model.apply(
                {"params": params, **({"cache": cache} if cache else {})},
                prompt[:, t:t + 1], jnp.asarray(t, jnp.int32), enc, max_len,
                method=model.decode_step, mutable=["cache"])
            cache = mods["cache"]
            seq_logits.append(np.asarray(logits[:, 0]))
    seq_logits = np.stack(seq_logits, axis=1)

    # Chunked: a 2-token prefill at step 0 then a 2-token chunk at step 2 —
    # the second chunk exercises the nonzero cache-index offset in the
    # per-query validity mask (q_pos = i + arange(T) with i != 0).
    chunk_logits = []
    ccache = {}
    with jax.default_matmul_precision("float32"):
        for t0 in (0, 2):
            logits, mods = model.apply(
                {"params": params, **({"cache": ccache} if ccache else {})},
                prompt[:, t0:t0 + 2], jnp.asarray(t0, jnp.int32), enc,
                max_len, method=model.decode_step, mutable=["cache"])
            ccache = mods["cache"]
            chunk_logits.append(np.asarray(logits))
    chunk_logits = np.concatenate(chunk_logits, axis=1)
    np.testing.assert_allclose(chunk_logits, seq_logits,
                               rtol=2e-5, atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=2e-5, atol=2e-5),
        ccache, cache)
