"""Golden test of the full multimodal cascade vs a torch assembly of the
reference's ``MyModel`` (/root/reference/models/model.py:8-28): frozen T5
encoder + SwinV2 -> seq concat -> T5ForConditionalGeneration loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.checkpoint import (convert_swinv2,
                                                 convert_t5_encoder,
                                                 convert_t5_lm)
from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                             register_swin_size,
                                             register_t5_size)
from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# Swin final feature dim = 16 * 2 = 32 == T5 d_model (mirrors the reference's
# swinv2-base(1024) == t5-large(1024) coupling, quirk #8).
TINY_T5 = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
                 num_decoder_layers=2, num_heads=4, vocab_size=128,
                 relative_attention_num_buckets=8,
                 relative_attention_max_distance=16, dropout_rate=0.0)
TINY_SWIN = SwinV2Size(image_size=32, patch_size=4, embed_dim=16,
                       depths=(2, 2), num_heads=(2, 4), window_size=4,
                       drop_path_rate=0.0, pretrained_window_sizes=(0, 0))

register_t5_size("t5-tiny-test", TINY_T5)
register_swin_size("swin-tiny-test", TINY_SWIN)


def _hf_t5_config():
    return transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        decoder_start_token_id=0, tie_word_embeddings=True)


def _hf_swin_config():
    return transformers.Swinv2Config(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def towers():
    torch.manual_seed(0)
    lang = transformers.T5EncoderModel(_hf_t5_config()).eval()
    swin = transformers.Swinv2Model(_hf_swin_config(),
                                    add_pooling_layer=False).eval()
    lm = transformers.T5ForConditionalGeneration(_hf_t5_config()).eval()
    return lang, swin, lm


def _framework_params(towers, cfg):
    lang, swin, lm = towers
    return {
        "language_model": convert_t5_encoder(lang.state_dict(), TINY_T5),
        "image_model": convert_swinv2(swin.state_dict(), TINY_SWIN),
        "transformer": convert_t5_lm(lm.state_dict(), TINY_T5),
        "vision_projection": {"kernel": np.eye(32, dtype=np.float32)},
    }


def test_cascade_loss_matches_reference_assembly(towers, rng):
    lang, swin, lm = towers
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    src = rng.integers(2, 128, size=(2, 7))
    tgt = rng.integers(2, 128, size=(2, 5))

    # Reference forward (models/model.py:19-26), verbatim semantics.
    with torch.no_grad():
        lang_emb = lang(input_ids=torch.tensor(src)).last_hidden_state
        img_emb = swin(torch.tensor(images)).last_hidden_state
        concat = torch.cat((img_emb, lang_emb), dim=1)
        ref_loss = lm(inputs_embeds=concat,
                      labels=torch.tensor(tgt)).loss.item()

    cfg = Config(language_model_name="t5-tiny-test",
                 transformer_model_name="t5-tiny-test",
                 image_model_name="swin-tiny-test",
                 reference_pad_quirks=True)
    model = MultiModalModel(cfg)
    params = _framework_params(towers, cfg)
    out = model.apply({"params": params},
                      jnp.asarray(images.transpose(0, 2, 3, 1)),
                      jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(float(out.loss), ref_loss, rtol=1e-4)


@pytest.mark.slow
def test_frozen_towers_get_zero_grads(towers, rng):
    """stop_gradient parity with torch.no_grad (model.py:20) + frozen Swin."""
    cfg = Config(language_model_name="t5-tiny-test",
                 transformer_model_name="t5-tiny-test",
                 image_model_name="swin-tiny-test",
                 image_model_train=False, reference_pad_quirks=True)
    model = MultiModalModel(cfg)
    params = _framework_params(towers, cfg)
    images = jnp.asarray(
        rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    src = jnp.asarray(rng.integers(2, 128, size=(1, 5)))
    tgt = jnp.asarray(rng.integers(2, 128, size=(1, 4)))

    def loss_fn(p):
        return model.apply({"params": p}, images, src, tgt).loss

    grads = jax.grad(loss_fn)(jax.tree.map(jnp.asarray, params))
    lm_grad_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["language_model"]))
    img_grad_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["image_model"]))
    tf_grad_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["transformer"]))
    assert lm_grad_norm == 0.0
    assert img_grad_norm == 0.0
    assert tf_grad_norm > 0.0


@pytest.mark.slow
def test_dim_mismatch_is_projected(rng):
    """Quirk #8 fix: swin(32-d) + t5(48-d) works via the projection instead
    of crashing like the reference."""
    t5_48 = T5Size(d_model=48, d_kv=8, d_ff=64, num_layers=1,
                   num_decoder_layers=1, num_heads=4, vocab_size=128,
                   relative_attention_num_buckets=8,
                   relative_attention_max_distance=16, dropout_rate=0.0)
    register_t5_size("t5-tiny-48", t5_48)
    cfg = Config(language_model_name="t5-tiny-48",
                 transformer_model_name="t5-tiny-48",
                 image_model_name="swin-tiny-test")
    model = MultiModalModel(cfg)
    images = jnp.asarray(
        rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    src = jnp.asarray(rng.integers(2, 128, size=(1, 5)))
    tgt = jnp.asarray(rng.integers(2, 128, size=(1, 4)))
    params = model.init(jax.random.PRNGKey(0), images, src, tgt)["params"]
    out = model.apply({"params": params}, images, src, tgt)
    assert np.isfinite(float(out.loss))


def test_quirks_generation_attends_pads_like_training(towers, rng):
    """reference_pad_quirks must gate encode_for_generation the same way it
    gates __call__: the reference's generate sees no attention mask
    (/root/reference/models/model.py:21,28), so bit-parity mode must attend
    pads during generation too — the encoder output with a padded mask must
    equal the no-mask output, and the returned mask must be None."""
    cfg = Config(language_model_name="t5-tiny-test",
                 transformer_model_name="t5-tiny-test",
                 image_model_name="swin-tiny-test",
                 reference_pad_quirks=True)
    model = MultiModalModel(cfg)
    params = _framework_params(towers, cfg)
    images = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    src = np.asarray(rng.integers(2, 128, size=(2, 7)), np.int32)
    mask = np.ones_like(src)
    mask[:, 4:] = 0
    enc_masked, mask_out = model.apply(
        {"params": params}, images, jnp.asarray(src), jnp.asarray(mask),
        method=model.encode_for_generation)
    enc_none, none_out = model.apply(
        {"params": params}, images, jnp.asarray(src), None,
        method=model.encode_for_generation)
    assert mask_out is None and none_out is None
    np.testing.assert_array_equal(np.asarray(enc_masked),
                                  np.asarray(enc_none))
