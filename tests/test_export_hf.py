"""Roundtrip test of the HF exporter: tiny HF towers -> convert_hf ->
export_hf -> load into FRESH HF torch models -> outputs must match the
originals exactly. Proves checkpoints trained here flow back into the
reference's torch stack (/root/reference/models/model.py:14-17)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from klab_multimodalmodel_tpu.checkpoint.convert_hf import (convert_swinv2,
                                                            convert_t5_encoder,
                                                            convert_t5_lm)
from klab_multimodalmodel_tpu.checkpoint.export_hf import (export_swinv2,
                                                           export_t5_encoder,
                                                           export_t5_lm)
from klab_multimodalmodel_tpu.config import SwinV2Size, T5Size

T5_SIZE = T5Size(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
    num_heads=4, vocab_size=128, relative_attention_num_buckets=8,
    relative_attention_max_distance=16, dropout_rate=0.0)
SWIN_SIZE = SwinV2Size(
    image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
    num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    pretrained_window_sizes=(0, 0))


def _t5_cfg(tie=True):
    return transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        decoder_start_token_id=0, tie_word_embeddings=tie)


@pytest.mark.parametrize("tie", [True, False])
def test_t5_lm_roundtrip(tie, rng):
    torch.manual_seed(0)
    size = T5_SIZE if tie else T5Size(
        **{**T5_SIZE.__dict__, "tie_word_embeddings": False})
    orig = transformers.T5ForConditionalGeneration(_t5_cfg(tie)).eval()
    sd = export_t5_lm(convert_t5_lm(orig.state_dict(), size), size)
    fresh = transformers.T5ForConditionalGeneration(_t5_cfg(tie)).eval()
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected

    src = torch.tensor(rng.integers(2, 128, size=(2, 6)))
    tgt = torch.tensor(rng.integers(2, 128, size=(2, 4)))
    with torch.no_grad():
        a = orig(input_ids=src, labels=tgt)
        b = fresh(input_ids=src, labels=tgt)
    np.testing.assert_allclose(b.logits.numpy(), a.logits.numpy(),
                               atol=1e-5)


def test_t5_encoder_roundtrip(rng):
    torch.manual_seed(1)
    orig = transformers.T5EncoderModel(_t5_cfg()).eval()
    sd = export_t5_encoder(convert_t5_encoder(orig.state_dict(), T5_SIZE),
                           T5_SIZE)
    fresh = transformers.T5EncoderModel(_t5_cfg()).eval()
    _, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    src = torch.tensor(rng.integers(2, 128, size=(2, 6)))
    with torch.no_grad():
        a = orig(input_ids=src).last_hidden_state
        b = fresh(input_ids=src).last_hidden_state
    np.testing.assert_allclose(b.numpy(), a.numpy(), atol=1e-6)


def test_swinv2_roundtrip(rng):
    torch.manual_seed(2)
    cfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    orig = transformers.Swinv2Model(cfg, add_pooling_layer=False).eval()
    sd = export_swinv2(convert_swinv2(orig.state_dict(), SWIN_SIZE),
                       SWIN_SIZE)
    fresh = transformers.Swinv2Model(cfg, add_pooling_layer=False).eval()
    _, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
        strict=False)
    assert not unexpected, unexpected
    imgs = torch.tensor(rng.standard_normal((1, 3, 32, 32),
                                            ).astype(np.float32))
    with torch.no_grad():
        a = orig(imgs).last_hidden_state
        b = fresh(imgs).last_hidden_state
    np.testing.assert_allclose(b.numpy(), a.numpy(), atol=1e-6)
