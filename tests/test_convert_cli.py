"""End-to-end test of the HF checkpoint conversion CLI: tiny HF models are
saved to disk, converted via tools/convert_hf_checkpoint.py, and the restored
parameter tree reproduces the reference-assembly loss (the real pretrained-
weights path of /root/reference/models/model.py:14-17)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path, rng):
    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel

    t5_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        decoder_start_token_id=0, tie_word_embeddings=True)
    swin_cfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf_t5 = transformers.T5ForConditionalGeneration(t5_cfg).eval()
    hf_swin = transformers.Swinv2Model(swin_cfg, add_pooling_layer=False).eval()

    t5_dir = tmp_path / "t5"
    swin_dir = tmp_path / "swin"
    hf_t5.save_pretrained(t5_dir, safe_serialization=False)
    hf_swin.save_pretrained(swin_dir, safe_serialization=False)

    register_t5_size("t5-cli-test", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
        num_heads=4, vocab_size=128, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-cli-test", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))

    out = tmp_path / "converted"
    # the CLI can't know the test-registered names; run in-process instead
    sys_argv = ["convert", "--t5_dir", str(t5_dir), "--swin_dir",
                str(swin_dir), "--language_model_name", "t5-cli-test",
                "--transformer_model_name", "t5-cli-test",
                "--image_model_name", "swin-cli-test",
                "--output", str(out)]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "convert_cli", os.path.join(REPO, "tools", "convert_hf_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old_argv = sys.argv
    sys.argv = sys_argv
    try:
        mod.main()
    finally:
        sys.argv = old_argv

    import orbax.checkpoint as ocp
    params = ocp.StandardCheckpointer().restore(
        str(out / "checkpoints" / "pretrained"))

    # reference-assembly loss vs framework loss with converted params
    images = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    src = rng.integers(2, 128, size=(1, 6))
    tgt = rng.integers(2, 128, size=(1, 4))
    with torch.no_grad():
        lang = transformers.T5EncoderModel(t5_cfg)
        lang.load_state_dict({k: v for k, v in hf_t5.state_dict().items()
                              if k.startswith(("shared", "encoder"))},
                             strict=False)
        lang.eval()
        lang_emb = lang(input_ids=torch.tensor(src)).last_hidden_state
        img_emb = hf_swin(torch.tensor(images)).last_hidden_state
        concat = torch.cat((img_emb, lang_emb), dim=1)
        ref_loss = hf_t5(inputs_embeds=concat,
                         labels=torch.tensor(tgt)).loss.item()

    cfg = Config(language_model_name="t5-cli-test",
                 transformer_model_name="t5-cli-test",
                 image_model_name="swin-cli-test", reference_pad_quirks=True)
    model = MultiModalModel(cfg)
    outp = model.apply({"params": params},
                       jnp.asarray(images.transpose(0, 2, 3, 1)),
                       jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(float(outp.loss), ref_loss, rtol=1e-4)
