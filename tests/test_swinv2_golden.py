"""Golden-value tests: framework SwinV2 vs HuggingFace torch Swinv2Model.

Validates the v2-specific machinery — scaled-cosine attention with clamped
logit scale, log-CPB bias MLP, residual-post-norm, shifted-window masking,
patch merging — against the exact implementation the reference uses
(/root/reference/models/model.py:4,15).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from klab_multimodalmodel_tpu.checkpoint import convert_swinv2
from klab_multimodalmodel_tpu.config import SwinV2Size
from klab_multimodalmodel_tpu.models.swinv2 import SwinV2Encoder

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# Two shifted blocks per stage at 32px/window4 exercises cyclic shift + masks
# in stage 0 (res 8 > window 4) and the window-shrink path in stage 1 (res 4
# <= window 4).
TINY = SwinV2Size(image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
                  num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
                  pretrained_window_sizes=(0, 0))


@pytest.fixture(scope="module")
def hf_swin():
    torch.manual_seed(0)
    cfg = transformers.Swinv2Config(
        image_size=TINY.image_size, patch_size=TINY.patch_size,
        num_channels=3, embed_dim=TINY.embed_dim, depths=list(TINY.depths),
        num_heads=list(TINY.num_heads), window_size=TINY.window_size,
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    model = transformers.Swinv2Model(cfg, add_pooling_layer=False)
    model.eval()
    return model


def test_swinv2_golden(hf_swin, rng):
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_swin(torch.tensor(images)).last_hidden_state.numpy()

    model = SwinV2Encoder(TINY)
    params = convert_swinv2(hf_swin.state_dict(), TINY)
    # Framework uses channels-last (TPU conv layout).
    out = model.apply({"params": params},
                      jnp.asarray(images.transpose(0, 2, 3, 1)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


def test_swinv2_output_geometry():
    """Base config at 256px must produce (B, 64, 1024) — the shape contract
    the concat cascade relies on (/root/reference/models/model.py:22-23)."""
    size = SwinV2Size()
    assert size.num_features == 1024
    assert size.num_patches_out == 64


def test_swin_bf16_softmax_and_tanh_gelu_close_to_fp32(rng):
    """Opt-in perf levers (BASELINE.md r2): bf16 softmax chain + tanh GELU
    must stay within bf16-level deviation of the fp32/erf default — the
    bound quoted for the frozen-tower opt mode."""
    import jax
    import jax.numpy as jnp

    from klab_multimodalmodel_tpu.config import SwinV2Size
    from klab_multimodalmodel_tpu.models.swinv2 import SwinV2Encoder

    size = SwinV2Size(image_size=32, patch_size=4, embed_dim=16,
                      depths=(2, 2), num_heads=(2, 4), window_size=4,
                      drop_path_rate=0.0, pretrained_window_sizes=(0, 0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    ref_model = SwinV2Encoder(size)
    params = ref_model.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(ref_model.apply({"params": params}, x), np.float32)
    opt_model = SwinV2Encoder(size, softmax_dtype=jnp.bfloat16,
                              gelu_approximate=True)
    out = np.asarray(opt_model.apply({"params": params}, x), np.float32)
    scale = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / scale < 0.05
    np.testing.assert_allclose(out, ref, atol=0.35)  # bf16-level bound


@pytest.mark.slow
def test_swinv2_base_full_geometry_golden(rng):
    """FULL swinv2-base-patch4-window8-256 (88M params, the reference's
    default --image_model_name): a random-weight HF torch model converted
    with the production converter must match HF's last_hidden_state —
    provenance evidence at the exact geometry real checkpoints use (the
    T5 towers have the same full-geometry pin in test_provenance.py)."""
    size = SwinV2Size()  # base defaults: 256px/4/128/(2,2,18,2)/(4,8,16,32)/8
    torch.manual_seed(0)
    cfg = transformers.Swinv2Config(
        image_size=size.image_size, patch_size=size.patch_size,
        num_channels=3, embed_dim=size.embed_dim, depths=list(size.depths),
        num_heads=list(size.num_heads), window_size=size.window_size,
        drop_path_rate=0.0, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    hf = transformers.Swinv2Model(cfg, add_pooling_layer=False)
    hf.eval()

    images = rng.standard_normal((1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(images)).last_hidden_state.numpy()

    model = SwinV2Encoder(size)
    params = convert_swinv2(hf.state_dict(), size)
    import jax
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.asarray(images.transpose(0, 2, 3, 1)))
    assert out.shape == ref.shape == (1, 64, 1024)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=1e-4)
