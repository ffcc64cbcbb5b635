"""Ring attention (sequence-parallel streamed-K/V attention) correctness.

Checks the shard_map ring path (ops/ring_attention.py) against the dense
XLA attention on the virtual 8-device mesh: forward (bias, causal-bias,
batched key-mask bias), gradients through the ring (ppermute transposes),
and the exact dropout semantics via a numpy oracle that replays the
per-(device, step) folded mask keys.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.models.layers import (NEG_INF,
                                                    dot_product_attention)
from klab_multimodalmodel_tpu.ops.ring_attention import (ring_applicable,
                                                         ring_self_attention)
from klab_multimodalmodel_tpu.utils import make_mesh

B, H, L, D = 4, 2, 16, 8


def _inputs(seed=0, causal=False, masked=False):
    rng = np.random.RandomState(seed)
    q = rng.randn(B, H, L, D).astype(np.float32)
    k = rng.randn(B, H, L, D).astype(np.float32)
    v = rng.randn(B, H, L, D).astype(np.float32)
    bias = rng.randn(1, H, L, L).astype(np.float32)
    if causal:
        idx = np.arange(L)
        bias = bias + np.where(idx[:, None] >= idx[None, :], 0.0,
                               NEG_INF).astype(np.float32)
    if masked:
        kmask = (rng.rand(B, L) > 0.25).astype(np.float32)
        kmask[:, :2] = 1.0  # never fully masked
        bias = bias + np.where(kmask[:, None, None, :] > 0, 0.0, NEG_INF)
    return q, k, v, bias


@pytest.mark.parametrize("mesh_shape,case", [
    ((2, 1, 1, 4), "plain"),
    ((1, 1, 1, 8), "causal"),
    ((2, 1, 1, 4), "masked"),
    ((2, 2, 2, 1), "fallback-guard"),
])
def test_ring_matches_dense(mesh_shape, case):
    mesh = make_mesh(mesh_shape)
    q, k, v, bias = _inputs(causal=case == "causal",
                            masked=case == "masked")
    dense = dot_product_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), bias=jnp.asarray(bias))
    with mesh:
        if case == "fallback-guard":
            assert not ring_applicable(L, L)
            return
        assert ring_applicable(L, L)
        ring = jax.jit(lambda *a: ring_self_attention(*a))(
            q, k, v, bias)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-5, atol=2e-6)


def test_ring_gradients_match_dense():
    """Autodiff through the ring (scan + transposed ppermute backward)."""
    mesh = make_mesh((2, 1, 1, 4))
    q, k, v, bias = _inputs(seed=3)
    ct = np.random.RandomState(9).randn(B, H, L, D).astype(np.float32)

    def dense_loss(q, k, v):
        return jnp.sum(dot_product_attention(
            q, k, v, bias=jnp.asarray(bias)) * ct)

    def ring_loss(q, k, v):
        return jnp.sum(ring_self_attention(q, k, v, jnp.asarray(bias)) * ct)

    dense_grads = jax.grad(dense_loss, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    with mesh:
        ring_grads = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(
            q, k, v)
    for dg, rg, name in zip(dense_grads, ring_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(rg), np.asarray(dg),
                                   rtol=5e-5, atol=5e-6,
                                   err_msg=f"d{name} mismatch")


def test_ring_dropout_matches_oracle():
    """Ring dropout = dropout(softmax(logits)) @ v with the ring's own
    per-(device, step) folded mask keys — replayed here into a global mask
    and applied to the dense path."""
    rate = 0.3
    n = 4
    mesh = make_mesh((2, 1, 1, n))
    q, k, v, bias = _inputs(seed=5)
    rng = jax.random.PRNGKey(42)
    with mesh:
        ring = jax.jit(lambda *a: ring_self_attention(
            *a, dropout_rate=rate, dropout_rng=rng))(q, k, v, bias)

    # Replay the mask: data shard d holds batch rows [d*Bl:(d+1)*Bl], seq
    # device i holds query rows [i*Lq:(i+1)*Lq], and at step t sees key
    # chunk (i - t) % n under key fold(fold(fold(rng, d), i), t).
    Lq = Lc = L // n
    Bl = B // 2
    keep = np.zeros((B, H, L, L), np.float32)
    for d in range(2):
        for i in range(n):
            base = jax.random.fold_in(rng, d)       # data axis index
            base = jax.random.fold_in(base, 0)      # fsdp axis (size 1)
            base = jax.random.fold_in(base, 0)      # tensor axis (size 1)
            base = jax.random.fold_in(base, i)      # seq axis index
            for t in range(n):
                src = (i - t) % n
                key = jax.random.fold_in(base, t)
                m = jax.random.bernoulli(key, 1.0 - rate,
                                         (Bl, H, Lq, Lc)).astype(np.float32)
                keep[d * Bl:(d + 1) * Bl, :, i * Lq:(i + 1) * Lq,
                     src * Lc:(src + 1) * Lc] = m
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) + bias
    p = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    dropped = np.asarray(p) * keep / (1.0 - rate)
    oracle = np.einsum("bhqk,bhkd->bhqd", dropped, v)
    np.testing.assert_allclose(np.asarray(ring), oracle, rtol=2e-4,
                               atol=2e-5)


def test_xla_attention_dropout_masks_probs():
    """The default XLA backend's dropout masks the attention PROBABILITIES
    (HF T5Attention semantics) — the same structure as the ring and Pallas
    backends, so a backend swap changes only the RNG stream."""
    from klab_multimodalmodel_tpu.models.layers import dot_product_attention

    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(2, 3, 8, 4), jnp.float32)
               for _ in range(3))
    key = jax.random.PRNGKey(7)
    rate = 0.4
    got = dot_product_attention(q, k, v, dropout_rate=rate, dropout_rng=key)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    probs = jax.nn.softmax(logits, axis=-1)
    keep = jax.random.bernoulli(key, 1.0 - rate, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    want = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
