"""Shared building blocks for the model zoo.

These are written TPU-first: static shapes, fp32 statistics with bf16 compute,
and layouts that keep the contraction dimensions MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# Large-negative additive mask value. Finite (not -inf) so that fully-masked
# rows softmax to uniform instead of NaN.
NEG_INF = -1e9


class RMSNorm(nn.Module):
    """T5-style RMS LayerNorm: no mean subtraction, no bias.

    Matches HF ``T5LayerNorm``: variance over the last axis in fp32, scale in
    the weight dtype (reference dependency at
    ``/root/reference/models/model.py:4`` via ``transformers``).
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.epsilon)
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                            jnp.float32)
        return (y * weight).astype(orig_dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm (SwinV2 uses this), fp32 statistics."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return (y * weight + bias).astype(orig_dtype)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          scale: Optional[float] = None,
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None
                          ) -> jax.Array:
    """Reference (XLA) attention: q,k,v are (B, H, L, D).

    ``scale=None`` means no 1/sqrt(d) scaling — T5 folds the scale into the
    initialization. Softmax runs in fp32 regardless of the input dtype.
    Dropout, when enabled, masks the attention PROBABILITIES (HF
    ``T5Attention`` semantics: ``dropout(softmax(scores)) @ v``) — the same
    structure as the Pallas in-kernel and ring-streamed backends, so
    swapping backends changes only the RNG stream, never the form of the
    stochastic objective. The mask applies to the POST-CAST (compute-dtype)
    probs: the (B, H, L, L) mask/scale work is the dominant dropout cost
    (~200M elements/step at the bench geometry), and running it at bf16
    instead of fp32 recovers ~5 ms/step (measured, BASELINE.md) with only
    dropout-path rounding changed — form and keep probability are exact.
    """
    dtype = q.dtype
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if scale is not None:
        logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep,
                          probs / jnp.asarray(1.0 - dropout_rate, dtype),
                          jnp.zeros((), dtype))
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(dtype)


class MlpBlock(nn.Module):
    """Generic bias-carrying MLP (SwinV2 FFN)."""

    hidden_dim: int
    out_dim: int
    activation: Callable[[jax.Array], jax.Array] = nn.gelu
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.activation(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
