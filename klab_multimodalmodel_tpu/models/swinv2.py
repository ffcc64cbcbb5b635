"""SwinV2 vision encoder, TPU-native.

Re-implements the capability the reference pulls in through HuggingFace
``Swinv2Model`` (``/root/reference/models/model.py:4,15,22``): patch embedding,
four stages of shifted-window attention with the v2 changes (scaled-cosine
attention with a learned clamped logit scale, log-spaced continuous
relative-position-bias MLP, residual-post-norm), patch merging, and the final
LayerNorm producing ``last_hidden_state``.

TPU-first choices:
  * window partition/reverse are pure reshape+transpose (layout moves XLA
    fuses away), cyclic shift is a static ``jnp.roll``;
  * the shifted-window attention mask and the log-CPB coordinate table are
    compile-time constants (numpy at trace time) — no dynamic shapes;
  * all windows of a layer run as one batched attention (MXU-friendly
    ``(B * nW, heads, w*w, d)`` einsums);
  * softmax and norm statistics in fp32; matmuls follow the dtype policy.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import SwinV2Size
from .layers import LayerNorm, MlpBlock

Dtype = Any


# ---------------------------------------------------------------------------
# Static (trace-time) tables
# ---------------------------------------------------------------------------


def log_cpb_coords(window_size: int, pretrained_window_size: int = 0
                   ) -> np.ndarray:
    """Log-spaced normalized relative coordinate table, ((2w-1)^2, 2) fp32.

    Matches HF Swinv2SelfAttention's ``relative_coords_table`` buffer.
    """
    w = window_size
    h = np.arange(-(w - 1), w, dtype=np.float32)
    grid = np.stack(np.meshgrid(h, h, indexing="ij"), axis=-1)  # (2w-1,2w-1,2)
    denom = (pretrained_window_size - 1) if pretrained_window_size > 0 else (w - 1)
    grid = grid / max(denom, 1)
    grid = grid * 8.0
    grid = np.sign(grid) * np.log2(np.abs(grid) + 1.0) / np.log2(8.0)
    return grid.reshape(-1, 2)


def relative_position_index(window_size: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 bias table (standard Swin)."""
    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)  # (2, w*w)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def shifted_window_mask(height: int, width: int, window_size: int,
                        shift_size: int) -> np.ndarray:
    """(nW, w*w, w*w) additive mask for shifted windows (0 or -100).

    -100 (not -inf) matches HF Swinv2's ``get_attn_mask`` fill value; the
    cosine-attention logits are bounded so -100 fully suppresses them.
    """
    w, s = window_size, shift_size
    img = np.zeros((height, width), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
        for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(height // w, w, width // w, w).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, w * w)  # (nW, w*w)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, H, W, C) -> (B * nW, w*w, C)."""
    B, H, W, C = x.shape
    w = window_size
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(x: jax.Array, window_size: int, height: int,
                   width: int) -> jax.Array:
    """(B * nW, w*w, C) -> (B, H, W, C)."""
    w = window_size
    C = x.shape[-1]
    B = x.shape[0] // (height // w * (width // w))
    x = x.reshape(B, height // w, width // w, w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, height, width, C)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class WindowAttention(nn.Module):
    """SwinV2 scaled-cosine window attention with log-CPB.

    Operates on pre-partitioned windows ``(B*nW, w*w, C)``; ``mask`` is the
    static shifted-window mask ``(nW, w*w, w*w)`` or None.
    ``use_pallas=True`` routes the cosine attention through the fused
    Pallas kernel (ops/fused_attention.py).
    """

    dim: int
    num_heads: int
    window_size: int
    pretrained_window_size: int = 0
    qkv_bias: bool = True
    attn_drop: float = 0.0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    # dtype of the logits/softmax chain. fp32 default; bf16 halves the HBM
    # traffic and doubles VPU packing on the dominant (B*nW, H, N, N)
    # elementwise work — safe for cosine attention (logits bounded by the
    # clamped scale + 16-bounded CPB bias), opt-in for frozen towers.
    softmax_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True) -> jax.Array:
        Bn, N, C = x.shape
        H = self.num_heads
        d = C // H
        q = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)

        def heads(t):
            return t.reshape(Bn, N, H, d).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        # Continuous relative position bias: tiny MLP over the static
        # log-spaced coordinate table, then 16*sigmoid (v2 bounding).
        coords = jnp.asarray(
            log_cpb_coords(self.window_size, self.pretrained_window_size))
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(coords)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(H, use_bias=False, dtype=jnp.float32,
                       name="cpb_fc2")(cpb)          # ((2w-1)^2, H)
        idx = jnp.asarray(relative_position_index(self.window_size))
        bias = cpb[idx.reshape(-1)].reshape(N, N, H)
        bias = 16.0 * jax.nn.sigmoid(bias)
        bias_h = jnp.transpose(bias, (2, 0, 1))      # (H, N, N)
        logit_scale = self.param(
            "logit_scale", lambda rng, shape: jnp.full(shape, np.log(10.0)),
            (H,))

        if self.use_pallas:
            from ..ops.fused_attention import swin_fused_attention

            out = swin_fused_attention(q, k, v, logit_scale, bias_h, mask,
                                       softmax_dtype=self.softmax_dtype)
            out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
            return nn.Dense(C, dtype=self.dtype, name="proj")(out)

        # Cosine attention: L2-normalize q and k in fp32, scale by the learned
        # clamped temperature (v2 replacement for 1/sqrt(d)).
        sm = self.softmax_dtype
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        q32 = q32 / jnp.maximum(
            jnp.linalg.norm(q32, axis=-1, keepdims=True), 1e-12)
        k32 = k32 / jnp.maximum(
            jnp.linalg.norm(k32, axis=-1, keepdims=True), 1e-12)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q32.astype(self.dtype),
                            k32.astype(self.dtype),
                            preferred_element_type=sm)
        scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))
        logits = logits * scale[None, :, None, None].astype(sm)
        logits = logits + bias_h[None].astype(sm)

        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(Bn // nW, nW, H, N, N)
            logits = logits + jnp.asarray(mask, sm)[None, :, None]
            logits = logits.reshape(Bn, H, N, N)

        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(self.dtype), v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class SwinV2Block(nn.Module):
    """One SwinV2 layer: shifted-window attention + MLP, residual-post-norm.

    v2 ordering (HF ``Swinv2Layer``): the norm is applied to each sublayer's
    *output* before it is added to the residual.
    """

    dim: int
    num_heads: int
    input_resolution: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    layer_norm_eps: float = 1e-5
    pretrained_window_size: int = 0
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    softmax_dtype: Dtype = jnp.float32
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        R = self.input_resolution
        # Shrink the window when the feature map is no larger than it
        # (HF _compute_window_shift) — e.g. the 8x8 final stage at 256px.
        w = R if R <= self.window_size else self.window_size
        s = 0 if R <= self.window_size else self.shift_size

        B, L, C = x.shape
        shortcut = x
        h = x.reshape(B, R, R, C)
        if s > 0:
            h = jnp.roll(h, (-s, -s), axis=(1, 2))
        windows = window_partition(h, w)
        mask = shifted_window_mask(R, R, w, s) if s > 0 else None
        attn = WindowAttention(
            dim=C, num_heads=self.num_heads, window_size=w,
            pretrained_window_size=self.pretrained_window_size,
            qkv_bias=self.qkv_bias, use_pallas=self.use_pallas,
            dtype=self.dtype, softmax_dtype=self.softmax_dtype,
            name="attn")(
                windows, mask=mask, deterministic=deterministic)
        h = window_reverse(attn, w, R, R)
        if s > 0:
            h = jnp.roll(h, (s, s), axis=(1, 2))
        h = h.reshape(B, L, C)
        h = LayerNorm(epsilon=self.layer_norm_eps, name="norm1")(h)
        x = shortcut + DropPath(self.drop_path_rate)(h, deterministic)

        # Exact (erf) GELU matches HF's "gelu"; the tanh approximation is an
        # opt-in perf lever (erf is the VPU-heaviest op of the frozen MLPs).
        h = MlpBlock(hidden_dim=int(C * self.mlp_ratio), out_dim=C,
                     activation=lambda t: nn.gelu(
                         t, approximate=self.gelu_approximate),
                     dtype=self.dtype, name="mlp")(
                         x, deterministic=deterministic)
        h = LayerNorm(epsilon=self.layer_norm_eps, name="norm2")(h)
        return x + DropPath(self.drop_path_rate)(h, deterministic)


class PatchMerging(nn.Module):
    """2x2 patch merge: concat -> Linear(4C->2C) -> LayerNorm (v2 order)."""

    dim: int
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, resolution: int) -> jax.Array:
        B, L, C = x.shape
        R = resolution
        h = x.reshape(B, R, R, C)
        # HF concat order: (0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2)
        parts = [h[:, 0::2, 0::2], h[:, 1::2, 0::2],
                 h[:, 0::2, 1::2], h[:, 1::2, 1::2]]
        h = jnp.concatenate(parts, axis=-1).reshape(B, (R // 2) ** 2, 4 * C)
        h = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                     name="reduction")(h)
        return LayerNorm(epsilon=self.layer_norm_eps, name="norm")(h)


class SwinV2Encoder(nn.Module):
    """Swinv2Model equivalent: images -> (B, tokens, num_features).

    Input is channels-last ``(B, H, W, 3)`` (TPU conv layout).
    """

    size: SwinV2Size
    use_pallas: bool = False
    dtype: Dtype = jnp.float32
    softmax_dtype: Dtype = jnp.float32
    gelu_approximate: bool = False

    @nn.compact
    def __call__(self, pixel_values: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.size
        B = pixel_values.shape[0]
        # Patch embedding: non-overlapping conv, then LayerNorm.
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=self.dtype, name="patch_embed_proj")(pixel_values)
        R = cfg.image_size // cfg.patch_size
        x = x.reshape(B, R * R, cfg.embed_dim)
        x = LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_embed_norm")(x)

        total_blocks = sum(cfg.depths)
        dp_rates = np.linspace(0.0, cfg.drop_path_rate, total_blocks)
        b = 0
        dim = cfg.embed_dim
        for si, depth in enumerate(cfg.depths):
            for li in range(depth):
                x = SwinV2Block(
                    dim=dim, num_heads=cfg.num_heads[si], input_resolution=R,
                    window_size=cfg.window_size,
                    shift_size=0 if li % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    drop_path_rate=float(dp_rates[b]),
                    layer_norm_eps=cfg.layer_norm_eps,
                    pretrained_window_size=cfg.pretrained_window_sizes[si],
                    use_pallas=self.use_pallas,
                    dtype=self.dtype, softmax_dtype=self.softmax_dtype,
                    gelu_approximate=self.gelu_approximate,
                    name=f"stage_{si}_block_{li}")(
                        x, deterministic=deterministic)
                b += 1
            if si < len(cfg.depths) - 1:
                x = PatchMerging(dim=dim, layer_norm_eps=cfg.layer_norm_eps,
                                 dtype=self.dtype,
                                 name=f"stage_{si}_downsample")(x, R)
                R //= 2
                dim *= 2
        return LayerNorm(epsilon=cfg.layer_norm_eps, name="final_norm")(x)
