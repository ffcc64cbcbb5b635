"""Fused attention Pallas kernels for TPU.

One kernel family serves both transformers in the cascade:
  * **plain mode** (T5): un-scaled ``q @ k^T`` with an additive head bias
    (relative-position buckets + causal, learned -> gradient flows) and an
    optional per-batch key mask; optional in-kernel attention-prob dropout
    (T5 trains with p=0.1 on the probs); custom-VJP backward as a second
    Pallas kernel regenerating the identical dropout bits from the seed.
  * **cosine mode** (SwinV2): L2-normalized q,k with a learned per-head
    clamped logit scale, additive log-CPB head bias and static shifted-window
    masks — the v2 attention of the reference's Swin tower
    (``/root/reference/models/model.py:15``), fused end-to-end.

Performance design — **block-diagonal batch packing**. The sequences here are
short (64 window tokens, ≤ a few hundred text tokens) and head dims are
32/64, so naive batched attention decomposes into thousands of 64x64x32 MXU
calls whose per-matmul overhead dominates (measured on v5e: stage-2 Swin
attention runs ~30x above its FLOP bound). Each grid instance instead packs
G batch rows into ONE dense ``(G*Q) x (G*K)`` logits matmul; off-diagonal
(cross-batch) blocks are masked to -1e9 before the softmax, making them
exact zeros in the probabilities, so the single dense ``p @ v_cat`` matmul
reproduces per-row attention bit-for-bit while running G-fold larger MXU
ops. The G-fold FLOP waste is irrelevant — these matmuls are overhead-bound.

Bias plumbing:
  * per-head biases are pre-tiled onto the block diagonal (off-diagonal
    = -1e9) with ``pack_head_bias`` — for T5, pack ONCE per stack, not per
    scanned layer;
  * Swin's static window masks tile in numpy via ``pack_window_masks``
    (also -1e9 off-diagonal; the doubled off-diagonal NEG just saturates);
  * per-batch key masks are passed as (B//G, G*K) rows and broadcast along
    packed columns in-kernel.

Grid order is (H, B//G) so all batch groups of one head run consecutively —
the backward kernel accumulates the bias gradient into a single revisited
(Q, K) output block per head.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
_INTERPRET = False  # flipped by tests on CPU


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def pick_group(batch: int, q_len: int, k_len: int, limit_elems: int = 512,
               limit: int = 16) -> int:
    """Largest G dividing ``batch`` with G*max(Q,K) <= limit_elems."""
    cap = max(1, limit_elems // max(q_len, k_len))
    for g in range(min(limit, cap, batch), 0, -1):
        if batch % g == 0:
            return g
    return 1


# ---------------------------------------------------------------------------
# Bias packing helpers
# ---------------------------------------------------------------------------


def pack_head_bias(bias_h: jax.Array, G: int) -> jax.Array:
    """(H, Q, K) head bias -> (H, G*Q, G*K) block-diagonal tile with NEG
    off-diagonal (doubles as the cross-batch mask)."""
    H, Q, K = bias_h.shape
    eye = jnp.eye(G, dtype=bool)
    big = jnp.where(eye[None, :, None, :, None],
                    bias_h.astype(jnp.float32)[:, None, :, None, :], NEG)
    return big.reshape(H, G * Q, G * K)


def blockdiag_mask(G: int, Q: int, K: int) -> np.ndarray:
    """Static (1, G*Q, G*K) mask: 0 on diagonal blocks, NEG elsewhere."""
    eye = np.eye(G, dtype=bool)[:, None, :, None]
    return np.where(np.broadcast_to(eye, (G, Q, G, K)), 0.0,
                    NEG).astype(np.float32).reshape(1, G * Q, G * K)


def pack_window_masks(wmask: np.ndarray, G: int) -> np.ndarray:
    """Static (nW, N, N) shifted-window masks -> (nW//G, G*N, G*N) packed
    diagonals (window mask on diagonal blocks, NEG off-diagonal)."""
    nW, N, _ = wmask.shape
    ngroups = max(nW // G, 1)
    out = np.full((ngroups, G * N, G * N), NEG, np.float32)
    for grp in range(ngroups):
        for g in range(G):
            w = (grp * G + g) % nW
            out[grp, g * N:(g + 1) * N, g * N:(g + 1) * N] = wmask[w]
    return out


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(*refs, G: int, Q: int, K: int, cosine: bool,
                has_bias_h: bool, has_bias_g: bool, has_kmask: bool,
                dropout_rate: float, out_dtype, sm_dtype=jnp.float32):
    i = 0
    if dropout_rate > 0:
        seed_ref = refs[i]; i += 1
    if cosine:
        scale_ref = refs[i]; i += 1
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias_h_ref = bias_g_ref = kmask_ref = None
    if has_bias_h:
        bias_h_ref = refs[i]; i += 1
    if has_bias_g:
        bias_g_ref = refs[i]; i += 1
    if has_kmask:
        kmask_ref = refs[i]; i += 1
    o_ref = refs[i]

    D = q_ref.shape[-1]
    q = q_ref[0].reshape(G * Q, D)  # pack batch rows
    k = k_ref[0].reshape(G * K, D)
    v = v_ref[0].reshape(G * K, D)

    if cosine:
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        q = (q32 * jax.lax.rsqrt(
            jnp.sum(q32 * q32, -1, keepdims=True) + 1e-24)).astype(q.dtype)
        k = (k32 * jax.lax.rsqrt(
            jnp.sum(k32 * k32, -1, keepdims=True) + 1e-24)).astype(k.dtype)

    # Mosaic requires a 32-bit matmul accumulator; the softmax chain then
    # runs in sm_dtype (bf16 halves the dominant elementwise VPU work).
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(
            sm_dtype)  # (GQ, GK): ONE dense matmul

    if cosine:
        s = jnp.exp(jnp.minimum(scale_ref[pl.program_id(0)],
                                np.log(100.0))).astype(sm_dtype)
        logits = logits * s
    if has_bias_h:
        logits = logits + bias_h_ref[0].astype(sm_dtype)
    if has_bias_g:
        logits = logits + bias_g_ref[0].astype(sm_dtype)
    if has_kmask:
        logits = logits + jnp.where(kmask_ref[0, 0] > 0, 0.0,
                                    NEG).astype(sm_dtype)[None, :]

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    if dropout_rate > 0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                        + pl.program_id(1))
        bits = pltpu.prng_random_bits(p.shape)
        keep = pltpu.bitcast(bits, jnp.uint32) > jnp.uint32(
            dropout_rate * (2 ** 32))
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (GQ, D): ONE dense matmul
    o_ref[0] = o.reshape(G, Q, D).astype(out_dtype)


def _bwd_kernel(*refs, G: int, Q: int, K: int, has_bias_h: bool,
                has_bias_g: bool, has_kmask: bool, need_dbias: bool,
                dropout_rate: float, io_dtype):
    i = 0
    if dropout_rate > 0:
        seed_ref = refs[i]; i += 1
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias_h_ref = bias_g_ref = kmask_ref = None
    if has_bias_h:
        bias_h_ref = refs[i]; i += 1
    if has_bias_g:
        bias_g_ref = refs[i]; i += 1
    if has_kmask:
        kmask_ref = refs[i]; i += 1
    do_ref = refs[i]; i += 1
    dq_ref, dk_ref, dv_ref = refs[i], refs[i + 1], refs[i + 2]
    dbias_ref = refs[i + 3] if need_dbias else None

    D = q_ref.shape[-1]
    q = q_ref[0].reshape(G * Q, D)
    k = k_ref[0].reshape(G * K, D)
    v = v_ref[0].reshape(G * K, D)
    do = do_ref[0].reshape(G * Q, D).astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias_h:
        logits = logits + bias_h_ref[0]
    if has_bias_g:
        logits = logits + bias_g_ref[0]
    if has_kmask:
        logits = logits + jnp.where(kmask_ref[0, 0] > 0, 0.0, NEG)[None, :]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    if dropout_rate > 0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                        + pl.program_id(1))
        bits = pltpu.prng_random_bits(p.shape)
        keep = pltpu.bitcast(bits, jnp.uint32) > jnp.uint32(
            dropout_rate * (2 ** 32))
        p_drop = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        p_drop = p

    dv = jax.lax.dot_general(
        p_drop.astype(io_dtype), do.astype(io_dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (GK, D)
    dp = jax.lax.dot_general(
        do.astype(io_dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (GQ, GK)
    if dropout_rate > 0:
        dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_c = ds.astype(io_dtype)
    dq = jax.lax.dot_general(
        ds_c, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds_c, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dq_ref[0] = dq.reshape(G, Q, D).astype(io_dtype)
    dk_ref[0] = dk.reshape(G, K, D).astype(io_dtype)
    dv_ref[0] = dv.reshape(G, K, D).astype(io_dtype)

    if need_dbias:
        # Sum the diagonal blocks of ds into the per-head (Q, K) bias grad;
        # the output block is revisited across the g grid dimension
        # (grid order (H, B//G) keeps one head's groups consecutive).
        acc = jnp.zeros((Q, K), jnp.float32)
        for g in range(G):
            acc = acc + ds[g * Q:(g + 1) * Q, g * K:(g + 1) * K]

        @pl.when(pl.program_id(1) == 0)
        def _():
            dbias_ref[0] = acc

        @pl.when(pl.program_id(1) != 0)
        def _():
            dbias_ref[0] = dbias_ref[0] + acc


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _specs(H, G, Q, K, D, cosine, bias_h, bias_g, kmask, dropout_rate):
    in_specs = []
    if dropout_rate > 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if cosine:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    qspec = pl.BlockSpec((1, G, Q, D), lambda h, g: (h, g, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, G, K, D), lambda h, g: (h, g, 0, 0),
                         memory_space=pltpu.VMEM)
    in_specs += [qspec, kspec, kspec]
    if bias_h is not None:
        nh = bias_h.shape[0]  # H, or 1 for a shared block-diag mask
        in_specs.append(pl.BlockSpec(
            (1, G * Q, G * K), lambda h, g: (h % nh, 0, 0),
            memory_space=pltpu.VMEM))
    if bias_g is not None:
        ngroups = bias_g.shape[0]
        in_specs.append(pl.BlockSpec(
            (1, G * Q, G * K), lambda h, g: (g % ngroups, 0, 0),
            memory_space=pltpu.VMEM))
    if kmask is not None:
        # (B//G, 1, G*K) layout so the trailing two block dims equal the
        # array dims (Mosaic tiling constraint).
        in_specs.append(pl.BlockSpec((1, 1, G * K), lambda h, g: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, G, Q, D), lambda h, g: (h, g, 0, 0),
                            memory_space=pltpu.VMEM)
    return in_specs, qspec, kspec, out_spec


def _to_head_major(x):
    return jnp.swapaxes(x, 0, 1)  # (B, H, L, D) -> (H, B, L, D)


def _fwd(q, k, v, bias_h, bias_g, kmask, scale, cosine, dropout_rate, seed,
         G, sm_dtype=jnp.float32):
    """q/k/v: (B, H, L, D); bias_h: (H|1, GQ, GK); bias_g: (ngroups, GQ, GK);
    kmask: (B//G, G*K)."""
    B, H, Q, D = q.shape
    K = k.shape[2]
    in_specs, _, _, out_spec = _specs(H, G, Q, K, D, cosine, bias_h, bias_g,
                                      kmask, dropout_rate)
    kernel = functools.partial(
        _fwd_kernel, G=G, Q=Q, K=K, cosine=cosine,
        has_bias_h=bias_h is not None, has_bias_g=bias_g is not None,
        has_kmask=kmask is not None, dropout_rate=dropout_rate,
        out_dtype=q.dtype, sm_dtype=sm_dtype)
    args = []
    if dropout_rate > 0:
        args.append(jnp.asarray([seed], jnp.int32))
    if cosine:
        args.append(scale.astype(jnp.float32))
    args += [_to_head_major(q), _to_head_major(k), _to_head_major(v)]
    if bias_h is not None:
        args.append(bias_h.astype(jnp.float32))
    if bias_g is not None:
        args.append(bias_g.astype(jnp.float32))
    if kmask is not None:
        args.append(kmask.astype(jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(H, B // G),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((H, B, Q, D), q.dtype),
        interpret=_INTERPRET,
    )(*args)
    return jnp.swapaxes(out, 0, 1)


def _bwd(q, k, v, bias_h, kmask, dropout_rate, seed, do, need_dbias, G):
    B, H, Q, D = q.shape
    K = k.shape[2]
    in_specs, qspec, kspec, _ = _specs(H, G, Q, K, D, False, bias_h, None,
                                       kmask, dropout_rate)
    in_specs = in_specs + [qspec]
    kernel = functools.partial(
        _bwd_kernel, G=G, Q=Q, K=K, has_bias_h=bias_h is not None,
        has_bias_g=False, has_kmask=kmask is not None,
        need_dbias=need_dbias, dropout_rate=dropout_rate, io_dtype=q.dtype)
    args = []
    if dropout_rate > 0:
        args.append(jnp.asarray([seed], jnp.int32))
    args += [_to_head_major(q), _to_head_major(k), _to_head_major(v)]
    if bias_h is not None:
        args.append(bias_h.astype(jnp.float32))
    if kmask is not None:
        args.append(kmask.astype(jnp.int32))
    args.append(_to_head_major(do))
    out_specs = [qspec, kspec, kspec]
    out_shape = [jax.ShapeDtypeStruct((H, B, Q, D), q.dtype),
                 jax.ShapeDtypeStruct((H, B, K, D), q.dtype),
                 jax.ShapeDtypeStruct((H, B, K, D), q.dtype)]
    if need_dbias:
        out_specs.append(pl.BlockSpec((1, Q, K), lambda h, g: (h, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((H, Q, K), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(H, B // G),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_INTERPRET,
    )(*args)
    dq, dk, dv = (jnp.swapaxes(t, 0, 1) for t in outs[:3])
    dbias = outs[3] if need_dbias else None
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# T5 (plain) public entry
# ---------------------------------------------------------------------------


def _float0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0) if x is not None else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _t5_attention(dropout_rate, G, bias_is_shared_mask, q, k, v, packed_bias,
                  kmask, seed):
    return _fwd(q, k, v, packed_bias, None, kmask, None, False, dropout_rate,
                seed, G)


def _t5_attention_fwd(dropout_rate, G, bias_is_shared_mask, q, k, v,
                      packed_bias, kmask, seed):
    out = _fwd(q, k, v, packed_bias, None, kmask, None, False, dropout_rate,
               seed, G)
    return out, (q, k, v, packed_bias, kmask, seed)


def _t5_attention_bwd(dropout_rate, G, bias_is_shared_mask, res, do):
    q, k, v, packed_bias, kmask, seed = res
    need_dbias = packed_bias is not None and not bias_is_shared_mask
    dq, dk, dv, dbias_hqk = _bwd(q, k, v, packed_bias, kmask, dropout_rate,
                                 seed, do, need_dbias, G)
    dbias = None
    if packed_bias is not None:
        if need_dbias:
            # cotangent must match the packed (H, GQ, GK) primal: re-tile
            # the per-head (Q, K) grad onto the diagonal (zeros elsewhere).
            # pack_head_bias's own transpose re-sums the G diagonal copies,
            # so pre-divide to keep the chain-rule sum exact.
            dbias = pack_head_bias(dbias_hqk / G, G)
            dbias = jnp.where(dbias <= NEG / 2, 0.0, dbias)
        else:
            dbias = jnp.zeros_like(packed_bias)
    return (dq, dk, dv, dbias, _float0_like(kmask), _float0_like(seed))


_t5_attention.defvjp(_t5_attention_fwd, _t5_attention_bwd)


def t5_fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                       bias_h: Optional[jax.Array] = None,
                       kmask: Optional[jax.Array] = None,
                       dropout_rate: float = 0.0,
                       seed: int | jax.Array = 0) -> jax.Array:
    """T5 attention: softmax(q@k^T + bias_h + log(kmask)) @ v.

    q: (B, H, Q, D); k/v: (B, H, K, D); bias_h: (H, Q, K) or (1, H, Q, K)
    additive head bias (learned — gradient flows); kmask: (B, K) int,
    1=attend. For a bias reused across scanned layers, pre-pack once with
    ``pick_group`` + ``pack_head_bias`` and call
    ``t5_fused_attention_packed``.
    """
    B, _, Q, _ = q.shape
    K = k.shape[2]
    G = pick_group(B, Q, K)
    packed = None
    if bias_h is not None:
        if bias_h.ndim == 4:
            bias_h = bias_h[0]
        packed = pack_head_bias(bias_h, G)
    return t5_fused_attention_packed(q, k, v, packed, kmask, dropout_rate,
                                     seed, G)


def t5_fused_attention_packed(q, k, v, packed_bias, kmask=None,
                              dropout_rate: float = 0.0, seed=0,
                              G: Optional[int] = None) -> jax.Array:
    """Like ``t5_fused_attention`` with a pre-packed (H|1, G*Q, G*K) bias."""
    B, _, Q, _ = q.shape
    K = k.shape[2]
    if G is None:
        G = pick_group(B, Q, K)
    shared_mask = False
    if packed_bias is None and G > 1:
        packed_bias = jnp.asarray(blockdiag_mask(G, Q, K))
        shared_mask = True
    km = None
    if kmask is not None:
        km = kmask.astype(jnp.int32).reshape(B // G, 1, G * K)
    return _t5_attention(float(dropout_rate), G, shared_mask, q, k, v,
                         packed_bias, km, jnp.asarray(seed, jnp.int32))


# ---------------------------------------------------------------------------
# SwinV2 (cosine) public entry
# ---------------------------------------------------------------------------


def _swin_reference(q, k, v, scale, bias_h, wmask, sm_dtype=jnp.float32):
    """XLA reference of the cosine attention (backward pass + CPU tests).

    ``sm_dtype`` mirrors the kernel's softmax-chain dtype so the recompute
    backward differentiates the SAME function the Pallas forward computed —
    with ``swin_softmax_dtype=bfloat16`` and a trainable tower, an fp32-only
    reference would yield systematically mismatched q/k/v/scale/CPB grads.
    """
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    qn = q32 * jax.lax.rsqrt(jnp.sum(q32 * q32, -1, keepdims=True) + 1e-24)
    kn = k32 * jax.lax.rsqrt(jnp.sum(k32 * k32, -1, keepdims=True) + 1e-24)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qn, kn).astype(sm_dtype)
    s = jnp.exp(jnp.minimum(scale.astype(jnp.float32),
                            np.log(100.0))).astype(sm_dtype)
    logits = logits * s[None, :, None, None]
    logits = logits + bias_h.astype(sm_dtype)[None]
    if wmask is not None:
        B = q.shape[0]
        nW = wmask.shape[0]
        wm = jnp.tile(wmask.astype(sm_dtype), (B // nW, 1, 1))
        logits = logits + wm[:, None]
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _swin_attention(G, sm_name, q, k, v, scale, bias_h, wmask, packed_wmask):
    sm_dtype = jnp.bfloat16 if sm_name == "bfloat16" else jnp.float32
    if packed_wmask is None:
        # unshifted: head bias packed on the diagonal carries the mask
        packed_bias = pack_head_bias(bias_h, G)
        return _fwd(q, k, v, packed_bias, None, None, scale, True, 0.0, 0, G,
                    sm_dtype)
    # shifted: dense-tiled head bias (off-diag irrelevant) + static packed
    # window masks (which carry the off-diag NEG)
    bias_dense = jnp.tile(bias_h.astype(jnp.float32), (1, G, G))
    return _fwd(q, k, v, bias_dense, packed_wmask, None, scale, True, 0.0,
                0, G, sm_dtype)


def _swin_attention_fwd(G, sm_name, q, k, v, scale, bias_h, wmask,
                        packed_wmask):
    return (_swin_attention(G, sm_name, q, k, v, scale, bias_h, wmask,
                            packed_wmask),
            (q, k, v, scale, bias_h, wmask))


def _swin_attention_bwd(G, sm_name, res, do):
    # XLA recompute backward (exercised in --image_model_train mode only);
    # gradients flow to q/k/v, the logit scale, and the CPB bias. The
    # recompute honors sm_name so it differentiates the function the kernel
    # actually computed (fp32 or bf16 softmax chain).
    sm_dtype = jnp.bfloat16 if sm_name == "bfloat16" else jnp.float32
    q, k, v, scale, bias_h, wmask = res
    if wmask is None:
        _, vjp = jax.vjp(
            lambda q, k, v, s, b: _swin_reference(q, k, v, s, b, None,
                                                  sm_dtype),
            q, k, v, scale, bias_h)
        return (*vjp(do), None, None)
    _, vjp = jax.vjp(
        lambda q, k, v, s, b, w: _swin_reference(q, k, v, s, b, w,
                                                 sm_dtype),
        q, k, v, scale, bias_h, wmask)
    dq, dk, dv, dscale, dbias = vjp(do)[:5]
    return (dq, dk, dv, dscale, dbias, jnp.zeros_like(wmask), None)


_swin_attention.defvjp(_swin_attention_fwd, _swin_attention_bwd)


def swin_fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         logit_scale: jax.Array, bias_h: jax.Array,
                         window_mask: Optional[np.ndarray] = None,
                         softmax_dtype: Any = jnp.float32) -> jax.Array:
    """SwinV2 scaled-cosine window attention, fused.

    q/k/v: (B*nW, H, N, D); logit_scale: (H,) raw learned scale (clamp+exp
    in-kernel); bias_h: (H, N, N) CPB bias (learned -> gradient flows);
    window_mask: static numpy (nW, N, N) additive mask or None;
    softmax_dtype: in-kernel logits/softmax dtype (bf16 halves the VPU work
    of the bounded cosine logits; the recompute backward runs the SAME
    softmax dtype so gradients differentiate the function the kernel
    computed).
    """
    B, H, N, D = q.shape
    sm_name = "bfloat16" if softmax_dtype == jnp.bfloat16 else "float32"
    if window_mask is not None:
        nW = window_mask.shape[0]
        G = pick_group(int(np.gcd(B, nW)), N, N)
        packed = jnp.asarray(pack_window_masks(np.asarray(window_mask), G))
        wm = jnp.asarray(window_mask, jnp.float32)
        return _swin_attention(G, sm_name, q, k, v, logit_scale, bias_h, wm,
                               packed)
    G = pick_group(B, N, N)
    return _swin_attention(G, sm_name, q, k, v, logit_scale, bias_h, None,
                           None)
