"""Ring attention: sequence-parallel attention that streams K/V over ICI.

The second flavor of context parallelism (SURVEY.md §2D SP/CP row — absent
from the reference, which never leaves one GPU's sequence). The default
``seq``-axis path (``parallel.partitioning.seq_constraint``) lets the XLA
SPMD partitioner ALL-GATHER the full K/V onto every device; that is optimal
at the reference's short sequences but costs O(L) memory per device. Ring
attention instead keeps K/V sharded: each device holds one K/V chunk and the
chunks rotate around the ``seq`` axis with ``lax.ppermute`` while a
flash-style running softmax (fp32 max/numerator/denominator carry) folds in
one chunk per tick — peak memory O(L/n) per device and the permute overlaps
with the chunk's matmuls. This is the TPU-native layout for long-context
pretraining (Liu et al., "Ring Attention with Blockwise Transformers", 2023;
the jax-ml scaling-book collective recipe), built here on ``shard_map`` so
it composes with the data/fsdp/tensor axes of the same mesh.

Semantics match ``models.layers.dot_product_attention`` (no 1/sqrt(d) scale —
T5 folds it into init; additive fp32 bias; fp32 softmax statistics).
Attention-prob dropout (HF applies it post-softmax,
``transformers`` T5Attention) is exact-by-construction: the per-chunk
unnormalized probabilities are masked with a per-(step, device) folded key
in the numerator while the denominator keeps the undropped mass, which
equals dropout(softmax(logits)) @ v row-for-row. The mask stream differs
from the XLA path's (different RNG consumption order), like every other
attention backend swap.

Autodiff: the scan + ppermute body is plain differentiable JAX — the
backward pass re-streams chunks in the reverse ring direction via the
transposed permutation, so no custom VJP is needed for correctness; wrap the
stack in ``remat`` (``--remat``) to avoid storing per-tick residuals at very
long L.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..parallel.partitioning import _ambient_mesh


def _local_ring_attention(q, k, v, bias_rows, dropout_mask_fn,
                          axis_name: str, axis_size: int):
    """Per-device body (runs inside shard_map).

    q:         (B, H, Lq, D)  — this device's query rows
    k, v:      (B, H, Lc, D)  — this device's resident K/V chunk
    bias_rows: (B|1, H, Lq, L_global) or None — this device's bias rows
               against the FULL key length (memory O(L·Lq/n) per device)
    dropout_mask_fn: (step, p_shape) -> keep mask / None
    """
    orig_dtype = q.dtype
    B, H, Lq, D = q.shape
    Lc = k.shape[2]
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def tick(carry, step):
        m, num, den, k_cur, v_cur = carry
        # Which chunk is resident this tick: chunks rotate forward, so at
        # tick t device i holds chunk (i - t) mod n.
        src = (my_idx - step) % axis_size
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur,
                            preferred_element_type=jnp.float32)
        if bias_rows is not None:
            b = jax.lax.dynamic_slice_in_dim(bias_rows, src * Lc, Lc, axis=3)
            logits = logits + b.astype(jnp.float32)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])          # fp32 (B,H,Lq,Lc)
        den = den * alpha + p.sum(axis=-1)
        p_num = p
        if dropout_mask_fn is not None:
            p_num = p * dropout_mask_fn(step, p.shape)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p_num,
                        v_cur.astype(jnp.float32))
        num = num * alpha[..., None] + pv
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, num, den, k_next, v_next), None

    init = (jnp.full((B, H, Lq), -jnp.inf, jnp.float32),
            jnp.zeros((B, H, Lq, D), jnp.float32),
            jnp.zeros((B, H, Lq), jnp.float32),
            k, v)
    (m, num, den, _, _), _ = jax.lax.scan(
        tick, init, jnp.arange(axis_size))
    return (num / den[..., None]).astype(orig_dtype)


def ring_applicable(q_len: int, k_len: int, axis_name: str = "seq",
                    batch: Optional[int] = None,
                    num_heads: Optional[int] = None) -> bool:
    """True when the ambient mesh has a nontrivial ``axis_name`` axis and
    the shapes divide it (the call-site gate for the ring path).

    ``ring_self_attention``'s shard_map also splits the batch dim over
    (data, fsdp) and the head dim over tensor, so when ``batch``/
    ``num_heads`` are given they must divide those mesh factors too —
    otherwise the shard_map raises at trace time. Trainer.init_state traces
    the model on a tiny example batch that need not divide the data axes;
    falling back to the dense path there is free (params are identical),
    and real train batches already satisfy batch % (data*fsdp) == 0 from
    the input sharding."""
    mesh = _ambient_mesh()
    if (mesh is None or axis_name not in mesh.axis_names
            or mesh.shape[axis_name] == 1):
        return False
    n = mesh.shape[axis_name]
    if batch is not None:
        dp = 1
        for a in ("data", "fsdp"):
            if a in mesh.axis_names:
                dp *= mesh.shape[a]
        if batch % dp != 0:
            return False
    if num_heads is not None and "tensor" in mesh.axis_names:
        if num_heads % mesh.shape["tensor"] != 0:
            return False
    return q_len % n == 0 and k_len % n == 0 and q_len == k_len


def ring_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        bias: Optional[jax.Array] = None,
                        axis_name: str = "seq",
                        dropout_rate: float = 0.0,
                        dropout_rng: Optional[jax.Array] = None) -> jax.Array:
    """Sequence-parallel self-attention with ring-streamed K/V.

    Call from inside an auto-SPMD (jit) region whose ambient mesh has a
    nontrivial ``axis_name`` axis; q/k/v are the usual GLOBAL (B, H, L, D)
    arrays (sequence-sharded by ``seq_constraint``), ``bias`` the usual
    additive (B|1, H, L, L) fp32 logit bias (relative-position [+ causal]
    [+ key-mask] — causal rows simply mask future chunks, trading the
    skipped-block optimization for one code path). Falls back to dense
    attention when the mesh has no ``axis_name`` axis or L doesn't divide.
    """
    mesh = _ambient_mesh()
    L = q.shape[2]
    if not ring_applicable(L, k.shape[2], axis_name):
        raise ValueError(
            "ring_self_attention called without an applicable seq mesh — "
            "gate call sites on ring_applicable()")
    n = mesh.shape[axis_name]

    batch_axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    head_axis = "tensor" if "tensor" in mesh.axis_names else None
    qkv_spec = P(batch_axes or None, head_axis, axis_name, None)
    bias_specs = ()
    args = [q, k, v]
    if bias is not None:
        bias_batch = batch_axes or None if bias.shape[0] != 1 else None
        bias_specs = (P(bias_batch, head_axis, axis_name, None),)
        args.append(bias)

    dropout_mask_fn = None
    rng_args = ()
    rng_specs = ()
    if dropout_rate > 0.0 and dropout_rng is not None:
        rng_args = (dropout_rng,)
        rng_specs = (P(),)

    def mapped(q_l, k_l, v_l, *rest):
        rest = list(rest)
        bias_l = rest.pop(0) if bias is not None else None
        mask_fn = None
        if rng_args:
            rng_l = rest.pop(0)
            # Fold every sharded dim's index into the key: devices holding
            # DIFFERENT batch rows / heads / query rows must not reuse one
            # mask realization.
            key0 = rng_l
            for ax in batch_axes:
                key0 = jax.random.fold_in(key0, jax.lax.axis_index(ax))
            if head_axis is not None:
                key0 = jax.random.fold_in(
                    key0, jax.lax.axis_index(head_axis))
            key0 = jax.random.fold_in(key0, jax.lax.axis_index(axis_name))

            def mask_fn(step, shape):  # noqa: F811
                key = jax.random.fold_in(key0, step)
                return jax.random.bernoulli(
                    key, 1.0 - dropout_rate, shape).astype(jnp.float32) / (
                        1.0 - dropout_rate)

        return _local_ring_attention(q_l, k_l, v_l, bias_l, mask_fn,
                                     axis_name, n)

    out_spec = P(batch_axes or None, head_axis, axis_name, None)
    return jax.shard_map(
        mapped, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec) + bias_specs + rng_specs,
        out_specs=out_spec,
        check_vma=False)(*args, *rng_args)
