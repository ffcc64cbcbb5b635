"""Mixture-of-Experts routing and expert-parallel FFN compute.

Completes the SURVEY.md §2D parallelism matrix (EP row — beyond the
reference, which is pure DDP at ``/root/reference/train.py:26``): a
Switch-Transformer-style sparse MLP for the main T5's blocks, laid out the
GSPMD way ("How to Scale Your Model" / GShard):

  * routing is DENSE-dispatch: a fp32 router softmax picks top-k experts
    per token, and fixed-capacity dispatch/combine tensors of shape
    ``(groups, tokens, experts, capacity)`` turn the sparse gather into
    einsums — static shapes, MXU-friendly, no data-dependent control flow;
  * expert weights carry a leading ``(experts, ...)`` axis sharded over the
    mesh's ``expert`` axis (``parallel/partitioning.py``), and the
    dispatched activations are constrained to the same axis — the XLA SPMD
    partitioner inserts the token-exchange collectives over ICI
    (all-to-all, or all-gather + reduce where its cost model prefers);
  * tokens overflowing an expert's capacity are dropped from the MLP (the
    residual connection still carries them — standard Switch semantics),
    and the load-balancing auxiliary loss (Switch eq. 4) pushes the router
    toward uniform expert utilization so drops stay rare.

Everything here is deterministic (no routing jitter): the same batch routes
the same way every step, which keeps the bit-exact-resume guarantees of the
train loop intact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..parallel.partitioning import expert_constraint


def moe_capacity(num_tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-expert token capacity: ``ceil(top_k * S / E * factor)``, at
    least 1, at most S (an expert can never receive more than every
    token of its group once)."""
    cap = int(-(-top_k * num_tokens * capacity_factor // num_experts))
    return max(1, min(cap, num_tokens))


def topk_routing(router_logits: jax.Array, top_k: int, capacity: int,
                 mask: jax.Array | None = None
                 ) -> tuple[jax.Array, jax.Array]:
    """Dense-dispatch top-k routing.

    Args:
      router_logits: ``(G, S, E)`` — per-token expert scores (any float
        dtype; the softmax runs in fp32).
      top_k: experts per token (1 = Switch, 2 = GShard).
      capacity: per-expert slot count ``C``.
      mask: optional ``(G, S)`` token-validity mask (1 = real token,
        0 = padding). Masked tokens route nowhere (zero combine row),
        consume no expert capacity, and are excluded from the
        balance-loss statistics — so routing of real tokens does not
        depend on how many pad columns ride along, and the aux loss
        balances REAL-token load (GShard's nonpadding treatment).

    Returns:
      ``(combine, aux_loss)`` where ``combine`` is ``(G, S, E, C)`` fp32 —
      ``combine[g, s, e, c]`` is token ``(g, s)``'s gate weight in expert
      ``e``'s slot ``c`` (zero everywhere the token wasn't routed or
      overflowed capacity) — and ``aux_loss`` is the scalar Switch
      load-balancing loss (≈1.0 at perfect balance, minimized at uniform
      routing; multiply by the config weight before adding to the CE loss).
    """
    G, S, E = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    m = None if mask is None else mask.astype(jnp.float32)  # (G, S)
    n_real = (jnp.full((G,), float(S)) if m is None
              else jnp.maximum(jnp.sum(m, axis=1), 1.0))      # (G,)

    combine = jnp.zeros((G, S, E, capacity), jnp.float32)
    remaining = probs
    # Slots already claimed in each expert by higher-priority (earlier-k)
    # assignments: (G, E) running counter.
    used = jnp.zeros((G, E), jnp.int32)
    frac_routed = jnp.zeros((G, E), jnp.float32)
    for _ in range(top_k):
        gate = jnp.max(remaining, axis=-1)                    # (G, S)
        index = jnp.argmax(remaining, axis=-1)                # (G, S)
        onehot = jax.nn.one_hot(index, E, dtype=jnp.float32)  # (G, S, E)
        if m is not None:
            # Pad tokens claim no expert: zero rows drop out of the
            # capacity cumsum, the combine sum, and the fraction stats.
            onehot = onehot * m[:, :, None]
        # Position of each token within its chosen expert, counting tokens
        # in sequence order (GShard's deterministic priority), offset by
        # slots the previous k-pass already filled.
        pos_in_expert = (jnp.cumsum(onehot, axis=1) - onehot
                         ).astype(jnp.int32)                  # (G, S, E)
        ioh = (onehot > 0).astype(jnp.int32)
        pos = jnp.sum(pos_in_expert * ioh, axis=-1) + jnp.sum(
            used[:, None, :] * ioh, axis=-1)                  # (G, S)
        fits = pos < capacity
        slot = jax.nn.one_hot(jnp.where(fits, pos, capacity), capacity,
                              dtype=jnp.float32)              # (G, S, C)
        combine = combine + (gate * fits)[:, :, None, None] \
            * onehot[:, :, :, None] * slot[:, :, None, :]
        used = used + jnp.sum(ioh * fits[:, :, None].astype(jnp.int32),
                              axis=1)
        frac_routed = frac_routed + jnp.sum(onehot, axis=1) / n_real[:, None]
        # Mask the chosen expert out for the next k-pass.
        remaining = remaining * (1.0 - onehot)

    # Switch load-balancing loss: E * sum_e(f_e * P_e) with f_e the
    # fraction of REAL tokens whose (any-k) choice was e and P_e their mean
    # router prob — computed on the FULL softmax so the router gradient
    # sees every expert. Mean over NONEMPTY groups (an all-padding group —
    # e.g. a gradient-accumulation phantom row — contributes zero to the
    # sum and must not dilute the mean, so padded batches score exactly
    # like their unpadded equivalent); /top_k normalizes f so balance
    # => ~1.0.
    pm = probs if m is None else probs * m[:, :, None]
    mean_prob = jnp.sum(pm, axis=1) / n_real[:, None]         # (G, E)
    n_groups = (jnp.asarray(float(G)) if m is None
                else jnp.maximum(jnp.sum(jnp.max(m, axis=1)), 1.0))
    aux = E * jnp.sum(
        jnp.sum(frac_routed / top_k * mean_prob, axis=-1)) / n_groups
    return combine, aux


def moe_ffn(x: jax.Array, combine: jax.Array, wi: jax.Array, wo: jax.Array,
            activation=jax.nn.relu, dropout_rate: float = 0.0,
            dropout_rng: jax.Array | None = None) -> jax.Array:
    """Expert-parallel un-gated FFN over dense-dispatched tokens.

    Args:
      x: ``(G, S, D)`` token activations.
      combine: ``(G, S, E, C)`` from :func:`topk_routing`.
      wi: ``(E, D, F)`` per-expert expand weights.
      wo: ``(E, F, D)`` per-expert contract weights.

    Returns ``(G, S, D)`` — each token's gate-weighted sum of its experts'
    outputs (zero for capacity-dropped tokens; the caller's residual
    carries those through unchanged).

    The dispatched tensor ``(E, G, C, D)`` is sharded over the ``expert``
    mesh axis (``expert_constraint``); with ``x`` sharded over the data
    axes and ``wi/wo`` over ``expert``, XLA lowers the two boundary
    einsums to the token exchange over ICI.
    """
    dispatch = (combine > 0).astype(x.dtype)           # (G, S, E, C)
    expert_in = jnp.einsum("gsec,gsd->egcd", dispatch, x)
    expert_in = expert_constraint(expert_in)
    h = activation(jnp.einsum("egcd,edf->egcf", expert_in,
                              wi.astype(x.dtype)))
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    h.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0).astype(h.dtype)
    expert_out = jnp.einsum("egcf,efd->egcd", h, wo.astype(x.dtype))
    expert_out = expert_constraint(expert_out)
    return jnp.einsum("gsec,egcd->gsd", combine.astype(x.dtype),
                      expert_out)
