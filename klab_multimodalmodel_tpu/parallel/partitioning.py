"""Parameter partitioning: path-regex -> PartitionSpec rules.

TPU-native replacement for the reference's replicate-everything DDP
(``/root/reference/train.py:26``): parameters get named shardings over the
``(data, fsdp, tensor)`` mesh and the XLA SPMD partitioner inserts all
collectives. The same rules apply transitively to optimizer moments (their
trees mirror the param tree).

Axes:
  * ``data``   — pure data parallel (batch only; params replicated);
  * ``fsdp``   — ZeRO-style parameter/optimizer sharding on one weight axis;
  * ``tensor`` — megatron TP: attention heads / MLP hidden / vocab sharded
    (warranted because t5-3b/11b are in the reference's flag choices,
    ``/root/reference/modules/config.py:8-9``);
  * ``seq`` / ``pipe`` / ``expert`` — activation sequence dims (context
    parallelism), pipeline stages, and MoE expert weights + dispatched
    tokens (see the ``*_constraint`` helpers below).

Scanned stacks have a leading layer axis (never sharded). Rules match on the
``/``-joined parameter path suffix.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex, spec for the *trailing* dims). Specs are padded on the left with
# None for any leading (layer) axes at application time.
_RULES: list[tuple[str, P]] = [
    # T5 attention: qkv project d_model -> heads*d_kv (shard heads on tensor,
    # d_model on fsdp); o projects back.
    (r"SelfAttention/(q|k|v)/kernel$", P("fsdp", "tensor")),
    (r"SelfAttention/o/kernel$", P("tensor", "fsdp")),
    (r"EncDecAttention/(q|k|v)/kernel$", P("fsdp", "tensor")),
    (r"EncDecAttention/o/kernel$", P("tensor", "fsdp")),
    # T5 MLP: wi expands (shard d_ff on tensor), wo contracts. wi_0/wi_1
    # are the v1.1/Flan gated pair — both expand, same layout as wi.
    (r"mlp/wi(_[01])?/kernel$", P("fsdp", "tensor")),
    (r"mlp/wo/kernel$", P("tensor", "fsdp")),
    # MoE expert FFNs: leading experts axis over ``expert``, then the dense
    # rules' layout per expert. The router stays replicated — it is tiny
    # (d_model x E) and every token needs it, so sharding would only buy
    # a per-layer all-gather.
    (r"mlp/experts_wi$", P("expert", "fsdp", "tensor")),
    (r"mlp/experts_wo$", P("expert", "tensor", "fsdp")),
    (r"mlp/router/kernel$", P(None, None)),
    # Embeddings / LM head: shard vocab on tensor (XLA handles the gather).
    (r"shared/embedding$", P("tensor", "fsdp")),
    (r"lm_head/kernel$", P("fsdp", "tensor")),
    # Relative position bias tables: tiny, replicate.
    (r"relpos_bias/embedding$", P(None, None)),
    # SwinV2: attention + MLP dense layers (in, out).
    (r"attn/(q|k|v)/kernel$", P("fsdp", "tensor")),
    (r"attn/proj/kernel$", P("tensor", "fsdp")),
    (r"attn/(q|v)/bias$", P("tensor")),
    (r"attn/proj/bias$", P("fsdp")),
    (r"attn/logit_scale$", P(None)),
    (r"attn/cpb_fc[12]/(kernel|bias)$", P(None, None)),
    (r"(fc1|fc2)/kernel$", P("fsdp", "tensor")),
    (r"(fc1|fc2)/bias$", P("tensor")),
    (r"reduction/kernel$", P("fsdp", "tensor")),
    (r"patch_embed_proj/kernel$", P(None, None, None, "tensor")),
    (r"patch_embed_proj/bias$", P("tensor")),
    # Projections between towers.
    (r"(vision|language)_projection/kernel$", P("fsdp", "tensor")),
    # Norm scales / biases: replicate.
    (r"(weight|bias|scale)$", P(None)),
]


def spec_for_path(path: str, ndim: int) -> P:
    """PartitionSpec for one parameter, padded to its rank.

    Pipelined stacks (``--pipeline_stages``) carry params under a
    ``…/stages/…`` path with a leading stage axis — that axis is sharded
    over ``pipe`` so each stage's layer block lives on its stage devices.
    """
    pipelined = "/stages/" in path or path.startswith("stages/")
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            trailing = tuple(spec)
            if len(trailing) > ndim:
                # e.g. a rank-1 param matched a rank-2 rule: replicate.
                return _with_pipe(P(*([None] * ndim)), pipelined)
            return _with_pipe(
                P(*([None] * (ndim - len(trailing)) + list(trailing))),
                pipelined)
    return _with_pipe(P(*([None] * ndim)), pipelined)


def _with_pipe(spec: P, pipelined: bool) -> P:
    if not pipelined or len(spec) == 0 or spec[0] is not None:
        return spec
    return P("pipe", *tuple(spec)[1:])


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def make_param_specs(params: Any) -> Any:
    """Param pytree -> pytree of PartitionSpecs (same structure)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), leaf.ndim), params)


def make_shardings(tree_of_specs: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda s: NamedSharding(mesh, s), tree_of_specs,
                        is_leaf=lambda x: isinstance(x, P))


def make_param_shardings(params: Any, mesh: Mesh) -> Any:
    return make_shardings(make_param_specs(params), mesh)


def batch_spec() -> P:
    """Input batches: leading dim over the combined data-like axes."""
    return P(("data", "fsdp"))


def _ambient_mesh():
    """The ambient mesh at trace time (``jax.sharding.use_mesh`` or the
    legacy ``with mesh:`` context), or None. Only ``axis_names``/``shape``
    are consumed — an AbstractMesh is fine."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and mesh.axis_names:
        return mesh
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.interpreters import pxla

        mesh = pxla.thread_resources.env.physical_mesh
    return None if mesh.empty else mesh


def mesh_axis_size(name: str) -> int:
    """Size of a named axis on the ambient mesh (1 if absent/no mesh)."""
    mesh = _ambient_mesh()
    if mesh is None or name not in mesh.axis_names:
        return 1
    return mesh.shape[name]


def seq_constraint(x: jax.Array, seq_dim: int = 1) -> jax.Array:
    """Constrain an activation's sequence dim onto the ``seq`` mesh axis.

    Sequence/context parallelism (SURVEY.md §2D SP/CP row): activations of
    shape (B, L, ...) get ``P(('data','fsdp'), 'seq')`` so the XLA SPMD
    partitioner splits all per-token work (norms, MLPs, residuals, the
    softmax over query rows) across the ``seq`` axis and inserts the K/V
    all-gathers attention needs — the all-gather flavor of context
    parallelism ("How to Scale Your Model"'s default recipe; the opt-in
    ring-attention path streams K/V over ppermute instead). No-op unless a
    mesh with a nontrivial ``seq`` axis is the ambient context, so the
    single-chip and DP/FSDP/TP paths compile byte-identically.
    """
    mesh = _ambient_mesh()
    if (mesh is None or "seq" not in mesh.axis_names
            or mesh.shape["seq"] == 1):
        return x
    if x.ndim <= seq_dim or x.shape[seq_dim] % mesh.shape["seq"] != 0:
        return x  # unshardable (e.g. single-token decode step)
    spec = [None] * x.ndim
    spec[0] = ("data", "fsdp")
    spec[seq_dim] = "seq"
    # Bare PartitionSpec: resolved against the ambient mesh context, which
    # the guard above just proved is active.
    return jax.lax.with_sharding_constraint(x, P(*spec))


def tick_constraint(x: jax.Array) -> jax.Array:
    """Constrain a pipeline microbatch TICK stack ``(T, rows, …)``: tick
    axis replicated, rows on the data-like axes.

    The tick stack is built by reshaping the batch-sharded input to
    ``(M, rows, …)`` — without a constraint XLA propagates part of the
    batch sharding onto the tick axis, and the per-tick dynamic-slice that
    feeds stage 0 inside the scan then needs an "involuntary full
    rematerialization" (replicate-then-reshard) every tick. No-op without
    an ambient mesh with a nontrivial ``pipe`` axis (matching
    ``pipe_constraint``'s gate, since the stack only exists on the
    pipelined path)."""
    mesh = _ambient_mesh()
    if (mesh is None or "pipe" not in mesh.axis_names
            or mesh.shape["pipe"] == 1):
        return x
    spec = [None] * x.ndim
    if x.ndim > 1:
        spec[1] = ("data", "fsdp")
    return jax.lax.with_sharding_constraint(x, P(*spec))


def pipe_constraint(x: jax.Array) -> jax.Array:
    """Constrain a per-stage buffer's leading dim onto the ``pipe`` axis.

    Pipeline state tensors are (S, microbatch_rows, ...): stage axis over
    ``pipe``, batch rows over the data-like axes. The tick loop's
    stage-shift (concatenate of a rolled slice) then lowers to a
    collective-permute between neighbouring stages. No-op without an
    ambient mesh with a nontrivial ``pipe`` axis.
    """
    mesh = _ambient_mesh()
    if (mesh is None or "pipe" not in mesh.axis_names
            or mesh.shape["pipe"] == 1):
        return x
    if x.shape[0] % mesh.shape["pipe"] != 0:
        return x
    spec = [None] * x.ndim
    spec[0] = "pipe"
    if x.ndim > 1:
        spec[1] = ("data", "fsdp")
    return jax.lax.with_sharding_constraint(x, P(*spec))


def expert_constraint(x: jax.Array) -> jax.Array:
    """Constrain a dispatched MoE buffer's leading (experts) dim onto the
    ``expert`` mesh axis.

    Dispatched tensors are ``(E, G, C, D)`` (ops/moe.py): experts over
    ``expert``, token groups over the data-like axes. With token
    activations sharded over data and expert weights over ``expert``, this
    constraint is where the XLA SPMD partitioner inserts the token
    exchange of expert parallelism (all-to-all, or all-gather + reduce
    where its cost model prefers). No-op without an ambient mesh with a
    nontrivial ``expert`` axis, so dense and single-chip paths compile
    byte-identically.
    """
    mesh = _ambient_mesh()
    if (mesh is None or "expert" not in mesh.axis_names
            or mesh.shape["expert"] == 1):
        return x
    if x.shape[0] % mesh.shape["expert"] != 0:
        return x
    spec = [None] * x.ndim
    spec[0] = "expert"
    if x.ndim > 1:
        spec[1] = ("data", "fsdp")
    return jax.lax.with_sharding_constraint(x, P(*spec))


def shard_batch_specs(batch_example: Any) -> Any:
    return jax.tree.map(lambda _: batch_spec(), batch_example)
