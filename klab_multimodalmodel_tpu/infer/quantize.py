"""Int8 weight-only quantization for the decode/serving path.

Decode at serving batch sizes is HBM-bound: every `decode_step` streams the
decoder's dense kernels and (for tied-vocab T5s) the full embedding matrix
through the MXU at trivial arithmetic intensity. Weight-only int8 halves
that traffic vs bf16 (4x vs the fp32 training layout) while activations,
accumulation, and every non-matmul op stay in the model's compute dtype —
the standard TPU serving recipe (weights are loop-invariant in the decode
``while_loop``, so they are read from HBM once per step at whatever width
they are stored).

Mechanics — exact by construction:
  * per-output-channel symmetric scales: ``W ≈ Q * s[None, :]`` with
    ``Q`` int8 and ``s = absmax(W, axis=in) / 127``. Since every T5 matmul
    is bias-free, ``x @ (Q * s) == (x @ Q) * s`` exactly — the dequant
    multiply rides on the (small) activations, never on the weights;
  * the int8 ``Q`` replaces ``kernel`` IN PLACE in the params pytree
    (same path, same shape — flax's shape check passes), and the scales
    live in a parallel ``qscale`` collection that
    :class:`models.t5.KlabDense` applies when bound and ignores otherwise,
    so training and fp inference paths are untouched;
  * optionally (``int8_head=True``) the tied LM head (``shared.attend``
    — the single largest per-step stream: vocab x d_model) gets a
    dedicated int8 copy + per-vocab-row scale in the same collection;
    the fp embedding stays for the lookup (a gather only reads the B
    rows it needs, so it costs nothing per step). Off by default: the
    per-step (rows, vocab) scale multiply erased the win at t5-base and
    regressed beam search (BASELINE.md int8 table).

No reference analogue (``/root/reference`` serves nothing); this is the
framework's own serving-performance surface, benched in
``tools/bench_decode.py`` (``KLAB_DECODE_INT8=1``) and BASELINE.md.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np


class QuantizedParams(NamedTuple):
    """Int8 transformer params + their dequant scales, as ONE pytree.

    Drop-in for the ``params`` argument of every ``infer/generate.py``
    entry point (they unpack it into the ``params``/``qscale`` apply
    collections), so quantization never changes a decode signature and
    jit sees an ordinary pytree argument.
    """

    params: Any
    qscale: Any

# Module names whose 'kernel' is quantized. Everything else (embeddings,
# RMSNorm scales, relative-position tables, MoE expert banks — those use
# einsum params, not KlabDense) stays in its stored dtype.
QUANT_KERNEL_MODULES = frozenset(
    {"q", "k", "v", "o", "wi", "wi_0", "wi_1", "wo", "lm_head"})


def quantize_kernel(kernel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(int8 Q, per-output-channel scale) for a (..., in, out) kernel.

    Symmetric absmax grid over the contraction (in) axis. All-zero columns
    get scale 1 (Q is zero there anyway).
    """
    w = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(w), axis=-2, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return q, scale.squeeze(-2).astype(np.float32)


def quantize_transformer_int8(params: Any,
                              int8_head: bool = False) -> tuple[Any, Any]:
    """Quantize a T5ForConditionalGeneration params tree.

    Returns ``(params_q, qscale)``: ``params_q`` is ``params`` with each
    eligible ``kernel`` replaced by its int8 grid (paths and shapes
    unchanged — scanned stacks keep their leading layer axis, which the
    ``qscale`` scan axis mirrors), and ``qscale`` is the parallel
    collection tree KlabDense / the tied head read at apply time.
    """

    def walk(node):
        if not isinstance(node, Mapping):
            return node, None
        out, scales = {}, {}
        for name, child in node.items():
            if (name in QUANT_KERNEL_MODULES and isinstance(child, dict)
                    and "kernel" in child and np.ndim(child["kernel"]) >= 2):
                q, s = quantize_kernel(child["kernel"])
                out[name] = {**child, "kernel": q}
                scales[name] = {"scale": s}
            else:
                sub, sub_scales = walk(child)
                out[name] = sub
                if sub_scales:
                    scales[name] = sub_scales
        return out, scales

    params_q, qscale = walk(dict(params))
    qscale = qscale or {}
    shared = params_q.get("shared")
    if int8_head and shared is not None and "embedding" in shared:
        # Tied head: int8 copy of E + per-row scale; rows are the head's
        # output channels (logits_v = s_v * (h @ Q_v)). E itself stays fp
        # for the lookup gather.
        emb = np.asarray(shared["embedding"], np.float32)  # (vocab, d)
        q, s = quantize_kernel(emb.T)  # scale over d (axis -2 of E^T)
        qscale["head_q"] = q.T.copy()  # (vocab, d) int8
        qscale["head_scale"] = s  # (vocab,)
    return params_q, qscale


def quantize_for_decode(transformer_params: Any,
                        cast_dtype=jnp.bfloat16,
                        int8_head: bool = False) -> QuantizedParams:
    """One-call serving conversion: int8 dense kernels, every remaining
    fp32 leaf (embedding/head, norms, relpos tables) cast to
    ``cast_dtype``. Returns the :class:`QuantizedParams` pytree the
    decode entry points accept in place of raw params.

    ``int8_head`` defaults OFF on measurement (BASELINE.md int8 table):
    the tied (vocab, d) LM head is the single largest per-step stream,
    but its int8 variant adds a per-step (rows, vocab) fp32 scale
    multiply that grows with beam width — at t5-base the fp-head config
    measured identical on greedy/batched decode (35.5 vs 35.7 ms p50)
    and turned beam-4 from a +14% regression into -8% vs fp. The int8
    head remains available for large-d_model serving where the saved
    head stream dominates the scale multiply."""
    import jax
    import jax.numpy as _jnp

    params_q, qscale = quantize_transformer_int8(transformer_params,
                                                 int8_head=int8_head)
    if cast_dtype is not None:
        params_q = cast_for_decode(params_q, cast_dtype)
    # quantize_transformer_int8 computes on host (numpy); committing the
    # tree to device HERE is load-bearing — numpy leaves passed to a jitted
    # decode would otherwise re-upload the full int8 tree (~130 MB at
    # t5-base: every kernel + the (vocab, d) head_q) on EVERY call.
    return jax.tree.map(_jnp.asarray, QuantizedParams(params_q, qscale))


def dequantize_kernel(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Inverse of :func:`quantize_kernel` (tests / export)."""
    return np.asarray(q, np.float32) * np.expand_dims(
        np.asarray(scale, np.float32), -2)


def cast_for_decode(params: Any, dtype=jnp.bfloat16) -> Any:
    """Cast remaining float params (embeddings, norms, relpos tables) for
    inference — frozen-weight-safe, same lever as ``KLAB_DECODE_BF16``."""
    import jax

    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
