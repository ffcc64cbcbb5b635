"""Continuous-batching decode engine (infer/engine.py) parity tests.

The invariant everything here pins: a request decoded through the resident
slot batch — inserted at an arbitrary time, next to strangers at other
positions, into a recycled slot — produces tokens BIT-IDENTICAL to a lone
``greedy_decode`` call on the same encoder rows (which test_generate.py in
turn pins token-exact against HF)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.infer import greedy_decode
from klab_multimodalmodel_tpu.infer.engine import DecodeEngine
from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration

TINY = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
              num_heads=4, vocab_size=64, relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)

SRC_W = 6
MAX_LEN = 12


@pytest.fixture(scope="module")
def setup():
    model = T5ForConditionalGeneration(TINY)
    ids = np.ones((2, SRC_W), np.int32)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        labels=ids)["params"]
    return model, params


def _requests(model, params, rng, n, widths=None):
    """n single-row requests: (enc, mask, reference greedy tokens)."""
    out = []
    for i in range(n):
        ids = rng.integers(2, TINY.vocab_size, size=(1, SRC_W)).astype(
            np.int32)
        # Trailing pads exercise the mask path (each request its own count).
        n_pad = int(rng.integers(0, 3)) if widths is None else widths[i]
        mask = np.ones((1, SRC_W), np.int32)
        if n_pad:
            ids[:, SRC_W - n_pad:] = 0
            mask[:, SRC_W - n_pad:] = 0
        enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                          attention_mask=jnp.asarray(mask),
                          method=model.encode)
        ref = np.asarray(greedy_decode(model, params, enc,
                                       jnp.asarray(mask), MAX_LEN))
        out.append((enc, jnp.asarray(mask), ref))
    return out


def _drain(engine, results, deadline=200):
    for _ in range(deadline):
        if not engine.has_live():
            return
        engine.tick()
        for tag, row, n_valid in engine.reap():
            results[tag] = (row, n_valid)
    raise AssertionError("engine did not drain")


def test_engine_single_request_matches_greedy(setup, rng):
    model, params = setup
    (enc, mask, ref), = _requests(model, params, rng, 1)
    engine = DecodeEngine(model, params, slots=3, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=2,
                          enc_dtype=enc.dtype)
    pre = engine.prefill(enc, mask)
    engine.insert(pre, enc, mask, 0, tag="r0")
    results = {}
    _drain(engine, results)
    row, n_valid = results["r0"]
    np.testing.assert_array_equal(row, ref[0])


def test_engine_staggered_arrivals_match_greedy(setup, rng):
    """Requests join mid-flight: rows at different decode positions share
    the batch; every row still bit-matches its lone greedy decode."""
    model, params = setup
    reqs = _requests(model, params, rng, 5)
    engine = DecodeEngine(model, params, slots=3, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=2,
                          enc_dtype=reqs[0][0].dtype)
    results = {}

    def admit(i):
        enc, mask, _ = reqs[i]
        pre = engine.prefill(enc, mask)
        engine.insert(pre, enc, mask, 0, tag=i)

    admit(0)
    admit(1)
    engine.tick()                       # rows 0/1 now 2 tokens ahead
    for t, r, n in engine.reap():
        results[t] = (r, n)
    admit(2)                            # joins while 0/1 are mid-decode
    for _ in range(300):
        if not engine.has_live() and len(results) == len(reqs):
            break
        if engine.free_slots() and len(results) + sum(
                engine.active) < len(reqs):
            # Admit the next not-yet-admitted request when a slot frees
            # (slot recycling: request 3/4 reuse reaped slots).
            admitted = len(results) + int(engine.active.sum())
            if admitted < len(reqs):
                admit(admitted)
        engine.tick()
        for t, r, n in engine.reap():
            results[t] = (r, n)
    assert len(results) == len(reqs)
    for i, (_, _, ref) in enumerate(reqs):
        np.testing.assert_array_equal(
            results[i][0], ref[0],
            err_msg=f"request {i} diverged from its lone greedy decode")


def test_engine_reap_insert_reap_without_tick(setup, rng):
    """A slot freed by reap and refilled by insert must NOT be reaped
    again before the next tick: the last tick's packed flags describe the
    previous occupant (insert drops the slot from the flags-active
    snapshot). The recycled request then decodes to its own greedy tokens."""
    model, params = setup
    reqs = _requests(model, params, rng, 2)
    # max_length 2: the first request completes at the very first tick,
    # guaranteeing reap frees its slot immediately.
    engine = DecodeEngine(model, params, slots=1, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=2,
                          enc_dtype=reqs[0][0].dtype)
    enc, mask, _ = reqs[0]
    pre = engine.prefill(enc, mask)
    engine.insert(pre, enc, mask, 0, tag=0, max_length=2)
    engine.tick()
    reaped = engine.reap()
    assert [t for t, _, _ in reaped] == [0]
    assert engine.free_slots() == 1
    # Refill the same slot (same small max_length, so the STALE flag row —
    # steps=1 from the old occupant — would satisfy steps >= row_max-1 and
    # free the new request instantly if insert kept the slot in the flags
    # snapshot); reap again WITHOUT an intervening tick.
    enc, mask, ref = reqs[1]
    pre = engine.prefill(enc, mask)
    engine.insert(pre, enc, mask, 0, tag=1, max_length=2)
    assert engine.reap() == []
    assert engine.has_live()
    results = {}
    _drain(engine, results)
    row, n_valid = results[1]
    assert n_valid == 2
    np.testing.assert_array_equal(row[:n_valid], ref[0][:n_valid])


def test_engine_batched_prefill_rows(setup, rng):
    """One prefill batch, several rows inserted into different slots."""
    model, params = setup
    reqs = _requests(model, params, rng, 3, widths=[0, 1, 2])
    enc = jnp.concatenate([r[0] for r in reqs], axis=0)
    mask = jnp.concatenate([r[1] for r in reqs], axis=0)
    engine = DecodeEngine(model, params, slots=4, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=3,
                          enc_dtype=enc.dtype)
    pre = engine.prefill(enc, mask)
    for j in range(3):
        engine.insert(pre, enc, mask, j, tag=j)
    results = {}
    _drain(engine, results)
    for i, (_, _, ref) in enumerate(reqs):
        np.testing.assert_array_equal(results[i][0], ref[0])


def test_engine_per_row_max_length(setup, rng):
    """A slot's own max_length (< engine buffer) reaps early and matches
    greedy_decode at that max_length on the written prefix."""
    model, params = setup
    (enc, mask, _), = _requests(model, params, rng, 1, widths=[0])
    short = 6
    ref_short = np.asarray(greedy_decode(model, params, enc, mask, short))
    engine = DecodeEngine(model, params, slots=2, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=4,
                          enc_dtype=enc.dtype)
    pre = engine.prefill(enc, mask)
    engine.insert(pre, enc, mask, 0, tag="s", max_length=short)
    results = {}
    _drain(engine, results)
    row, n_valid = results["s"]
    assert n_valid <= short
    np.testing.assert_array_equal(row[:short], ref_short[0])
    # Positions past the request's budget stay pad.
    assert (row[short:] == model.size.pad_token_id).all()


def test_engine_int8_params_match_int8_greedy(setup, rng):
    """The engine accepts QuantizedParams (serve --continuous --int8):
    slot decode bit-matches the monolithic int8 greedy loop."""
    from klab_multimodalmodel_tpu.infer.quantize import quantize_for_decode

    model, params = setup
    qp = quantize_for_decode(params)
    (enc, mask, _), = _requests(model, params, rng, 1)
    ref = np.asarray(greedy_decode(model, qp, enc, mask, MAX_LEN))
    engine = DecodeEngine(model, qp, slots=2, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=3,
                          enc_dtype=enc.dtype)
    pre = engine.prefill(enc, mask)
    engine.insert(pre, enc, mask, 0, tag="q")
    results = {}
    _drain(engine, results)
    np.testing.assert_array_equal(results["q"][0], ref[0])


def test_engine_insert_rejects_bad_width_and_max(setup, rng):
    model, params = setup
    (enc, mask, _), = _requests(model, params, rng, 1)
    engine = DecodeEngine(model, params, slots=2, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN,
                          enc_dtype=enc.dtype)
    with pytest.raises(ValueError, match="source width"):
        engine.prefill(enc[:, :4], mask[:, :4])
    pre = engine.prefill(enc, mask)
    with pytest.raises(ValueError, match="max_length"):
        engine.insert(pre, enc, mask, 0, tag=0, max_length=MAX_LEN + 1)


def _sample_requests(model, params, rng, n, warper):
    """n single-row sampled requests: (enc, mask, key, reference tokens
    from a lone B=1 sample_decode with that key)."""
    from klab_multimodalmodel_tpu.infer import sample_decode

    t, k, p = warper
    out = []
    for i in range(n):
        ids = rng.integers(2, TINY.vocab_size, size=(1, SRC_W)).astype(
            np.int32)
        n_pad = int(rng.integers(0, 3))
        mask = np.ones((1, SRC_W), np.int32)
        if n_pad:
            ids[:, SRC_W - n_pad:] = 0
            mask[:, SRC_W - n_pad:] = 0
        enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                          attention_mask=jnp.asarray(mask),
                          method=model.encode)
        key = jax.random.key(100 + i)
        ref = np.asarray(sample_decode(model, params, enc,
                                       jnp.asarray(mask), MAX_LEN, key,
                                       temperature=t, top_k=k, top_p=p))
        out.append((enc, jnp.asarray(mask), key, ref))
    return out


def test_engine_sampling_matches_per_request_sample_decode(setup, rng):
    """Sampled rows decoded through shared ticks — staggered arrivals,
    recycled slots — bit-match a lone B=1 ``sample_decode`` with the same
    key: each slot draws from its request's own stream at its own absolute
    step, unaffected by batch-mates (VERDICT r3 item 5)."""
    model, params = setup
    warper = (0.8, 5, 0.9)
    reqs = _sample_requests(model, params, rng, 5, warper)
    engine = DecodeEngine(model, params, slots=3, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=2,
                          enc_dtype=reqs[0][0].dtype, do_sample=True,
                          temperature=warper[0], top_k=warper[1],
                          top_p=warper[2])
    results = {}

    def admit(i):
        enc, mask, key, _ = reqs[i]
        pre = engine.prefill(enc, mask, rngs=key[None])
        engine.insert(pre, enc, mask, 0, tag=i, rng=key)

    admit(0)
    admit(1)
    engine.tick()                     # rows 0/1 advance before 2 arrives
    for t, r, n in engine.reap():
        results[t] = (r, n)
    admit(2)
    _drain(engine, results)
    admit(3)                          # recycled slots
    admit(4)
    _drain(engine, results)
    assert sorted(results) == [0, 1, 2, 3, 4]
    for i, (_, _, _, ref) in enumerate(reqs):
        row, _ = results[i]
        np.testing.assert_array_equal(row, ref[0], err_msg=f"request {i}")


def test_engine_sampling_batched_prefill_rows(setup, rng):
    """A W-row arrival batch prefilled with per-arrival keys: each inserted
    row still matches its own B=1 sample_decode (token 1 — drawn inside
    the batched prefill — included)."""
    model, params = setup
    warper = (1.0, 0, 1.0)            # pure ancestral sampling
    reqs = _sample_requests(model, params, rng, 3, warper)
    engine = DecodeEngine(model, params, slots=4, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=3,
                          enc_dtype=reqs[0][0].dtype, do_sample=True)
    enc = jnp.concatenate([r[0] for r in reqs], axis=0)
    mask = jnp.concatenate([r[1] for r in reqs], axis=0)
    keys = jnp.concatenate([r[2][None] for r in reqs], axis=0)
    pre = engine.prefill(enc, mask, rngs=keys)
    for j in range(3):
        engine.insert(pre, enc, mask, j, tag=j, rng=keys[j])
    results = {}
    _drain(engine, results)
    for i, (_, _, _, ref) in enumerate(reqs):
        row, _ = results[i]
        np.testing.assert_array_equal(row, ref[0], err_msg=f"request {i}")


def test_engine_sampling_accepts_legacy_uint32_keys(setup, rng):
    """Old-style (2,)-uint32 PRNGKeys are normalized at the engine
    boundary (ADVICE r4): the same raw key words draw the identical token
    stream as typed keys, and malformed keys fail with a clear message
    instead of a shape error inside the jitted insert."""
    model, params = setup
    reqs = _sample_requests(model, params, rng, 2, (1.0, 0, 1.0))
    engine = DecodeEngine(model, params, slots=3, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN, chunk=2,
                          enc_dtype=reqs[0][0].dtype, do_sample=True)
    enc = jnp.concatenate([r[0] for r in reqs], axis=0)
    mask = jnp.concatenate([r[1] for r in reqs], axis=0)
    typed = jnp.concatenate([r[2][None] for r in reqs], axis=0)
    legacy = jax.random.key_data(typed)          # (2, 2) uint32
    assert legacy.dtype == jnp.uint32
    pre = engine.prefill(enc, mask, rngs=legacy)
    for j in range(2):
        engine.insert(pre, enc, mask, j, tag=j, rng=legacy[j])
    results = {}
    _drain(engine, results)
    for i, (_, _, _, ref) in enumerate(reqs):
        np.testing.assert_array_equal(results[i][0], ref[0],
                                      err_msg=f"request {i}")
    with pytest.raises(ValueError, match="typed"):
        engine.prefill(enc, mask, rngs=jnp.zeros((2, 3), jnp.float32))


def test_engine_sampling_prefill_requires_keys(setup, rng):
    model, params = setup
    (enc, mask, _, _), = _sample_requests(model, params, rng, 1,
                                          (1.0, 0, 1.0))
    engine = DecodeEngine(model, params, slots=2, source_width=SRC_W,
                          d_model=TINY.d_model, max_length=MAX_LEN,
                          enc_dtype=enc.dtype, do_sample=True)
    with pytest.raises(ValueError, match="rngs"):
        engine.prefill(enc, mask)
