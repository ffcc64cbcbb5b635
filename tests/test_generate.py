"""Generation golden tests vs HF ``generate`` (the reference's inference
path, /root/reference/models/model.py:28 + visualization.ipynb cells 3-8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.checkpoint import convert_t5_lm
from klab_multimodalmodel_tpu.config import T5Size
from klab_multimodalmodel_tpu.infer import (beam_search_decode,
                                            greedy_decode)
from klab_multimodalmodel_tpu.models import T5ForConditionalGeneration

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
              num_heads=4, vocab_size=64, relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)


@pytest.fixture(autouse=True)
def _fp32_matmuls():
    """Token-exact HF differentials are knife-edge sensitive: on backends
    whose default matmul precision is bf16, ~0.5% logit noise can flip a
    near-tied beam cut with no product bug. Pin fp32 so these tests compare
    algorithms, not backend precision defaults."""
    import jax

    with jax.default_matmul_precision("float32"):
        yield


def _tiny_hf(tie_word_embeddings: bool = True, seed: int = 3):
    """The HF twin of TINY — one copy of the geometry (three tests and the
    module fixture previously each rebuilt it by hand)."""
    torch.manual_seed(seed)
    cfg = transformers.T5Config(
        vocab_size=TINY.vocab_size, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1,
        tie_word_embeddings=tie_word_embeddings)
    return transformers.T5ForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def hf_lm():
    return _tiny_hf()


@pytest.fixture(scope="module")
def setup(hf_lm):
    model = T5ForConditionalGeneration(TINY)
    params = convert_t5_lm(hf_lm.state_dict(), TINY)
    return model, params


def _encode_both(hf_lm, model, params, ids):
    with torch.no_grad():
        hf_enc = hf_lm.encoder(input_ids=torch.tensor(ids)).last_hidden_state
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    np.testing.assert_allclose(np.asarray(enc), hf_enc.numpy(), rtol=2e-4,
                               atol=2e-4)
    return enc


def test_greedy_matches_hf(hf_lm, setup, rng):
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    max_length = 12
    with torch.no_grad():
        ref = hf_lm.generate(input_ids=torch.tensor(ids),
                             max_length=max_length, num_beams=1,
                             do_sample=False).numpy()
    enc = _encode_both(hf_lm, model, params, ids)
    ours = np.asarray(greedy_decode(model, params, enc, None, max_length))
    # HF trims finished batches to the longest sequence; compare the
    # overlapping prefix and require pads after.
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)
    assert (ours[:, L:] == TINY.pad_token_id).all()


def test_greedy_incremental_equals_full_forward(setup, rng):
    """KV-cache decode must produce the same logits argmax chain as the
    non-cached teacher-forced forward (internal consistency)."""
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(2, 5))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    toks = np.asarray(greedy_decode(model, params, enc, None, 10))
    # re-score with the training decode path
    logits = model.apply({"params": params},
                         jnp.asarray(toks[:, :-1]), enc,
                         method=model.decode_train)
    next_tokens = np.asarray(jnp.argmax(logits, axis=-1))
    for b in range(toks.shape[0]):
        for t in range(toks.shape[1] - 1):
            tok = toks[b, t + 1]
            if tok == TINY.pad_token_id and toks[b, t] in (
                    TINY.pad_token_id, TINY.eos_token_id):
                break  # finished
            assert next_tokens[b, t] == tok, (b, t, toks[b], next_tokens[b])


def test_beam_search_matches_hf(hf_lm, setup, rng):
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(2, 6))
    max_length = 10
    with torch.no_grad():
        ref = hf_lm.generate(input_ids=torch.tensor(ids),
                             max_length=max_length, num_beams=3,
                             do_sample=False, length_penalty=1.0,
                             early_stopping=False).numpy()
    enc = _encode_both(hf_lm, model, params, ids)
    ours = np.asarray(beam_search_decode(model, params, enc, None,
                                         max_length, 3, 1.0))
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_beam_search_matches_hf_stress(hf_lm, setup, seed):
    """Stress sweep that catches cache-reorder bugs: longer horizons force
    beams to switch parents repeatedly, so stale KV caches diverge from HF
    within a few steps (round-1 bug: reorder applied to the layer axis of
    the scanned (layers, B*K, H, L, D) cache, i.e. never)."""
    model, params = setup
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    max_length = 16
    with torch.no_grad():
        ref = hf_lm.generate(input_ids=torch.tensor(ids),
                             max_length=max_length, num_beams=4,
                             do_sample=False, length_penalty=1.0,
                             early_stopping=False).numpy()
    enc = _encode_both(hf_lm, model, params, ids)
    ours = np.asarray(beam_search_decode(model, params, enc, None,
                                         max_length, 4, 1.0))
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)
    assert (ours[:, L:] == TINY.pad_token_id).all()


def test_beam_first_step_eos_hypothesis_kept():
    """Regression: a hypothesis that finishes AT the first expansion
    ([decoder_start, eos]) must be stored with its tokens, not just its
    score — an unseeded token store returned all-pad rows whenever that
    hypothesis won. Forces the case surgically: an untied lm_head whose
    eos row is aligned with the probed step-0 decoder hidden state, so
    row 0's first decode step argmaxes to eos; then requires token-exact
    agreement with HF beam search."""
    import dataclasses

    size = dataclasses.replace(TINY, tie_word_embeddings=False)
    hf = _tiny_hf(tie_word_embeddings=False)
    ids = np.random.default_rng(7).integers(2, size.vocab_size, size=(2, 6))
    with torch.no_grad():
        probe = hf(input_ids=torch.tensor(ids),
                   decoder_input_ids=torch.zeros((2, 1), dtype=torch.long),
                   output_hidden_states=True)
        h0 = probe.decoder_hidden_states[-1][0, 0]  # row 0, step 0 hidden
        hf.lm_head.weight[size.eos_token_id] = 40.0 * h0 / (h0 @ h0)
        out = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.zeros((2, 1), dtype=torch.long))
    assert int(out.logits[0, 0].argmax()) == size.eos_token_id

    max_length = 10
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids),
                          max_length=max_length, num_beams=4,
                          do_sample=False, length_penalty=1.0,
                          early_stopping=False).numpy()
    assert ref[0, 1] == size.eos_token_id, \
        "forced first-step-eos hypothesis no longer wins in HF"
    model = T5ForConditionalGeneration(size)
    params = convert_t5_lm(hf.state_dict(), size)
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    ours = np.asarray(beam_search_decode(model, params, enc, None,
                                         max_length, 4, 1.0))
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)
    assert (ours[:, L:] == size.pad_token_id).all()


def _canon_after_eos(arr, eos_id, pad_id):
    """Rewrite everything after a row's first eos to pad: HF's beam search
    fills finished rows with ``pad_token_id or eos_token_id`` — with T5's
    pad_token_id=0 that ``or`` picks EOS as filler, an HF formatting
    artifact its output trimming usually hides. Token choice up to and
    including eos is the semantics under test."""
    arr = arr.copy()
    for row in arr:
        hits = np.where(row[1:] == eos_id)[0]
        if len(hits):
            row[hits[0] + 2:] = pad_id
    return arr


@pytest.mark.parametrize("length_penalty", [0.0, 0.5, 2.0])
def test_beam_search_length_penalty_matches_hf(hf_lm, setup, length_penalty):
    """Non-unit length penalties exercise the normalization bookkeeping:
    HF divides by generated_len EXCLUDING the decoder-start token (an
    off-by-one here reorders which finished hypothesis wins whenever
    hypotheses of different lengths compete)."""
    model, params = setup
    rng = np.random.default_rng(11)
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    max_length = 14
    with torch.no_grad():
        ref = hf_lm.generate(input_ids=torch.tensor(ids),
                             max_length=max_length, num_beams=4,
                             do_sample=False, length_penalty=length_penalty,
                             early_stopping=False).numpy()
    enc = _encode_both(hf_lm, model, params, ids)
    ours = np.asarray(beam_search_decode(model, params, enc, None,
                                         max_length, 4, length_penalty))
    L = ref.shape[1]
    np.testing.assert_array_equal(
        _canon_after_eos(ours[:, :L], TINY.eos_token_id, TINY.pad_token_id),
        _canon_after_eos(ref, TINY.eos_token_id, TINY.pad_token_id))
    assert (ours[:, L:] == TINY.pad_token_id).all()


@pytest.mark.parametrize("seed,length_penalty",
                         [(1, 1.0),    # one row finishes mid-sequence
                          (5, 1.4),    # every row finishes early
                          (8, 1.0),    # first-step eos hypotheses win
                          (22, 0.6),   # mixed first-step + mid-sequence
                          (20, 0.6)])  # finishes under a <1 penalty
def test_beam_search_eos_heavy_matches_hf(seed, length_penalty):
    """EOS-prone models exercise the finished-hypothesis machinery on
    every step: the top-num-beams rank filter (lower-ranked eos candidates
    must NOT be stored), the running-beam refill from the 2K candidate
    pool, and the early-stop heuristic that freezes a row's store. The
    lm_head eos row is scaled so eos lands inside the top-K candidates
    mid-generation without always winning."""
    import dataclasses

    size = dataclasses.replace(TINY, tie_word_embeddings=False)
    hf = _tiny_hf(tie_word_embeddings=False, seed=100 + seed)
    with torch.no_grad():
        hf.lm_head.weight[size.eos_token_id] *= 3.0
    ids = np.random.default_rng(seed).integers(2, size.vocab_size,
                                               size=(3, 6))
    max_length = 16
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids),
                          max_length=max_length, num_beams=4,
                          do_sample=False, length_penalty=length_penalty,
                          early_stopping=False).numpy()
    # the setup only matters if some row actually finishes before the cap
    assert (ref == size.eos_token_id).any(), "eos boost too weak"
    model = T5ForConditionalGeneration(size)
    params = convert_t5_lm(hf.state_dict(), size)
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    ours = np.asarray(beam_search_decode(model, params, enc, None,
                                         max_length, 4, length_penalty))
    L = ref.shape[1]
    np.testing.assert_array_equal(
        _canon_after_eos(ours[:, :L], size.eos_token_id, size.pad_token_id),
        _canon_after_eos(ref, size.eos_token_id, size.pad_token_id))
    assert (ours[:, L:] == size.pad_token_id).all()


def test_greedy_handles_padded_encoder_mask(setup, rng):
    """Generation with a padded source: masked encoder positions must not
    influence the output (cross-attention kmask path in the decode loop)."""
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(2, 8))
    mask = np.ones((2, 8), np.int32)
    mask[:, 5:] = 0
    ids_garbage = ids.copy()
    ids_garbage[:, 5:] = 3  # different pad-region content
    enc_a = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                        attention_mask=jnp.asarray(mask),
                        method=model.encode)
    enc_b = model.apply({"params": params},
                        input_ids=jnp.asarray(ids_garbage),
                        attention_mask=jnp.asarray(mask),
                        method=model.encode)
    out_a = np.asarray(greedy_decode(model, params, enc_a,
                                     jnp.asarray(mask), 10))
    out_b = np.asarray(greedy_decode(model, params, enc_b,
                                     jnp.asarray(mask), 10))
    # masked positions may differ in hidden states, but generation that
    # attends through the mask must be identical
    np.testing.assert_array_equal(out_a, out_b)


def test_greedy_early_eos_pads_rest(setup, rng):
    """Rows that emit eos early are padded afterwards and decoding stops
    as soon as every row is finished (while_loop early exit)."""
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(4, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    out = np.asarray(greedy_decode(model, params, enc, None, 16))
    for row in out:
        eos_pos = np.where(row == TINY.eos_token_id)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == TINY.pad_token_id).all()


# ---------------------------------------------------------------------------
# Sampling (HF do_sample=True)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("temperature,top_k,top_p",
                         [(0.7, 0, 1.0),    # temperature only
                          (1.0, 5, 1.0),    # top-k only
                          (1.0, 0, 0.9),    # top-p only
                          (0.8, 7, 0.92),   # full chain
                          (1.3, 3, 0.5)])   # high temp, tight nucleus
def test_warp_logits_matches_hf_warpers(temperature, top_k, top_p):
    """warp_logits must reproduce HF's TemperatureLogitsWarper →
    TopKLogitsWarper → TopPLogitsWarper chain (the order
    GenerationMixin._get_logits_processor installs them): identical
    removed-token sets (-inf) and matching surviving logits."""
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper)

    from klab_multimodalmodel_tpu.infer import warp_logits

    rng = np.random.default_rng(17)
    logits = rng.normal(size=(4, 64)).astype(np.float32) * 2.0

    ref = torch.tensor(logits)
    if temperature != 1.0:
        ref = TemperatureLogitsWarper(temperature)(None, ref)
    if top_k:
        ref = TopKLogitsWarper(top_k)(None, ref)
    if top_p < 1.0:
        ref = TopPLogitsWarper(top_p)(None, ref)
    ref = ref.numpy()

    ours = np.asarray(warp_logits(jnp.asarray(logits), temperature, top_k,
                                  top_p))
    ref_removed = np.isneginf(ref)
    np.testing.assert_array_equal(np.isneginf(ours), ref_removed)
    np.testing.assert_allclose(ours[~ref_removed], ref[~ref_removed],
                               rtol=1e-6, atol=1e-6)


def test_sample_topk1_equals_greedy(setup, rng):
    """top_k=1 collapses the sampling distribution to the argmax, so the
    sampled sequence must equal greedy regardless of the rng."""
    from klab_multimodalmodel_tpu.infer import sample_decode

    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    ref = np.asarray(greedy_decode(model, params, enc, None, 12))
    for seed in (0, 7):
        ours = np.asarray(sample_decode(
            model, params, enc, None, 12, jax.random.PRNGKey(seed),
            1.0, 1, 1.0))
        np.testing.assert_array_equal(ours, ref)


def test_sample_deterministic_per_key_and_varies(setup, rng):
    from klab_multimodalmodel_tpu.infer import sample_decode

    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(4, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    a1 = np.asarray(sample_decode(model, params, enc, None, 14,
                                  jax.random.PRNGKey(3), 1.0, 0, 1.0))
    a2 = np.asarray(sample_decode(model, params, enc, None, 14,
                                  jax.random.PRNGKey(3), 1.0, 0, 1.0))
    np.testing.assert_array_equal(a1, a2)
    outs = [np.asarray(sample_decode(model, params, enc, None, 14,
                                     jax.random.PRNGKey(s), 1.0, 0, 1.0))
            for s in range(4, 8)]
    assert any(not np.array_equal(a1, o) for o in outs), \
        "4 different keys all produced identical samples"


def test_sample_tokens_stay_in_warped_support(setup, rng):
    """Every sampled token must come from the warped support: rescore each
    sampled prefix with the teacher-forced decoder, re-apply the warp, and
    require the chosen token's warped logit to be finite."""
    from klab_multimodalmodel_tpu.infer import sample_decode, warp_logits

    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    temperature, top_k, top_p = 0.9, 4, 0.8
    toks = np.asarray(sample_decode(model, params, enc, None, 12,
                                    jax.random.PRNGKey(11), temperature,
                                    top_k, top_p))
    logits = model.apply({"params": params}, jnp.asarray(toks[:, :-1]), enc,
                         method=model.decode_train)
    warped = np.asarray(warp_logits(logits, temperature, top_k, top_p))
    for b in range(toks.shape[0]):
        for t in range(toks.shape[1] - 1):
            tok = toks[b, t + 1]
            if tok == TINY.pad_token_id and toks[b, t] in (
                    TINY.pad_token_id, TINY.eos_token_id):
                break  # finished: pads are forced, not sampled
            assert np.isfinite(warped[b, t, tok]), (b, t, toks[b])


def test_sample_early_eos_pads_rest(setup, rng):
    from klab_multimodalmodel_tpu.infer import sample_decode

    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(4, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    out = np.asarray(sample_decode(model, params, enc, None, 16,
                                   jax.random.PRNGKey(5), 1.2, 0, 1.0))
    assert (out[:, 0] == TINY.decoder_start_token_id).all()
    for row in out:
        eos_pos = np.where(row == TINY.eos_token_id)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == TINY.pad_token_id).all()


def test_generate_rejects_sampled_beam_search(setup):
    from klab_multimodalmodel_tpu.infer import generate

    model, params = setup
    enc = jnp.zeros((1, 4, TINY.d_model))
    with pytest.raises(ValueError, match="beam-search sampling"):
        generate(model, params, enc, None, 10, num_beams=2, do_sample=True)


@pytest.mark.parametrize("min_length,rep_pen,ngram", [
    (6, 1.0, 0), (0, 1.7, 0), (0, 0.6, 0), (0, 1.0, 2), (0, 1.0, 3),
    (5, 1.3, 2),
])
def test_process_logits_matches_hf_processors(rng, min_length, rep_pen,
                                              ngram):
    """Bit-exact differential of :func:`process_logits` vs HF's processor
    classes on random fp32 scores and random prefixes, across prefix
    lengths (incl. too-short-for-ngram edges)."""
    from transformers.generation.logits_process import (
        LogitsProcessorList, MinLengthLogitsProcessor,
        NoRepeatNGramLogitsProcessor, RepetitionPenaltyLogitsProcessor)

    from klab_multimodalmodel_tpu.infer.generate import process_logits

    eos = 1
    chain = LogitsProcessorList()
    if rep_pen != 1.0:
        chain.append(RepetitionPenaltyLogitsProcessor(rep_pen))
    if ngram:
        chain.append(NoRepeatNGramLogitsProcessor(ngram))
    if min_length:
        chain.append(MinLengthLogitsProcessor(min_length, eos))

    B, V, L = 4, 17, 12
    for cur_len in (1, 2, 3, 7, L):
        step = cur_len - 1
        # Prefix with deliberate repeats so ngram bans actually fire.
        prefix = rng.integers(0, 5, size=(B, cur_len)).astype(np.int64)
        prefix[:, 0] = 0  # decoder start
        scores = rng.standard_normal((B, V)).astype(np.float32)
        ref = chain(torch.tensor(prefix), torch.tensor(scores)).numpy()

        buf = np.full((B, L), 0, np.int32)
        buf[:, :cur_len] = prefix
        ours = np.asarray(process_logits(
            jnp.asarray(scores), jnp.asarray(buf),
            jnp.asarray(step, jnp.int32), eos, min_length, rep_pen, ngram))
        np.testing.assert_array_equal(ours, ref, err_msg=f"cur_len={cur_len}")


@pytest.mark.parametrize("kwargs", [
    dict(min_length=8), dict(repetition_penalty=1.8),
    dict(no_repeat_ngram_size=2),
    dict(min_length=6, repetition_penalty=1.4, no_repeat_ngram_size=2),
])
def test_greedy_processors_match_hf(hf_lm, setup, rng, kwargs):
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(3, 6))
    max_length = 14
    with torch.no_grad():
        ref = hf_lm.generate(input_ids=torch.tensor(ids),
                             max_length=max_length, num_beams=1,
                             do_sample=False, **kwargs).numpy()
    enc = _encode_both(hf_lm, model, params, ids)
    ours = np.asarray(greedy_decode(
        model, params, enc, None, max_length,
        kwargs.get("min_length", 0), kwargs.get("repetition_penalty", 1.0),
        kwargs.get("no_repeat_ngram_size", 0)))
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)
    assert (ours[:, L:] == TINY.pad_token_id).all()


@pytest.mark.parametrize("kwargs", [
    dict(min_length=7), dict(repetition_penalty=1.5),
    dict(no_repeat_ngram_size=2),
    dict(min_length=5, no_repeat_ngram_size=2),
])
def test_beam_processors_match_hf(hf_lm, setup, rng, kwargs):
    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(2, 6))
    max_length = 12
    with torch.no_grad():
        ref = hf_lm.generate(input_ids=torch.tensor(ids),
                             max_length=max_length, num_beams=3,
                             do_sample=False, length_penalty=1.0,
                             early_stopping=False, **kwargs).numpy()
    enc = _encode_both(hf_lm, model, params, ids)
    ours = np.asarray(beam_search_decode(
        model, params, enc, None, max_length, 3, 1.0,
        kwargs.get("min_length", 0), kwargs.get("repetition_penalty", 1.0),
        kwargs.get("no_repeat_ngram_size", 0)))
    L = ref.shape[1]
    np.testing.assert_array_equal(ours[:, :L], ref)


def test_sample_processors_respected(setup, rng):
    """Sampled tokens must obey the processor constraints: no eos before
    min_length, and no repeated bigram anywhere in the output."""
    from klab_multimodalmodel_tpu.infer import sample_decode

    model, params = setup
    ids = rng.integers(2, TINY.vocab_size, size=(4, 6))
    enc = model.apply({"params": params}, input_ids=jnp.asarray(ids),
                      method=model.encode)
    min_length, ngram = 8, 2
    toks = np.asarray(sample_decode(model, params, enc, None, 16,
                                    jax.random.PRNGKey(7), 1.0, 0, 1.0,
                                    min_length, 1.0, ngram))
    for row in toks:
        eos_pos = np.where(row == TINY.eos_token_id)[0]
        if len(eos_pos):
            assert eos_pos[0] + 1 >= min_length, row
            gen = row[:eos_pos[0] + 1]
        else:
            gen = row
        bigrams = set()
        for t in range(len(gen) - 1):
            bg = (gen[t], gen[t + 1])
            assert bg not in bigrams, (row, bg)
            bigrams.add(bg)
