"""Metric + end-to-end caption evaluation tests."""

import json

import numpy as np
import pytest

from klab_multimodalmodel_tpu.evaluation import (bleu, bleu_n, cider_d,
                                                 ptb_tokenize, rouge_l,
                                                 simple_tokenize)


def test_tokenize():
    assert simple_tokenize("A man, with a RED helmet!") == [
        "a", "man", "with", "a", "red", "helmet"]


def test_ptb_tokenize_official_semantics():
    """Canonical PTB behaviors + the pycocoevalcap punctuation removal:
    contractions split (so "man's" scores as `man 's`, not `mans`),
    possessives kept, punctuation tokens dropped. Brackets normalize to
    -LRB-/-RRB- and are KEPT (lowercased): the official pipeline lowercases
    before filtering against its uppercase PUNCTUATIONS list, so `-lrb-`
    never matches an entry."""
    assert ptb_tokenize("A man's dog.") == ["a", "man", "'s", "dog"]
    assert ptb_tokenize("They'll save and invest more.") == [
        "they", "'ll", "save", "and", "invest", "more"]
    assert ptb_tokenize("I can't swim; he cannot either!") == [
        "i", "ca", "n't", "swim", "he", "can", "not", "either"]
    assert ptb_tokenize("Good muffins cost $3.88 in New York.") == [
        "good", "muffins", "cost", "$", "3.88", "in", "new", "york"]
    # Brackets: lowercased -lrb-/-rrb- escape the uppercase removal list
    # (official pycocoevalcap behavior); U.S. keeps its periods.
    assert ptb_tokenize('He said, "hi (there)" to the U.S. crowd...') == [
        "he", "said", "hi", "-lrb-", "there", "-rrb-", "to", "the",
        "u.s.", "crowd"]
    assert ptb_tokenize("a dog {brown} [spotted]") == [
        "a", "dog", "-lcb-", "brown", "-rcb-", "-lsb-", "spotted", "-rsb-"]
    assert ptb_tokenize("a red--blue sign: nice?") == [
        "a", "red", "blue", "sign", "nice"]


def test_ptb_rules_match_nltk_treebank():
    """The rule set is the canonical Treebank sed-script port — cross-check
    the raw tokenization (before lowercase/punct removal) against NLTK's
    TreebankWordTokenizer on caption-like text."""
    nltk = pytest.importorskip("nltk")
    from klab_multimodalmodel_tpu.evaluation.metrics import _treebank_tokens

    tk = nltk.tokenize.TreebankWordTokenizer()
    corpus = [
        "A man with a red helmet on a small moped on a dirt road.",
        "They'll save and invest more.",
        "hi, my name can't hello,",
        'He said, "There is a cat." Really?',
        "Good muffins cost $3.88 in New York.",
        "two dogs -- one black, one white -- run; they're fast!",
        "the dog's bone (a big one) ...",
    ]
    for text in corpus:
        assert _treebank_tokens(text) == tk.tokenize(
            text, convert_parentheses=True), text


def test_cider_identical_candidate_scores_exactly_ten():
    """Worked-example golden: with every candidate equal to its single
    reference and disjoint vocab across images, every n-gram cosine is 1,
    the length gaussian is e^0, and CIDEr-D = 10 exactly."""
    refs = [["a dog jumps over the fence"],
            ["red boats float in the calm harbor"]]
    cands = [r[0] for r in refs]
    assert cider_d(cands, refs) == pytest.approx(10.0, abs=1e-9)


def test_cider_perfect_match_scores_high():
    refs = [["a dog jumps over the fence"],
            ["a man rides a red moped down the road"]]
    cands = [r[0] for r in refs]
    score = cider_d(cands, refs)
    assert score > 5.0  # perfect match saturates near 10


def test_cider_orders_quality():
    # idf needs a multi-image corpus (log N and df are corpus statistics);
    # image 0 is the one under test, the rest provide document frequency.
    base_refs = [["a cat sleeps on a warm chair"],
                 ["two boats float in the harbor"],
                 ["children play football in the park"],
                 ["a plate of pasta on a table"]]
    refs = [["a dog jumps over the fence",
             "the dog leaps over a fence"]] + base_refs
    others = ["a cat sleeps on a warm chair",
              "two boats float in the harbor",
              "children play football in the park",
              "a plate of pasta on a table"]

    def score_first(cand):
        return cider_d([cand] + others, refs)

    s_good = score_first("a dog jumps over the fence")
    s_partial = score_first("a dog sits near the fence")
    s_bad = score_first("purple elephants fly backwards")
    assert s_good > s_partial > s_bad


def test_bleu_basics():
    refs = [["the cat sits on the mat"]]
    assert bleu(["the cat sits on the mat"], refs) == pytest.approx(1.0)
    # Zero overlap: tiny-smoothed (pycocoevalcap bleu_scorer.py), not a
    # hard 0.0 — the score is epsilon-scale but nonzero.
    s0 = bleu(["dog"], refs)
    assert 0.0 < s0 < 1e-6
    # partial overlap in (0, 1)
    s = bleu(["the cat sits on a mat"], refs)
    assert s0 < s < 1.0


def test_bleu_n_cumulative_tuple():
    """bleu_n is the pycocoevalcap four-tuple: cumulative, monotonically
    non-increasing in n, with BLEU-4 equal to the single-value bleu()."""
    cands = ["a cat sits on a mat", "a dog runs in the park"]
    refs = [["the cat sits on the mat", "a cat is on a mat"],
            ["a dog runs through a park"]]
    scores = bleu_n(cands, refs)
    assert len(scores) == 4
    assert all(scores[i] >= scores[i + 1] for i in range(3))
    assert scores[3] == pytest.approx(bleu(cands, refs))
    assert 0.0 < scores[0] <= 1.0


def test_rouge_l_hand_computed():
    """Official pycocoevalcap rouge.py semantics on a worked example.

    cand = "a cat sat on the mat" (6 tokens)
    ref1 = "the cat sat on the mat" (6): LCS=5  -> P=5/6, R=5/6
    ref2 = "a cat was on a red mat" (7): LCS=4 -> P=4/6, R=4/7
    prec_max=5/6, rec_max=5/6 (both from ref1); beta=1.2 F = 5/6 exactly
    (P == R makes the F-measure collapse to that value)."""
    score = rouge_l(["a cat sat on the mat"],
                    [["the cat sat on the mat", "a cat was on a red mat"]],
                    tokenizer=simple_tokenize)
    assert score == pytest.approx(5 / 6, abs=1e-12)
    # Asymmetric P/R case: candidate "a b" vs refs "a b c d" (LCS=2 ->
    # P=1, R=1/2) and "a q" (LCS=1 -> P=1/2, R=1/2): prec_max=1,
    # rec_max=1/2; beta=1.2 F = (1+1.44)*1*0.5 / (0.5 + 1.44*1) ~ 0.629
    # — NOT the harmonic mean (0.667), pinning the beta weighting.
    beta = 1.2
    expected = (1 + beta**2) * 1.0 * 0.5 / (0.5 + beta**2 * 1.0)
    score = rouge_l(["a b"], [["a b c d", "a q"]],
                    tokenizer=simple_tokenize)
    assert score == pytest.approx(expected, abs=1e-12)


def test_rouge_l_bounds_and_edges():
    refs = [["the cat sits on the mat"]]
    assert rouge_l(["the cat sits on the mat"], refs) == pytest.approx(1.0)
    assert rouge_l(["dog"], refs) == 0.0  # no common subsequence
    assert rouge_l([""], refs) == 0.0     # empty candidate guard
    assert rouge_l([], []) == 0.0
    # corpus score is the mean of per-image scores
    two = rouge_l(["the cat sits on the mat", "dog"], refs * 2)
    assert two == pytest.approx(0.5)


def test_rouge_l_lcs_against_independent_dp():
    """_lcs_len (rolling-row DP) vs a naive full-matrix DP written here
    from the recurrence, over random token sequences."""
    from klab_multimodalmodel_tpu.evaluation.metrics import _lcs_len

    def naive_lcs(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = (m[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                           else max(m[i - 1][j], m[i][j - 1]))
        return m[-1][-1]

    rng = np.random.default_rng(7)
    vocab = list("abcdefg")
    for _ in range(50):
        a = [vocab[i] for i in rng.integers(0, len(vocab),
                                            rng.integers(0, 12))]
        b = [vocab[i] for i in rng.integers(0, len(vocab),
                                            rng.integers(0, 12))]
        assert _lcs_len(a, b) == naive_lcs(a, b), (a, b)


@pytest.mark.slow
def test_evaluate_captions_end_to_end(tmp_path, rng):
    """Random-init micro model captions a 2-image synthetic val set."""
    from PIL import Image

    import jax

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.evaluation import evaluate_captions
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    # micro sizes registered by test_train import-time side effects are not
    # guaranteed; register here explicitly
    from klab_multimodalmodel_tpu.config import (SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    register_t5_size("t5-eval-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-eval-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))

    cfg = Config(language_model_name="t5-eval-micro",
                 transformer_model_name="t5-eval-micro",
                 image_model_name="swin-eval-micro",
                 max_source_length=48, generate_max_length=8,
                 compute_dtype="float32", scan_unroll=1,
                 result_dir=str(tmp_path / "results"))
    paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.jpg"
        Image.new("RGB", (40, 40), color=(i * 100, 20, 30)).save(p)
        paths.append(str(p))
    refs = [["a red square"], ["a dark square on a wall"]]

    tok = ByteTokenizer()
    model = MultiModalModel(cfg)
    imgs = np.zeros((1, 32, 32, 3), np.uint8)
    params = model.init(jax.random.PRNGKey(0), imgs.astype(np.float32),
                        np.zeros((1, 48), np.int32),
                        np.zeros((1, 4), np.int32))["params"]
    metrics = evaluate_captions(cfg, params, tok, paths, refs, batch_size=2)
    assert metrics["num_images"] == 2
    assert np.isfinite(metrics["CIDEr-D"])
    assert "prediction" in metrics["sample"]


@pytest.mark.slow
def test_caption_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """klab-caption (cli.caption_main): trained run dir + image files ->
    one tab-separated `path\\tcaption` line per image, through checkpoint
    restore, host image decode/resize, and the generate path."""
    import sys

    from PIL import Image

    from klab_multimodalmodel_tpu import cli
    from test_train import micro_config  # registers micro sizes
    from klab_multimodalmodel_tpu.train import train

    cfg = micro_config(tmp_path, num_epochs=1)
    train(cfg)

    img = tmp_path / "img.png"
    Image.new("RGB", (60, 44), color=(120, 40, 200)).save(img)
    monkeypatch.setattr(sys, "argv", [
        "klab-caption", str(img), str(img),
        "--result_dir", cfg.result_dir, "--max_length", "6"])
    cli.caption_main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if "\t" in ln]
    assert len(lines) == 2
    assert all(ln.split("\t")[0] == str(img) for ln in lines)


def test_captioner_source_bucketing_token_identical(tmp_path, rng):
    """bucket_source trims only masked pad columns, so the generated
    tokens match the full-width run exactly (same model, same seed)."""
    import jax

    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.infer.captioner import Captioner
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    from klab_multimodalmodel_tpu.config import (SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    register_t5_size("t5-bucket-micro", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=1, num_decoder_layers=1,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-bucket-micro", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))
    cfg = Config(language_model_name="t5-bucket-micro",
                 transformer_model_name="t5-bucket-micro",
                 image_model_name="swin-bucket-micro",
                 max_source_length=128, generate_max_length=8,
                 compute_dtype="float32", scan_unroll=1,
                 result_dir=str(tmp_path / "r"))
    tok = ByteTokenizer()
    model = MultiModalModel(cfg)
    imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32),
        np.zeros((1, cfg.max_source_length), np.int32),
        np.zeros((1, 4), np.int32))["params"]

    full = Captioner(cfg, params, tok, bucket_source=False).caption(imgs)
    bucketed = Captioner(cfg, params, tok, bucket_source=True).caption(imgs)
    assert bucketed == full


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """klab-eval (cli.eval_main): trained run dir + a 2-image COCO-layout
    val set -> CIDEr-D/BLEU/ROUGE-L json on stdout AND metrics.json in the
    run dir — through checkpoint restore, the COCO annotation index, host
    decode/resize, and the generate path (the one console entry COVERAGE.md
    listed untested in r3)."""
    import sys

    from PIL import Image

    from klab_multimodalmodel_tpu import cli
    from test_train import micro_config  # registers micro sizes
    from klab_multimodalmodel_tpu.train import train

    cfg = micro_config(tmp_path, num_epochs=1, generate_max_length=6)
    train(cfg)

    # Minimal COCO val2017 layout (data/coco.py index schema).
    coco_dir = tmp_path / "coco"
    img_dir = coco_dir / "val2017"
    img_dir.mkdir(parents=True)
    (coco_dir / "annotations").mkdir()
    for i in (1, 2):
        Image.new("RGB", (48, 36), color=(40 * i, 80, 120)).save(
            img_dir / f"{i:012d}.jpg")
    anno = {
        "images": [{"id": i, "file_name": f"{i:012d}.jpg"} for i in (1, 2)],
        "annotations": [
            {"id": 10, "image_id": 1, "caption": "a blue wall"},
            {"id": 11, "image_id": 1, "caption": "a plain blue surface"},
            {"id": 20, "image_id": 2, "caption": "a teal wall"},
        ],
    }
    with open(coco_dir / "annotations" / "captions_val2017.json", "w") as f:
        json.dump(anno, f)

    monkeypatch.setattr(sys, "argv", [
        "klab-eval", "--result_dir", cfg.result_dir,
        "--data_dir", str(coco_dir), "--limit", "2"])
    cli.eval_main()
    out = json.loads(capsys.readouterr().out)
    for key in ("CIDEr-D", "BLEU-1", "BLEU-4", "ROUGE-L", "num_images"):
        assert key in out, f"missing {key}: {sorted(out)}"
    assert out["num_images"] == 2
    assert all(np.isfinite(out[k]) for k in
               ("CIDEr-D", "BLEU-1", "BLEU-4", "ROUGE-L"))

    import os

    with open(os.path.join(cfg.result_dir, "metrics.json")) as f:
        assert json.load(f) == out
