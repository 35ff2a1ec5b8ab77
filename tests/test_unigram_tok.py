"""Unigram-LM (SentencePiece-style) tokenizer tests."""

from __future__ import annotations

import math

import pytest

from document_ai_ray.stages.unigram_tok import seed_vocab, viterbi_segment


def test_seed_vocab_keeps_all_chars_and_caps_multis():
    wc = [("abc", 10), ("abd", 5), ("xy", 1)]
    v = seed_vocab(wc, seed_size=8, max_len=3)
    for ch in "abcdxy":
        assert ch in v  # single chars always kept
    multis = [p for p in v if len(p) > 1]
    assert len(multis) == 2  # capped to seed_size - n_chars
    assert v["ab"] == 15  # weighted by word frequency, top multi
    # tiny seed budget: chars survive even when it leaves no multi room
    v2 = seed_vocab(wc, seed_size=3, max_len=3)
    assert set(v2) == set("abcdxy")


def test_viterbi_prefers_probable_pieces():
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.5), "abc": math.log(0.05), "c": math.log(0.15)}
    assert viterbi_segment("ab", logp) == ["ab"]
    # 'abc' as one piece: log 0.05 = -3.0; 'ab'+'c': log .5 + log .15 = -2.59 -> split wins
    assert viterbi_segment("abc", logp) == ["ab", "c"]
    # chars guarantee feasibility
    assert viterbi_segment("ba", logp) == ["b", "a"]


@pytest.mark.usefixtures("ray_session")
def test_unigram_train_likelihood_and_vocab(sf_tiny):
    from document_ai_ray.pipelines.text_queries import _UT_VOCAB, _unigram_vocab

    logp, hist = _unigram_vocab(sf_tiny)
    # EM likelihood never decreases within a fixed-vocab stretch; the
    # FINAL vocab is at (or under) target + the single-char floor
    n_chars = sum(1 for p in logp if len(p) == 1)
    assert len(logp) <= max(_UT_VOCAB, n_chars) + n_chars
    # probabilities normalize
    assert abs(sum(math.exp(v) for v in logp.values()) - 1.0) < 1e-9
    # deterministic: retrain gives identical vocab
    logp2, _ = _unigram_vocab(sf_tiny)
    assert logp == logp2


@pytest.mark.usefixtures("ray_session")
def test_unigram_tokenize_roundtrip(sf_tiny):
    from document_ai_ray.pipelines.text_queries import unigram_tokenize_docs

    df = unigram_tokenize_docs(sf_tiny).to_pandas()
    assert df["roundtrip_ok"].all()
    assert (df["n_tokens"] >= 1).all()
    # pieces never exceed chars; multi-char pieces give real compression
    assert (df["n_tokens"] <= df["n_chars_tok"]).all()
    assert df["n_tokens"].sum() < 0.8 * df["n_chars_tok"].sum()


@pytest.mark.usefixtures("ray_session")
def test_seed_vocab_distributed_matches_driver_version():
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.unigram_tok import seed_vocab, seed_vocab_distributed

    wc = [("alpha", 7), ("alphabet", 3), ("beta", 5), ("bet", 2), ("x", 1)]
    ds = rd.from_arrow(
        pa.table({"word": [w for w, _ in wc], "n": [n for _, n in wc]})
    )
    assert seed_vocab_distributed(ds, seed_size=40) == seed_vocab(wc, seed_size=40)
    assert seed_vocab_distributed(ds, seed_size=12) == seed_vocab(wc, seed_size=12)
