"""Span (substring-window) dedup: stats + keep-first rebuild vs a
pure-Python reference model, edge cases, bucket-count invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.span_dedup import (
    dedup_spans_keep_first,
    dup_span_stats,
)

W = 4  # small window so tiny fixtures exercise real duplication


def _docs(texts):
    return rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )


def _ref_model(texts, window):
    """Reference: global window counts + first occurrence, per doc."""
    from collections import Counter

    wins = []  # (doc_id, k, win_text)
    for did, txt in enumerate(texts):
        toks = txt.split(" ")
        for k in range(len(toks) // window):
            wins.append((did, k, " ".join(toks[k * window : (k + 1) * window])))
    counts = Counter(w for _, _, w in wins)
    first = {}
    for did, k, w in sorted(wins):
        first.setdefault(w, (did, k))
    stats = {}
    for did, txt in enumerate(texts):
        mine = [(k, w) for d, k, w in wins if d == did]
        n = len(mine)
        dup = sum(1 for _, w in mine if counts[w] > 1)
        stats[did] = (n, dup)
    rebuilt = {}
    for did, txt in enumerate(texts):
        toks = txt.split(" ")
        nw = len(toks) // window
        parts = [
            " ".join(toks[k * window : (k + 1) * window])
            for k in range(nw)
            if first[" ".join(toks[k * window : (k + 1) * window])] == (did, k)
        ]
        tail = " ".join(toks[nw * window :])
        if tail:
            parts.append(tail)
        rebuilt[did] = " ".join(parts)
    return stats, rebuilt


def test_stats_known_corpus():
    texts = [
        "a b c d e f g h x",      # windows: 'a b c d', 'e f g h'; tail 'x'
        "a b c d q r s t",        # shares 'a b c d'
        "short",                  # zero windows
    ]
    out = {r["doc_id"]: r for r in dup_span_stats(_docs(texts), window=W).take_all()}
    assert out[0]["n_windows"] == 2 and out[0]["dup_windows"] == 1
    assert out[0]["dup_frac"] == 0.5
    assert out[1]["n_windows"] == 2 and out[1]["dup_windows"] == 1
    assert out[2]["n_windows"] == 0 and out[2]["dup_frac"] == 0.0


def test_keep_first_known_corpus():
    texts = [
        "a b c d e f g h x",
        "a b c d q r s t",
        "short",
    ]
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_spans_keep_first(_docs(texts), window=W).take_all()
    }
    assert out[0] == "a b c d e f g h x"          # first occurrence keeps all
    assert out[1] == "q r s t"                    # duplicated head removed
    assert out[2] == "short"                      # sub-window doc unchanged


def test_matches_reference_model_random():
    rng = np.random.RandomState(11)
    vocab = ["w%d" % i for i in range(12)]
    texts = []
    for _ in range(40):
        n = rng.randint(0, 20)
        texts.append(" ".join(rng.choice(vocab, n)))
    texts.append("")                               # empty doc
    texts.append("x  y")                           # double space -> empty token
    stats_ref, rebuilt_ref = _ref_model(texts, W)
    stats = {r["doc_id"]: r for r in dup_span_stats(_docs(texts), window=W).take_all()}
    assert len(stats) == len(texts)
    for did, (n, dup) in stats_ref.items():
        assert stats[did]["n_windows"] == n
        assert stats[did]["dup_windows"] == dup
    rebuilt = {
        r["doc_id"]: r["text"]
        for r in dedup_spans_keep_first(_docs(texts), window=W).take_all()
    }
    assert rebuilt == rebuilt_ref


def test_within_doc_repetition_counts_as_dup():
    texts = ["p q r s p q r s"]                   # same window twice in ONE doc
    s = dup_span_stats(_docs(texts), window=W).take_all()[0]
    assert s["n_windows"] == 2 and s["dup_windows"] == 2
    t = dedup_spans_keep_first(_docs(texts), window=W).take_all()[0]["text"]
    assert t == "p q r s"                          # second occurrence removed


def test_bucket_count_invariance(monkeypatch):
    import document_ai_ray.stages.span_dedup as sd

    texts = ["a b c d e f g h"] * 5 + ["u v w x y z q r"]
    base = sorted(
        (r["doc_id"], r["text"])
        for r in dedup_spans_keep_first(_docs(texts), window=W).take_all()
    )
    monkeypatch.setattr(sd, "auto_buckets", lambda n, **kw: 3)
    alt = sorted(
        (r["doc_id"], r["text"])
        for r in dedup_spans_keep_first(_docs(texts), window=W).take_all()
    )
    assert base == alt
