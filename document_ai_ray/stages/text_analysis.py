"""Text-analysis operators for training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and winnowing document fingerprints.  All are per-batch
vectorized-or-tight-loop functions intended for
``map_batches(batch_format="pyarrow")`` over the `documents` table or
extraction output.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from document_ai_ray.functions.hashing import simhash64, stable64, winnow_fingerprint
from document_ai_ray.functions.strings import bpe_tokens

STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the a an and of to in is was for on with as at by while over where "
        "about from that this it are be or not near across toward".split()
    ),
    "fr": frozenset(
        "le la les des du de un une et que qui dans sur par pour avec où est "
        "sont pendant vers ce cette il elle au aux".split()
    ),
    "de": frozenset(
        "der die das und ein eine einen zu von mit auf für ist sind über wo "
        "während nach bei dem den des im am".split()
    ),
    "es": frozenset(
        "el la los las un una y que de en es son por para con sobre donde "
        "mientras hacia del al se su".split()
    ),
    "it": frozenset(
        "il la le lo i gli un una e che di in è sono per con su dove mentre "
        "verso del della delle dei sopra".split()
    ),
}
_LANG_ORDER = sorted(STOPWORDS)  # deterministic tie-break order
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def langid_text(text: str) -> tuple[str, float]:
    """Heuristic language ID: per-language stopword hit rate over word
    tokens; deterministic tie-break by language code.  Returns
    ("und", 0.0) when no stopword hits at all."""
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang in _LANG_ORDER:
        sw = STOPWORDS[lang]
        hits = sum(1 for w in words if w in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, best_hits / len(words)


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds, scores = [], []
    for t in batch.column(text_col).to_pylist():
        lang, score = langid_text(t or "")
        preds.append(lang)
        scores.append(score)
    return batch.append_column("pred_lang", pa.array(preds, pa.string())).append_column(
        "lang_score", pa.array(scores, pa.float64())
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features: char/word counts, alpha & punct & stopword &
    whitespace ratios, mean word length, and a composite [0,1] score."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_words = np.zeros(n, np.int64)
    alpha_ratio = np.zeros(n, np.float64)
    punct_ratio = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    mean_wlen = np.zeros(n, np.float64)
    all_stops = frozenset().union(*STOPWORDS.values())
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        words = [w.lower() for w in _WORD_RE.findall(t)]
        n_words[i] = len(words)
        if t:
            alpha_ratio[i] = sum(c.isalpha() for c in t) / len(t)
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / len(t)
        if words:
            stop_ratio[i] = sum(1 for w in words if w in all_stops) / len(words)
            mean_wlen[i] = sum(map(len, words)) / len(words)
    # composite: reward alphaness + stopword presence + sane word length
    wlen_sane = np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0.0, 1.0)
    score = np.clip(
        0.4 * alpha_ratio + 0.3 * np.minimum(stop_ratio / 0.3, 1.0) + 0.3 * wlen_sane, 0.0, 1.0
    ) * (n_words >= 5)
    out = batch
    for name, arr, typ in [
        ("n_chars_q", n_chars, pa.int64()),
        ("n_words", n_words, pa.int64()),
        ("alpha_ratio", alpha_ratio, pa.float64()),
        ("punct_ratio", punct_ratio, pa.float64()),
        ("stopword_ratio", stop_ratio, pa.float64()),
        ("mean_word_len", mean_wlen, pa.float64()),
        ("quality_score", score.astype(np.float64), pa.float64()),
    ]:
        out = out.append_column(name, pa.array(arr, typ))
    return out


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count."""
    texts = batch.column(text_col).to_pylist()
    ws = pa.array([len((t or "").split()) for t in texts], pa.int64())
    bpe = pa.array([len(bpe_tokens(t or "")) for t in texts], pa.int64())
    return batch.append_column("n_ws_tokens", ws).append_column("n_bpe_tokens", bpe)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Winnowing fingerprints + 64-bit SimHash per document."""
    texts = batch.column(text_col).to_pylist()
    fps, shs = [], []
    for t in texts:
        toks = (t or "").split()
        th = np.array([stable64(w) for w in toks], dtype=np.uint64)
        fps.append(winnow_fingerprint(th))
        shs.append(simhash64(th))
    return batch.append_column(
        "fingerprint", pa.array(fps, pa.list_(pa.uint64()))
    ).append_column("simhash", pa.array(shs, pa.uint64()))


# ---------------------------------------------------------------------------
# Approximate distinct counting (KMV sketch) — the mergeable-sketch
# aggregate for cardinalities where exact COUNT(DISTINCT) would shuffle
# every distinct value (see functions/sketch.py).
# ---------------------------------------------------------------------------


def approx_distinct_ngrams_per_lang(ds, n: int = 3, k: int = 256):
    """documents(lang, text) -> (lang, approx_distinct, sketch_size):
    approximate number of distinct word n-grams per language.

    Partial per batch: one KMV sketch per lang (k smallest hashes of
    the n-grams seen).  Merge: two-level coalesced min-union of the
    sketches per lang — the same shuffle-free combiner shape as
    `ops.merge_partials`, with sketch-union instead of sum."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.functions.sketch import kmv_estimate, kmv_merge, kmv_sketch

    def grams(text: str):
        w = (text or "").split()
        for i in range(len(w) - n + 1):
            yield " ".join(w[i : i + n])

    def partial(t: pa.Table) -> pa.Table:
        by_lang: dict[str, list] = {}
        for lang, text in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
            by_lang.setdefault(lang, []).append(text)
        rows = []
        for lang, texts in by_lang.items():
            sk = kmv_sketch((g for tx in texts for g in grams(tx)), k=k)
            rows.append({"lang": lang, "sketch": sk.tobytes()})
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("lang", pa.string()), ("sketch", pa.binary())])
        )

    def merge(t: pa.Table) -> pa.Table:
        by_lang: dict[str, list] = {}
        for lang, sk in zip(t.column("lang").to_pylist(), t.column("sketch").to_pylist()):
            by_lang.setdefault(lang, []).append(np.frombuffer(sk, dtype=np.uint64))
        rows = [
            {"lang": lang, "sketch": kmv_merge(sks, k=k).tobytes()}
            for lang, sks in by_lang.items()
        ]
        return pa.Table.from_pylist(
            rows, schema=pa.schema([("lang", pa.string()), ("sketch", pa.binary())])
        )

    def finalize(t: pa.Table) -> pa.Table:
        import numpy as np

        rows = []
        for lang, sk in zip(t.column("lang").to_pylist(), t.column("sketch").to_pylist()):
            arr = np.frombuffer(sk, dtype=np.uint64)
            rows.append(
                {"lang": lang, "approx_distinct": float(kmv_estimate(arr, k=k)),
                 "sketch_size": len(arr)}
            )
        return pa.Table.from_pylist(rows)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.map_batches(merge, batch_format="pyarrow", batch_size=1 << 20)
    # repartition(1): exactly one final sketch-merge task (see
    # ops.merge_partials for why batch_size alone is not a guarantee)
    merged = merged.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    return merged.map_batches(finalize, batch_format="pyarrow")
