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


# word -> tuple of languages whose stopword list contains it: one dict
# probe per word instead of one set probe per word per language
_SW_LANGS: dict[str, tuple[str, ...]] = {}
for _lang in _LANG_ORDER:
    for _w in STOPWORDS[_lang]:
        _SW_LANGS[_w] = _SW_LANGS.get(_w, ()) + (_lang,)


def langid_text(text: str) -> tuple[str, float]:
    """Heuristic language ID: per-language stopword hit rate over word
    tokens; deterministic tie-break by language code.  Returns
    ("und", 0.0) when no stopword hits at all."""
    words = _WORD_RE.findall(text)
    if not words:
        return "und", 0.0
    counts: dict[str, int] = {}
    get_langs = _SW_LANGS.get
    for w in words:
        # probe the raw token first: stopword keys are lowercase, and on
        # real text most tokens already are — w.lower() would allocate a
        # copy per word; the second probe only runs for cased tokens
        langs = get_langs(w)
        if langs is None and not w.islower():
            langs = get_langs(w.lower())
        if langs is not None:
            for lang in langs:
                counts[lang] = counts.get(lang, 0) + 1
    best_lang, best_hits = "und", 0
    for lang in _LANG_ORDER:  # same strictly-greater scan order as before
        hits = counts.get(lang, 0)
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


WINNOW_K = 4  # words per k-gram
WINNOW_W = 5  # winnowing window (grams)


def winnow_md5_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> pa.Table:
    """SQL-checkable winnowing (Schleimer et al., SIGMOD '03): k-word
    grams hashed with md5 (first 16 hex chars = upper 64 bits), then a
    per-window minimum selection; a document's fingerprint is the
    DISTINCT set of window minima, emitted as exploded (doc_id, fp_hex)
    rows.  Unlike `fingerprint_batch` (blake2b + polynomial rolling
    hash), every step here has an exact DuckDB analogue: md5() + a
    ROWS-frame window MIN — so the oracle replays the whole scheme.
    Fewer grams than one window -> the single global minimum (the SQL
    side keeps only pos=1 in that case).  Hex-string comparison is
    numeric comparison (fixed-width lowercase hex)."""
    import hashlib

    ids_out: list[int] = []
    fps_out: list[str] = []
    for i, t in zip(
        batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
    ):
        ws = (t or "").split(" ")
        n_grams = max(len(ws) - k + 1, 1)
        fps = np.empty(n_grams, np.uint64)
        for g in range(n_grams):
            hx = hashlib.md5(" ".join(ws[g : g + k]).encode("utf-8")).hexdigest()
            fps[g] = np.uint64(int(hx[:16], 16))
        if n_grams <= w:
            sel = {int(fps.min())}
        else:
            wins = np.lib.stride_tricks.sliding_window_view(fps, w)
            sel = set(wins.min(axis=1).tolist())
        for v in sorted(sel):
            ids_out.append(i)
            fps_out.append(f"{v:016x}")
    return pa.table(
        {
            "doc_id": pa.array(ids_out, pa.int64()),
            "fp": pa.array(fps_out, pa.string()),
        }
    )


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
    # num_cpus=0.5: fusion break (see ops.merge_partials) — the big
    # coalescing batch_size must not become the upstream's bundle size
    merged = partials.map_batches(
        merge, batch_format="pyarrow", batch_size=1 << 20, num_cpus=0.5
    )
    # repartition(1): exactly one final sketch-merge task (see
    # ops.merge_partials for why batch_size alone is not a guarantee)
    merged = merged.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    return merged.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII scrubbing + fixed-window token chunking (training-data prep ops)
# ---------------------------------------------------------------------------

# Patterns are written in the RE2-compatible subset so the SAME strings
# run in Python `re` and in DuckDB's regexp_replace (the oracle).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{7,15}\b"


def pii_scrub_batch(t: "pa.Table", id_col: str = "doc_id", text_col: str = "text") -> "pa.Table":
    """Redact emails / IPv4 addresses / international phone numbers
    (the C4/RefinedWeb-style pre-training scrub) and count each kind.
    Replacement order is fixed (email, ip, phone) and mirrored in the
    SQL oracle."""
    import re

    import pyarrow as pa

    email = re.compile(PII_EMAIL_RE)
    ipv4 = re.compile(PII_IPV4_RE)
    phone = re.compile(PII_PHONE_RE)
    clean, n_e, n_i, n_p = [], [], [], []
    for txt in t.column(text_col).to_pylist():
        s = txt or ""
        n_e.append(len(email.findall(s)))
        s = email.sub("<EMAIL>", s)
        n_i.append(len(ipv4.findall(s)))
        s = ipv4.sub("<IP>", s)
        n_p.append(len(phone.findall(s)))
        s = phone.sub("<PHONE>", s)
        clean.append(s)
    return pa.Table.from_arrays(
        [
            t.column(id_col),
            pa.array(clean, pa.string()),
            pa.array(n_e, pa.int64()),
            pa.array(n_i, pa.int64()),
            pa.array(n_p, pa.int64()),
        ],
        names=[id_col, "clean_text", "n_email", "n_ip", "n_phone"],
    )


def chunk_batch(
    t: "pa.Table",
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Fixed-window token chunking with overlap (the training-sample
    windowing step): tokens are split on single spaces (byte-parity
    with SQL string_split), windows start at 0, stride, 2*stride ...
    while start < n_tokens.  One input row -> ceil(max flat_map) rows
    (doc_id, chunk_idx, chunk_text, n_tokens)."""
    import pyarrow as pa

    ids_out, idx_out, text_out, n_out = [], [], [], []
    for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        toks = (txt or "").split(" ")
        for k, start in enumerate(range(0, max(1, len(toks)), stride)):
            window = toks[start : start + size]
            ids_out.append(i)
            idx_out.append(k)
            text_out.append(" ".join(window))
            n_out.append(len(window))
    return pa.Table.from_arrays(
        [
            pa.array(ids_out, pa.int64()),
            pa.array(idx_out, pa.int64()),
            pa.array(text_out, pa.string()),
            pa.array(n_out, pa.int64()),
        ],
        names=[id_col, "chunk_idx", "chunk_text", "n_tokens"],
    )


# Gopher/MassiveText-style repetition thresholds (Rae et al. 2021,
# table A1 spirit): docs above either fraction are near-template spam
REP_DUP_LINE_MAX = 0.3
REP_DUP_2GRAM_MAX = 0.2


def repetition_batch(t: "pa.Table", id_col: str = "doc_id", text_col: str = "text") -> "pa.Table":
    """Within-document repetition metrics (the Gopher quality rules a
    pre-training corpus filter runs): fraction of line occurrences
    belonging to duplicated lines, fraction of word-2gram occurrences
    belonging to duplicated 2-grams, and the keep decision."""
    from collections import Counter

    import numpy as np
    import pyarrow as pa

    ids, dl, dg, keep = [], [], [], []
    for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        s = txt or ""
        lines = Counter(s.split("\n"))
        tot_l = sum(lines.values())
        dup_l = sum(c for c in lines.values() if c > 1) / tot_l if tot_l else 0.0
        ws = s.split(" ")
        grams = Counter(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        tot_g = sum(grams.values())
        dup_g = sum(c for c in grams.values() if c > 1) / tot_g if tot_g else 0.0
        ids.append(i)
        dl.append(np.floor(abs(dup_l) * 1e6 + 0.5) / 1e6)   # ROUND(...,6), >= 0
        dg.append(np.floor(abs(dup_g) * 1e6 + 0.5) / 1e6)
        keep.append(dup_l <= REP_DUP_LINE_MAX and dup_g <= REP_DUP_2GRAM_MAX)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(dl, pa.float64()),
            pa.array(dg, pa.float64()),
            pa.array(keep, pa.bool_()),
        ],
        names=[id_col, "dup_line_frac", "dup_2gram_frac", "keep"],
    )


def eval_grams_batch(
    t: "pa.Table", n: int, id_filter_mod: int, id_col: str = "doc_id", text_col: str = "text"
) -> "pa.Table":
    """Distinct word-n-gram STRINGS of the benchmark subset
    (doc_id % id_filter_mod == 0) — strings, not hashes, so the
    membership test is byte-identical to the SQL oracle's join."""
    import pyarrow as pa

    grams: set[str] = set()
    for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        if i % id_filter_mod != 0:
            continue
        toks = (txt or "").split(" ")
        for j in range(len(toks) - n + 1):
            grams.add(" ".join(toks[j : j + n]))
    return pa.table({"gram": pa.array(sorted(grams), pa.string())})


def contamination_batch(
    t: "pa.Table", eval_ref: tuple, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> "pa.Table":
    """Per doc: how many of its DISTINCT word-n-grams appear in the
    broadcast eval-set gram set, plus the contaminated flag — the
    benchmark-decontamination check a pre-training corpus runs.  The
    eval set is small by definition (benchmarks are MBs), so broadcast
    + per-batch membership is the scale-correct shape (no shuffle)."""
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import get_broadcast

    egrams: set[str] = get_broadcast(eval_ref, tag="decontam")
    ids, n_ov, flag = [], [], []
    for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        toks = (txt or "").split(" ")
        grams = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        ov = len(grams & egrams)
        ids.append(i)
        n_ov.append(ov)
        flag.append(ov > 0)
    return pa.Table.from_arrays(
        [
            pa.array(ids, pa.int64()),
            pa.array(n_ov, pa.int64()),
            pa.array(flag, pa.bool_()),
        ],
        names=[id_col, "n_overlap", "contaminated"],
    )


def word_value_counts(texts: "pa.ChunkedArray | pa.Array") -> "pa.Table":
    """Vectorized word -> count over a string column: split on single
    spaces (same semantics as Python ``s.split(' ')`` with empties
    dropped), flatten, value_counts — all pyarrow kernels, ~20x a
    Python Counter loop.  Returns a table (word:string, n:int64)."""
    import pyarrow.compute as pc

    words = pc.list_flatten(pc.split_pattern(texts, " "))
    words = words.filter(pc.not_equal(words, ""))
    vc = pc.value_counts(words)
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.Table.from_arrays([vc.field("values"), vc.field("counts")], names=["word", "n"])


PAIR_SEP = "\x1f"  # unit separator — cannot appear in space-split words


def doc_word_pairs(texts: "pa.ChunkedArray | pa.Array"):
    """Vectorized (row, w1, w2) consecutive-token pairs over a string
    column: split on single spaces, drop empties, pair each surviving
    token with its successor WITHIN the same row.  Returns
    (row_idx:int64 np.ndarray, w1:pa.Array, w2:pa.Array) — all pyarrow
    / numpy kernels, no per-row Python loop."""
    import numpy as np
    import pyarrow.compute as pc

    lists = pc.split_pattern(texts, " ")
    n_per = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    words = flat.filter(keep)
    rows = rows[keep_np]
    if len(rows) < 2:
        empty = pa.array([], pa.string())
        return np.empty(0, np.int64), empty, empty
    same_row = rows[1:] == rows[:-1]
    mask = pa.array(same_row)
    w1 = words.slice(0, len(words) - 1).filter(mask)
    w2 = words.slice(1).filter(mask)
    return rows[:-1][same_row], w1, w2


def window_pair_counts(texts: "pa.ChunkedArray | pa.Array", window: int) -> "pa.Table":
    """Vectorized ORDERED co-occurrence pair -> count combiner: for
    every token w_i, pair it with each w_j, i < j <= i+window, within
    the same row (the skip-gram / SGNS context window, one direction).
    Returns (pair:string `w1\\x1fw2`, n:int64).  One filtered slice
    per offset — window is a small constant, tokens never loop in
    Python."""
    import numpy as np
    import pyarrow.compute as pc

    lists = pc.split_pattern(texts, " ")
    n_per = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.not_equal(flat, "")
    words = flat.filter(keep)
    rows = rows[keep.to_numpy(zero_copy_only=False)]
    parts = []
    for d in range(1, window + 1):
        if len(rows) <= d:
            break
        same_row = rows[d:] == rows[:-d]
        mask = pa.array(same_row)
        w1 = words.slice(0, len(words) - d).filter(mask)
        w2 = words.slice(d).filter(mask)
        parts.append(pc.binary_join_element_wise(w1, w2, PAIR_SEP))
    if not parts:
        return pa.table({"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    keys = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])
    vc = pc.value_counts(keys)
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.Table.from_arrays([vc.field("values"), vc.field("counts")], names=["pair", "n"])


def bigram_value_counts(texts: "pa.ChunkedArray | pa.Array") -> "pa.Table":
    """Vectorized consecutive-bigram -> count combiner over a string
    column (tokenization = `word_value_counts`, pairs within a row
    only).  Returns (pair:string `w1\\x1fw2`, n:int64)."""
    import pyarrow.compute as pc

    _, w1, w2 = doc_word_pairs(texts)
    keys = pc.binary_join_element_wise(w1, w2, PAIR_SEP)
    vc = pc.value_counts(keys)
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return pa.Table.from_arrays([vc.field("values"), vc.field("counts")], names=["pair", "n"])


# -- compressibility quality signal -----------------------------------------

COMPRESS_MIN_RATIO = 0.30  # below: near-pure repetition (spam/boilerplate)
COMPRESS_MAX_RATIO = 0.80  # above: near-random (gibberish, base64/hash soup)
COMPRESS_MIN_BYTES = 64  # too short to measure — fail the gate


def compressibility_batch(
    t: "pa.Table", id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> "pa.Table":
    """zlib compression ratio as a document-quality signal (the
    MassiveText/RefinedWeb-family 'compressibility' heuristic):
    compressed_size / raw_size.  Natural prose lands mid-range;
    near-zero means machine repetition, near-one means random bytes —
    both are cut.  Stateless per-batch pass (zlib is stdlib and
    deterministic across platforms for a fixed level), no shuffle at
    any corpus size."""
    import zlib

    texts = t.column(text_col).to_pylist()
    n_bytes = np.zeros(len(texts), np.int64)
    n_comp = np.zeros(len(texts), np.int64)
    for i, txt in enumerate(texts):
        raw = (txt or "").encode("utf-8")
        n_bytes[i] = len(raw)
        n_comp[i] = len(zlib.compress(raw, level))
    ratio = np.where(n_bytes > 0, n_comp / np.maximum(n_bytes, 1), 1.0)
    keep = (
        (n_bytes >= COMPRESS_MIN_BYTES)
        & (ratio >= COMPRESS_MIN_RATIO)
        & (ratio <= COMPRESS_MAX_RATIO)
    )
    return pa.table(
        {
            id_col: t.column(id_col),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "n_compressed": pa.array(n_comp, pa.int64()),
            "compress_ratio": pa.array(
                np.copysign(np.floor(np.abs(ratio) * 1e6 + 0.5), ratio) / 1e6,
                pa.float64(),
            ),
            "keep": pa.array(keep.astype(bool)),
        }
    )


def hll_distinct_words(ds) -> float:
    """Approximate distinct-word count of the corpus via HyperLogLog:
    per-batch 4 KiB register partials (fixed size whatever the stream —
    the property KMV lacks), two-level elementwise-max merge, one
    driver-side estimate.  At 100 TB the driver holds one 4 KiB array
    per in-flight batch row, never a value set."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.sketch import (
        HLL_P,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    def partial(t: pa.Table) -> pa.Table:
        vc = word_value_counts(t.column("text"))
        hs = np.fromiter(
            (stable64(w) for w in vc.column("word").to_pylist()), dtype=np.uint64
        )
        return pa.table({"regs": pa.array([hll_registers(hs, HLL_P).tobytes()], pa.binary())})

    def merge(t: pa.Table) -> pa.Table:
        regs = [np.frombuffer(b, dtype=np.uint8) for b in t.column("regs").to_pylist()]
        return pa.table({"regs": pa.array([hll_merge(regs).tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # num_cpus=0.5: fusion break (see ops.merge_partials)
    merged = parts.map_batches(
        merge, batch_format="pyarrow", batch_size=1 << 20, num_cpus=0.5
    )
    merged = merged.repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=1 << 30)
    final = [np.frombuffer(b["regs"], dtype=np.uint8) for b in merged.take_all()]
    return hll_estimate(hll_merge(final))


def langid_words(words: list[str]) -> str:
    """`langid_text`'s argmax over an already-tokenized word list —
    the per-segment building block for mixed-language detection."""
    if not words:
        return "und"
    counts: dict[str, int] = {}
    get_langs = _SW_LANGS.get
    for w in words:
        # probe the raw token first: stopword keys are lowercase, and on
        # real text most tokens already are — w.lower() would allocate a
        # copy per word; the second probe only runs for cased tokens
        langs = get_langs(w)
        if langs is None and not w.islower():
            langs = get_langs(w.lower())
        if langs is not None:
            for lang in langs:
                counts[lang] = counts.get(lang, 0) + 1
    best_lang, best_hits = "und", 0
    for lang in _LANG_ORDER:
        hits = counts.get(lang, 0)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang
