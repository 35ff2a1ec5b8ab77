"""Web-corpus curation queries: C4 line filter, Gopher rule battery,
CCNet-style corpus-level line dedup (stages/curation.py).

The raw `documents` corpus is single-line and punctuation-free, so the
line-based operators run over a deterministically derived page (10-word
lines; C4 adds cycling synthetic terminal punctuation).  Each oracle
rebuilds the IDENTICAL page in SQL with list lambdas, so both engines
genuinely execute the filter logic — the url_parse_parts precedent.
"""

from __future__ import annotations

from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table
from document_ai_ray.stages.curation import (
    C4_MIN_LINE_WORDS,
    C4_MIN_LINES,
    GOPHER_MAX_BULLET_FRAC,
    GOPHER_MAX_ELLIPSIS_FRAC,
    GOPHER_MAX_MEAN_WLEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MEAN_WLEN,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    LINE_WORDS,
    REP_MAX_DUP5_CHAR_FRAC,
    REP_MAX_DUP_LINE_CHAR_FRAC,
    REP_MAX_DUP_LINE_FRAC,
    REP_MAX_TOP2_CHAR_FRAC,
    REP_MAX_TOP3_CHAR_FRAC,
    c4_filter_batch,
    gopher_batch,
    gopher_repetition_batch,
    line_dedup_docs,
)

# Derived page, shared by the C4 and line-dedup oracles: words regrouped
# into LINE_WORDS-word lines (generate_series is 1-based, ln is 0-based).
_LINES_CTE = f"""
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
l AS (SELECT doc_id, CAST((t.i - 1) // {LINE_WORDS} AS BIGINT) AS ln,
             array_to_string(ws[CAST(t.i AS BIGINT):CAST(t.i + {LINE_WORDS - 1} AS BIGINT)], ' ') AS line
      FROM w, UNNEST(generate_series(1, len(ws), {LINE_WORDS})) AS t(i))
"""

_C4_ORACLE = rf"""
WITH {_LINES_CTE},
p AS (SELECT doc_id, ln,
             line || CASE CAST((doc_id + ln) % 3 AS INT)
                       WHEN 0 THEN '.' WHEN 1 THEN '' ELSE '!' END AS pline
      FROM l),
a AS (SELECT doc_id,
             list(pline ORDER BY ln) AS lines
      FROM p GROUP BY doc_id),
k AS (SELECT doc_id,
             len(lines) AS n_lines,
             list_filter(lines,
               x -> (ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?') OR ends_with(x, '"'))
                    AND len(regexp_extract_all(x, '\S+')) >= {C4_MIN_LINE_WORDS}) AS kept,
             array_to_string(lines, chr(10)) AS page
      FROM a)
SELECT doc_id,
       COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
       n_lines,
       len(kept) AS n_lines_kept,
       (len(kept) >= {C4_MIN_LINES}
        AND NOT contains(page, '{{')
        AND NOT contains(lower(page), 'lorem ipsum')) AS keep
FROM k
"""


@register("c4_line_filter_docs", oracle=_C4_ORACLE)
def c4_line_filter_docs(sf_dir: str):
    """C4 line filter (Raffel et al. 2020 §2.2): keep lines ending in
    terminal punctuation with >= 5 words; keep docs with >= 3 surviving
    lines, no '{' and no 'lorem ipsum'.  Stateless per-batch pass, no
    shuffle — at 100 TB this is a pure streaming map."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(c4_filter_batch, batch_format="pyarrow")


_GOPHER_ORACLE = rf"""
WITH b AS (SELECT doc_id, text,
                  regexp_extract_all(text, '\S+') AS ws,
                  string_split(text, chr(10)) AS ls
           FROM documents),
m AS (SELECT doc_id,
        len(ws) AS nw,
        CASE WHEN len(ws) = 0 THEN 0.0
             ELSE list_sum(list_transform(ws, x -> len(x))) / CAST(len(ws) AS DOUBLE) END AS mwl,
        CASE WHEN len(ws) = 0 THEN 0.0
             ELSE (len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')))
                  / CAST(len(ws) AS DOUBLE) END AS sym,
        len(list_filter(ls, x -> starts_with(trim(x), '•') OR starts_with(trim(x), '- ')))
            / CAST(len(ls) AS DOUBLE) AS bul,
        len(list_filter(ls, x -> ends_with(x, '...') OR ends_with(x, '…')))
            / CAST(len(ls) AS DOUBLE) AS ell,
        CASE WHEN len(ws) = 0 THEN 0.0
             ELSE len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
                  / CAST(len(ws) AS DOUBLE) END AS alp,
        len(list_filter(ws, x -> lower(x) IN ('the','be','to','of','and','that','have','with'))) AS stops
      FROM b)
SELECT doc_id,
       nw AS n_words,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(sym, 6) AS symbol_word_ratio,
       ROUND(bul, 6) AS bullet_line_frac,
       ROUND(ell, 6) AS ellipsis_line_frac,
       ROUND(alp, 6) AS alpha_word_frac,
       stops AS n_stop_hits,
       (nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mwl BETWEEN {GOPHER_MIN_MEAN_WLEN} AND {GOPHER_MAX_MEAN_WLEN}
        AND sym <= {GOPHER_MAX_SYMBOL_RATIO}
        AND bul <= {GOPHER_MAX_BULLET_FRAC}
        AND ell <= {GOPHER_MAX_ELLIPSIS_FRAC}
        AND alp >= {GOPHER_MIN_ALPHA_FRAC}
        AND stops >= {GOPHER_MIN_STOP_HITS}) AS keep
FROM m
"""


@register("gopher_filter_docs", oracle=_GOPHER_ORACLE)
def gopher_filter_docs(sf_dir: str):
    """Gopher/MassiveText document-quality rule battery (Rae et al.
    2021): word-count and mean-word-length bounds, symbol-to-word
    ratio, bullet/ellipsis line fractions, alpha-word fraction, minimum
    stop-word hits, and the AND-of-all keep decision.  Stateless
    per-batch pass; the keep comparisons run on UNROUNDED doubles on
    both sides, emitted ratios are ROUND(...,6)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(gopher_batch, batch_format="pyarrow")


def _gram_cte(n: int) -> str:
    """n-gram counts per doc: gram = chr(31)-joined word slice (words
    are space-split so the separator is injective), gram word-chars =
    len(gram) - (n-1) separators."""
    return f"""
g{n} AS (SELECT doc_id,
              array_to_string(ws[CAST(t.i AS BIGINT):CAST(t.i + {n - 1} AS BIGINT)], chr(31)) AS gram
       FROM w, UNNEST(generate_series(1, len(ws) - {n - 1})) AS t(i)),
c{n} AS (SELECT doc_id, gram, COUNT(*) AS cnt, len(gram) - {n - 1} AS gc
       FROM g{n} GROUP BY doc_id, gram)"""


_REP_ORACLE = f"""
WITH {_LINES_CTE},
lc AS (SELECT doc_id, line, COUNT(*) AS cnt FROM l GROUP BY doc_id, line),
ls AS (SELECT doc_id, SUM(cnt) AS n_lines, SUM(cnt - 1) AS dup_lines,
              SUM((cnt - 1) * len(line)) AS dup_chars,
              SUM(cnt * len(line)) AS tot_chars
       FROM lc GROUP BY doc_id),
tw AS (SELECT doc_id, list_sum(list_transform(ws, x -> len(x))) AS twc FROM w),
{_gram_cte(2)},
{_gram_cte(3)},
{_gram_cte(5)},
t2 AS (SELECT doc_id, MAX(cnt * gc) AS num2 FROM c2 GROUP BY doc_id),
t3 AS (SELECT doc_id, MAX(cnt * gc) AS num3 FROM c3 GROUP BY doc_id),
d5 AS (SELECT doc_id, SUM((cnt - 1) * gc) AS num5 FROM c5 GROUP BY doc_id),
f AS (SELECT ls.doc_id,
             CASE WHEN ls.n_lines > 0 THEN ls.dup_lines / ls.n_lines ELSE 0 END AS dlf,
             CASE WHEN ls.tot_chars > 0 THEN ls.dup_chars / ls.tot_chars ELSE 0 END AS dlcf,
             CASE WHEN tw.twc > 0 THEN COALESCE(t2.num2, 0) / tw.twc ELSE 0 END AS top2,
             CASE WHEN tw.twc > 0 THEN COALESCE(t3.num3, 0) / tw.twc ELSE 0 END AS top3,
             CASE WHEN tw.twc > 0 THEN COALESCE(d5.num5, 0) / tw.twc ELSE 0 END AS dup5
      FROM ls JOIN tw USING (doc_id)
      LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id) LEFT JOIN d5 USING (doc_id))
SELECT doc_id,
       ROUND(dlf, 6) AS dup_line_frac,
       ROUND(dlcf, 6) AS dup_line_char_frac,
       ROUND(top2, 6) AS top2gram_char_frac,
       ROUND(top3, 6) AS top3gram_char_frac,
       ROUND(dup5, 6) AS dup_5gram_char_frac,
       (dlf <= {REP_MAX_DUP_LINE_FRAC} AND dlcf <= {REP_MAX_DUP_LINE_CHAR_FRAC}
        AND top2 <= {REP_MAX_TOP2_CHAR_FRAC} AND top3 <= {REP_MAX_TOP3_CHAR_FRAC}
        AND dup5 <= {REP_MAX_DUP5_CHAR_FRAC}) AS keep
FROM f
"""


@register("gopher_repetition_docs", oracle=_REP_ORACLE)
def gopher_repetition_docs(sf_dir: str):
    """Gopher repetition-removal battery (Rae et al. 2021 table A1):
    duplicate-line fractions over the derived 10-word page plus
    top-2/3-gram and duplicate-5-gram character fractions — the
    repetition half of MassiveText filtering (gopher_filter_docs is the
    quality half).  Stateless per-doc map_batches; the oracle rebuilds
    lines AND n-grams with list lambdas + UNNEST(generate_series)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(gopher_repetition_batch, batch_format="pyarrow")


_LINEDEDUP_ORACLE = f"""
WITH {_LINES_CTE},
r AS (SELECT doc_id, ln, line,
             ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, ln) AS rn
      FROM l),
k AS (SELECT doc_id,
             string_agg(line, chr(10) ORDER BY ln) AS clean_text,
             COUNT(*) AS n_lines_kept
      FROM r WHERE rn = 1 GROUP BY doc_id),
n AS (SELECT doc_id, COUNT(*) AS n_lines FROM l GROUP BY doc_id)
SELECT n.doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       n.n_lines,
       COALESCE(k.n_lines_kept, 0) AS n_lines_kept
FROM n LEFT JOIN k USING (doc_id)
"""


@register("line_dedup_docs", oracle=_LINEDEDUP_ORACLE)
def line_dedup_docs_query(sf_dir: str):
    """CCNet-style corpus-level line dedup: a (derived 10-word) line
    survives only at its FIRST (doc_id, line_no) occurrence corpus-wide;
    docs are reassembled from surviving lines.  Winner election moves
    only (md5, doc_id, ln) triples through a hash-bucketed exchange;
    the single corpus-sized exchange is the final reassembly join."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return line_dedup_docs(docs)


BADWORDS = ("slow", "dup")  # stand-in blocklist present in the corpus vocab

_BADWORD_ORACLE = rf"""
WITH b AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws FROM documents)
SELECT doc_id,
       len(list_filter(ws, x -> lower(x) IN {BADWORDS!r})) AS n_bad,
       len(list_filter(ws, x -> lower(x) IN {BADWORDS!r})) = 0 AS keep
FROM b
"""


@register("badword_filter_docs", oracle=_BADWORD_ORACLE)
def badword_filter_docs(sf_dir: str):
    """C4-style blocklist filter: count words on the bad-word list
    (case-insensitive whole-word membership — C4's actual mechanism)
    and keep only clean docs.  Stateless per-batch pass; the list is
    tiny and ships in the task closure (a real profanity list would
    broadcast via ray.put, same shape as the decontamination set)."""
    import pyarrow as pa

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bad = frozenset(BADWORDS)

    def annotate(t: pa.Table) -> pa.Table:
        n_bad = [
            sum(1 for w in (txt or "").split() if w.lower() in bad)
            for txt in t.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bad": pa.array(n_bad, pa.int64()),
                "keep": pa.array([n == 0 for n in n_bad], pa.bool_()),
            }
        )

    return docs.map_batches(annotate, batch_format="pyarrow")


_SPLIT_SEED = "split-r3"

_SPLIT_ORACLE = f"""
WITH h AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-{_SPLIT_SEED}'), 1, 8)) AS BIGINT)
           % 100 AS hv
  FROM documents)
SELECT doc_id, lang,
       CASE WHEN hv < 98 THEN 'train' WHEN hv < 99 THEN 'val' ELSE 'test' END AS split
FROM h
"""


@register("split_train_val_test", oracle=_SPLIT_ORACLE)
def split_train_val_test(sf_dir: str):
    """Deterministic 98/1/1 train/val/test assignment by seeded md5 of
    doc_id — stable across runs, engines and re-shards (the property a
    training split needs: adding data never moves an existing doc
    between splits).  Pure per-batch map, no shuffle, no RNG state."""
    import hashlib

    import pyarrow as pa

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def assign(t: pa.Table) -> pa.Table:
        splits = []
        for i in t.column("doc_id").to_pylist():
            hv = int(hashlib.md5(f"{i}-{_SPLIT_SEED}".encode()).hexdigest()[:8], 16) % 100
            splits.append("train" if hv < 98 else ("val" if hv < 99 else "test"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "split": pa.array(splits, pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")
_PROFILE_DISTINCT = ("lang", "source")  # low-cardinality: exact distinct

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""SELECT '{c}' AS col, COUNT(*) AS n,
        COUNT(*) - COUNT({c}) AS n_null,
        CAST(MIN({c}) AS VARCHAR) AS min_val,
        CAST(MAX({c}) AS VARCHAR) AS max_val,
        {f"COUNT(DISTINCT {c})" if c in _PROFILE_DISTINCT else "CAST(NULL AS BIGINT)"} AS n_distinct
        FROM documents"""
    for c in _PROFILE_COLS
)


@register("profile_documents", oracle=_PROFILE_ORACLE)
def profile_documents(sf_dir: str):
    """Column profiling (the data-quality audit step a corpus ingest
    runs): per column row count, null count, lexicographic/numeric
    min + max (as VARCHAR for one uniform schema), and exact distinct
    counts for the low-cardinality columns.  Everything is a mergeable
    per-batch partial (count/min/max merge associatively; distinct sets
    only for vocab-tiny columns) — one streaming pass, one tiny final
    merge, NO shuffle.  High-cardinality distinct counts belong to the
    KMV sketch (`approx_distinct_ngrams`), deliberately not here."""
    import pyarrow as pa

    docs = read_table(sf_dir, "documents", columns=list(_PROFILE_COLS))

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in _PROFILE_COLS:
            col = t.column(c)
            vals = [v for v in col.to_pylist() if v is not None]
            rows.append(
                {
                    "col": c,
                    "n": len(t),
                    "n_null": len(t) - len(vals),
                    "min_val": str(min(vals)) if vals else None,
                    "max_val": str(max(vals)) if vals else None,
                    "distinct": sorted({str(v) for v in vals})
                    if c in _PROFILE_DISTINCT
                    else [],
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("col", pa.string()),
                    ("n", pa.int64()),
                    ("n_null", pa.int64()),
                    ("min_val", pa.string()),
                    ("max_val", pa.string()),
                    ("distinct", pa.list_(pa.string())),
                ]
            ),
        )

    def merge(t: pa.Table) -> pa.Table:
        rows = []
        for c in _PROFILE_COLS:
            sub = t.filter(pa.compute.equal(t.column("col"), c))
            mins = [v for v in sub.column("min_val").to_pylist() if v is not None]
            maxs = [v for v in sub.column("max_val").to_pylist() if v is not None]
            if c in ("doc_id", "n_chars"):  # numeric: "100" < "99" lexically!
                mins = [str(min(map(int, mins)))] if mins else []
                maxs = [str(max(map(int, maxs)))] if maxs else []
            dist: set[str] = set()
            for lst in sub.column("distinct").to_pylist():
                dist.update(lst)
            rows.append(
                {
                    "col": c,
                    "n": sum(sub.column("n").to_pylist()),
                    "n_null": sum(sub.column("n_null").to_pylist()),
                    "min_val": min(mins) if mins else None,
                    "max_val": max(maxs) if maxs else None,
                    "n_distinct": len(dist) if c in _PROFILE_DISTINCT else None,
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("col", pa.string()),
                    ("n", pa.int64()),
                    ("n_null", pa.int64()),
                    ("min_val", pa.string()),
                    ("max_val", pa.string()),
                    ("n_distinct", pa.int64()),
                ]
            ),
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")
    # repartition(1): exactly one final merge task over tiny partials
    return partials.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )


_BK_SEED = "bottomk-r3"
_BK_GLOBAL, _BK_PER_LANG = 100, 10

_BOTTOMK_ORACLE = f"""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '-{_BK_SEED}') AS skey
FROM documents
ORDER BY skey LIMIT {_BK_GLOBAL}
"""

_BOTTOMK_LANG_ORACLE = f"""
SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR) || '-{_BK_SEED}') AS skey
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY skey) <= {_BK_PER_LANG}
"""


def _with_skey(docs):
    import hashlib

    import pyarrow as pa

    def add(t: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{i}-{_BK_SEED}".encode()).hexdigest()
            for i in t.column("doc_id").to_pylist()
        ]
        return t.append_column("skey", pa.array(keys, pa.string()))

    return docs.map_batches(add, batch_format="pyarrow")


@register("sample_bottom_k", oracle=_BOTTOMK_ORACLE)
def sample_bottom_k(sf_dir: str):
    """Mergeable uniform sampling WITHOUT replacement: bottom-k by a
    seeded per-doc hash — the distributed-reservoir equivalent (any
    union of partial bottom-k sets re-cut to k IS the global bottom-k,
    the KMV property), deterministic across engines and runs.  Shape:
    per-batch local bottom-k, one k-row final cut — k rows per block
    move, never the corpus."""
    from document_ai_ray.pipelines.ops import topk

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return topk(_with_skey(docs), keys=[("skey", False)], k=_BK_GLOBAL)


@register("sample_per_lang_bottomk", oracle=_BOTTOMK_LANG_ORACLE)
def sample_per_lang_bottomk(sf_dir: str):
    """Per-stratum bottom-k-by-hash sampling (k docs per lang) through
    the bucketed grouped-topk substrate — equal-depth stratified
    sampling that stays deterministic and mergeable at any scale."""
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import grouped_topk

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    out = grouped_topk(
        _with_skey(docs),
        keys=["lang"],
        sort_cols=[("skey", True)],
        k=_BK_PER_LANG,
        n_buckets=auto_buckets(docs.count()),
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "skey"]), batch_format="pyarrow"
    )


_BLOCK_TOKENS = 64

_BLOCKS_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = ''
              THEN []::VARCHAR[]
              ELSE string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
         END AS ts
  FROM documents),
allt AS (SELECT flatten(list(ts ORDER BY doc_id)) AS a FROM toks),
blocks AS (
  SELECT CAST(t.i AS BIGINT) AS block_id,
         a[CAST(t.i*{_BLOCK_TOKENS}+1 AS BIGINT):CAST(t.i*{_BLOCK_TOKENS}+{_BLOCK_TOKENS} AS BIGINT)] AS win
  FROM allt, UNNEST(generate_series(0, CAST((len(a) - 1) // {_BLOCK_TOKENS} AS BIGINT))) AS t(i))
SELECT block_id, array_to_string(win, ' ') AS block_text, len(win) AS n_tokens
FROM blocks
"""


@register("concat_token_blocks", oracle=_BLOCKS_ORACLE)
def concat_token_blocks_query(sf_dir: str):
    """GPT-style block packing: the global whitespace-token stream
    (docs in doc_id order) cut into fixed {0}-token training blocks —
    blocks CROSS document boundaries, the layout a causal-LM loader
    consumes.  Offsets from the distributed exclusive prefix sum,
    piece emission per doc, one bucketed reassembly exchange; the
    oracle flattens the same stream in SQL and slices it.""".format(_BLOCK_TOKENS)
    from document_ai_ray.stages.curation import concat_token_blocks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return concat_token_blocks(docs, block_tokens=_BLOCK_TOKENS)


@register("bpe_train_merges")
def bpe_train_merges_query(sf_dir: str):
    """BPE tokenizer training (Sennrich et al. 2016): the top-40 merge
    rules learned from the corpus — rows-only (iterative argmax has no
    SQL analogue; tests assert exact equality with a brute-force
    corpus-level trainer).  One distributed pass builds the exact
    word-frequency table (pair statistics over the weighted word table
    are IDENTICAL to the corpus's, since BPE never merges across word
    boundaries); the merge loop is vocab-sized driver compute — the
    SentencePiece/HF-trainer shape at any corpus scale."""
    from document_ai_ray.stages.bpe import bpe_train_merges

    docs = read_table(sf_dir, "documents", columns=["text"])
    return bpe_train_merges(docs, k=40)


@register("bpe_encode_docs")
def bpe_encode_docs_query(sf_dir: str):
    """BPE tokenization APPLIED: train the merge table on the corpus
    (one distributed counting pass + vocab-sized merge loop), broadcast
    the ranks once, and encode every document in a second streaming
    pass — (doc_id, n_words, n_tokens, n_chars).  Rows-only (the
    lowest-rank-pair fixpoint has no SQL analogue); tests pin exact
    equality with a character-level reference encoder and the
    n_words <= n_tokens <= n_chars sandwich."""
    from document_ai_ray.stages.bpe import (
        bpe_encode_docs,
        corpus_word_counts,
        train_merges_from_counts,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    merges = train_merges_from_counts(
        corpus_word_counts(docs, text_col="text", vocab_cap=1 << 16), 40
    )
    return bpe_encode_docs(docs, merges)


_WDS_ORACLE = """
SELECT doc_id, text, lang, source FROM documents
"""


@register("webdataset_roundtrip", oracle=_WDS_ORACLE)
def webdataset_roundtrip(sf_dir: str):
    """Byte-identity through the WebDataset tar-shard exchange format
    (the training-loader sink): documents spool to POSIX tar shards
    (one per task batch, {doc_id}.txt + {doc_id}.json members,
    deterministic bytes), are re-read via read_binary_files + in-task
    tar parse, and must come back exactly — doc_id, text, lang, source
    all value-checked against the source table."""
    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.sources.webdataset import read_webdataset, write_webdataset

    out_dir = scratch_dir("wds_rt")

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    paths = [r["path"] for r in write_webdataset(docs, out_dir).take_all()]
    return read_webdataset(paths)


@register("jsonl_roundtrip", oracle=_WDS_ORACLE)
def jsonl_roundtrip(sf_dir: str):
    """Value-identity through the JSONL exchange format (the other
    interchange sink next to Parquet/WARC/WebDataset): documents ->
    `write_json` (one JSONL file per block, distributed writers) ->
    `read_json` -> value-checked against the source table.  Both ends
    are Ray datasources, so a 100 TB corpus spools shard-parallel with
    no driver materialization."""
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.functions.scratch import scratch_dir

    out_dir = scratch_dir("jsonl_rt")

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    docs.write_json(out_dir)
    back = rd.read_json(out_dir)
    # read_json infers column order per file; normalize + re-assert types
    return back.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text": t.column("text").cast(pa.string()),
                "lang": t.column("lang").cast(pa.string()),
                "source": t.column("source").cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


def _ccnet_oracle() -> str:
    from document_ai_ray.pipelines.text_queries import _ULM_ORACLE

    return (
        "WITH u AS ("
        + _ULM_ORACLE
        + """),
r AS (SELECT doc_id, avg_logprob,
             NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS t
      FROM u)
SELECT doc_id, avg_logprob,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM r
"""
    )


@register("ccnet_perplexity_buckets", oracle=_ccnet_oracle())
def ccnet_perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail partition (Wenzek et al. 2020): docs
    ranked by unigram-LM mean log-probability (a perplexity proxy,
    highest-first) and cut into three equal-depth buckets — head is the
    most fluent third, tail the rare-word soup.  The rank is ON the
    ROUNDED score (6 dp, doc_id tie-break) on both sides so float noise
    cannot move the cut; the global rank comes from the distributed
    range-partitioned sort substrate (`ops.with_group_ranks`), and the
    tile is a vectorized function of (rank, n) per block — NTILE's
    first-(n mod k)-tiles-are-larger rule reproduced exactly."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import with_group_ranks
    from document_ai_ray.pipelines.text_queries import unigram_scored

    scored = unigram_scored(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        neg = np.negative(t.column("avg_logprob").to_numpy(zero_copy_only=False))
        t = t.append_column("__neglp", pa.array(neg, pa.float64()))
        return t.append_column("__g", pa.array(np.zeros(len(t), np.int8)))

    ranked = with_group_ranks(
        scored.map_batches(prep, batch_format="pyarrow"), "__g", ["__neglp", "doc_id"]
    )
    k = 3
    names = np.array(["head", "middle", "tail"])

    def tile_batch(t: pa.Table) -> pa.Table:
        r = t.column("__rank").to_numpy(zero_copy_only=False)
        n = t.column("__gn").to_numpy(zero_copy_only=False)
        size, rem = n // k, n % k
        big = rem * (size + 1)
        tile = np.where(r < big, r // (size + 1), rem + (r - big) // np.maximum(size, 1))
        return pa.Table.from_arrays(
            [
                t.column("doc_id"),
                t.column("avg_logprob"),
                pa.array(names[tile.astype(np.int64)]),
            ],
            names=["doc_id", "avg_logprob", "bucket"],
        )

    return ranked.map_batches(tile_batch, batch_format="pyarrow")


_TEMP_TAU = 0.7
_MIXW_ORACLE = f"""
WITH c AS (SELECT lang, source, COUNT(*) AS n_docs
           FROM documents GROUP BY 1, 2)
SELECT lang, source, n_docs,
       ROUND(POWER(n_docs, {_TEMP_TAU}) / SUM(POWER(n_docs, {_TEMP_TAU})) OVER (), 6)
         AS weight
FROM c
"""


@register("mixture_weights_temperature", oracle=_MIXW_ORACLE)
def mixture_weights_temperature(sf_dir: str):
    """Temperature-based sampling weights per (lang, source) cell —
    the multilingual-mixture reweighting of mBERT/XLM-R/PaLM: cell
    weight ∝ n_docs^τ (τ={0}), normalized; τ<1 upsamples the tail so
    low-resource cells are not drowned.  Counting is the combiner
    groupby (`partial_group_agg`); the normalization runs on the
    cells-sized aggregate (one tiny final task by construction —
    cells, not documents).""".format(_TEMP_TAU)
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import partial_group_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    cells = partial_group_agg(docs, ["lang", "source"], count_alias="n_docs")

    def normalize(t: pa.Table) -> pa.Table:
        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        p = n**_TEMP_TAU
        w = p / p.sum()
        w = np.copysign(np.floor(np.abs(w) * 1e6 + 0.5), w) / 1e6
        return t.append_column("weight", pa.array(w, pa.float64()))

    return cells.repartition(1).map_batches(
        normalize, batch_format="pyarrow", batch_size=1 << 30
    )


@register("compressibility_docs")
def compressibility_docs(sf_dir: str):
    """Compression-ratio quality gate (zlib level 6, deterministic):
    compressed/raw bytes per document; cut near-zero (machine
    repetition) and near-one (random bytes) tails.  Rows-only — SQL has
    no DEFLATE; tests pin monotonicity (repetitive < prose < random),
    determinism, and the keep-window edges."""
    from document_ai_ray.stages.text_analysis import compressibility_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(compressibility_batch, batch_format="pyarrow")


@register("cdc_chunk_stats")
def cdc_chunk_stats(sf_dir: str):
    """Content-defined chunking (Gear/FastCDC) byte-dedup estimate: cut
    every document into rolling-hash-aligned chunks, then report corpus
    totals vs distinct chunks — the dedupable-bytes measure a
    chunk-store would realize.  Chunking is a stateless streaming map;
    distinct-chunk reduction is hash-bucketed (`ops.distinct_rows`),
    so no task ever holds the corpus chunk set.  Rows-only — the
    rolling-hash cut has no SQL analogue; tests pin reassembly,
    size bounds, edit locality, and a scalar-reference differential."""
    import pandas as pd
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import distinct_rows, partial_group_agg
    from document_ai_ray.stages.cdc import cdc_chunk_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    chunks = docs.map_batches(cdc_chunk_batch, batch_format="pyarrow")
    tot = (
        partial_group_agg(
            chunks.map_batches(
                lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
                batch_format="pyarrow",
            ),
            ["one"],
            {"chunk_len": "total_bytes"},
            count_alias="n_chunks",
        )
        .to_pandas()
        .iloc[0]
    )
    dist = (
        partial_group_agg(
            distinct_rows(chunks.select_columns(["chunk_hash", "chunk_len"]), ["chunk_hash", "chunk_len"])
            .map_batches(
                lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
                batch_format="pyarrow",
            ),
            ["one"],
            {"chunk_len": "distinct_bytes"},
            count_alias="n_distinct",
        )
        .to_pandas()
        .iloc[0]
    )
    total_b, dup_b = int(tot["total_bytes"]), int(tot["total_bytes"] - dist["distinct_bytes"])
    return pd.DataFrame(
        [
            {
                "n_chunks": int(tot["n_chunks"]),
                "n_distinct_chunks": int(dist["n_distinct"]),
                "total_bytes": total_b,
                "dup_bytes": dup_b,
                "dedup_frac": round(dup_b / total_b, 6) if total_b else 0.0,
            }
        ]
    )


# ---------------------------------------------------------------------------
# Multiword phrase blocklist (substring counts, not word-set membership)
# ---------------------------------------------------------------------------

_BLOCK_PHRASES = ["value table", "fast merge", "slow scan", "big join"]

_PHRASE_COUNT_SQL = " + ".join(
    f"CAST((len(text) - len(replace(text, '{p}', ''))) / {len(p)} AS BIGINT)"
    for p in _BLOCK_PHRASES
)


@register(
    "phrase_blocklist_docs",
    oracle=f"""
    SELECT doc_id, {_PHRASE_COUNT_SQL} AS n_phrase_hits,
           ({_PHRASE_COUNT_SQL}) > 0 AS blocked
    FROM documents
    """,
)
def phrase_blocklist_docs(sf_dir: str):
    """MULTIWORD phrase blocklist — the substring sibling of the
    word-set `badword_filter_docs` (policy blocklists are phrases more
    often than words: scam slogans, boilerplate disclaimers).
    Non-overlapping left-to-right counts per phrase (str.count
    semantics — the oracle replays them with DuckDB's replace-length
    trick), summed per doc.  The scan runs through the Aho-Corasick
    automaton (`functions/multisearch.py`): ONE pass over each
    document regardless of blocklist size, built once per worker —
    the 10^4-phrase blocklist costs the same stream as this 4-phrase
    one.  `count_nonoverlapping` is differential-tested equal to
    str.count per pattern (tests/test_multisearch.py)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(t):
        import numpy as np
        import pyarrow as pa

        from document_ai_ray.functions.multisearch import AhoCorasick

        global _BLOCK_AC
        try:
            ac = _BLOCK_AC  # built once per worker process
        except NameError:
            ac = _BLOCK_AC = AhoCorasick(_BLOCK_PHRASES)
        texts = t.column("text").to_pylist()
        hits = np.fromiter(
            (sum(ac.count_nonoverlapping(s or "")) for s in texts), np.int64, len(texts)
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_phrase_hits": pa.array(hits, pa.int64()),
                "blocked": pa.array(hits > 0),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow")


@register("csv_roundtrip", oracle=_WDS_ORACLE)
def csv_roundtrip(sf_dir: str):
    """Value-identity through the CSV exchange format (quoting-safe:
    document text contains no newlines by construction, but commas and
    quotes round-trip through Arrow's RFC-4180 writer/reader).  Both
    ends are Ray datasources — shard-parallel writers, no driver
    materialization — completing the interchange quartet next to
    JSONL, WARC and WebDataset tar."""
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.functions.scratch import scratch_dir

    out_dir = scratch_dir("csv_rt")

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    docs.write_csv(out_dir)
    back = rd.read_csv(out_dir)
    return back.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text": t.column("text").cast(pa.string()),
                "lang": t.column("lang").cast(pa.string()),
                "source": t.column("source").cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Per-host boilerplate (RefinedWeb/trafilatura-style site-template
# stripping): `source` stands in for the host.  Both oracles evaluate
# the threshold rule max(BOILER_MIN_DOCS, ceil(BOILER_MIN_FRAC*n_docs))
# in SQL — no hardcoded answers.
# ---------------------------------------------------------------------------

from document_ai_ray.stages.curation import (  # noqa: E402
    BOILER_MIN_DOCS,
    BOILER_MIN_FRAC,
    boilerplate_remove_docs,
    boilerplate_stats_by_source,
)

# lines CTE carrying the source column (the shared _LINES_CTE drops it)
_SRC_LINES_CTE = f"""
w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
l AS (SELECT doc_id, source, CAST((t.i - 1) // {LINE_WORDS} AS BIGINT) AS ln,
             array_to_string(ws[CAST(t.i AS BIGINT):CAST(t.i + {LINE_WORDS - 1} AS BIGINT)], ' ') AS line
      FROM w, UNNEST(generate_series(1, len(ws), {LINE_WORDS})) AS t(i)),
sd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM l GROUP BY source),
b AS (SELECT per.source, per.line
      FROM (SELECT source, line, COUNT(DISTINCT doc_id) AS nd
            FROM l GROUP BY source, line) per
      JOIN sd USING (source)
      WHERE nd >= GREATEST({BOILER_MIN_DOCS},
                           CAST(CEIL({BOILER_MIN_FRAC} * n_docs) AS BIGINT)))
"""

_BOILER_STATS_ORACLE = f"""
WITH {_SRC_LINES_CTE},
occ AS (SELECT l.source, l.doc_id
        FROM l JOIN b ON l.source = b.source AND l.line = b.line)
SELECT sd.source, sd.n_docs,
       COALESCE(bc.n_boiler_lines, 0) AS n_boiler_lines,
       COALESCE(oc.n_occ, 0) AS n_boiler_occurrences,
       COALESCE(oc.n_aff, 0) AS n_docs_affected
FROM sd
LEFT JOIN (SELECT source, COUNT(*) AS n_boiler_lines FROM b GROUP BY source) bc
       USING (source)
LEFT JOIN (SELECT source, COUNT(*) AS n_occ,
                  COUNT(DISTINCT doc_id) AS n_aff FROM occ GROUP BY source) oc
       USING (source)
"""


@register("boilerplate_stats_by_source", oracle=_BOILER_STATS_ORACLE)
def boilerplate_stats_query(sf_dir: str):
    """Per-host boilerplate census: lines repeated across >= max(2,
    ceil(5% * n_docs)) distinct documents of the same source are site
    chrome.  One hash(source)-bucketed exchange of (md5, ids) triples;
    per-host totals are bucket-local, output is host-sized."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return boilerplate_stats_by_source(docs)


_BOILER_REMOVE_ORACLE = f"""
WITH {_SRC_LINES_CTE},
k AS (SELECT l.doc_id,
             string_agg(l.line, chr(10) ORDER BY l.ln) AS clean_text,
             COUNT(*) AS n_lines_kept
      FROM l LEFT JOIN b ON l.source = b.source AND l.line = b.line
      WHERE b.line IS NULL GROUP BY l.doc_id),
n AS (SELECT doc_id, COUNT(*) AS n_lines FROM l GROUP BY doc_id)
SELECT n.doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       n.n_lines,
       COALESCE(k.n_lines_kept, 0) AS n_lines_kept
FROM n LEFT JOIN k USING (doc_id)
"""


@register("boilerplate_remove_docs", oracle=_BOILER_REMOVE_ORACLE)
def boilerplate_remove_query(sf_dir: str):
    """Strip per-host boilerplate from every document (removal of ALL
    occurrences — the dual of line_dedup_docs's keep-first).  Winner
    election ships only (md5, doc_id, ln); the single corpus-sized
    exchange is the shared reassembly join."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return boilerplate_remove_docs(docs)


# ---------------------------------------------------------------------------
# Crawl-snapshot content diff: added/removed/changed/unchanged census
# between two corpus snapshots.  The snapshots are deterministic
# derivations of the documents table (old drops doc_id%11==3, new drops
# doc_id%13==5 and appends ' updated' to doc_id%7==2) — the ENGINE
# treats them as two independent datasets and runs a real distributed
# diff; only the oracle knows they share a parent.
# ---------------------------------------------------------------------------

_SNAPDIFF_ORACLE = """
WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 != 3),
new AS (SELECT doc_id,
               CASE WHEN doc_id % 7 = 2 THEN text || ' updated' ELSE text END AS text
        FROM documents WHERE doc_id % 13 != 5)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text = n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
"""


@register("snapshot_content_diff", oracle=_SNAPDIFF_ORACLE)
def snapshot_content_diff(sf_dir: str):
    """Two-snapshot corpus diff by content hash: each side ships only
    (doc_id, md5(text)) through a hash(doc_id)-bucketed exchange —
    never text — and each bucket classifies its disjoint key range in
    one vectorized pandas pass (the deterministic census shape; Ray's
    native full-outer join is avoided per the r3 verdict).  Output is
    diff-listing-sized.  The oracle replays the diff with a FULL OUTER
    JOIN comparing text directly (md5 equality == text equality at the
    repo's documented 2^-64 collision assumption)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    def derive(side: int, P: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            txts = t.column("text").to_pylist()
            if side == 0:
                keep = ids % 11 != 3
            else:
                keep = ids % 13 != 5
                txts = [
                    (s or "") + " updated" if i % 7 == 2 else (s or "")
                    for i, s in zip(ids, txts)
                ]
            ids_k = ids[keep]
            h = [
                hashlib.md5((s or "").encode("utf-8", "surrogatepass")).digest()
                for s, m in zip(txts, keep) if m
            ]
            bk = (ids_k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
            return pa.table(
                {
                    "doc_id": pa.array(ids_k, pa.int64()),
                    "h": pa.array(h, pa.binary(16)),
                    "side": pa.array(np.full(len(ids_k), side, np.int8)),
                    "bk": pa.array(bk.astype(np.int64)),
                }
            )

        return fn

    docs_cols = ["doc_id", "text"]
    P = auto_buckets(read_table(sf_dir, "documents", columns=["doc_id"]).count())
    old = read_table(sf_dir, "documents", columns=docs_cols).map_batches(
        derive(0, P), batch_format="pyarrow"
    )
    new = read_table(sf_dir, "documents", columns=docs_cols).map_batches(
        derive(1, P), batch_format="pyarrow"
    )

    def classify(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "status": pd.Series(dtype="object")}
            )
        piv = df.pivot_table(
            index="doc_id", columns="side", values="h", aggfunc="first"
        )
        o = piv[0] if 0 in piv.columns else pd.Series(index=piv.index, dtype=object)
        n = piv[1] if 1 in piv.columns else pd.Series(index=piv.index, dtype=object)
        status = np.where(
            o.isna(), "added",
            np.where(n.isna(), "removed", np.where(o == n, "unchanged", "changed")),
        )
        return pd.DataFrame(
            {"doc_id": piv.index.astype("int64"), "status": status}
        ).reset_index(drop=True)

    return bucket_map_groups(old.union(new), "bk", classify, P, batch_format="pandas")


# ---------------------------------------------------------------------------
# Inverted-index build + partitioned-sink roundtrip: the posting-list
# structure under every search engine, built with one word-hash
# exchange, persisted as parquet, and read back (sink+source parity —
# a real index build would be resumed/partition-pruned from this
# layout).
# ---------------------------------------------------------------------------

_INVIDX_ORACLE = """
WITH w AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
d AS (SELECT DISTINCT word, doc_id FROM w)
SELECT word, COUNT(*) AS n_docs,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
FROM d GROUP BY word
"""


@register("inverted_index_roundtrip", oracle=_INVIDX_ORACLE)
def inverted_index_roundtrip(sf_dir: str):
    """Build posting lists (word -> sorted distinct doc_ids) through a
    hash(word)-bucketed exchange — (word, doc_id) pairs are deduped
    per-batch BEFORE the exchange, so the shuffle carries per-doc
    vocabulary, not token occurrences — write the index as parquet,
    read it back.  Posting lists serialize as comma-joined strings so
    the SQL oracle (string_agg ORDER BY doc_id) compares them exactly."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.pipelines.ops import bucket_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    P = auto_buckets(docs.count())

    def postings(t: pa.Table) -> pa.Table:
        words, ids, buckets = [], [], []
        for i, s in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            for w in set((s or "").split(" ")):
                words.append(w)
                ids.append(i)
                buckets.append(zlib.crc32(w.encode("utf-8", "surrogatepass")) % P)
        return pa.table(
            {
                "word": pa.array(words, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    def build(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "word": pd.Series(dtype="object"),
                    "n_docs": pd.Series(dtype="int64"),
                    "doc_ids": pd.Series(dtype="object"),
                }
            )
        df = df.drop_duplicates(["word", "doc_id"]).sort_values(
            ["word", "doc_id"], kind="mergesort"
        )
        g = df.groupby("word", sort=False)["doc_id"]
        out = pd.DataFrame(
            {
                "n_docs": g.nunique().astype("int64"),
                "doc_ids": g.apply(lambda s: ",".join(map(str, s))),
            }
        ).reset_index()
        return out[["word", "n_docs", "doc_ids"]]

    idx = bucket_map_groups(
        docs.map_batches(postings, batch_format="pyarrow"),
        "bucket",
        build,
        P,
        batch_format="pandas",
    )
    out_dir = scratch_dir("invidx")
    idx.write_parquet(out_dir)
    back = rd.read_parquet(out_dir)
    return back.map_batches(
        lambda t: pa.table(
            {
                "word": t.column("word").cast(pa.string()),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "doc_ids": t.column("doc_ids").cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Mixture resampling: downsample every source to the SMALLEST source's
# token budget (uniform source mixture) with deterministic
# md5-threshold Bernoulli keeps — the data-mixing step before training.
# Thresholds are exact integer arithmetic (t_min * 2^32 // t_s) so both
# engines compare identical values; the min source keeps rate 1 via the
# explicit saturation branch (DuckDB lpad TRUNCATES 0x100000000).
# ---------------------------------------------------------------------------

_MIX_SEED = "mix-r4"

_MIX_ORACLE = f"""
WITH tok AS (SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
             FROM documents),
st AS (SELECT source, SUM(n_tok) AS t_s FROM tok GROUP BY source),
mn AS (SELECT MIN(t_s) AS t_min FROM st)
SELECT d.doc_id, d.source, d.n_tok
FROM tok d JOIN st USING (source), mn
WHERE st.t_s = mn.t_min
   OR substr(md5(CAST(d.doc_id AS VARCHAR) || '-{_MIX_SEED}'), 1, 8)
      < lpad(lower(to_hex(mn.t_min * 4294967296 // st.t_s)), 8, '0')
"""


@register("mixture_downsample_uniform", oracle=_MIX_ORACLE)
def mixture_downsample_uniform(sf_dir: str):
    """Uniform-source mixture construction: per-source token totals via
    the combiner aggregate (source-cardinality result, bounded), keep
    rates t_min/t_s broadcast as exact integer thresholds, then one
    stateless Bernoulli-filter pass (u = md5(doc_id||seed)[:8] < rate).
    At 100 TB the rate table is host/source-sized and broadcast once;
    the corpus never shuffles."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast, partial_group_agg

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def toks(t: pa.Table) -> pa.Table:
        n = pa.array(
            [len((s or "").split(" ")) for s in t.column("text").to_pylist()],
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "n_tok": n,
            }
        )

    tok = docs.map_batches(toks, batch_format="pyarrow")
    totals = partial_group_agg(
        tok.select_columns(["source", "n_tok"]), ["source"], {"n_tok": "t_s"}
    ).to_pandas()  # bounded: one row per source
    t_min = int(totals["t_s"].min())
    thresh = {
        s: (None if int(ts) == t_min else t_min * 4294967296 // int(ts))
        for s, ts in zip(totals["source"], totals["t_s"])
    }
    ref = (ray.put(thresh),)

    def keep(t: pa.Table, _ref=ref) -> pa.Table:
        thr = get_broadcast(_ref, tag="mix_thresh")
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        u = np.array(
            [
                int(hashlib.md5(f"{i}-{_MIX_SEED}".encode()).hexdigest()[:8], 16)
                for i in ids
            ],
            dtype=np.int64,
        )
        mask = np.array(
            [
                thr[s] is None or int(ui) < thr[s]
                for s, ui in zip(srcs, u)
            ]
        )
        return t.filter(pa.array(mask))

    return tok.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Adaptive re-crawl scheduling (Nutch AdaptiveFetchSchedule shape):
# the snapshot diff drives per-page fetch intervals — changed pages
# get re-fetched sooner, stable pages back off, removed pages leave
# the schedule.  All-integer policy arithmetic.
# ---------------------------------------------------------------------------

_RECRAWL_ORACLE = """
WITH old AS (SELECT doc_id, text FROM documents WHERE doc_id % 11 != 3),
new AS (SELECT doc_id,
               CASE WHEN doc_id % 7 = 2 THEN text || ' updated' ELSE text END AS text
        FROM documents WHERE doc_id % 13 != 5),
d AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
             CASE WHEN o.doc_id IS NULL THEN 'added'
                  WHEN n.doc_id IS NULL THEN 'removed'
                  WHEN o.text = n.text THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
SELECT doc_id, status,
       CASE status WHEN 'changed' THEN 3 WHEN 'added' THEN 7 ELSE 10 END
       AS next_fetch_days
FROM d WHERE status != 'removed'
"""


@register("adaptive_recrawl_schedule", oracle=_RECRAWL_ORACLE)
def adaptive_recrawl_schedule(sf_dir: str):
    """Per-page re-fetch intervals from the two-snapshot content diff:
    changed -> 3 days, newly discovered -> 7, stable -> 10, removed ->
    off the schedule.  Rides the proven snapshot_content_diff census
    (hash(doc_id)-bucketed md5 exchange); the policy map is one
    stateless vectorized pass."""
    import numpy as np
    import pyarrow as pa

    diff = snapshot_content_diff(sf_dir)

    def policy(t: pa.Table) -> pa.Table:
        st = np.asarray(t.column("status").to_pylist(), dtype=object)
        keep = st != "removed"
        st_k = st[keep]
        days = np.where(st_k == "changed", 3, np.where(st_k == "added", 7, 10))
        return pa.table(
            {
                "doc_id": t.column("doc_id").filter(pa.array(keep)),
                "status": pa.array(st_k, pa.string()),
                "next_fetch_days": pa.array(days.astype(np.int64)),
            }
        )

    return diff.map_batches(policy, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Crawl politeness scheduling: per-host fetch slots with a per-host
# crawl delay — URL k of a host fetches at slot k * delay(host).
# ---------------------------------------------------------------------------

_POLITE_ORACLE = """
WITH urls AS (
  SELECT 'https://site' || CAST(i % 37 AS VARCHAR) || '.example/' ||
         CASE i % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' WHEN 2 THEN 'de'
                    WHEN 3 THEN 'es' ELSE 'it' END ||
         '/page' || CAST(i AS VARCHAR) AS url
  FROM range(300) t(i)
),
h AS (SELECT url, split_part(replace(url, 'https://', ''), '/', 1) AS host FROM urls),
r AS (SELECT url, host,
             CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url) - 1 AS BIGINT) AS slot,
             CAST(1 + LENGTH(host) % 3 AS BIGINT) AS delay_s
      FROM h)
SELECT url, host, slot, delay_s, slot * delay_s AS fetch_at_s FROM r
"""


@register("crawl_schedule_politeness", oracle=_POLITE_ORACLE)
def crawl_schedule_politeness(sf_dir: str):
    """Politeness scheduler over the synthetic crawl frontier: rank
    each host's URLs (deterministic url order) on the rank substrate —
    host cardinality is the low-card key the substrate contracts for —
    and assign fetch_at = slot * per-host delay (all-integer, no float
    order risk).  At 100 TB the same shape holds: ranks come from the
    distributed sort, delays from a broadcast robots map."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import with_group_ranks
    from document_ai_ray.synth import pages_dataset

    def host_of(t: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        urls = t.column("url").to_pylist()
        hosts = [urlsplit(u).netloc for u in urls]
        return pa.table(
            {"url": t.column("url"), "host": pa.array(hosts, pa.string())}
        )

    pages = pages_dataset(300).select_columns(["url"]).map_batches(host_of, batch_format="pyarrow")
    ranked = with_group_ranks(pages, "host", ["url"])

    def finish(t: pa.Table) -> pa.Table:
        slot = t.column("__rank").to_numpy(zero_copy_only=False)
        hosts = t.column("host").to_pylist()
        delay = np.array([1 + len(h) % 3 for h in hosts], np.int64)
        return pa.table(
            {
                "url": t.column("url"),
                "host": t.column("host"),
                "slot": pa.array(slot.astype(np.int64)),
                "delay_s": pa.array(delay),
                "fetch_at_s": pa.array((slot * delay).astype(np.int64)),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers: group sizes on
# (lang, source) with the k>=5 flag — the privacy-side release check.
# ---------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
SELECT lang, source, COUNT(*) AS n_docs,
       COUNT(*) >= {_KANON_K} AS k_anonymous
FROM documents GROUP BY lang, source
"""


@register("k_anonymity_report", oracle=_KANON_ORACLE)
def k_anonymity_report(sf_dir: str):
    """k-anonymity census over the (lang, source) quasi-identifier
    pair: any release bucket smaller than k={0} is flagged for
    suppression.  One combiner pass; the flag derives in the
    group-cardinality final.""".format(_KANON_K)
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import partial_group_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source"])
    agg = partial_group_agg(docs, ["lang", "source"], count_alias="n_docs")

    def flag(t: pa.Table) -> pa.Table:
        n = t.column("n_docs").to_numpy(zero_copy_only=False)
        return t.append_column("k_anonymous", pa.array(n >= _KANON_K))

    return agg.map_batches(flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Train/val/test LEAKAGE report: near-duplicate pairs (bigram Jaccard
# >= 0.5, the corpus's proven near-dup spec) broken down by the split
# pair they land in — cross-split rows are contamination a training
# run must scrub before trusting eval numbers.
# ---------------------------------------------------------------------------

_LEAK_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS gram
      FROM w, UNNEST(generate_series(1, len(ws)-1)) AS t(i)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (SELECT id_a, id_b
          FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
sp AS (SELECT doc_id,
              CASE WHEN hv < 98 THEN 'train' WHEN hv < 99 THEN 'val' ELSE 'test' END AS split
       FROM (SELECT doc_id,
                    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-{_SPLIT_SEED}'), 1, 8)) AS BIGINT)
                      % 100 AS hv
             FROM documents))
SELECT LEAST(a.split, b.split) AS split_a, GREATEST(a.split, b.split) AS split_b,
       COUNT(*) AS n_pairs, LEAST(a.split, b.split) != GREATEST(a.split, b.split) AS leaky
FROM pairs JOIN sp a ON a.doc_id = id_a JOIN sp b ON b.doc_id = id_b
GROUP BY 1, 2
"""


@register("split_leakage_report", oracle=_LEAK_ORACLE)
def split_leakage_report(sf_dir: str):
    """Near-dup contamination across the 98/1/1 split: every proven
    bigram-Jaccard>=0.5 pair classified by the (lexicographically
    normalized) split pair it straddles.  The pair stream comes from
    the existing exact near-dup pipeline; the split is a pure hash of
    doc_id, so the classification is a stateless map + a tiny
    combiner — no extra join."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.dedup_queries import ngram_jaccard_pairs
    from document_ai_ray.pipelines.ops import merge_partials

    pairs = ngram_jaccard_pairs(sf_dir)

    def split_of(i: int) -> str:
        hv = int(hashlib.md5(f"{i}-{_SPLIT_SEED}".encode()).hexdigest()[:8], 16) % 100
        return "train" if hv < 98 else ("val" if hv < 99 else "test")

    def classify(t: pa.Table) -> pa.Table:
        sa = [split_of(i) for i in t.column("id_a").to_pylist()]
        sb = [split_of(i) for i in t.column("id_b").to_pylist()]
        lo = [min(x, y) for x, y in zip(sa, sb)]
        hi = [max(x, y) for x, y in zip(sa, sb)]
        return pa.table(
            {
                "split_a": pa.array(lo, pa.string()),
                "split_b": pa.array(hi, pa.string()),
                "one": pa.array(np.ones(len(lo), np.int64)),
            }
        )

    merged = merge_partials(
        pairs.map_batches(classify, batch_format="pyarrow"),
        ["split_a", "split_b"],
        {"one": "sum"},
    )

    def finish(t: pa.Table) -> pa.Table:
        a = t.column("split_a").to_pylist()
        b = t.column("split_b").to_pylist()
        return pa.table(
            {
                "split_a": t.column("split_a"),
                "split_b": t.column("split_b"),
                "n_pairs": t.column("one"),
                "leaky": pa.array([x != y for x, y in zip(a, b)]),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL template mining: digit-collapsed path templates with counts —
# the crawl-side structure census (which page generators dominate a
# site, which templates to throttle or prioritize).
# ---------------------------------------------------------------------------

_URLTPL_ORACLE = """
WITH urls AS (
  SELECT 'https://site' || CAST(i % 37 AS VARCHAR) || '.example/' ||
         CASE i % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' WHEN 2 THEN 'de'
                    WHEN 3 THEN 'es' ELSE 'it' END ||
         '/page' || CAST(i AS VARCHAR) AS url
  FROM range(300) t(i)
)
SELECT regexp_replace(url, '[0-9]+', 'N', 'g') AS template, COUNT(*) AS n_urls
FROM urls GROUP BY 1
"""


@register("url_template_census", oracle=_URLTPL_ORACLE)
def url_template_census(sf_dir: str):
    """Collapse every URL's digit runs to 'N' and census the resulting
    templates (site{N}.example/{lang}/page{N}) — a pure vectorized map
    with a compiled regex per worker plus a template-cardinality
    combiner."""
    import re

    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.synth import pages_dataset

    digit_rx = re.compile(r"[0-9]+")

    def template(t: pa.Table) -> pa.Table:
        tpl = [digit_rx.sub("N", u) for u in t.column("url").to_pylist()]
        return pa.table(
            {"template": pa.array(tpl, pa.string()),
             "one": pa.array(np.ones(len(tpl), np.int64))}
        )

    merged = merge_partials(
        pages_dataset(300).select_columns(["url"]).map_batches(template, batch_format="pyarrow"),
        ["template"],
        {"one": "sum"},
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"template": t.column("template"), "n_urls": t.column("one")})

    return merged.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Dense surrogate-key assignment: map every distinct dimension value
# to a stable dense integer id (ordinal under the sorted order) — the
# warehouse-load primitive behind every dimension table.
# ---------------------------------------------------------------------------

_DENSEID_ORACLE = """
WITH d AS (SELECT DISTINCT p_name FROM part)
SELECT p_name, CAST(ROW_NUMBER() OVER (ORDER BY p_name) - 1 AS BIGINT) AS dense_id
FROM d
"""


@register("dense_id_assignment", oracle=_DENSEID_ORACLE)
def dense_id_assignment(sf_dir: str):
    """Distinct part names -> dense ids 0..n-1 in sorted-name order:
    per-batch distinct partials into a combiner, then one rank-
    substrate pass assigns the ordinal (the distributed ROW_NUMBER
    shape; ids are reproducible because the order is total)."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import merge_partials, with_group_ranks
    from document_ai_ray.sources.tables import read_table

    parts = read_table(sf_dir, "part", columns=["p_name"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        names = sorted(set(t.column("p_name").to_pylist()))
        return pa.table(
            {"p_name": pa.array(names, pa.string()),
             "one": pa.array(np.ones(len(names), np.int64))}
        )

    dist = merge_partials(
        parts.map_batches(distinct_partial, batch_format="pyarrow"), ["p_name"], {"one": "sum"}
    ).map_batches(
        lambda t: t.drop_columns(["one"]).append_column(
            "__g", pa.array(np.zeros(len(t), np.int8))
        ),
        batch_format="pyarrow",
    )
    ranked = with_group_ranks(dist, "__g", ["p_name"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"p_name": t.column("p_name"), "dense_id": t.column("__rank")}
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Referential-integrity report: orphan-count per declared FK edge —
# the cross-table data-quality audit (complementing the single-table
# Deequ-style suite).
# ---------------------------------------------------------------------------

_RI_ORACLE = """
SELECT 'orders.o_custkey->customer' AS fk_edge,
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       COUNT(*) AS n_rows
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       CAST(SUM(CASE WHEN oo.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
FROM lineitem l LEFT JOIN orders oo ON oo.o_orderkey = l.l_orderkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), COUNT(*)
FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
"""


@register("referential_integrity_report", oracle=_RI_ORACLE)
def referential_integrity_report(sf_dir: str):
    """Orphan census for four FK edges.  Each edge broadcasts the
    PARENT key set when dimension-sized (nation/customer/part) or
    probes a bucketed distinct-key exchange when fact-sized (orders) —
    here all parent key sets are dimension-bounded, so each check is a
    broadcast-membership scan + one combiner row."""
    import numpy as np
    import pyarrow as pa

    import ray

    from document_ai_ray.pipelines.ops import get_broadcast, merge_partials
    from document_ai_ray.sources.tables import read_table

    edges = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    outs = []
    for name, child, ck, parent, pk in edges:
        keys = read_table(sf_dir, parent, columns=[pk])
        key_arr = np.unique(
            np.concatenate(
                [b.column(pk).to_numpy(zero_copy_only=False)
                 for b in keys.iter_batches(batch_format="pyarrow")]
            )
        )
        ref = ray.put(key_arr)

        def check(t: pa.Table, _ref=ref, _ck=ck, _name=name) -> pa.Table:
            parent_keys = get_broadcast((_ref,), tag=_name)
            v = t.column(_ck).to_numpy(zero_copy_only=False)
            orphan = ~np.isin(v, parent_keys)
            return pa.table(
                {
                    "fk_edge": pa.array([_name], pa.string()),
                    "n_orphans": pa.array([int(orphan.sum())], pa.int64()),
                    "n_rows": pa.array([len(v)], pa.int64()),
                }
            )

        child_ds = read_table(sf_dir, child, columns=[ck])
        outs.append(
            merge_partials(
                child_ds.map_batches(check, batch_format="pyarrow"),
                ["fk_edge"],
                {"n_orphans": "sum", "n_rows": "sum"},
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


@register("orc_roundtrip", oracle=_WDS_ORACLE)
def orc_roundtrip(sf_dir: str):
    """Value-identity through the ORC columnar exchange format (the
    Hive-ecosystem sibling of Parquet): documents -> per-batch ORC
    shards -> read_binary_files + in-task pyarrow.orc decode ->
    value-checked against the source table.  Shard-parallel in both
    directions; the manifest consume drives the distributed write."""
    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.sources.columnar import read_orc, write_orc_shards

    out_dir = scratch_dir("orc_rt")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    paths = [r["path"] for r in write_orc_shards(docs, out_dir).take_all()]
    return read_orc(paths)


@register("ipc_roundtrip", oracle=_WDS_ORACLE)
def ipc_roundtrip(sf_dir: str):
    """Value-identity through the Arrow IPC file format (Feather v2) —
    the zero-copy spill/interchange format between Arrow engines.
    Same shard-parallel shape as the ORC/tar roundtrips; on a real
    deployment the read side maps the shards zero-copy."""
    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.sources.columnar import read_ipc, write_ipc_shards

    out_dir = scratch_dir("ipc_rt")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    paths = [r["path"] for r in write_ipc_shards(docs, out_dir).take_all()]
    return read_ipc(paths)


@register("zip_roundtrip", oracle=_WDS_ORACLE)
def zip_roundtrip(sf_dir: str):
    """Value-identity through ZIP archives (deflate members, the
    crawl-delivery container): documents -> per-batch ZIP shards with
    {doc_id}.txt/.json members -> read_binary_files + in-task unzip —
    the compressed sibling of the WebDataset tar roundtrip."""
    import pyarrow as pa

    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.sources.columnar import read_zip_shards, write_zip_shards

    out_dir = scratch_dir("zip_rt")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    paths = [r["path"] for r in write_zip_shards(docs, out_dir).take_all()]
    back = read_zip_shards(paths)
    return back.map_batches(
        lambda t: t.select(["doc_id", "text", "lang", "source"]),
        batch_format="pyarrow",
    )


@register("jsonl_gz_roundtrip", oracle=_WDS_ORACLE)
def jsonl_gz_roundtrip(sf_dir: str):
    """Value-identity through gzip-compressed JSONL shards (the
    log-pipeline interchange staple; ~5x smaller on the wire than the
    plain JSONL roundtrip next to it).  Deterministic gzip bytes
    (mtime=0); the read side streams through Arrow's JSON reader with
    a gzip input stream — both directions shard-parallel."""
    import pyarrow as pa

    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.sources.columnar import read_jsonl_gz, write_jsonl_gz_shards

    out_dir = scratch_dir("jsonlgz_rt")
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    paths = [r["path"] for r in write_jsonl_gz_shards(docs, out_dir).take_all()]
    back = read_jsonl_gz(paths)
    return back.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text": t.column("text").cast(pa.string()),
                "lang": t.column("lang").cast(pa.string()),
                "source": t.column("source").cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# t-closeness audit over (lang, source) quasi-identifier groups: EMD
# between each group's doc-length histogram (8 fixed-width bins) and
# the corpus histogram, on the ordered-bin ground distance.  The EMD of
# cumulative histograms is a sum of |integer cross products| — exact
# ints up to one final floor-quantized division.
# ---------------------------------------------------------------------------

_T_CLOSENESS_ORACLE = """
WITH L AS (SELECT lang, source, LENGTH(text) AS ln FROM documents),
mx AS (SELECT MAX(ln) AS m FROM L),
b AS (SELECT lang, source, LEAST(7, ln * 8 // (mx.m + 1)) AS bin FROM L, mx),
h AS (SELECT lang, source, bin, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
g AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS gc FROM h GROUP BY 1),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM h),
grp AS (SELECT lang, source, CAST(SUM(c) AS BIGINT) AS ng FROM h GROUP BY 1, 2),
bins AS (SELECT UNNEST(generate_series(0, 7)) AS bin),
f AS (SELECT gr.lang, gr.source, bi.bin,
             COALESCE(h.c, 0) AS c, COALESCE(g.gc, 0) AS gc, gr.ng, n.nt
      FROM grp gr CROSS JOIN bins bi
      LEFT JOIN h ON h.lang = gr.lang AND h.source = gr.source AND h.bin = bi.bin
      LEFT JOIN g ON g.bin = bi.bin, n),
cum AS (SELECT lang, source, bin, ng, nt,
               SUM(c) OVER (PARTITION BY lang, source ORDER BY bin) AS ch,
               SUM(gc) OVER (PARTITION BY lang, source ORDER BY bin) AS cg
        FROM f),
emd AS (SELECT lang, source, CAST(MAX(ng) AS BIGINT) AS n_docs, CAST(MAX(nt) AS BIGINT) AS nt,
               CAST(SUM(CASE WHEN bin < 7 THEN ABS(ch * nt - cg * ng) ELSE 0 END) AS BIGINT) AS num
        FROM cum GROUP BY 1, 2)
SELECT lang, source, n_docs,
       CAST(FLOOR(1000000.0 * num / (CAST(nt AS DOUBLE) * n_docs * 7)) AS BIGINT) AS t_micro
FROM emd
"""


@register("t_closeness_report", oracle=_T_CLOSENESS_ORACLE)
def t_closeness_report(sf_dir: str):
    """t-closeness per (lang, source) quasi-identifier group over the
    doc-length distribution — the release-audit companion to
    k_anonymity_report / l_diversity_report.  Two combiner passes (max
    length, then per-(group, bin) counts); the EMD algebra runs on the
    groups x 8-bin table in exact integers."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc_

    from document_ai_ray.pipelines.ops import merge_partials, partial_group_agg

    docs = read_table(sf_dir, "documents", columns=["lang", "source", "text"])

    def maxlen(t: pa.Table) -> pa.Table:
        ln = pc_.utf8_length(t.column("text"))
        return pa.table({"k": pa.array([0], pa.int64()),
                         "m": pa.array([int(pc_.max(ln).as_py() or 0)], pa.int64())})

    m = int(
        merge_partials(docs.map_batches(maxlen, batch_format="pyarrow"),
                       ["k"], {"m": "max"}).take_all()[0]["m"]
    )

    def bin_col(t: pa.Table) -> pa.Table:
        ln = pc_.utf8_length(t.column("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(7, ln * 8 // (m + 1))
        return pa.table({"lang": t.column("lang"), "source": t.column("source"),
                         "bin": pa.array(b)})

    h = partial_group_agg(
        docs.map_batches(bin_col, batch_format="pyarrow"), ["lang", "source", "bin"],
        count_alias="c",
    ).take_all()  # groups x bins sized
    gc = np.zeros(8, np.int64)
    groups: dict[tuple[str, str], np.ndarray] = {}
    for r in h:
        key = (r["lang"], r["source"])
        groups.setdefault(key, np.zeros(8, np.int64))[r["bin"]] += r["c"]
        gc[r["bin"]] += r["c"]
    nt = int(gc.sum())
    cg = np.cumsum(gc)
    out = {"lang": [], "source": [], "n_docs": [], "t_micro": []}
    for (lang, source) in sorted(groups):
        hist = groups[(lang, source)]
        ng = int(hist.sum())
        ch = np.cumsum(hist)
        num = int(np.abs(ch[:7] * nt - cg[:7] * ng).sum())
        t_micro = math.floor(1000000.0 * num / (float(nt) * ng * 7))
        out["lang"].append(lang)
        out["source"].append(source)
        out["n_docs"].append(ng)
        out["t_micro"].append(t_micro)
    return pa.table(
        {"lang": pa.array(out["lang"], pa.string()),
         "source": pa.array(out["source"], pa.string()),
         "n_docs": pa.array(out["n_docs"], pa.int64()),
         "t_micro": pa.array(out["t_micro"], pa.int64())}
    )
