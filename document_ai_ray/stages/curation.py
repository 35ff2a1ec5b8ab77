"""Web-corpus curation operators: C4 line filtering, the Gopher rule
battery, and CCNet-style corpus-level line deduplication.

These are the named line/document filters every public LLM web corpus
runs (C4, Raffel et al. 2020; Gopher/MassiveText, Rae et al. 2021;
CCNet, Wenzek et al. 2020) re-expressed as Ray Data stages:

* per-document rules (C4, Gopher) are stateless ``map_batches`` passes —
  embarrassingly parallel, no shuffle;
* corpus-level line dedup needs global per-line state, expressed as a
  hash-bucketed exchange over narrow (hash, doc_id, line_no) triples —
  the line TEXT never shuffles in the winner election, only in the
  final doc-side reassembly join.

The raw `documents` corpus is single-line, so the line-based operators
run over a deterministically DERIVED page: the text's words re-grouped
into 10-word lines (and, for C4, synthetic terminal punctuation keyed
on (doc_id + line_no) % 3).  The DuckDB oracles rebuild the identical
page in SQL, so both sides genuinely execute the filter logic.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from document_ai_ray.functions.scale import auto_buckets
from document_ai_ray.pipelines.ops import bucket_map_groups

LINE_WORDS = 10  # derived-page line width (words)

# --- C4 rules (Raffel et al. 2020 §2.2) -----------------------------------
C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_LINES = 3
C4_BAD_SUBSTRINGS = ("lorem ipsum",)  # checked on lower(page)
C4_BRACE = "{"

# --- Gopher rules (Rae et al. 2021, table A1 spirit) -----------------------
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with")
)

_NONWS_RE = re.compile(r"\S+")
_ALPHA_RE = re.compile(r"[A-Za-z]")


def derive_lines(text: str) -> list[str]:
    """Words (single-space split, SQL string_split parity) regrouped
    into LINE_WORDS-word lines.  '' -> [''] -> one empty line, exactly
    like the oracle's generate_series(1, len(ws), 10)."""
    ws = (text or "").split(" ")
    return [" ".join(ws[i : i + LINE_WORDS]) for i in range(0, len(ws), LINE_WORDS)]


def _round6(x: float) -> float:
    # ROUND(x, 6) half-away-from-zero — the repo-wide DuckDB convention
    return float(np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6)


def c4_punct(doc_id: int, line_no: int) -> str:
    """Deterministic synthetic terminal punctuation for the derived C4
    page (the raw corpus has none): '.', '', '!' cycling on
    (doc_id + line_no) % 3 — mirrored verbatim in the SQL oracle."""
    return (".", "", "!")[(doc_id + line_no) % 3]


def c4_filter_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """C4 line filter over the derived page: keep lines that end in a
    terminal punctuation mark AND have >= C4_MIN_LINE_WORDS words; a
    document keeps iff >= C4_MIN_LINES lines survive and the page has
    no '{' and no 'lorem ipsum'.  Annotates every doc (no row drop) so
    the oracle compares the full decision surface."""
    ids_out, clean, n_lines, n_kept, keep = [], [], [], [], []
    for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        lines = [
            ln + c4_punct(i, k) for k, ln in enumerate(derive_lines(txt or ""))
        ]
        kept = [
            ln
            for ln in lines
            if ln.endswith(C4_TERMINALS) and len(_NONWS_RE.findall(ln)) >= C4_MIN_LINE_WORDS
        ]
        page = "\n".join(lines)
        low = page.lower()
        ok = (
            len(kept) >= C4_MIN_LINES
            and C4_BRACE not in page
            and not any(b in low for b in C4_BAD_SUBSTRINGS)
        )
        ids_out.append(i)
        clean.append("\n".join(kept))
        n_lines.append(len(lines))
        n_kept.append(len(kept))
        keep.append(ok)
    return pa.Table.from_arrays(
        [
            pa.array(ids_out, pa.int64()),
            pa.array(clean, pa.string()),
            pa.array(n_lines, pa.int64()),
            pa.array(n_kept, pa.int64()),
            pa.array(keep, pa.bool_()),
        ],
        names=[id_col, "clean_text", "n_lines", "n_lines_kept", "keep"],
    )


def gopher_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Gopher/MassiveText document-quality rule battery: word-count
    bounds, mean-word-length bounds, symbol-to-word ratio (# and ...),
    bullet-start / ellipsis-end line fractions, alpha-word fraction,
    and a minimum stop-word hit count.  keep = AND of all rules,
    evaluated on UNROUNDED values (the oracle does the same); emitted
    ratios are ROUND(...,6)."""
    ids_out = []
    cols: dict[str, list] = {
        "n_words": [],
        "mean_word_len": [],
        "symbol_word_ratio": [],
        "bullet_line_frac": [],
        "ellipsis_line_frac": [],
        "alpha_word_frac": [],
        "n_stop_hits": [],
        "keep": [],
    }
    for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        s = txt or ""
        ws = _NONWS_RE.findall(s)
        nw = len(ws)
        lines = s.split("\n")
        nl = len(lines)  # >= 1 always ('' -> [''])
        mean_wlen = sum(map(len, ws)) / nw if nw else 0.0
        symbol = (s.count("#") + s.count("...")) / nw if nw else 0.0
        bullet = (
            sum(1 for ln in lines if ln.strip(" ").startswith(("•", "- "))) / nl
        )
        ellipsis = sum(1 for ln in lines if ln.endswith(("...", "…"))) / nl
        alpha = (
            sum(1 for w in ws if _ALPHA_RE.search(w)) / nw if nw else 0.0
        )
        stops = sum(1 for w in ws if w.lower() in GOPHER_STOPWORDS)
        ok = (
            GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS
            and GOPHER_MIN_MEAN_WLEN <= mean_wlen <= GOPHER_MAX_MEAN_WLEN
            and symbol <= GOPHER_MAX_SYMBOL_RATIO
            and bullet <= GOPHER_MAX_BULLET_FRAC
            and ellipsis <= GOPHER_MAX_ELLIPSIS_FRAC
            and alpha >= GOPHER_MIN_ALPHA_FRAC
            and stops >= GOPHER_MIN_STOP_HITS
        )
        ids_out.append(i)
        cols["n_words"].append(nw)
        cols["mean_word_len"].append(_round6(mean_wlen))
        cols["symbol_word_ratio"].append(_round6(symbol))
        cols["bullet_line_frac"].append(_round6(bullet))
        cols["ellipsis_line_frac"].append(_round6(ellipsis))
        cols["alpha_word_frac"].append(_round6(alpha))
        cols["n_stop_hits"].append(stops)
        cols["keep"].append(ok)
    return pa.Table.from_arrays(
        [
            pa.array(ids_out, pa.int64()),
            pa.array(cols["n_words"], pa.int64()),
            pa.array(cols["mean_word_len"], pa.float64()),
            pa.array(cols["symbol_word_ratio"], pa.float64()),
            pa.array(cols["bullet_line_frac"], pa.float64()),
            pa.array(cols["ellipsis_line_frac"], pa.float64()),
            pa.array(cols["alpha_word_frac"], pa.float64()),
            pa.array(cols["n_stop_hits"], pa.int64()),
            pa.array(cols["keep"], pa.bool_()),
        ],
        names=[
            id_col,
            "n_words",
            "mean_word_len",
            "symbol_word_ratio",
            "bullet_line_frac",
            "ellipsis_line_frac",
            "alpha_word_frac",
            "n_stop_hits",
            "keep",
        ],
    )


# --- Gopher repetition rules (Rae et al. 2021, table A1 repetition set) ----
# Exact semantics (mirrored verbatim by the SQL oracle):
#   lines        = the derived 10-word page (derive_lines)
#   dup_line_frac       = sum over distinct lines of (cnt-1) / n_lines
#   dup_line_char_frac  = sum over distinct lines of (cnt-1)*len(line)
#                         / total chars over ALL line occurrences
#   top{2,3}gram_char_frac = MAX over distinct word n-grams of
#                         cnt * (sum of word lengths in the gram)
#                         / total word chars — "the most repetition-heavy
#                         n-gram", a deterministic variant of the paper's
#                         most-common-n-gram rule (Counter tie-break is
#                         insertion-ordered, not reproducible in SQL)
#   dup_5gram_char_frac = sum over distinct 5-grams of (cnt-1)*gramchars
#                         / total word chars
REP_MAX_DUP_LINE_FRAC = 0.30
REP_MAX_DUP_LINE_CHAR_FRAC = 0.20
REP_MAX_TOP2_CHAR_FRAC = 0.20
REP_MAX_TOP3_CHAR_FRAC = 0.18
REP_MAX_DUP5_CHAR_FRAC = 0.15


def gopher_repetition_batch(
    t: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Gopher repetition-removal battery over the derived page: dup-line
    fractions + top-2/3-gram and dup-5-gram character fractions; keep =
    AND of all five thresholds on UNROUNDED values (oracle identical),
    emitted ratios ROUND(...,6).  Stateless per-doc pass — no shuffle."""
    from collections import Counter

    ids = t.column(id_col).to_pylist()
    out: dict[str, list] = {k: [] for k in (
        "dup_line_frac", "dup_line_char_frac", "top2gram_char_frac",
        "top3gram_char_frac", "dup_5gram_char_frac", "keep",
    )}
    for txt in t.column(text_col).to_pylist():
        lines = derive_lines(txt or "")
        lc = Counter(lines)
        n_lines = len(lines)
        tot_lc = sum(len(ln) for ln in lines)
        dup_lines = sum(c - 1 for c in lc.values())
        dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
        dlf = dup_lines / n_lines if n_lines else 0.0
        dlcf = dup_chars / tot_lc if tot_lc else 0.0

        ws = (txt or "").split(" ")
        wl = [len(w) for w in ws]
        twc = sum(wl)
        fracs = {}
        for n, mode in ((2, "top"), (3, "top"), (5, "dup")):
            if len(ws) < n or twc == 0:
                fracs[(n, mode)] = 0.0
                continue
            grams = Counter(
                (tuple(ws[i : i + n]), sum(wl[i : i + n]))
                for i in range(len(ws) - n + 1)
            )
            if mode == "top":
                fracs[(n, mode)] = max(c * gc for (_, gc), c in grams.items()) / twc
            else:
                fracs[(n, mode)] = (
                    sum((c - 1) * gc for (_, gc), c in grams.items()) / twc
                )
        t2, t3, d5 = fracs[(2, "top")], fracs[(3, "top")], fracs[(5, "dup")]
        out["dup_line_frac"].append(_round6(dlf))
        out["dup_line_char_frac"].append(_round6(dlcf))
        out["top2gram_char_frac"].append(_round6(t2))
        out["top3gram_char_frac"].append(_round6(t3))
        out["dup_5gram_char_frac"].append(_round6(d5))
        out["keep"].append(
            dlf <= REP_MAX_DUP_LINE_FRAC
            and dlcf <= REP_MAX_DUP_LINE_CHAR_FRAC
            and t2 <= REP_MAX_TOP2_CHAR_FRAC
            and t3 <= REP_MAX_TOP3_CHAR_FRAC
            and d5 <= REP_MAX_DUP5_CHAR_FRAC
        )
    arrays = [pa.array(ids, pa.int64())]
    names = [id_col]
    for k, v in out.items():
        arrays.append(pa.array(v, pa.bool_() if k == "keep" else pa.float64()))
        names.append(k)
    return pa.Table.from_arrays(arrays, names=names)


def concat_token_blocks(
    docs: rd.Dataset,
    block_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """GPT-style training-block packing: the corpus's whitespace-token
    stream (docs concatenated in doc_id order) cut into fixed
    `block_tokens`-token blocks -> (block_id, block_text, n_tokens),
    last partial block included.  This is the operator a causal-LM data
    loader actually consumes — blocks cross document boundaries.

    Distributed shape:
      1. each doc learns its global token OFFSET via the exclusive
         prefix-sum substrate (`ops.with_group_ranks(value_col=...)` —
         distributed sort + driver-merged per-block sums, no task holds
         the corpus);
      2. a flat map emits each doc's block-aligned PIECES
         (block_id, offset, piece_text, piece_tokens) — a doc touches
         ceil(n/B)+1 blocks, so output is corpus-sized, never larger;
      3. pieces reassemble per block through one hash-bucketed exchange
         (sort by offset inside the bucket, vectorized pandas join).
    """
    from document_ai_ray.pipelines.ops import with_group_ranks

    P = n_buckets or auto_buckets(docs.count())
    B = block_tokens

    def add_counts(t: pa.Table) -> pa.Table:
        n = [len((x or "").split()) for x in t.column(text_col).to_pylist()]
        return (
            t.append_column("__ntok", pa.array(n, pa.int64()))
            .append_column("__g", pa.array(np.zeros(len(t), np.int8)))
        )

    ranked = with_group_ranks(
        docs.map_batches(add_counts, batch_format="pyarrow"),
        "__g",
        [id_col],
        value_col="__ntok",
    )

    def pieces(t: pa.Table) -> pa.Table:
        bids, offs, texts, ns, buckets = [], [], [], [], []
        for txt, off in zip(
            t.column(text_col).to_pylist(),
            t.column("__cum").to_pylist(),
        ):
            toks = (txt or "").split()
            j = 0
            while j < len(toks):
                pos = off + j
                take = min(B - pos % B, len(toks) - j)
                bids.append(pos // B)
                offs.append(pos)
                texts.append(" ".join(toks[j : j + take]))
                ns.append(take)
                buckets.append((pos // B) % P)
                j += take
        return pa.table(
            {
                "block_id": pa.array(bids, pa.int64()),
                "off": pa.array(offs, pa.int64()),
                "piece": pa.array(texts, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    def assemble(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "block_id": pd.Series(dtype="int64"),
                    "block_text": pd.Series(dtype="object"),
                    "n_tokens": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["block_id", "off"], kind="mergesort")
        out = df.groupby("block_id", as_index=False).agg(
            block_text=("piece", " ".join), n_tokens=("n", "sum")
        )
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out[["block_id", "block_text", "n_tokens"]]

    return bucket_map_groups(
        ranked.map_batches(pieces, batch_format="pyarrow"),
        "bucket",
        assemble,
        P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# CCNet-style corpus-level line dedup: a line occurrence survives iff it
# is the (doc_id, line_no)-minimal occurrence of its text corpus-wide.
# ---------------------------------------------------------------------------

_REBUILD_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("ln", pa.int64()), ("text", pa.string())]
)


def line_dedup_docs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Corpus-level exact line dedup over the derived 10-word-line page
    (CCNet's duplicated-paragraph removal): every line keeps only its
    FIRST occurrence in (doc_id, line_no) order, all later copies are
    dropped, and each document is reassembled from its surviving lines.

    Distributed shape (the 10^12-doc shape):
      1. occurrence scan — flat map to (md5(line), doc_id, ln) triples;
         only 16-byte hashes + two ints shuffle, never line text
         (md5 collisions are the documented 2^-64-scale assumption);
      2. winner election — hash-bucketed exchange, per bucket a
         vectorized sort + duplicated(keep='first'); emits LOSER
         occurrences only (output is duplicate-sized, not corpus-sized);
      3. reassembly — one bucketed hash join of losers against the docs
         (the only corpus-sized exchange, unavoidable: the output IS the
         corpus), re-deriving lines in-task and dropping losers.
    Nothing is ever collected on the driver."""
    P = n_buckets or auto_buckets(docs.count())

    def occurrences(t: pa.Table) -> pa.Table:
        keys, ids, lns, buckets = [], [], [], []
        for i, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            for k, line in enumerate(derive_lines(txt or "")):
                d = hashlib.md5(line.encode("utf-8", "surrogatepass")).digest()
                keys.append(d)
                ids.append(i)
                lns.append(k)
                buckets.append(zlib.crc32(d) % P)
        return pa.table(
            {
                "key": pa.array(keys, pa.binary(16)),
                "doc_id": pa.array(ids, pa.int64()),
                "ln": pa.array(lns, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    occ = docs.map_batches(occurrences, batch_format="pyarrow")

    def losers_in_bucket(df):
        if len(df) == 0:
            return df[["doc_id", "ln"]]
        df = df.sort_values(["key", "doc_id", "ln"], kind="mergesort")
        dup = df.duplicated(subset=["key"], keep="first")
        return df.loc[dup, ["doc_id", "ln"]]

    losers = bucket_map_groups(occ, "bucket", losers_in_bucket, P, batch_format="pandas")
    return _reassemble_without(docs, losers, id_col, text_col, P)


def _reassemble_without(
    docs: rd.Dataset,
    losers: rd.Dataset,
    id_col: str,
    text_col: str,
    P: int,
) -> rd.Dataset:
    """Rebuild each document from its derived lines MINUS the loser
    (doc_id, ln) occurrences: one bucketed hash join of the loser set
    against the docs (the only corpus-sized exchange — the output IS
    the corpus).  Shared by line_dedup_docs and boilerplate_remove_docs;
    emits (doc_id, clean_text, n_lines, n_lines_kept)."""

    def losers_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("doc_id"), t.column("ln"), pa.nulls(len(t), pa.string())],
            schema=_REBUILD_SCHEMA,
        )

    def docs_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column(id_col).cast(pa.int64()),
                pa.nulls(len(t), pa.int64()),
                t.column(text_col),
            ],
            schema=_REBUILD_SCHEMA,
        )

    unioned = losers.map_batches(losers_side, batch_format="pyarrow").union(
        docs.map_batches(docs_side, batch_format="pyarrow")
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = np.mod(t.column("doc_id").to_numpy(zero_copy_only=False), P).astype(np.int32)
        return t.append_column("bucket", pa.array(b))

    def rebuild(df):
        import pandas as pd

        out_schema = {
            "doc_id": pd.Series(dtype="int64"),
            "clean_text": pd.Series(dtype="object"),
            "n_lines": pd.Series(dtype="int64"),
            "n_lines_kept": pd.Series(dtype="int64"),
        }
        if len(df) == 0:
            return pd.DataFrame(out_schema)
        lose = df[df["text"].isna()]
        drops: dict[int, set[int]] = {}
        for i, ln in zip(lose["doc_id"].to_numpy(), lose["ln"].to_numpy()):
            drops.setdefault(int(i), set()).add(int(ln))
        d = df[df["text"].notna()]
        ids_out, clean, n_all, n_kept = [], [], [], []
        for i, txt in zip(d["doc_id"].to_numpy(), d["text"]):
            lines = derive_lines(txt or "")
            gone = drops.get(int(i), ())
            kept = [ln for k, ln in enumerate(lines) if k not in gone]
            ids_out.append(int(i))
            clean.append("\n".join(kept))
            n_all.append(len(lines))
            n_kept.append(len(kept))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids_out, dtype="int64"),
                "clean_text": clean,
                "n_lines": pd.Series(n_all, dtype="int64"),
                "n_lines_kept": pd.Series(n_kept, dtype="int64"),
            }
        )

    return bucket_map_groups(
        unioned.map_batches(add_bucket, batch_format="pyarrow"),
        "bucket",
        rebuild,
        P,
        batch_format="pandas",
    )

# ---------------------------------------------------------------------------
# Per-host boilerplate line removal (RefinedWeb / trafilatura-style
# site-template stripping): a line repeated across many documents of
# the SAME host is chrome (nav, footer, cookie banner), not content.
# The documents table's `source` column stands in for the host.
# ---------------------------------------------------------------------------

BOILER_MIN_DOCS = 2      # a line must appear in >= this many distinct docs
BOILER_MIN_FRAC = 0.05   # ... and in >= this fraction of the host's docs


def _boiler_occurrences(
    docs: rd.Dataset, id_col: str, text_col: str, src_col: str, P: int
) -> rd.Dataset:
    """(md5(line), source, doc_id, ln) occurrence scan, bucketed on
    hash(source) so ONE bucket holds a host's full occurrence set (the
    per-host doc total and per-line doc counts are then bucket-local —
    no second exchange).  Only 16-byte hashes + ids ship, never line
    text.  Partitioning assumption: a single host's occurrences fit one
    task; a pathological mega-host would need key-salted counting with
    a host-totals join — documented, not needed at any tested scale."""

    def occurrences(t: pa.Table) -> pa.Table:
        keys, srcs, ids, lns, buckets = [], [], [], [], []
        for i, src, txt in zip(
            t.column(id_col).to_pylist(),
            t.column(src_col).to_pylist(),
            t.column(text_col).to_pylist(),
        ):
            b = zlib.crc32((src or "").encode("utf-8", "surrogatepass")) % P
            for k, line in enumerate(derive_lines(txt or "")):
                keys.append(hashlib.md5(line.encode("utf-8", "surrogatepass")).digest())
                srcs.append(src)
                ids.append(i)
                lns.append(k)
                buckets.append(b)
        return pa.table(
            {
                "key": pa.array(keys, pa.binary(16)),
                "src": pa.array(srcs, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "ln": pa.array(lns, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    return docs.map_batches(occurrences, batch_format="pyarrow")


def _boiler_threshold(n_docs: int) -> int:
    return max(BOILER_MIN_DOCS, int(np.ceil(BOILER_MIN_FRAC * n_docs)))


def boilerplate_stats_by_source(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    src_col: str = "source",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Per-host boilerplate census: for every source, how many distinct
    derived lines cross the boilerplate threshold (appear in
    >= max(BOILER_MIN_DOCS, ceil(BOILER_MIN_FRAC * n_docs)) distinct
    docs of that source), how many occurrences they account for, and
    how many docs carry at least one.  Output is host-sized."""
    P = n_buckets or auto_buckets(docs.count())
    occ = _boiler_occurrences(docs, id_col, text_col, src_col, P)

    def census(df):
        import pandas as pd

        rows = []
        for src, g in df.groupby("src", sort=False):
            n_docs = g["doc_id"].nunique()
            per = g.groupby("key")["doc_id"].nunique()
            boiler = per[per >= _boiler_threshold(n_docs)]
            hit = g[g["key"].isin(set(boiler.index))]
            rows.append(
                (src, n_docs, len(boiler), len(hit), hit["doc_id"].nunique())
            )
        return pd.DataFrame(
            rows,
            columns=[
                "source",
                "n_docs",
                "n_boiler_lines",
                "n_boiler_occurrences",
                "n_docs_affected",
            ],
        ).astype(
            {
                "n_docs": "int64",
                "n_boiler_lines": "int64",
                "n_boiler_occurrences": "int64",
                "n_docs_affected": "int64",
            }
        )

    return bucket_map_groups(occ, "bucket", census, P, batch_format="pandas")


def boilerplate_remove_docs(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    src_col: str = "source",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Strip per-host boilerplate lines from every document: unlike
    line dedup (keep FIRST occurrence), a boilerplate line is removed
    from ALL documents that carry it.  Same two-exchange shape as
    line_dedup_docs: hash-narrow winner election, then the shared
    `_reassemble_without` corpus join."""
    P = n_buckets or auto_buckets(docs.count())
    occ = _boiler_occurrences(docs, id_col, text_col, src_col, P)

    def losers_in_bucket(df):
        outs = []
        for _, g in df.groupby("src", sort=False):
            per = g.groupby("key")["doc_id"].nunique()
            boiler = per[per >= _boiler_threshold(g["doc_id"].nunique())]
            outs.append(g.loc[g["key"].isin(set(boiler.index)), ["doc_id", "ln"]])
        import pandas as pd

        if not outs:
            return df[["doc_id", "ln"]]
        return pd.concat(outs, ignore_index=True)

    losers = bucket_map_groups(occ, "bucket", losers_in_bucket, P, batch_format="pandas")
    return _reassemble_without(docs, losers, id_col, text_col, P)
