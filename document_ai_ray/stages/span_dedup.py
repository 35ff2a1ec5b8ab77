"""Cross-document substring (span) deduplication.

The fixed-stride token-window variant of exact substring dedup
("Deduplicating Training Data Makes Language Models Better", Lee et
al. 2021 — their suffix-array pass finds duplicated byte spans; the
window discretization here is the shuffle-friendly form of the same
operator, and CCNet's duplicated-paragraph removal is the identical
shape with paragraph segments).  Beyond the reference's operator set
(SURVEY.md §2.7 has only whole-document dedup) — part of the
training-data suite the brief requires.

Windowing contract (shared verbatim by the DuckDB oracles in
`pipelines/dedup_queries.py`): tokens = text.split(' ') (exactly SQL
``string_split(text, ' ')``, empty tokens preserved); window k =
tokens[k*W : (k+1)*W] for k < len(tokens) // W, rendered as
' '.join(window); the tail (len % W tokens) never participates in
matching and is always kept.

Scale shape — two bucketed exchanges, document TEXT never enters the
hash shuffle:

  1. explode (doc_id, win_idx, hash64) and hash-bucket on the window
     hash: every occurrence of a given window lands in one bucket, so
     the global occurrence count and the lexicographically-first
     occurrence (min (doc_id, win_idx)) are computed bucket-locally →
     per-window flags (dup, keep).
  2. flags ∪ documents (tagged union) doc-bucketed: per-doc stats
     aggregation or keep-first text rebuild, one bucket ≈
     corpus/n_buckets documents.

Both exchanges go through `ops.bucket_map_groups` (manual hash
exchange — no sort-shuffle fixed cost) with `auto_buckets` sizing, so
per-task memory stays flat as the corpus grows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from document_ai_ray.functions.hashing import stable64
from document_ai_ray.functions.scale import auto_buckets
from document_ai_ray.pipelines.ops import _mix64, bucket_map_groups

DEFAULT_WINDOW = 8
# windows per document estimate for bucket sizing (mean tokens / W on
# web-text-shaped corpora; only a knob — correctness never depends on it)
_WINDOWS_PER_DOC_EST = 16


def _explode_windows(
    docs: rd.Dataset, id_col: str, text_col: str, window: int, n_buckets: int
) -> rd.Dataset:
    """(doc_id, win_idx, h, bucket) — one row per full window.  The
    window hash is blake2b-64 of the rendered window text (the hash IS
    the dedup key here — no downstream exact verify — so we pay the
    real hash per window rather than reusing the mixed word-hash trick
    from stages/dedup.py, whose combined hashes are verify-shielded)."""

    def fn(t: pa.Table) -> pa.Table:
        ids: list[int] = []
        ks: list[int] = []
        hs: list[int] = []
        for did, txt in zip(
            t.column(id_col).to_pylist(), t.column(text_col).to_pylist()
        ):
            toks = (txt or "").split(" ")
            for k in range(len(toks) // window):
                ids.append(did)
                ks.append(k)
                hs.append(stable64(" ".join(toks[k * window : (k + 1) * window])))
        h = np.asarray(hs, dtype=np.uint64)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(ks, pa.int32()),
                pa.array(h.view(np.int64)),
                pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
            ],
            names=[id_col, "win_idx", "h", "bucket"],
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def _span_flags(
    docs: rd.Dataset, id_col: str, text_col: str, window: int, n_buckets: int
) -> rd.Dataset:
    """Per-window flags (doc_id, win_idx, dup, keep): dup = the window
    text occurs >1 time corpus-wide; keep = this occurrence is the
    lexicographically-first (unique windows keep trivially)."""
    exploded = _explode_windows(docs, id_col, text_col, window, n_buckets)

    def flags_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "win_idx": pd.Series([], dtype="int32"),
                    "dup": pd.Series([], dtype="bool"),
                    "keep": pd.Series([], dtype="bool"),
                }
            )
        df = df.sort_values(["h", id_col, "win_idx"], kind="mergesort")
        dup = df.groupby("h")["h"].transform("size").to_numpy() > 1
        keep = ~df.duplicated("h").to_numpy()  # first row per h after the sort
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "win_idx": df["win_idx"].to_numpy(),
                "dup": dup,
                "keep": keep,
            }
        )

    return bucket_map_groups(
        exploded, "bucket", flags_in_bucket, n_buckets, batch_format="pandas"
    )


def _doc_bucket_col(ds: rd.Dataset, id_col: str, n_buckets: int) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (_mix64(ids.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    return ds.map_batches(fn, batch_format="pyarrow")


def dup_span_stats(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> rd.Dataset:
    """Per-document duplicated-window fraction (doc_id, n_windows,
    dup_windows, dup_frac) — the Gopher/RefinedWeb 'duplicated n-gram
    fraction' quality signal, computed corpus-globally.  Documents too
    short for one window report 0 / 0.0."""
    n_docs = docs.count()
    hash_buckets = auto_buckets(n_docs * _WINDOWS_PER_DOC_EST)
    flags = _span_flags(docs, id_col, text_col, window, hash_buckets)

    # tagged union so zero-window docs still get a row: doc side carries
    # win_idx=null, flag side carries real windows.
    def doc_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column(id_col).cast(pa.int64()),
                pa.nulls(n, pa.int32()),
                pa.nulls(n, pa.bool_()),
            ],
            names=[id_col, "win_idx", "dup"],
        )

    def flag_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column(id_col), t.column("win_idx"), t.column("dup")],
            names=[id_col, "win_idx", "dup"],
        )

    unioned = docs.select_columns([id_col]).map_batches(
        doc_side, batch_format="pyarrow"
    ).union(flags.map_batches(flag_side, batch_format="pyarrow"))

    doc_buckets = auto_buckets(n_docs, rows_per_bucket=1 << 15)

    def stats_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        base = df[df["win_idx"].isna()][[id_col]].drop_duplicates()
        flag = df[df["win_idx"].notna()]
        if flag.empty:
            g = pd.DataFrame({id_col: [], "n_windows": [], "dup_windows": []})
        else:
            g = (
                flag.groupby(id_col)
                .agg(
                    n_windows=("win_idx", "size"),
                    dup_windows=("dup", lambda s: int(s.astype(bool).sum())),
                )
                .reset_index()
            )
        out = base.merge(g, on=id_col, how="left").fillna(0)
        n = out["n_windows"].to_numpy(dtype=np.float64)
        d = out["dup_windows"].to_numpy(dtype=np.float64)
        frac = np.where(n > 0, d / np.maximum(n, 1), 0.0)
        # DuckDB ROUND convention (half away from zero), 6 places
        frac = np.copysign(np.floor(np.abs(frac) * 1e6 + 0.5), frac) / 1e6
        return pd.DataFrame(
            {
                id_col: out[id_col].astype("int64"),
                "n_windows": out["n_windows"].astype("int64"),
                "dup_windows": out["dup_windows"].astype("int64"),
                "dup_frac": frac,
            }
        )

    return bucket_map_groups(
        _doc_bucket_col(unioned, id_col, doc_buckets),
        "bucket",
        stats_in_bucket,
        doc_buckets,
        batch_format="pandas",
    )


def dedup_spans_keep_first(
    docs: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> rd.Dataset:
    """Rebuild every document keeping only windows that are the
    corpus-globally first occurrence of their content (keep-first
    substring dedup); sub-window tails always survive.  Output
    (doc_id, text) covers every input document — a doc shorter than
    one window passes through unchanged."""
    n_docs = docs.count()
    hash_buckets = auto_buckets(n_docs * _WINDOWS_PER_DOC_EST)
    flags = _span_flags(docs, id_col, text_col, window, hash_buckets)

    def doc_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column(id_col).cast(pa.int64()),
                t.column(text_col).cast(pa.string()),
                pa.nulls(n, pa.int32()),
                pa.nulls(n, pa.bool_()),
            ],
            names=[id_col, text_col, "win_idx", "keep"],
        )

    def flag_side(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column(id_col),
                pa.nulls(t.num_rows, pa.string()),
                t.column("win_idx"),
                t.column("keep"),
            ],
            names=[id_col, text_col, "win_idx", "keep"],
        )

    unioned = docs.select_columns([id_col, text_col]).map_batches(
        doc_side, batch_format="pyarrow"
    ).union(flags.map_batches(flag_side, batch_format="pyarrow"))

    doc_buckets = auto_buckets(n_docs, rows_per_bucket=1 << 15)

    def rebuild_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[df[text_col].notna()]
        flag = df[df[text_col].isna()]
        keep_map: dict[int, set[int]] = {}
        if not flag.empty:
            kept = flag[flag["keep"].astype(bool)]
            for did, g in kept.groupby(id_col):
                keep_map[int(did)] = set(g["win_idx"].astype(int))
        out_ids: list[int] = []
        out_texts: list[str] = []
        for did, txt in zip(texts[id_col], texts[text_col]):
            toks = txt.split(" ")
            nw = len(toks) // window
            ks = keep_map.get(int(did), set())
            parts = [
                " ".join(toks[k * window : (k + 1) * window])
                for k in range(nw)
                if k in ks
            ]
            tail = " ".join(toks[nw * window :])
            if tail:
                parts.append(tail)
            out_ids.append(int(did))
            out_texts.append(" ".join(parts))
        return pd.DataFrame(
            {id_col: pd.Series(out_ids, dtype="int64"), text_col: out_texts}
        )

    return bucket_map_groups(
        _doc_bucket_col(unioned, id_col, doc_buckets),
        "bucket",
        rebuild_in_bucket,
        doc_buckets,
        batch_format="pandas",
    )
