"""BPE merge-rule training over a Ray Data corpus.

The Sennrich et al. 2016 byte-pair-encoding trainer, in the shape
every production tokenizer trainer (SentencePiece, HF tokenizers)
uses at scale: ONE distributed pass reduces the corpus to a
word-frequency table (BPE never merges across word boundaries, so the
pair statistics of the corpus and of the weighted word table are
identical), then the merge loop runs over the VOCAB-sized table.  The
corpus-sized work is the streaming count; the driver only ever holds
(word, count) rows capped to the top `vocab_cap` by frequency — the
standard trainer cap, collected with the exact bucketed heavy-hitter
shape of `vocab_top_words`.

Determinism: the next merge is the (count DESC, pair ASC) maximum, so
equal-count ties break lexicographically — byte-stable merge tables
for identical input.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from document_ai_ray.functions.hashing import crc_bucket
from document_ai_ray.functions.scale import auto_buckets
from document_ai_ray.pipelines.ops import bucket_map_groups


def corpus_word_counts(
    docs: rd.Dataset, text_col: str = "text", vocab_cap: int | None = None
) -> list[tuple[str, int]]:
    """Distributed exact (word, count) table: per-batch vectorized
    combiner partials, hash-bucketed merge; with vocab_cap each bucket
    emits only its local top (a global top row is top in its bucket),
    one tiny final cut on the driver."""
    P = auto_buckets(docs.count())

    def partial_counts(t: pa.Table) -> pa.Table:
        from document_ai_ray.stages.text_analysis import word_value_counts

        g = word_value_counts(t.column(text_col))
        bucket = pa.array(
            [crc_bucket(w, P) for w in g.column("word").to_pylist()], pa.int32()
        )
        return g.append_column("bucket", bucket)

    def bucket_merge(df):
        out = df.groupby("word", as_index=False)["n"].sum()
        if vocab_cap is not None:
            out = out.sort_values(["n", "word"], ascending=[False, True]).head(vocab_cap)
        return out

    merged = bucket_map_groups(
        docs.map_batches(partial_counts, batch_format="pyarrow"),
        "bucket",
        bucket_merge,
        P,
        batch_format="pandas",
    )
    rows = [(r["word"], int(r["n"])) for b in merged.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    rows.sort(key=lambda wn: (-wn[1], wn[0]))
    if vocab_cap is not None:
        rows = rows[:vocab_cap]
    return rows


def train_merges_from_counts(
    word_counts: list[tuple[str, int]], k: int
) -> list[tuple[int, str, str, int]]:
    """Classic BPE merge loop over a (word, count) table: words start
    as character sequences; each round merges the globally
    most-frequent adjacent symbol pair (count DESC, pair ASC).
    Returns up to k rows (rank, left, right, pair_count); stops early
    when no pair repeats."""
    words: list[tuple[list[str], int]] = [(list(w), n) for w, n in word_counts if w]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(k):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < 2:
            break  # nothing repeats; further merges are arbitrary
        merges.append((rank, left, right, best))
        fused = left + right
        for i, (syms, n) in enumerate(words):
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(fused)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, n)
    return merges


def bpe_train_merges(
    docs: rd.Dataset,
    k: int = 50,
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
) -> rd.Dataset:
    """documents -> (rank, left, right, pair_count) merge table."""
    counts = corpus_word_counts(docs, text_col=text_col, vocab_cap=vocab_cap)
    merges = train_merges_from_counts(counts, k)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array([m[0] for m in merges], pa.int64()),
                "left": pa.array([m[1] for m in merges], pa.string()),
                "right": pa.array([m[2] for m in merges], pa.string()),
                "pair_count": pa.array([m[3] for m in merges], pa.int64()),
            }
        )
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a trained merge table to one word: repeatedly fuse the
    LOWEST-rank adjacent pair (the canonical BPE encode order — the
    order the rules were learned in, not greedy left-to-right)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_docs(
    docs: rd.Dataset,
    merges: list[tuple[int, str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Tokenize the corpus with a trained merge table: one streaming
    pass, ranks broadcast once via ray.put (vocab-sized, never
    re-shipped per batch), per-worker word->len memo (Zipf makes the
    distinct-word working set tiny next to the token stream).  Emits
    (id, n_words, n_tokens, n_chars) per document."""
    import ray

    from document_ai_ray.pipelines.ops import get_broadcast

    ranks = {(left, right): rank for rank, left, right, _ in merges}
    ref = ray.put(ranks)

    def encode_batch(t: pa.Table) -> pa.Table:
        r: dict = get_broadcast((ref,), tag="bpe_ranks")
        memo: dict[str, int] = {}
        ids = t.column(id_col).to_pylist()
        n_words, n_tokens, n_chars = [], [], []
        for txt in t.column(text_col).to_pylist():
            words = [w for w in (txt or "").split(" ") if w]
            tot = 0
            for w in words:
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, r))
                    memo[w] = n
                tot += n
            n_words.append(len(words))
            n_tokens.append(tot)
            n_chars.append(sum(len(w) for w in words))
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        )

    return docs.map_batches(encode_batch, batch_format="pyarrow")
