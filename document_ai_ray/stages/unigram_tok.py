"""SentencePiece-style unigram-LM tokenizer trainer (Kudo 2018,
"Subword Regularization") — the OTHER production tokenizer family next
to BPE (stages/bpe.py): instead of growing a vocab by merges, START
from a large seed of candidate substrings, fit piece probabilities by
EM under a unigram segmentation model, and iteratively PRUNE the vocab
down to the target size.

This is the hard-EM (Viterbi) variant: the E-step assigns each word
its single best segmentation under current piece log-probs (a tiny DP
over the word), the M-step re-estimates probabilities from the
frequency-weighted piece counts.  Hard EM is monotone in Viterbi
likelihood for a fixed vocab; pruning steps may trade likelihood for
size, exactly as in SentencePiece.

Scale shape (same discipline as the BPE trainer): ONE distributed pass
reduces the corpus to a (word, count) table — unigram segmentation
never crosses word boundaries, so the weighted word table carries the
full statistics.  EM then runs over the DISTINCT-WORD table as a Ray
Dataset: piece log-probs broadcast per round, per-batch Viterbi counts
emitted as vocabulary-sized partials, one driver-side merge per round
(the driver only ever holds vocab-sized state).  At 100 TB the word
table is millions of rows — still a small Dataset; the corpus-sized
work stays in the single counting pass.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

MAX_PIECE_LEN = 6


def seed_vocab(word_counts: list[tuple[str, int]], seed_size: int, max_len: int = MAX_PIECE_LEN) -> dict[str, int]:
    """Candidate pieces: every substring (length <= max_len) of every
    word, weighted by word frequency; keep the top `seed_size` by
    weight; ALL single characters are always kept (they guarantee every
    word stays segmentable through every prune)."""
    weight: dict[str, int] = {}
    for w, n in word_counts:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_len, L) + 1):
                p = w[i:j]
                weight[p] = weight.get(p, 0) + n
    chars = {p for p in weight if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in weight.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    out = {p: weight[p] for p in chars}
    out.update(dict(multi))
    return out


def viterbi_segment(word: str, logp: dict[str, float], max_len: int = MAX_PIECE_LEN) -> list[str]:
    """Best segmentation of `word` under piece log-probs (ties broken
    toward FEWER pieces, then lexicographically smaller piece at each
    boundary — deterministic).  Single chars must be present."""
    L = len(word)
    best = [-math.inf] * (L + 1)
    back = [0] * (L + 1)
    best[0] = 0.0
    for i in range(1, L + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    pieces = []
    i = L
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def _counts_to_logp(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def seed_vocab_distributed(
    words: rd.Dataset, seed_size: int, max_len: int = MAX_PIECE_LEN
) -> dict[str, int]:
    """`seed_vocab` with the substring enumeration pushed into the
    word-table Dataset (at 100 TB the distinct-word table is millions
    of rows — the driver must not loop it): per-batch substring-weight
    COMBINER partials, hash-bucketed exact merge, per-bucket local
    top (a global top piece is top in its bucket), tiny final cut.
    Single characters bypass the cap, as in the driver version."""
    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    P = auto_buckets(words.count())

    def partial(t: pa.Table) -> pa.Table:
        weight: dict[str, int] = {}
        for w, n in zip(t.column("word").to_pylist(), t.column("n").to_pylist()):
            L = len(w)
            for i in range(L):
                for j in range(i + 1, min(i + max_len, L) + 1):
                    p = w[i:j]
                    weight[p] = weight.get(p, 0) + n
        return pa.table(
            {
                "piece": pa.array(list(weight), pa.string()),
                "c": pa.array(list(weight.values()), pa.int64()),
                "bucket": pa.array(
                    [crc_bucket(p, P) for p in weight], pa.int32()
                ),
            }
        )

    def bucket_top(df):
        out = df.groupby("piece", as_index=False)["c"].sum()
        chars = out[out["piece"].str.len() == 1]
        multi = out[out["piece"].str.len() > 1]
        multi = multi.sort_values(["c", "piece"], ascending=[False, True]).head(seed_size)
        import pandas as pd

        return pd.concat([chars, multi], ignore_index=True)

    merged = bucket_map_groups(
        words.map_batches(partial, batch_format="pyarrow"),
        "bucket",
        bucket_top,
        P,
        batch_format="pandas",
    )
    cand: dict[str, int] = {}
    for b in merged.iter_batches(batch_format="pyarrow"):
        cand.update(zip(b.column("piece").to_pylist(), b.column("c").to_pylist()))
    chars = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1), key=lambda kv: (-kv[1], kv[0])
    )[: max(0, seed_size - len(chars))]
    out = dict(chars)
    out.update(dict(multi))
    return out


def unigram_train(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 300,
    seed_size: int = 3000,
    em_rounds: int = 2,
    prune_rounds: int = 4,
    prune_frac: float = 0.25,
) -> tuple[dict[str, float], list[float]]:
    """Train on a weighted word table.  Returns ({piece: logprob},
    per-round corpus Viterbi log-likelihood history).  Both the seed
    enumeration and the E-step run DISTRIBUTED over a Ray Dataset of
    the distinct words; all driver state is vocab-sized."""
    from document_ai_ray.pipelines.ops import get_broadcast

    words = rd.from_arrow(
        pa.table(
            {
                "word": pa.array([w for w, _ in word_counts], pa.string()),
                "n": pa.array([n for _, n in word_counts], pa.int64()),
            }
        )
    ).materialize()  # seeding + EM re-scan it every round

    weights = seed_vocab_distributed(words, seed_size)
    logp = _counts_to_logp({p: float(c) for p, c in weights.items()})

    history: list[float] = []

    def em_round(cur_logp: dict[str, float], tag: str) -> tuple[dict[str, float], float]:
        ref = ray.put(cur_logp)

        def estep(t: pa.Table, _ref=ref, _tag=tag) -> pa.Table:
            lp: dict = get_broadcast((_ref,), tag=_tag)
            counts: dict[str, float] = {}
            ll = 0.0
            for w, n in zip(t.column("word").to_pylist(), t.column("n").to_pylist()):
                pieces = viterbi_segment(w, lp)
                for p in pieces:
                    counts[p] = counts.get(p, 0.0) + n
                ll += n * sum(lp[p] for p in pieces)
            return pa.table(
                {
                    "piece": pa.array(list(counts), pa.string()),
                    "c": pa.array(list(counts.values()), pa.float64()),
                    "ll": pa.array([ll] * len(counts), pa.float64())
                    if counts
                    else pa.array([], pa.float64()),
                    "first": pa.array(
                        [1] + [0] * (len(counts) - 1) if counts else [], pa.int8()
                    ),
                }
            )

        merged: dict[str, float] = {}
        total_ll = 0.0
        for b in (
            words.map_batches(estep, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        ):
            ll_col = b.column("ll").to_numpy(zero_copy_only=False)
            first = b.column("first").to_numpy(zero_copy_only=False)
            total_ll += float((ll_col * first).sum())
            for p, c in zip(b.column("piece").to_pylist(), b.column("c").to_pylist()):
                merged[p] = merged.get(p, 0.0) + c
        # unused pieces vanish; single chars are re-floored so every
        # word stays segmentable
        for ch in {p for p in cur_logp if len(p) == 1}:
            merged.setdefault(ch, 0.5)
        return _counts_to_logp(merged), total_ll

    rnd = 0
    for _ in range(prune_rounds + 1):
        for _ in range(em_rounds):
            logp, ll = em_round(logp, f"ut_{rnd}_{id(word_counts)}")
            history.append(ll)
            rnd += 1
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = vocab_size - sum(1 for p in logp if len(p) == 1)
        if n_multi <= max(target_multi, 0):
            break
        # prune the lowest-probability multi-char pieces (never chars)
        keep_n = max(int(n_multi * (1 - prune_frac)), target_multi, 0)
        multi_sorted = sorted(
            ((p, v) for p, v in logp.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept = dict(multi_sorted[:keep_n])
        kept.update({p: v for p, v in logp.items() if len(p) == 1})
        logp = kept
    # final EM to re-normalize after the last prune
    logp, ll = em_round(logp, f"ut_final_{id(word_counts)}")
    history.append(ll)
    return logp, history


def unigram_encode_docs(
    docs: rd.Dataset, logp: dict[str, float], text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Tokenize documents with a trained vocab: per-doc token count,
    char count and a ROUNDTRIP check (concatenating each word's pieces
    must rebuild the word — asserted per doc, emitted as a column)."""
    from document_ai_ray.pipelines.ops import get_broadcast

    ref = ray.put(logp)

    def enc(t: pa.Table, _ref=ref) -> pa.Table:
        lp: dict = get_broadcast((_ref,), tag="ut_encode")
        n_tok, n_chr, ok = [], [], []
        cache: dict[str, tuple[int, bool]] = {}
        for text in t.column(text_col).to_pylist():
            tot = 0
            good = True
            chars = 0
            for w in text.split(" "):
                if not w:
                    continue
                chars += len(w)
                hit = cache.get(w)
                if hit is None:
                    pieces = viterbi_segment(w, lp)
                    hit = (len(pieces), "".join(pieces) == w)
                    cache[w] = hit
                tot += hit[0]
                good &= hit[1]
            n_tok.append(tot)
            n_chr.append(chars)
            ok.append(good)
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_chars_tok": pa.array(n_chr, pa.int64()),
                "roundtrip_ok": pa.array(ok),
            }
        )

    return docs.map_batches(enc, batch_format="pyarrow")
