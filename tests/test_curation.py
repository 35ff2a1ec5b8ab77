"""C4 line filter, Gopher rule battery, corpus-level line dedup
(stages/curation.py) — crafted-input rule coverage + brute-force
equivalence; the DuckDB oracles are the primary corpus gate."""

import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.curation import (
    LINE_WORDS,
    c4_filter_batch,
    c4_punct,
    derive_lines,
    gopher_batch,
    line_dedup_docs,
)


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


# ---------------------------------------------------------------- derive


def test_derive_lines_chunking():
    ws = [f"w{i}" for i in range(23)]
    lines = derive_lines(" ".join(ws))
    assert len(lines) == 3
    assert lines[0].split(" ") == ws[:LINE_WORDS]
    assert lines[2].split(" ") == ws[20:]
    assert derive_lines("") == [""]  # SQL string_split('') parity


# ---------------------------------------------------------------- gopher


def _gopher_row(text, doc_id=0):
    out = gopher_batch(_tbl([(doc_id, text)]))
    return {c: out.column(c)[0].as_py() for c in out.column_names}


GOOD = "the quick brown fox jumps over lazy dogs and then runs off to be with all of that good crew having fun " * 3  # 63 words, all rules pass


def test_gopher_good_doc_keeps():
    r = _gopher_row(GOOD)
    assert r["keep"] and r["n_words"] >= 50 and r["n_stop_hits"] >= 2
    assert 3.0 <= r["mean_word_len"] <= 10.0


def test_gopher_too_few_words():
    assert not _gopher_row("the quick brown fox with that")["keep"]


def test_gopher_mean_word_length_bounds():
    long_words = " ".join(["absolutelyenormousword"] * 60) + " the of"
    assert not _gopher_row(long_words)["keep"]
    short_words = " ".join(["a b"] * 60) + " the of"
    r = _gopher_row(short_words)
    assert r["mean_word_len"] < 3.0 and not r["keep"]


def test_gopher_symbol_ratio():
    spam = GOOD + " " + "#" * 1  # one '#' per ~63 words is fine
    assert _gopher_row(spam)["keep"]
    spam = GOOD + " " + " ".join(["#"] * 20)
    r = _gopher_row(spam)
    assert r["symbol_word_ratio"] > 0.1 and not r["keep"]


def test_gopher_ellipsis_and_bullet_lines():
    lines = [GOOD] + [f"- item {i} of the list with that" for i in range(40)]
    r = _gopher_row("\n".join(lines))
    assert r["bullet_line_frac"] > 0.9 and not r["keep"]
    lines = [GOOD] + [f"teaser {i} of the story continues..." for i in range(40)]
    r = _gopher_row("\n".join(lines))
    assert r["ellipsis_line_frac"] > 0.3 and not r["keep"]


def test_gopher_alpha_and_stopwords():
    nums = GOOD + " " + " ".join(str(i) for i in range(200))
    r = _gopher_row(nums)
    assert r["alpha_word_frac"] < 0.8 and not r["keep"]
    no_stops = " ".join(["zork grue flask"] * 30)
    r = _gopher_row(no_stops)
    assert r["n_stop_hits"] < 2 and not r["keep"]


# -------------------------------------------------------------------- c4


def test_c4_punct_cycle_and_line_rule():
    words = " ".join(["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 4)
    out = c4_filter_batch(_tbl([(0, words)]))
    lines = out.column("clean_text")[0].as_py().split("\n")
    # doc 0: line punct cycles '.', '', '!' — lines 1 (no terminal) drop
    assert out.column("n_lines")[0].as_py() == 4
    assert all(ln.endswith((".", "!", "?", '"')) for ln in lines if ln)
    kept = out.column("n_lines_kept")[0].as_py()
    assert kept == len([ln for ln in lines if ln])
    assert c4_punct(0, 0) == "." and c4_punct(0, 1) == "" and c4_punct(0, 2) == "!"


def test_c4_short_line_dropped_and_min_lines():
    # 40 words -> 4 lines, but only ceil fraction get terminal punct;
    # a 3-word tail line must drop even when punctuated
    words = " ".join([f"w{i}" for i in range(33)])
    out = c4_filter_batch(_tbl([(0, words)]))
    for ln in out.column("clean_text")[0].as_py().split("\n"):
        if ln:
            assert len(ln.split()) >= 5


def test_c4_brace_and_lorem_kill_doc():
    base = " ".join(["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 9)
    ok = c4_filter_batch(_tbl([(0, base)]))
    assert ok.column("keep")[0].as_py()
    brace = c4_filter_batch(_tbl([(0, base + " {config}")]))
    assert not brace.column("keep")[0].as_py()
    lorem = c4_filter_batch(_tbl([(0, base + " Lorem Ipsum dolor")]))
    assert not lorem.column("keep")[0].as_py()


# ------------------------------------------------------------ line dedup


def _brute_line_dedup(rows):
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        lines = derive_lines(text)
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[doc_id] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_line_dedup_matches_bruteforce():
    chunk_a = " ".join([f"a{i}" for i in range(LINE_WORDS)])
    chunk_b = " ".join([f"b{i}" for i in range(LINE_WORDS)])
    chunk_c = " ".join([f"c{i}" for i in range(LINE_WORDS)])
    rows = [
        (0, f"{chunk_a} {chunk_b}"),        # both survive (first)
        (1, f"{chunk_b} {chunk_c}"),        # b drops, c survives
        (2, f"{chunk_a} {chunk_b}"),        # loses EVERYTHING
        (3, f"{chunk_c} unique tail words"),  # c drops, tail survives
    ]
    ds = rd.from_arrow(_tbl(rows))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_kept"])
        for r in line_dedup_docs(ds, n_buckets=4).take_all()
    }
    assert got == _brute_line_dedup(rows)
    assert got[2][0] == "" and got[2][2] == 0  # total loss -> empty doc


def test_line_dedup_first_occurrence_order_within_doc():
    # the same chunk twice WITHIN one doc: second copy drops too
    chunk = " ".join([f"x{i}" for i in range(LINE_WORDS)])
    ds = rd.from_arrow(_tbl([(7, f"{chunk} {chunk}")]))
    [row] = line_dedup_docs(ds, n_buckets=2).take_all()
    assert row["n_lines"] == 2 and row["n_lines_kept"] == 1
    assert row["clean_text"] == chunk


# ------------------------------------------------- ccnet buckets


def test_ccnet_buckets_equal_depth_and_order(sf_tiny):
    from document_ai_ray.pipelines.curation_queries import ccnet_perplexity_buckets

    rows = ccnet_perplexity_buckets(sf_tiny).take_all()
    by_bucket: dict[str, list[float]] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_logprob"])
    sizes = {b: len(v) for b, v in by_bucket.items()}
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1  # equal depth
    # head is the most fluent third: every head score >= every tail score
    assert min(by_bucket["head"]) >= max(by_bucket["tail"])
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])


# ---------------------------------------------------- webdataset + bpe


def test_webdataset_roundtrip_small(tmp_path):
    from document_ai_ray.sources.webdataset import read_webdataset, write_webdataset

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["hello world", "", "unicode – ✓ text"], pa.string()),
            "lang": pa.array(["en", "fr", "de"], pa.string()),
            "source": pa.array(["s1", "s2", "s3"], pa.string()),
        }
    )
    paths = [
        r["path"]
        for r in write_webdataset(rd.from_arrow(t), str(tmp_path)).take_all()
    ]
    assert paths and all(p.endswith(".tar") for p in paths)
    back = read_webdataset(paths).take_all()
    got = {r["doc_id"]: (r["text"], r["lang"], r["source"]) for r in back}
    assert got == {1: ("hello world", "en", "s1"), 2: ("", "fr", "s2"),
                   3: ("unicode – ✓ text", "de", "s3")}


def test_webdataset_bytes_deterministic(tmp_path):
    from document_ai_ray.sources.webdataset import _tar_bytes

    rows = [{"doc_id": 5, "text": "abc", "lang": "en", "source": "s0"}]
    assert _tar_bytes(rows) == _tar_bytes([dict(r) for r in rows])


def _ref_bpe_from_corpus(texts, k):
    """Brute-force corpus-level BPE: pair counts over every word
    occurrence (not the word-frequency table) — the equivalence the
    distributed trainer's docstring claims."""
    words = [list(w) for t in texts for w in t.split(" ") if w]
    merges = []
    for rank in range(k):
        counts = {}
        for syms in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (l, r), best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append((rank, l, r, best))
        fused = l + r
        for i, syms in enumerate(words):
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(fused); j += 2
                else:
                    out.append(syms[j]); j += 1
            words[i] = out
    return merges


def test_bpe_matches_corpus_level_reference():
    from document_ai_ray.stages.bpe import bpe_train_merges

    texts = [
        "the theatre then thundered",
        "thin things the the then",
        "other leather weather the",
        "aaa aaab aab the",
    ] * 3
    ds = rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(ds, k=12, vocab_cap=1 << 20).take_all()
    ]
    got.sort()
    assert got == _ref_bpe_from_corpus(texts, 12)
    assert got[0][1:3] == ("t", "h")  # 'th' is the dominant first merge


def test_bpe_stops_when_nothing_repeats():
    from document_ai_ray.stages.bpe import train_merges_from_counts

    merges = train_merges_from_counts([("abc", 1), ("def", 1)], k=10)
    assert merges == []


def test_badword_filter_case_insensitive(sf_tiny):
    from document_ai_ray.pipelines.curation_queries import badword_filter_docs

    got = {r["doc_id"]: (r["n_bad"], r["keep"])
           for r in badword_filter_docs(sf_tiny).take_all()}
    assert len(got) == 500
    assert all(k == (n == 0) for n, k in got.values())
    assert any(n > 0 for n, _ in got.values())  # the blocklist discriminates


def test_split_deterministic_and_proportioned(sf_tiny):
    from document_ai_ray.pipelines.curation_queries import split_train_val_test

    a = {r["doc_id"]: r["split"] for r in split_train_val_test(sf_tiny).take_all()}
    b = {r["doc_id"]: r["split"] for r in split_train_val_test(sf_tiny).take_all()}
    assert a == b  # stable across runs
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert train / n > 0.9  # ~98% within small-sample noise


def test_concat_token_blocks_bruteforce():
    from document_ai_ray.stages.curation import concat_token_blocks

    texts = ["a b c", "", "d e f g h", "i", "j k l m n o p q r s t"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    B = 4
    got = sorted(
        (r["block_id"], r["block_text"], r["n_tokens"])
        for r in concat_token_blocks(ds, block_tokens=B, n_buckets=3).take_all()
    )
    stream = [w for t in texts for w in t.split()]
    want = [
        (i, " ".join(stream[i * B : (i + 1) * B]), len(stream[i * B : (i + 1) * B]))
        for i in range((len(stream) + B - 1) // B)
    ]
    assert got == want
    # blocks cross doc boundaries: block 0 is "a b c d" (docs 0 + 2)
    assert got[0][1] == "a b c d"


def test_bottomk_union_merge_property(sf_tiny):
    # the KMV property the docstring claims: the global bottom-k equals
    # the bottom-k of the union of any partition's bottom-k sets
    from document_ai_ray.pipelines.curation_queries import _BK_GLOBAL, sample_bottom_k
    import hashlib

    got = sorted(r["skey"] for r in sample_bottom_k(sf_tiny).take_all())
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_tiny}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    allk = sorted(hashlib.md5(f"{i}-bottomk-r3".encode()).hexdigest() for i in ids)
    assert got == allk[:_BK_GLOBAL]


def test_profile_documents_null_handling():
    from document_ai_ray.pipelines import curation_queries as cq

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, None], pa.int64()),
            "text": pa.array(["b", None, "a"], pa.string()),
            "lang": pa.array(["en", "en", "fr"], pa.string()),
            "source": pa.array(["s", "s", "s"], pa.string()),
            "n_chars": pa.array([100, 99, 9], pa.int64()),
        }
    )
    q = cq.profile_documents
    # drive the query over a crafted in-memory table via read_table patch
    orig = cq.read_table
    cq.read_table = lambda *a, **k: rd.from_arrow(t)
    try:
        rows = {r["col"]: r for r in q("unused").take_all()}
    finally:
        cq.read_table = orig
    assert rows["doc_id"]["n_null"] == 1
    assert rows["text"]["min_val"] == "a" and rows["text"]["max_val"] == "b"
    assert rows["n_chars"]["min_val"] == "9" and rows["n_chars"]["max_val"] == "100"
    assert rows["lang"]["n_distinct"] == 2 and rows["source"]["n_distinct"] == 1


def _replay_encode(word, merges):
    """Independent reference encode: apply merges IN RANK ORDER, fusing
    left-to-right occurrences — the original Sennrich replay procedure
    (equivalent to the lowest-rank-pair loop with leftmost tie-break)."""
    syms = list(word)
    for _, l, r, _ in sorted(merges):
        j, out = 0, []
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                out.append(l + r); j += 2
            else:
                out.append(syms[j]); j += 1
        syms = out
    return syms


def test_encode_word_uses_rank_order_not_leftmost():
    from document_ai_ray.stages.bpe import encode_word

    # rank 0 fuses (b,c); a greedy left-to-right scan would fuse (a,b)
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word("abc", ranks) == ["a", "bc"]
    assert encode_word("aabc", ranks) == ["a", "a", "bc"]


def test_bpe_encode_docs_matches_replay_reference():
    from document_ai_ray.stages.bpe import (
        bpe_encode_docs,
        corpus_word_counts,
        train_merges_from_counts,
    )

    texts = [
        "the theatre then thundered",
        "thin things the the then",
        "other leather weather the",
        "aaa aaab aab the",
        "",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    ds = rd.from_arrow(t).repartition(2)
    merges = train_merges_from_counts(
        corpus_word_counts(ds, vocab_cap=1 << 20), 12
    )
    got = (
        bpe_encode_docs(rd.from_arrow(t), merges)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i, txt in enumerate(texts):
        words = [w for w in txt.split(" ") if w]
        want = sum(len(_replay_encode(w, merges)) for w in words)
        assert got.loc[i, "n_tokens"] == want
        assert got.loc[i, "n_words"] == len(words)
        assert got.loc[i, "n_chars"] == sum(len(w) for w in words)
        assert got.loc[i, "n_words"] <= got.loc[i, "n_tokens"] <= max(got.loc[i, "n_chars"], got.loc[i, "n_words"])
    assert got.loc[4].tolist() == [0, 0, 0]


def test_gopher_repetition_rules_fire():
    import pyarrow as pa

    from document_ai_ray.stages.curation import gopher_repetition_batch

    normal = " ".join(f"w{i}x" for i in range(60))           # all-distinct words
    dup_lines = " ".join(["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 6)
    top2 = "spam ham " * 40 + " ".join(f"u{i}" for i in range(10))
    dup5 = ("one two three four five " * 8) + " ".join(f"q{i}" for i in range(30))
    t = pa.Table.from_pylist(
        [
            {"doc_id": 0, "text": normal},
            {"doc_id": 1, "text": dup_lines},
            {"doc_id": 2, "text": top2},
            {"doc_id": 3, "text": dup5},
            {"doc_id": 4, "text": ""},
        ]
    )
    rows = {r["doc_id"]: r for r in gopher_repetition_batch(t).to_pylist()}
    assert rows[0]["keep"] is True and rows[0]["dup_line_frac"] == 0.0
    # 6 identical 10-word lines -> 5/6 duplicates
    assert abs(rows[1]["dup_line_frac"] - 5 / 6) < 1e-6  # emitted ROUND(...,6)
    assert rows[1]["keep"] is False
    # 'spam ham' dominates the 2-gram mass
    assert rows[2]["top2gram_char_frac"] > 0.2 and rows[2]["keep"] is False
    assert rows[3]["dup_5gram_char_frac"] > 0.15 and rows[3]["keep"] is False
    # empty doc: one empty line, zero chars -> all fractions 0, kept
    assert rows[4]["keep"] is True and rows[4]["dup_5gram_char_frac"] == 0.0


def test_gopher_repetition_top_vs_dup_semantics():
    import pyarrow as pa

    from document_ai_ray.stages.curation import gopher_repetition_batch

    # 'aa bb aa bb aa': 2-grams (aa,bb)x2 (bb,aa)x2 -> top2 = 2*4/10 = 0.8
    # 5-grams: single occurrence -> dup5 = 0
    t = pa.Table.from_pylist([{"doc_id": 0, "text": "aa bb aa bb aa"}])
    r = gopher_repetition_batch(t).to_pylist()[0]
    assert abs(r["top2gram_char_frac"] - 0.8) < 1e-9
    assert r["dup_5gram_char_frac"] == 0.0


# ------------------------------------------------------- boilerplate


def _src_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _mkline(word, n=LINE_WORDS):
    return " ".join([word] * n)


def test_boilerplate_removed_from_all_docs_same_host():
    from document_ai_ray.stages.curation import (
        boilerplate_remove_docs,
        boilerplate_stats_by_source,
    )

    footer = _mkline("footer")
    rows = [
        (0, footer + " " + _mkline("alpha"), "hostA"),
        (1, footer + " " + _mkline("beta"), "hostA"),
        (2, footer + " " + _mkline("gamma"), "hostA"),
        # same footer on hostB but only ONE doc there -> not boilerplate
        (3, footer + " " + _mkline("delta"), "hostB"),
    ]
    ds = rd.from_arrow(_src_tbl(rows))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_kept"])
        for r in boilerplate_remove_docs(ds, n_buckets=3).take_all()
    }
    assert got[0] == (_mkline("alpha"), 2, 1)
    assert got[1] == (_mkline("beta"), 2, 1)
    assert got[2] == (_mkline("gamma"), 2, 1)
    # hostB keeps its copy: threshold is per-host
    assert got[3] == (footer + "\n" + _mkline("delta"), 2, 2)

    stats = {
        r["source"]: (
            r["n_docs"],
            r["n_boiler_lines"],
            r["n_boiler_occurrences"],
            r["n_docs_affected"],
        )
        for r in boilerplate_stats_by_source(ds, n_buckets=3).take_all()
    }
    assert stats["hostA"] == (3, 1, 3, 3)
    assert stats["hostB"] == (1, 0, 0, 0)


def test_boilerplate_frac_threshold_scales_with_host_size():
    from document_ai_ray.stages.curation import (
        _boiler_threshold,
        boilerplate_stats_by_source,
    )

    # 100-doc host: threshold = max(2, ceil(0.05*100)) = 5
    assert _boiler_threshold(100) == 5
    assert _boiler_threshold(3) == 2
    nav = _mkline("nav")
    rows = [(i, nav + " " + _mkline(f"u{i}"), "big") for i in range(4)]
    rows += [(100 + i, _mkline(f"v{i}"), "big") for i in range(96)]
    ds = rd.from_arrow(_src_tbl(rows))
    stats = {
        r["source"]: r["n_boiler_lines"]
        for r in boilerplate_stats_by_source(ds, n_buckets=4).take_all()
    }
    # nav appears in 4 docs < threshold 5 -> no boilerplate on this host
    assert stats["big"] == 0


def test_boilerplate_removes_all_occurrences_not_keep_first():
    from document_ai_ray.stages.curation import boilerplate_remove_docs

    dup = _mkline("chrome")
    # the SAME doc carries the line twice; both occurrences must go
    rows = [
        (0, dup + " " + dup, "h"),
        (1, dup + " " + _mkline("body"), "h"),
    ]
    ds = rd.from_arrow(_src_tbl(rows))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"])
        for r in boilerplate_remove_docs(ds, n_buckets=2).take_all()
    }
    assert got[0] == ("", 0)
    assert got[1] == (_mkline("body"), 1)
