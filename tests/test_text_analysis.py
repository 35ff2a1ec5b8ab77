"""Text analysis: lang-ID, quality, tokens, fingerprints, multimodal stubs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.functions.hashing import stable64, winnow_fingerprint
from document_ai_ray.stages.multimodal import MEDIA_SCHEMA, DecodeMedia, make_media_payload, media_features
from document_ai_ray.stages.text_analysis import langid_batch, langid_text, quality_batch, token_count_batch


def test_langid_basic():
    assert langid_text("the cat sat on the mat and the dog was in the house")[0] == "en"
    assert langid_text("le chat est dans la maison et le chien est sur le pont")[0] == "fr"
    assert langid_text("der hund und die katze sind in dem haus über der brücke")[0] == "de"
    assert langid_text("")[0] == "und"
    assert langid_text("zzz qqq xxx")[0] == "und"


def test_langid_batch_cols():
    t = pa.Table.from_pylist([{"text": "the cat and the dog"}, {"text": ""}])
    out = langid_batch(t)
    assert out.column("pred_lang").to_pylist() == ["en", "und"]


def test_quality_batch():
    t = pa.Table.from_pylist(
        [
            {"text": "The quick brown fox jumps over the lazy dog near the river bank today."},
            {"text": "x"},
            {"text": ""},
        ]
    )
    out = quality_batch(t)
    scores = out.column("quality_score").to_pylist()
    assert scores[0] > 0.5
    assert scores[1] == 0.0 and scores[2] == 0.0
    assert out.column("n_words").to_pylist()[0] == 14


def test_token_counts():
    t = pa.Table.from_pylist([{"text": "hello world it's 42 degrees!"}])
    out = token_count_batch(t)
    assert out.column("n_ws_tokens").to_pylist() == [5]
    assert out.column("n_bpe_tokens").to_pylist()[0] >= 6  # punctuation split off


def test_winnow_fingerprint_properties():
    toks = "a b c d e f g h i j k l m n".split()
    th = np.array([stable64(w) for w in toks], dtype=np.uint64)
    fp1 = winnow_fingerprint(th)
    fp2 = winnow_fingerprint(th)
    assert fp1 == fp2 and len(fp1) > 0
    # a local edit changes few fingerprints (winnowing locality)
    toks2 = list(toks)
    toks2[0] = "z"
    th2 = np.array([stable64(w) for w in toks2], dtype=np.uint64)
    fp3 = winnow_fingerprint(th2)
    assert len(set(fp1) & set(fp3)) >= len(fp1) - 3


def test_multimodal_decode_plumbing():
    rows = [
        {
            "media_id": i,
            "media_type": "image/synthetic",
            "payload": make_media_payload(i, 64, 48),
            "meta": {"width": 64, "height": 48, "sample_rate": 0},
        }
        for i in range(10)
    ]
    rows.append(
        {
            "media_id": 99,
            "media_type": "image/png",
            "payload": b"\x89PNG\r\n unsupported",
            "meta": {"width": 0, "height": 0, "sample_rate": 0},
        }
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = media_features(ds).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 11
    assert by_id[0]["error"] is None and len(by_id[0]["features"]) == DecodeMedia.FEATURE_DIM
    assert by_id[99]["error"].startswith("decode_error")
    # determinism
    out2 = media_features(rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))).take_all()
    assert {r["media_id"]: r["features"] for r in out2} == {r["media_id"]: r["features"] for r in out}


def test_multimodal_strict_mode_stubs():
    t = pa.Table.from_pylist(
        [{"media_id": 1, "media_type": "image/png", "payload": b"\x89PNG real image bytes", "meta": None}],
        schema=MEDIA_SCHEMA,
    )
    out = DecodeMedia(strict=True)(t)
    assert out.column("error").to_pylist()[0].startswith("decode_stubbed")


def test_kmv_sketch_accuracy_and_merge(sf_small):
    """KMV estimate within the theoretical error envelope of the exact
    distinct count, and exact when distinct < k."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from document_ai_ray.functions.sketch import kmv_estimate, kmv_merge, kmv_sketch
    from document_ai_ray.stages.text_analysis import approx_distinct_ngrams_per_lang

    # unit: exact below k
    sk = kmv_sketch([f"v{i}" for i in range(100)], k=256)
    assert kmv_estimate(sk, k=256) == 100.0
    # merge == sketch of union
    a = kmv_sketch([f"a{i}" for i in range(500)], k=64)
    b = kmv_sketch([f"b{i}" for i in range(500)], k=64)
    u = kmv_merge([a, b], k=64)
    direct = kmv_sketch([f"a{i}" for i in range(500)] + [f"b{i}" for i in range(500)], k=64)
    assert np.array_equal(u, direct)

    # distributed estimate vs exact per lang
    t = pq.read_table(f"{sf_small}/documents.parquet", columns=["lang", "text"])
    exact = {}
    for lang, text in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
        w = text.split()
        exact.setdefault(lang, set()).update(
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        )
    got = approx_distinct_ngrams_per_lang(
        rd.from_arrow(t), n=3, k=256
    ).to_pandas().set_index("lang")
    for lang, s in exact.items():
        est = got.loc[lang, "approx_distinct"]
        rel = abs(est - len(s)) / len(s)
        assert rel < 0.25, f"{lang}: est {est} vs exact {len(s)} (rel {rel:.3f})"


def test_pii_scrub_batch_crafted():
    import pyarrow as pa

    from document_ai_ray.stages.text_analysis import pii_scrub_batch

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail me at jane.doe+x@corp.example.com or call +4915123456789 now",
                "server 192.168.0.1 and 10.0.0.255 are up",
                "nothing sensitive here",
            ],
        }
    )
    out = pii_scrub_batch(t).to_pylist()
    assert out[0]["clean_text"] == "mail me at <EMAIL> or call <PHONE> now"
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1 and out[0]["n_ip"] == 0
    assert out[1]["clean_text"] == "server <IP> and <IP> are up"
    assert out[1]["n_ip"] == 2
    assert out[2]["clean_text"] == "nothing sensitive here"
    assert out[2]["n_email"] == out[2]["n_ip"] == out[2]["n_phone"] == 0


def test_chunk_batch_windows():
    import pyarrow as pa

    from document_ai_ray.stages.text_analysis import chunk_batch

    t = pa.table({"doc_id": [7, 8], "text": ["w1 w2 w3 w4 w5 w6 w7", ""]})
    out = chunk_batch(t, size=3, stride=2).to_pylist()
    d7 = [r for r in out if r["doc_id"] == 7]
    assert [r["chunk_text"] for r in d7] == ["w1 w2 w3", "w3 w4 w5", "w5 w6 w7", "w7"]
    assert [r["n_tokens"] for r in d7] == [3, 3, 3, 1]
    d8 = [r for r in out if r["doc_id"] == 8]
    assert len(d8) == 1 and d8[0]["chunk_text"] == ""      # empty doc -> one empty chunk


def test_repetition_batch_metrics():
    import pyarrow as pa

    from document_ai_ray.stages.text_analysis import repetition_batch

    spam = "\n".join(["buy now"] * 8 + ["unique line"])     # 8/9 duplicated lines
    clean = "every line here\nis totally different\nfrom the others entirely"
    t = pa.table({"doc_id": [1, 2], "text": [spam, clean]})
    out = {r["doc_id"]: r for r in repetition_batch(t).to_pylist()}
    assert out[1]["dup_line_frac"] > 0.8 and not out[1]["keep"]
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["keep"]


def test_contamination_batch_crafted():
    import pyarrow as pa
    import ray

    from document_ai_ray.stages.text_analysis import contamination_batch, eval_grams_batch

    eval_text = "the quick brown fox jumps over the lazy dog again and again today"
    t = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": [
                eval_text,                                       # the benchmark doc itself
                "prefix words " + eval_text + " suffix words",   # contains the eval text
                "totally unrelated content with no overlap at all in any gram window",
            ],
        }
    )
    eg = set(eval_grams_batch(t, n=8, id_filter_mod=50).column("gram").to_pylist())
    assert eg  # doc 0 produced grams
    ref = ray.put(eg)
    out = {r["doc_id"]: r for r in contamination_batch(t, (ref,), n=8).to_pylist()}
    assert out[0]["contaminated"] and out[1]["contaminated"]
    assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0
    assert out[1]["n_overlap"] >= len(eg)  # superset text overlaps every eval gram


class TestCanonicalizeUrl:
    def test_rules(self):
        from document_ai_ray.functions.urls import canonicalize_url as c

        # case, www, default port, fragment, param order, tracking
        assert (
            c("HTTP://WWW.Ex.COM:80/a/1?b=2&a=1&utm_source=x#f")
            == "http://ex.com/a/1?a=1&b=2"
        )
        # https default port; root path keeps its slash
        assert c("https://Site.org:443/") == "https://site.org/"
        # non-default port kept; trailing slash stripped; blank value kept
        assert c("https://site.org:8443/x/?z=") == "https://site.org:8443/x?z="
        # repeated keys keep INPUT relative order (stable sort by key)
        assert c("http://h.io/p?k=2&a=0&k=1") == "http://h.io/p?a=0&k=2&k=1"
        # credentials preserved
        assert c("http://u:pw@H.io/p") == "http://u:pw@h.io/p"
        # tracking-only query vanishes entirely
        assert c("http://h.io/p?gclid=abc&utm_medium=m") == "http://h.io/p"

    def test_idempotent(self):
        from document_ai_ray.functions.urls import canonicalize_url as c

        for u in [
            "HTTP://WWW.Ex.COM:80/a/1?b=2&a=1#f",
            "https://site.org:8443/x//y/?z=&ref=r",
            "http://h.io",
        ]:
            once = c(u)
            assert c(once) == once


class TestMisraGries:
    def test_bound_and_merge(self):
        import collections
        import random

        from document_ai_ray.functions.sketch import mg_from_counts, mg_merge

        random.seed(7)
        vocab = [f"w{i}" for i in range(500)]
        weights = [1000, 600, 400, 250, 150] + [1] * 495
        data = random.choices(vocab, weights=weights, k=200_000)
        true = collections.Counter(data)
        m = 64
        parts = [collections.Counter(data[i::16]) for i in range(16)]
        sk = mg_merge([mg_from_counts(dict(p), m) for p in parts], m)
        assert len(sk) <= m
        bound = len(data) / (m + 1)
        for w, c in true.most_common(5):
            est = sk.get(w, 0)
            # MG estimates are under-counts within N/(m+1)
            assert c - bound <= est <= c, (w, c, est)
        # any heavy hitter with count > N/(m+1) MUST be present
        for w, c in true.items():
            if c > bound:
                assert w in sk

    def test_merge_order_invariant_bound(self):
        import collections
        import random

        from document_ai_ray.functions.sketch import mg_from_counts, mg_merge

        random.seed(11)
        data = random.choices(["a", "b", "c", "d", "e"], weights=[40, 30, 15, 10, 5], k=50_000)
        true = collections.Counter(data)
        m = 3
        parts = [mg_from_counts(dict(collections.Counter(data[i::10])), m) for i in range(10)]
        flat = mg_merge(parts, m)
        treed = mg_merge([mg_merge(parts[:5], m), mg_merge(parts[5:], m)], m)
        bound = len(data) / (m + 1)
        for sk in (flat, treed):
            for w, c in true.most_common(2):
                assert c - bound <= sk.get(w, 0) <= c


def test_select_top_quality_cut(sf_tiny):
    """Exactly ceil(n/5) rows; every kept (score, -doc_id) dominates
    every dropped one under the (score desc, doc_id asc) order."""
    from document_ai_ray.pipelines.text_queries import quality_scores, select_top_quality

    kept = select_top_quality(sf_tiny).to_pandas()
    allq = quality_scores(sf_tiny).to_pandas()[["doc_id", "quality_score"]]
    n = len(allq)
    assert len(kept) == (n + 4) // 5
    dropped = allq[~allq["doc_id"].isin(set(kept["doc_id"]))]
    worst_kept = min((r.quality_score, -r.doc_id) for r in kept.itertuples())
    best_drop = max((r.quality_score, -r.doc_id) for r in dropped.itertuples())
    assert worst_kept > best_drop


# ------------------------------------------------------------ HLL sketch


def test_hll_error_within_bound_across_cardinalities():
    from document_ai_ray.functions.sketch import hll_estimate, hll_registers

    for n in (50, 1000, 20000, 300000):
        hs = np.fromiter((stable64(f"item-{i}") for i in range(n)), dtype=np.uint64)
        est = hll_estimate(hll_registers(hs))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_equals_single_pass_and_is_idempotent():
    from document_ai_ray.functions.sketch import hll_merge, hll_registers

    hs = np.fromiter((stable64(f"x{i}") for i in range(50000)), dtype=np.uint64)
    whole = hll_registers(hs)
    parts = [hll_registers(hs[i::7]) for i in range(7)]  # overlapping splits ok
    merged = hll_merge(parts)
    assert (merged == whole).all()
    assert (hll_merge([merged, whole]) == whole).all()  # idempotent


def test_hll_distinct_words_dataset(ray_session):
    from document_ai_ray.stages.text_analysis import hll_distinct_words

    texts = [f"w{i} w{i+1} shared common" for i in range(0, 2000, 2)]
    # distinct words: w0..w1999 (odd i appear as w{i+1}) + shared + common
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(5)
    est = hll_distinct_words(ds)
    true = len({w for t in texts for w in t.split()})
    assert abs(est - true) / true < 0.05


# --------------------------------------------------- compressibility gate


def test_compressibility_monotone_and_edges():
    import random

    from document_ai_ray.stages.text_analysis import (
        COMPRESS_MIN_BYTES,
        compressibility_batch,
    )

    rng = random.Random(7)
    repetitive = "spam " * 200
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(rng.randint(3, 8)))
        for _ in range(150)
    ]
    prose = " ".join(rng.choice(vocab) for _ in range(200))
    noise = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(1000))
    short = "tiny"
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array([repetitive, prose, noise, short]),
        }
    )
    out = compressibility_batch(t).to_pandas().set_index("doc_id")
    r = out["compress_ratio"]
    assert r[0] < r[1] < r[2]  # repetition < prose < random
    assert not out.loc[0, "keep"]  # too compressible
    assert out.loc[1, "keep"]
    assert not out.loc[2, "keep"]  # incompressible noise
    assert not out.loc[3, "keep"] and out.loc[3, "n_bytes"] < COMPRESS_MIN_BYTES
    # determinism
    again = compressibility_batch(t).to_pandas().set_index("doc_id")
    assert (again["n_compressed"] == out["n_compressed"]).all()


def test_doc_word_pairs_and_bigram_counts_vs_reference():
    from collections import Counter

    from document_ai_ray.stages.text_analysis import (
        PAIR_SEP,
        bigram_value_counts,
        doc_word_pairs,
    )

    texts = [
        "a b c a b",
        "  leading and  double  spaces here ",
        "single",
        "",
        "x y",
        "a b c a b",  # duplicate doc: counts must add
    ]
    arr = pa.array(texts, pa.string())
    rows, w1, w2 = doc_word_pairs(arr)
    ref = Counter()
    ref_rows = []
    for i, s in enumerate(texts):
        ws = [w for w in s.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            ref[(a, b)] += 1
            ref_rows.append(i)
    assert rows.tolist() == ref_rows
    got = Counter(zip(w1.to_pylist(), w2.to_pylist()))
    assert got == ref

    t = bigram_value_counts(arr)
    got2 = {
        tuple(p.split(PAIR_SEP)): n
        for p, n in zip(t.column("pair").to_pylist(), t.column("n").to_pylist())
    }
    assert got2 == dict(ref)


def test_window_pair_counts_vs_reference():
    from collections import Counter

    from document_ai_ray.stages.text_analysis import PAIR_SEP, window_pair_counts

    texts = ["a b c d e", "p  q r", "", "z", "a a a a"]
    for W in (1, 2, 3):
        t = window_pair_counts(pa.array(texts, pa.string()), W)
        got = {
            tuple(p.split(PAIR_SEP)): n
            for p, n in zip(t.column("pair").to_pylist(), t.column("n").to_pylist())
        }
        ref = Counter()
        for s in texts:
            ws = [w for w in s.split(" ") if w]
            for i in range(len(ws)):
                for j in range(i + 1, min(i + W, len(ws) - 1) + 1):
                    ref[(ws[i], ws[j])] += 1
        assert got == dict(ref), f"window={W}"


# ------------------------------------------------- md5 winnowing


def test_winnow_md5_short_doc_single_global_min():
    import hashlib

    import pyarrow as pa

    from document_ai_ray.stages.text_analysis import WINNOW_K, winnow_md5_batch

    # fewer words than k -> ONE gram (whole text), one fingerprint
    t = pa.table({"doc_id": pa.array([7], pa.int64()), "text": ["a b"]})
    out = winnow_md5_batch(t)
    assert out.num_rows == 1
    expect = hashlib.md5(b"a b").hexdigest()[:16]
    assert out.column("fp").to_pylist() == [expect]
    # exactly k words -> still one gram
    t2 = pa.table(
        {"doc_id": pa.array([8], pa.int64()), "text": [" ".join("wxyz")[: 2 * WINNOW_K - 1]]}
    )
    assert winnow_md5_batch(t2).num_rows == 1


def test_winnow_md5_matches_bruteforce():
    import hashlib

    import numpy as np
    import pyarrow as pa

    from document_ai_ray.stages.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnow_md5_batch,
    )

    rng = np.random.RandomState(5)
    vocab = ["red", "blue", "green", "ash", "oak", "elm"]
    text = " ".join(vocab[j] for j in rng.randint(0, len(vocab), 40))
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
    got = set(winnow_md5_batch(t).column("fp").to_pylist())
    ws = text.split(" ")
    grams = [
        int(hashlib.md5(" ".join(ws[i : i + WINNOW_K]).encode()).hexdigest()[:16], 16)
        for i in range(len(ws) - WINNOW_K + 1)
    ]
    want = {
        f"{min(grams[s : s + WINNOW_W]):016x}"
        for s in range(len(grams) - WINNOW_W + 1)
    }
    assert got == want
