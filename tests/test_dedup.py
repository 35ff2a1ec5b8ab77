"""Dedup operators: exact-jaccard vs brute force, LSH recall, simhash."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from document_ai_ray.stages.dedup import (
    exact_jaccard_pairs,
    minhash_lsh_pairs,
    popcount64,
    simhash_pairs,
    verify_pairs,
    word_ngrams,
)


def _brute_force_pairs(texts: dict[int, str], n=2, threshold=0.5):
    G = {i: word_ngrams(t, n) for i, t in texts.items()}
    ids = sorted(G)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(G[a] & G[b])
            u = len(G[a]) + len(G[b]) - inter
            if u and inter / u >= threshold:
                out.add((a, b))
    return out


@pytest.fixture(scope="module")
def docs_texts(sf_tiny):
    t = pq.read_table(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def test_popcount64():
    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 64, 1]


def test_exact_jaccard_matches_brute_force(sf_tiny, docs_texts):
    docs = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]) for r in exact_jaccard_pairs(docs, threshold=0.5).take_all()}
    want = _brute_force_pairs(docs_texts)
    assert got == want and len(want) > 0


def test_lsh_finds_planted_dups(sf_tiny, docs_texts):
    docs = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    cands = minhash_lsh_pairs(docs, threshold=0.5, distinct=False)
    got = {(r["id_a"], r["id_b"]) for r in verify_pairs(cands, docs, 0.5).take_all()}
    want = _brute_force_pairs(docs_texts)
    assert got == want  # planted dups are deep in the detectable regime


def test_verify_pairs_no_corpus_broadcast(sf_tiny, docs_texts, monkeypatch):
    """The verification path must never `ray.put` anything O(corpus):
    intercept ray.put during pipeline CONSTRUCTION + execution and
    bound every payload (the whole point of the join-based verify)."""
    import ray

    put_sizes = []
    real_put = ray.put

    def spy_put(obj, **kw):
        try:
            import sys

            put_sizes.append(sys.getsizeof(obj))
        except Exception:
            put_sizes.append(0)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    docs = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    cands = minhash_lsh_pairs(docs, threshold=0.5, distinct=False)
    got = verify_pairs(cands, docs, 0.5).take_all()
    assert len(got) > 0
    # no driver-side broadcast of gram maps / doc tables on this path
    assert all(s < 1 << 16 for s in put_sizes), put_sizes


def test_simhash_pairs_catch_planted_dups(sf_tiny, docs_texts):
    docs = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]) for r in simhash_pairs(docs).take_all()}
    want = _brute_force_pairs(docs_texts, threshold=0.9)  # strong dups only
    # simhash banding guarantees hamming<=7; strong dups sit there
    assert len(got & want) >= len(want) * 0.8
    assert len(want) > 0


def test_exact_jaccard_synthetic_clusters():
    rows = [
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d e f g x"},      # near-dup of 1
        {"doc_id": 3, "text": "q r s t u v w z"},      # unrelated
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = exact_jaccard_pairs(ds, threshold=0.5).take_all()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["jaccard"] == pytest.approx(6 / 8, abs=1e-6)


def test_prefix_path_matches_dense_path():
    """Force the AllPairs/PPJoin prefix inverted-index path (the
    large-vocabulary plan) and require the exact same pairs as the
    dense-matmul path on the same corpus."""
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.dedup import exact_jaccard_pairs

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    dense = exact_jaccard_pairs(docs, n=2, threshold=0.5).to_pandas()
    docs2 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    prefix = exact_jaccard_pairs(docs2, n=2, threshold=0.5, dense_vocab_max=0).to_pandas()

    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "jaccard"]].itertuples(index=False)))
    assert key(dense) == key(prefix)
    assert len(dense) > 0


def test_dense_gate_falls_through_on_byte_budget():
    """Even with a tiny vocabulary, a corpus whose n_docs x vocab
    incidence matrix exceeds the byte budget must take the PPJoin path
    (the dense matrix is gated on BOTH vocab size and bytes)."""
    rows = [
        {"doc_id": 1, "text": "a b c d e f g h"},
        {"doc_id": 2, "text": "a b c d e f g x"},
        {"doc_id": 3, "text": "q r s t u v w z"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    got = exact_jaccard_pairs(ds, threshold=0.5, dense_bytes_max=0).take_all()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["jaccard"] == pytest.approx(6 / 8, abs=1e-6)


def test_connected_components_multi_hop_chain():
    """Label propagation must cross multi-hop chains (convergence by
    the sum(label) monotone, not a fixed round guess): a 6-node path,
    a triangle, and an isolated pair."""
    from document_ai_ray.stages.cluster import assign_clusters, connected_components

    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),   # path
             (20, 21), (21, 22), (20, 22),                       # triangle
             (30, 31)]                                           # pair
    et = pa.Table.from_pylist([{"id_a": a, "id_b": b} for a, b in edges])
    comps = connected_components(rd.from_arrow(et))
    got = {r["node"]: r["cluster_id"] for r in comps.take_all()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 30}

    docs = pa.Table.from_pylist([{"doc_id": i} for i in [10, 13, 15, 22, 31, 99]])
    full = assign_clusters(rd.from_arrow(docs), connected_components(rd.from_arrow(et)))
    m = {r["doc_id"]: r["cluster_id"] for r in full.take_all()}
    assert m == {10: 10, 13: 10, 15: 10, 22: 20, 31: 30, 99: 99}  # 99 = singleton


def test_gram_hashes_consistent_with_string_ngrams(sf_tiny, docs_texts):
    """The cached-word-hash gram representation must be collision-free
    on real corpora: |gram_hashes| == |word_ngrams| per doc, and the
    hash-set Jaccard equals the string-set Jaccard."""
    from document_ai_ray.stages.dedup import gram_hashes

    items = list(docs_texts.items())[:100]
    for _, txt in items:
        assert len(gram_hashes(txt, 2)) == len(word_ngrams(txt, 2))
    (i1, t1), (i2, t2) = items[0], items[1]
    hs1, hs2 = set(gram_hashes(t1, 2)), set(gram_hashes(t2, 2))
    g1, g2 = word_ngrams(t1, 2), word_ngrams(t2, 2)
    assert len(hs1 & hs2) == len(g1 & g2)


def test_empty_edges_and_no_candidates_edge_cases():
    """Zero near-dup pairs must flow through cleanly: empty component
    set, every doc a singleton, empty verified-pair output."""
    from document_ai_ray.stages.cluster import assign_clusters, connected_components

    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "epsilon zeta eta theta"},
    ]
    docs = rd.from_arrow(pa.Table.from_pylist(rows))
    pairs = exact_jaccard_pairs(docs, threshold=0.5)
    assert pairs.count() == 0
    comps = connected_components(pairs)
    assert comps.count() == 0
    full = assign_clusters(
        rd.from_arrow(pa.Table.from_pylist([{"doc_id": 1}, {"doc_id": 2}])), comps
    )
    assert {r["doc_id"]: r["cluster_id"] for r in full.take_all()} == {1: 1, 2: 2}

    # verify_pairs with an empty candidate set -> empty, no crash
    empty = rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())], names=["id_a", "id_b"]
        )
    )
    docs2 = rd.from_arrow(pa.Table.from_pylist(rows))
    assert verify_pairs(empty, docs2, 0.5).count() == 0


def test_auto_buckets_grows_with_input():
    from document_ai_ray.functions.scale import auto_buckets

    small = auto_buckets(10_000)
    mid = auto_buckets(10_000_000)
    big = auto_buckets(1_000_000_000)
    assert small <= mid < big          # bucket count grows with rows
    assert small >= 8                  # parallelism floor
    # per-bucket slice stays ~flat once past the floor
    assert 10_000_000 / mid <= (1 << 17)
    assert 1_000_000_000 / big <= (1 << 17)


def test_selfmerge_degenerate_group_star_guard():
    """A match-key group above MAX_SELF_MERGE_GROUP must emit the
    bounded star pairing (m-1 pairs), not the quadratic m(m-1)/2."""
    import pandas as pd

    from document_ai_ray.stages.dedup import _pairs_by_selfmerge

    m = 10_000
    df = pd.DataFrame({"key": np.zeros(m, dtype=np.int64), "id": np.arange(m, dtype=np.int64)})
    out = _pairs_by_selfmerge(["key"], carry_cols=[])(df)
    assert len(out) == m - 1                       # star, not quadratic
    assert (out["id_a"] == 0).all()                # hub = group-min id
    assert set(out["id_b"]) == set(range(1, m))    # connectivity preserved

    # small groups still get the full pairing
    small = pd.DataFrame({"key": np.zeros(4, dtype=np.int64), "id": np.arange(4, dtype=np.int64)})
    assert len(_pairs_by_selfmerge(["key"], carry_cols=[])(small)) == 6


def test_lsh_identical_signature_corpus_bounded():
    """10k identical docs (one giant LSH bucket per band) completes in
    bounded time/output and still clusters into ONE component."""
    from document_ai_ray.stages.cluster import connected_components
    from document_ai_ray.stages.dedup import minhash_lsh_pairs

    m = 10_000
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(m, dtype=np.int64),
                "text": ["the same exact document text every single time"] * m,
            }
        )
    )
    cands = minhash_lsh_pairs(docs, distinct=False)
    n_cands = cands.count()
    assert 0 < n_cands <= 20 * m       # star per band, never ~m^2/2
    comps = connected_components(cands)
    labels = {r["cluster_id"] for r in comps.take_all()}
    assert labels == {0} and comps.count() == m


def test_simhash_query_emits_recall_floor(sf_tiny):
    """The rows-only driver query must carry an in-pipeline recall
    column meeting the documented floor (r2-verdict item)."""
    from document_ai_ray.pipelines.dedup_queries import simhash_near_dup_pairs

    out = simhash_near_dup_pairs(sf_tiny)
    assert "recall" in out.columns and len(out) > 0
    assert out["recall"].nunique() == 1          # one corpus-level estimate
    assert float(out["recall"].iloc[0]) >= 0.9   # documented floor


def test_exact_jaccard_dense_corpus_guard(sf_tiny):
    """r4: forcing a dense template corpus onto the PPJoin path must
    refuse LOUDLY (candidate volume ~quadratic) instead of silently
    spilling candidates x gram-list bytes — with the LSH referral in
    the message."""
    import pytest

    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.dedup import exact_jaccard_pairs

    docs = read_table(sf_tiny, "documents", columns=["doc_id", "text"])
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        exact_jaccard_pairs(
            docs, threshold=0.5, dense_vocab_max=0, max_candidates=100
        ).materialize()


def test_exact_jaccard_ppjoin_guard_allows_sparse(sf_tiny):
    """The guard must NOT trip when the candidate volume is genuinely
    small: same corpus, PPJoin path, generous budget — results match
    the dense path exactly (length filter loses nothing)."""
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.dedup import exact_jaccard_pairs

    docs = read_table(sf_tiny, "documents", columns=["doc_id", "text"])
    dense = {
        (r["id_a"], r["id_b"])
        for r in exact_jaccard_pairs(docs, threshold=0.5).take_all()
    }
    sparse = {
        (r["id_a"], r["id_b"])
        for r in exact_jaccard_pairs(
            docs, threshold=0.5, dense_vocab_max=0, max_candidates=1 << 30
        ).take_all()
    }
    assert sparse == dense


def _brute_force_overlap(texts: dict[int, str], n=2, threshold=0.8):
    G = {i: word_ngrams(t, n) for i, t in texts.items()}
    ids = sorted(G)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not G[a] or not G[b]:
                continue
            inter = len(G[a] & G[b])
            if inter / min(len(G[a]), len(G[b])) >= threshold:
                out.add((a, b))
    return out


def test_containment_matches_brute_force(sf_tiny, docs_texts):
    from document_ai_ray.stages.dedup import containment_pairs

    docs = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]) for r in containment_pairs(docs, threshold=0.8).take_all()}
    assert got == _brute_force_overlap(docs_texts)


def test_containment_catches_embedded_doc_jaccard_misses():
    """A 20-gram doc fully embedded in a 200-gram doc: overlap = 1.0,
    Jaccard ~ 0.1 — the structural case the operator exists for."""
    from document_ai_ray.stages.dedup import containment_pairs

    small = " ".join(f"needle{i}" for i in range(21))
    big = small + " " + " ".join(f"hay{i}" for i in range(200))
    other = " ".join(f"other{i}" for i in range(50))
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": small},
            {"doc_id": 2, "text": big},
            {"doc_id": 3, "text": other},
        ]
    )
    pairs = containment_pairs(docs, threshold=0.8).take_all()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["overlap"] == 1.0
    jac = exact_jaccard_pairs(docs, threshold=0.5).take_all()
    assert not jac  # Jaccard at 0.5 misses the embedded doc


def test_containment_dense_guard_raises():
    """Every doc sharing one tiny gram set -> candidate volume is
    quadratic; with the dense path gated OFF the pre-generation guard
    must refuse loudly (the dense path would otherwise absorb it)."""
    base = " ".join(f"w{i}" for i in range(12))
    docs = rd.from_items([{"doc_id": i, "text": base} for i in range(60)])
    with pytest.raises(ValueError, match="containment_pairs"):
        from document_ai_ray.stages.dedup import containment_pairs

        containment_pairs(docs, threshold=0.8, max_candidates=100, dense_vocab_max=0)


def test_containment_dense_and_sparse_paths_agree(sf_tiny, docs_texts):
    """The BLAS incidence path and the prefix-filter path are the same
    operator: identical pair sets and scores on the same corpus."""
    from document_ai_ray.stages.dedup import containment_pairs

    docs = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
    dense = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in containment_pairs(docs, threshold=0.8).take_all()
    }
    sparse = {
        (r["id_a"], r["id_b"]): r["overlap"]
        for r in containment_pairs(docs, threshold=0.8, dense_vocab_max=0).take_all()
    }
    assert dense == sparse
    assert set(dense) == _brute_force_overlap(docs_texts)
