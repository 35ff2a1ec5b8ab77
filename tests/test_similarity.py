"""Similarity search: brute-force exactness, IVF recall, cosine pairs."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from document_ai_ray.stages.similarity import (
    _collect_matrix,
    _normalize,
    _to_matrix,
    cosine_pairs,
    knn_bruteforce,
    knn_ivf,
    train_centroids,
)


@pytest.fixture(scope="module")
def emb(sf_tiny):
    t = pq.read_table(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _to_matrix(t.column("embedding"))
    return ids, m


def _numpy_knn(ids, m, q_ids, k=10):
    mn = _normalize(m)
    out = {}
    for qid in q_ids:
        q = mn[ids == qid][0]
        sims = mn @ q
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))
        out[qid] = [int(ids[i]) for i in order if ids[i] != qid][:k]
    return out


def test_bruteforce_knn_exact(sf_tiny, emb):
    ids, m = emb
    q_ids = [int(i) for i in ids[:5]]
    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = knn_bruteforce(vecs, q_ids, m[np.isin(ids, q_ids)], k=10).take_all()
    want = _numpy_knn(ids, m, q_ids)
    for qid in q_ids:
        mine = [r["neighbor_id"] for r in sorted((x for x in got if x["query_id"] == qid), key=lambda r: r["rank"])]
        assert mine == want[qid]


def test_ivf_recall(sf_tiny, emb):
    ids, m = emb
    q_ids = [int(i) for i in ids[:10]]
    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = train_centroids(m, n_cells=16)
    got = knn_ivf(vecs, q_ids, m[np.isin(ids, q_ids)], cents, k=10, n_probe=4).take_all()
    want = _numpy_knn(ids, m, q_ids)
    hits = total = 0
    for qid in q_ids:
        mine = {r["neighbor_id"] for r in got if r["query_id"] == qid}
        hits += len(mine & set(want[qid]))
        total += len(want[qid])
    recall = hits / total
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_cosine_pairs_match_numpy(sf_tiny, emb):
    ids, m = emb
    mn = _normalize(m)
    S = mn @ mn.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and S[i, j] >= 0.4
    }
    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = {(r["id_a"], r["id_b"]) for r in cosine_pairs(vecs, 0.4).take_all()}
    assert got == want


def test_centroids_deterministic(emb):
    _, m = emb
    c1 = train_centroids(m, n_cells=8)
    c2 = train_centroids(m, n_cells=8)
    assert np.array_equal(c1, c2)


def test_cosine_pairs_exact_at_high_threshold(sf_tiny, emb):
    """The cell-pair pruning must stay exact where it is actually
    effective (near-dup thresholds)."""
    ids, m = emb
    mn = _normalize(m)
    S = mn @ mn.T
    want = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and S[i, j] >= 0.9
    }
    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = {(r["id_a"], r["id_b"]) for r in cosine_pairs(vecs, 0.9).take_all()}
    assert got == want


def test_cosine_pairs_no_corpus_broadcast(sf_tiny, monkeypatch):
    """cosine_pairs must never ray.put anything O(corpus) — only the
    centroids and the cell-pair plan (both O(n_cells²))."""
    import sys

    import ray

    put_sizes = []
    real_put = ray.put

    def spy_put(obj, **kw):
        size = sys.getsizeof(obj)
        if isinstance(obj, np.ndarray):
            size = obj.nbytes
        put_sizes.append(size)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = cosine_pairs(vecs, 0.4).take_all()
    assert len(got) > 0
    assert all(s < 1 << 16 for s in put_sizes), put_sizes


def test_local_topk_tie_break():
    from document_ai_ray.stages.similarity import _local_topk_ties

    sims = np.array([0.9, 0.5, 0.5, 0.5, 0.1])
    ids = np.array([10, 7, 3, 5, 1])
    # k=2: tie at 0.5 -> the smaller id (3) must win over 7 and 5
    cols = _local_topk_ties(sims, ids, 2)
    assert sorted(ids[cols].tolist()) == [3, 10]
    # k=3: next tie winner is id 5
    cols = _local_topk_ties(sims, ids, 3)
    assert sorted(ids[cols].tolist()) == [3, 5, 10]


def test_cosine_pairs_sampling_unbiased_on_sorted_input():
    """Centroid training must use a uniform sample, not limit():
    on cluster-ordered input the limit() head covers only the first
    clusters, inflating radii and collapsing cell-pair pruning
    (r2-verdict item)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.similarity import (
        _normalize,
        plan_cell_pairs,
        sample_vectors,
        train_centroids,
    )

    rng = np.random.default_rng(42)
    n_clusters, per, dim = 8, 512, 16
    centers = _normalize(rng.standard_normal((n_clusters, dim)))
    rows = []
    for c in range(n_clusters):                      # id-sorted by cluster
        pts = centers[c][None, :] + 0.05 * rng.standard_normal((per, dim))
        rows.append(pts)
    M = _normalize(np.concatenate(rows))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": np.arange(len(M), dtype=np.int64),
                "embedding": list(M.astype(np.float32)),
            }
        )
    )

    def plan_for(train_mat):
        cents = _normalize(train_centroids(train_mat, n_cells=n_clusters))
        sims = M @ cents.T
        cell = np.argmax(sims, axis=1)
        ang = np.arccos(np.clip(sims[np.arange(len(M)), cell], -1, 1))
        radius = np.zeros(len(cents))
        np.maximum.at(radius, cell, ang)
        gid_pair, _ = plan_cell_pairs(cents, radius, threshold=0.9)
        return len(gid_pair)

    total = n_clusters * (n_clusters + 1) // 2       # 36 possible cell pairs
    unbiased = plan_for(sample_vectors(ds, 1024))
    biased = plan_for(M[:1024])                      # what limit() would train on
    assert unbiased <= total // 2                    # pruning actually bites
    assert unbiased < biased                         # and beats the head-biased plan


def test_knn_ivf_query_emits_recall_floor(sf_tiny):
    """Every emitted IVF row must carry per-query recall@k vs the
    in-pipeline brute-force run, meeting the documented floor."""
    from document_ai_ray.pipelines.similarity_queries import K, knn_ivf_query

    out = knn_ivf_query(sf_tiny)
    assert "recall_at_k" in out.columns and len(out) > 0
    assert ((out["recall_at_k"] >= 0) & (out["recall_at_k"] <= 1)).all()
    # documented floor (cosine-continuum corpus, n_probe=4/16 — same
    # floor as test_ivf_recall; raise n_probe for higher recall)
    assert out["recall_at_k"].mean() >= 0.5


def test_semantic_dedup_keep_invariants(sf_tiny):
    """Keep set: subset of all ids, contains every component's min id,
    drops at least one member of every cosine>=0.4 pair."""
    from document_ai_ray.pipelines.similarity_queries import (
        embedding_near_dup_pairs,
        semantic_dedup_keep,
    )

    kept = set(
        r["vec_id"] for r in semantic_dedup_keep(sf_tiny).take_all()
    )
    pairs = [(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(sf_tiny).take_all()]
    import pyarrow.parquet as pq

    all_ids = set(pq.read_table(sf_tiny + "/embeddings.parquet", columns=["vec_id"]).column(0).to_pylist())
    assert kept <= all_ids
    # no kept-kept pair may remain directly similar UNLESS they landed in
    # the same component via a third doc -- direct pairs always collapse
    for a, b in pairs:
        assert not (a in kept and b in kept)
    # singletons (in no pair) all survive
    paired = set(x for p in pairs for x in p)
    assert (all_ids - paired) <= kept


def test_kmeans_lloyd_monotone_and_matches_numpy(sf_tiny):
    """Distributed Lloyd: objective non-decreasing; centroids unit-norm;
    objective matches a single-process numpy Lloyd from the same init."""
    import numpy as np
    import pyarrow.parquet as pq

    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.similarity import _normalize, _to_matrix, kmeans_lloyd

    vecs = read_table(sf_tiny, "embeddings", columns=["vec_id", "embedding"])
    cents, counts, history, n_it = kmeans_lloyd(vecs, k=4, n_iter=6, seed=11)
    assert all(b - a >= -1e-9 for a, b in zip(history, history[1:]))
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)
    assert counts.sum() == vecs.count()

    # numpy reference with the identical seeded init
    t = pq.read_table(sf_tiny + "/embeddings.parquet", columns=["embedding"])
    m = _normalize(_to_matrix(t.column("embedding")))
    from document_ai_ray.stages.similarity import sample_vectors

    sample = _normalize(
        np.asarray(sample_vectors(vecs, 1000, "vec_id", "embedding", seed=11), np.float64)
    )
    rng = np.random.RandomState(11)
    idx = rng.choice(len(sample), size=4, replace=False)
    ref_c = sample[np.sort(idx)].copy()
    ref_hist = []
    for _ in range(n_it):
        sims = m @ ref_c.T
        a = np.argmax(sims, axis=1)
        ref_hist.append(float(sims[np.arange(len(m)), a].sum()))
        for c in range(4):
            mem = m[a == c]
            if len(mem):
                v = mem.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    ref_c[c] = v / nv
    assert np.allclose(history, ref_hist, rtol=1e-9, atol=1e-6)
