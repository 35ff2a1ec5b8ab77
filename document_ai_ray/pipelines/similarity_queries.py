"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table

N_QUERIES = 10
K = 10


def _load_queries(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    keep = ids < N_QUERIES
    import pyarrow as pa

    sub = t.filter(pa.array(keep))
    q_ids = sub.column("vec_id").to_numpy().tolist()
    from document_ai_ray.stages.similarity import _to_matrix

    return q_ids, _to_matrix(sub.column("embedding"))


@register(
    "knn_bruteforce",
    oracle=f"""
    SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.embedding, t.embedding) DESC,
                                       t.vec_id) AS rank
    FROM embeddings q JOIN embeddings t ON t.vec_id != q.vec_id
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY rank <= {K}
    """,
)
def knn_bruteforce_query(sf_dir: str):
    """Brute-force cosine top-k: one matmul per batch against the
    broadcast query matrix, streaming local top-k."""
    from document_ai_ray.stages.similarity import knn_bruteforce

    q_ids, q_mat = _load_queries(sf_dir)
    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_bruteforce(vecs, q_ids, q_mat, k=K)


@register("knn_ivf")
def knn_ivf_query(sf_dir: str):
    """IVF approximate top-k with an in-pipeline RECALL GATE (rows-only
    query made meaningful): the brute-force exact top-k runs alongside
    (both results are output-sized — k x n_queries rows), per-query
    recall@k is computed in the tiny final merge, and every emitted row
    carries it.  Documented floor: mean recall >= 0.5 with n_probe=4 of
    16 cells on this cosine-continuum corpus (also asserted in
    tests/test_similarity.py; raise n_probe to trade cost for recall).
    Centroids train on a seeded uniform sample (not limit() —
    head-bias)."""
    from document_ai_ray.stages.similarity import (
        knn_bruteforce,
        knn_ivf,
        sample_vectors,
        train_centroids,
    )

    q_ids, q_mat = _load_queries(sf_dir)
    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = sample_vectors(vecs, 1000, "vec_id", "embedding")
    cents = train_centroids(sample, n_cells=16)
    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ivf = knn_ivf(vecs, q_ids, q_mat, cents, k=K, n_probe=4).to_pandas()
    vecs2 = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = knn_bruteforce(vecs2, q_ids, q_mat, k=K).to_pandas()
    hits = ivf.merge(
        exact[["query_id", "neighbor_id"]], on=["query_id", "neighbor_id"], how="inner"
    )
    per_q = (hits.groupby("query_id").size() / float(K)).to_dict()
    import numpy as np

    ivf["recall_at_k"] = np.round(
        ivf["query_id"].map(lambda q: per_q.get(q, 0.0)).to_numpy(), 6
    )
    return ivf


@register(
    "embedding_near_dup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
    """,
)
def embedding_near_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (score column deliberately
    omitted: float equality across engines is not hash-stable)."""
    from document_ai_ray.stages.similarity import cosine_pairs

    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_pairs(vecs, threshold=0.4)


@register(
    "embedding_centroids",
    oracle="""
    SELECT label, i AS dim, ROUND(AVG(embedding[i]), 6) AS centroid_val
    FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
    GROUP BY 1, 2
    """,
)
def embedding_centroids(sf_dir: str):
    """Per-label mean embedding: numpy partial sums per batch, one tiny
    groupby over (label) partials, exploded to (label, dim, value)."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from document_ai_ray.stages.similarity import _to_matrix

    vecs = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t.column("embedding"))
        labels = t.column("label").to_numpy()
        rows = []
        for lab in np.unique(labels):
            sel = m[labels == lab]
            rows.append({"label": int(lab), "n": int(len(sel)), **{f"s{d}": float(x) for d, x in enumerate(sel.sum(axis=0))}})
        return pa.Table.from_pylist(rows)

    dims = 64
    from document_ai_ray.pipelines.ops import merge_partials

    partials = vecs.map_batches(partial, batch_format="pyarrow")
    agg = merge_partials(
        partials, keys=["label"],
        agg_funcs={"n": "sum", **{f"s{d}": "sum" for d in range(dims)}},
    )

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = []
        for _, r in df.iterrows():
            n = r["n"]
            for d in range(dims):
                v = r[f"s{d}"] / n
                out.append(
                    {"label": int(r["label"]), "dim": d + 1, "centroid_val": float(np.floor(abs(v) * 1e6 + 0.5) * (1 if v >= 0 else -1) / 1e6)}
                )
        return pa.Table.from_pylist(out)

    return agg.map_batches(finalize, batch_format="pyarrow", batch_size=None)


_SEMANTIC_KEEP_ORACLE = """
WITH RECURSIVE
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4),
edges AS (SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (SELECT vec_id AS u, vec_id AS label FROM embeddings
          UNION SELECT e.v AS u, r.label FROM edges e JOIN reach r ON r.u = e.u)
SELECT u AS vec_id FROM reach GROUP BY u HAVING u = MIN(label)
"""


@register("semantic_dedup_keep", oracle=_SEMANTIC_KEEP_ORACLE)
def semantic_dedup_keep(sf_dir: str):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): embedding-cosine near-dup pairs -> connected
    components -> keep only each component's canonical (min-id) vector;
    singletons survive.  Every stage is the already-verified distributed
    machinery: IVF-cell-bucketed exact cosine pairs
    (stages/similarity.py:cosine_pairs), min-label-propagation
    components + bucketed cluster assignment (stages/cluster.py).
    Unlike the paper's within-kmeans-cluster approximation, the
    cell-pair triangle-inequality pruning keeps the pair set EXACT, so
    the keep set matches the recursive-CTE reachability oracle
    row-for-row."""
    from document_ai_ray.stages.cluster import (
        assign_clusters,
        connected_components,
        keep_canonical,
    )
    from document_ai_ray.stages.similarity import cosine_pairs

    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    pairs = cosine_pairs(vecs, threshold=0.4)
    comps = connected_components(pairs)
    ids = read_table(sf_dir, "embeddings", columns=["vec_id"])
    assigned = assign_clusters(ids, comps, id_col="vec_id")
    return keep_canonical(assigned, out_col="vec_id")


@register("kmeans_embeddings")
def kmeans_embeddings(sf_dir: str):
    """Full-corpus distributed spherical k-means (Lloyd): per-iteration
    broadcast-assign + per-cell partial sums + tiny combiner merge —
    the iterative-algorithm representative (rows-only: a fixpoint loop
    has no SQL analogue; the monotone-objective certificate lives in
    tests/test_similarity.py).  Emits one row per (cell, dim) with the
    member count and iteration/objective metadata on every row."""
    import pandas as pd

    from document_ai_ray.stages.similarity import kmeans_lloyd

    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cents, counts, history, n_it = kmeans_lloyd(vecs, k=8, n_iter=10, seed=11)
    k, d = cents.shape
    rows = []
    for c in range(k):
        for j in range(d):
            rows.append(
                {
                    "cell": c,
                    "dim": j + 1,
                    "centroid_val": float(np.round(cents[c, j], 6)),
                    "n_members": int(counts[c]),
                    "n_iters": n_it,
                    "objective": float(np.round(history[-1], 6)),
                }
            )
    return pd.DataFrame(rows)


# -- BM25 lexical search ------------------------------------------------

_BM25_TERMS = ["spark", "hash", "window"]
_BM25_K = 20
# BM25 formula with k1=1.2, b=0.75, Robertson idf ln((N-df+.5)/(df+.5)+1);
# tokenization = string_split(' ') with empties dropped, matching
# stages/bm25.py byte-for-byte.
_BM25_TERMS_SQL = ",\n         ".join(
    f"len(list_filter(ws, x -> x = '{t}')) AS tf{j}" for j, t in enumerate(_BM25_TERMS)
)
_BM25_DF_SQL = ", ".join(
    f"SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS df{j}" for j in range(len(_BM25_TERMS))
)
_BM25_SCORE_SQL = "\n       + ".join(
    f"ln((n - df{j} + 0.5)/(df{j} + 0.5) + 1) * tf{j} * 2.2"
    f" / (tf{j} + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    for j in range(len(_BM25_TERMS))
)

_BM25_ORACLE = f"""
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
s AS (SELECT doc_id, len(ws) AS dl,
         {_BM25_TERMS_SQL}
      FROM t),
g AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl,
             {_BM25_DF_SQL}
      FROM s),
sc AS (SELECT doc_id,
         {_BM25_SCORE_SQL}
         AS raw
       FROM s CROSS JOIN g)
SELECT doc_id, ROUND(raw, 6) AS score
FROM sc WHERE raw > 0
ORDER BY score DESC, doc_id
LIMIT {_BM25_K}
"""


@register("bm25_search", oracle=_BM25_ORACLE)
def bm25_search(sf_dir: str):
    """Sparse LEXICAL retrieval (the keyword half of similarity search,
    next to the dense `knn_*` queries): BM25 top-{0} for the fixed
    query {1} over `documents.text`.  Two streaming passes — combiner
    partial corpus stats (n, avgdl, per-term df; one tiny row per
    batch), then vectorized scoring + streaming top-k (k rows per
    block, no global sort).  Nothing corpus-sized on the driver; the
    broadcast state is |query|+2 numbers.""".format(_BM25_K, _BM25_TERMS)
    from document_ai_ray.stages.bm25 import bm25_topk

    return bm25_topk(
        lambda: read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        _BM25_TERMS,
        _BM25_K,
    )


@register("pca_embeddings")
def pca_embeddings(sf_dir: str):
    """Distributed exact PCA over the embeddings (one streaming
    moments pass -> d x d covariance -> driver eigh): the embedding
    compression step before ANN indexing.  One row per component with
    its explained-variance ratio, the cumulative ratio, and a
    self-evidencing orthonormality error (max |CCᵀ - I|) — rows-only
    (eigendecomposition has no SQL analogue); tests pin equality with
    a materialized numpy reference."""
    import pandas as pd

    from document_ai_ray.stages.linalg import pca_fit

    vecs = read_table(sf_dir, "embeddings", columns=["embedding"])
    comps, ratio, _ = pca_fit(vecs, k=8)
    ortho_err = float(np.abs(comps @ comps.T - np.eye(len(comps))).max())
    cum = np.cumsum(ratio)
    return pd.DataFrame(
        {
            "component": np.arange(len(ratio), dtype=np.int64),
            "explained_variance_ratio": np.round(ratio, 6),
            "cumulative_ratio": np.round(cum, 6),
            "orthonormality_err": np.round(ortho_err, 12),
        }
    )


@register("softmax_classifier_embeddings")
def softmax_classifier_embeddings(sf_dir: str):
    """FineWeb-Edu-shape quality classifier: multinomial logistic
    regression on the embedding column against the stored labels,
    trained by FULL-BATCH distributed gradient descent (per-batch
    partial gradients Xᵀ(P−Y) merged on the driver, model broadcast
    once per iteration — the mergeable-partials discipline, d*k floats
    per batch).  Emits per-class precision/recall/F1 plus overall
    accuracy, final loss and a loss-monotone flag, so the rows-only
    check is self-evidencing; tests pin exact parity with a
    single-process reference and the accuracy floor."""
    import pandas as pd

    from document_ai_ray.stages.linalg import softmax_eval, softmax_train

    vecs = read_table(sf_dir, "embeddings", columns=["embedding", "label"])
    W, b, hist = softmax_train(vecs, n_classes=10, n_iter=25, lr=12.0)
    conf = softmax_eval(read_table(sf_dir, "embeddings", columns=["embedding", "label"]), W, b)
    k = conf.shape[0]
    tp = np.diag(conf).astype(np.float64)
    support = conf.sum(axis=1).astype(np.float64)
    predicted = conf.sum(axis=0).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        prec = np.where(predicted > 0, tp / predicted, 0.0)
        rec = np.where(support > 0, tp / support, 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    acc = float(tp.sum() / conf.sum())
    return pd.DataFrame(
        {
            "label": np.arange(k, dtype=np.int64),
            "n": support.astype(np.int64),
            "precision": np.round(prec, 6),
            "recall": np.round(rec, 6),
            "f1": np.round(f1, 6),
            "accuracy": np.round(acc, 6),
            "final_loss": np.round(hist[-1], 6),
            "loss_monotone": bool(all(b <= a + 1e-12 for a, b in zip(hist, hist[1:]))),
        }
    )


@register("knn_pq")
def knn_pq_query(sf_dir: str):
    """Product-quantization ANN with REFINE (the full FAISS recipe,
    stages/pq.py): train per-subspace codebooks on a seeded uniform
    sample, encode the corpus to 8-byte codes in one streaming pass,
    ADC-scan the CODES (never the float vectors) for a 100-candidate
    shortlist per query, exactly re-rank only the shortlisted vectors,
    and — rows-only query made meaningful — run exact brute-force
    alongside and attach per-query recall@k to every row.  Documented
    floor: mean recall >= 0.8 with 8x32 codebooks + shortlist 100 on
    this cosine-continuum 64-dim corpus (asserted in tests/test_pq.py;
    raw ADC without refine measures ~0.36-0.58 here — the shortlist
    knob is the standard cost/recall trade)."""
    import numpy as np

    from document_ai_ray.stages.pq import knn_pq_refined, pq_encode, pq_train
    from document_ai_ray.stages.similarity import knn_bruteforce, sample_vectors

    q_ids, q_mat = _load_queries(sf_dir)
    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = sample_vectors(vecs, 2000, "vec_id", "embedding")
    books = pq_train(sample, n_subspaces=8, n_codes=32)
    codes = pq_encode(read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), books)
    approx = knn_pq_refined(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        codes, q_ids, q_mat, books, k=K, shortlist=100,
    ).to_pandas()
    exact = knn_bruteforce(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), q_ids, q_mat, k=K
    ).to_pandas()
    hits = approx.merge(
        exact[["query_id", "neighbor_id"]], on=["query_id", "neighbor_id"], how="inner"
    )
    per_q = (hits.groupby("query_id").size() / float(K)).to_dict()
    approx["recall_at_k"] = np.round(
        approx["query_id"].map(lambda q: per_q.get(q, 0.0)).to_numpy(), 6
    )
    return approx


@register("knn_ivfpq")
def knn_ivfpq_query(sf_dir: str):
    """IVF-PQ — the literal FAISS billion-scale index, combining the
    repo's IVF (probe the n_probe nearest cells) with residual product
    codes (stages/pq.py `ivfpq_*`): the scan reads 8-byte codes of
    probed cells only.  Rows-only with the standard recall column vs
    exact brute force; with the refine stage, recall is bounded by the
    cell-probe miss rate alone (PQ distortion is repaired by the exact
    re-rank of the shortlist) — documented floor 0.5 on this
    cosine-continuum corpus at n_probe=6 of 16; raise n_probe to trade
    scan cost for recall."""
    import numpy as np

    from document_ai_ray.stages.pq import ivfpq_encode, ivfpq_train, knn_ivfpq_refined
    from document_ai_ray.stages.similarity import knn_bruteforce, sample_vectors

    q_ids, q_mat = _load_queries(sf_dir)
    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = sample_vectors(vecs, 2000, "vec_id", "embedding")
    cents, books = ivfpq_train(sample, n_cells=16, n_subspaces=8, n_codes=32)
    codes = ivfpq_encode(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), cents, books
    )
    approx = knn_ivfpq_refined(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        codes, q_ids, q_mat, cents, books, k=K, n_probe=6, shortlist=60,
    ).to_pandas()
    exact = knn_bruteforce(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]), q_ids, q_mat, k=K
    ).to_pandas()
    hits = approx.merge(
        exact[["query_id", "neighbor_id"]], on=["query_id", "neighbor_id"], how="inner"
    )
    per_q = (hits.groupby("query_id").size() / float(K)).to_dict()
    approx["recall_at_k"] = np.round(
        approx["query_id"].map(lambda q: per_q.get(q, 0.0)).to_numpy(), 6
    )
    return approx


_NORM_ORACLE = """
WITH n AS (SELECT label,
                  sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
           FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
       ROUND(MIN(nm), 6) AS min_norm, ROUND(MAX(nm), 6) AS max_norm,
       ROUND(AVG(nm), 4) AS avg_norm
FROM n GROUP BY label
"""


@register("embedding_norm_stats", oracle=_NORM_ORACLE)
def embedding_norm_stats(sf_dir: str):
    """Per-label L2-norm statistics over the raw vector column — the
    sanity profile run before any ANN build (catches unnormalized /
    zero vectors).  One vectorized matrix pass per batch, combiner
    merge; value-checked against DuckDB's list lambdas (norms rounded
    at 6, the distributed-vs-sequential sum drift is ~1e-15)."""
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import merge_partials, round_cols
    from document_ai_ray.stages.similarity import _to_matrix

    ds = read_table(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        m = _to_matrix(t.column("embedding")).astype(np.float64)
        norms = np.sqrt((m * m).sum(axis=1))
        labels = t.column("label").to_numpy(zero_copy_only=False)
        import pandas as pd

        df = pd.DataFrame({"label": labels, "nm": norms})
        g = df.groupby("label").agg(
            n_vecs=("nm", "size"), mn=("nm", "min"), mx=("nm", "max"), sm=("nm", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    merged = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label"],
        {"n_vecs": "sum", "mn": "min", "mx": "max", "sm": "sum"},
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        avg = pc.divide(t.column("sm"), pc.cast(t.column("n_vecs"), pa.float64()))
        out = pa.table(
            {
                "label": t.column("label"),
                "n_vecs": t.column("n_vecs"),
                "min_norm": t.column("mn"),
                "max_norm": t.column("mx"),
                "avg_norm": avg,
            }
        )
        return round_cols(out, {"min_norm": 6, "max_norm": 6, "avg_norm": 4})

    return merged.map_batches(finalize, batch_format="pyarrow")


# -- Hybrid retrieval: dense cosine + lexical Jaccard fused by RRF --------

_HY_Q = 4       # query docs (vec_id == doc_id < _HY_Q)
_HY_TOPN = 50   # per-system candidate list depth
_HY_K = 10      # fused results per query

_HYBRID_ORACLE = f"""
WITH qd AS (SELECT d.doc_id AS qid,
                   list_distinct(list_filter(string_split(d.text, ' '), x -> x != '')) AS qws,
                   e.embedding AS qemb
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
            WHERE d.doc_id < {_HY_Q}),
cand AS (SELECT doc_id,
                list_distinct(list_filter(string_split(text, ' '), x -> x != '')) AS ws
         FROM documents),
lex AS (SELECT qid, c.doc_id AS nid,
               CAST(len(list_intersect(qws, ws)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(qws, ws))) AS DOUBLE) AS jac
        FROM qd JOIN cand c ON c.doc_id != qid),
lexr AS (SELECT qid, nid,
                ROW_NUMBER() OVER (PARTITION BY qid ORDER BY jac DESC, nid) AS r
         FROM lex WHERE jac > 0 QUALIFY r <= {_HY_TOPN}),
den AS (SELECT qd.qid, t.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY qd.qid
                                  ORDER BY list_cosine_similarity(qd.qemb, t.embedding) DESC,
                                           t.vec_id) AS r
        FROM qd JOIN embeddings t ON t.vec_id != qd.qid
        QUALIFY r <= {_HY_TOPN}),
f AS (SELECT COALESCE(lexr.qid, den.qid) AS query_id,
             COALESCE(lexr.nid, den.nid) AS neighbor_id,
             COALESCE(1.0 / (60.0 + lexr.r), 0.0) + COALESCE(1.0 / (60.0 + den.r), 0.0) AS rrf
      FROM lexr FULL OUTER JOIN den ON lexr.qid = den.qid AND lexr.nid = den.nid)
SELECT query_id, neighbor_id, ROUND(rrf, 6) AS rrf_score,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS BIGINT)
       AS rrf_rank
FROM f QUALIFY rrf_rank <= {_HY_K}
"""


@register("hybrid_search_rrf", oracle=_HYBRID_ORACLE)
def hybrid_search_rrf(sf_dir: str):
    """Hybrid retrieval, the standard RAG fusion: a DENSE ranking
    (brute-force cosine over embeddings, the proven `knn_bruteforce`
    ordering) and a LEXICAL ranking (distinct-word-set Jaccard against
    the query doc, zero-overlap candidates dropped), each truncated to
    top-{0} per query, fused by reciprocal-rank fusion
    score = sum 1/(60+rank) over the systems that retrieved the
    candidate, top-{1} per query.  Shape: the dense half is one
    broadcast-matmul scan; the lexical half is one scan with per-batch
    per-query local top-k into a bucketless grouped-topk final (both
    candidate lists are Q x top-N rows); the fuse itself touches only
    those tiny lists.  RRF terms are two fixed-order additions of
    exactly-representable reciprocals, so the fused score is
    bit-identical to the oracle's.""".format(_HY_TOPN, _HY_K)
    import pandas as pd
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import grouped_topk
    from document_ai_ray.stages.similarity import _to_matrix, knn_bruteforce

    # tiny query-side state: Q embeddings + Q distinct word sets
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    keep = emb.column("vec_id").to_numpy() < _HY_Q
    sub = emb.filter(pa.array(keep))
    q_ids = sub.column("vec_id").to_numpy().tolist()
    q_mat = _to_matrix(sub.column("embedding"))
    qdocs = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    qkeep = qdocs.column("doc_id").to_numpy() < _HY_Q
    qsub = qdocs.filter(pa.array(qkeep))
    q_sets = {
        int(i): set(tx.split(" ")) - {""}
        for i, tx in zip(qsub.column("doc_id").to_pylist(), qsub.column("text").to_pylist())
    }

    # dense half — knn_bruteforce emits (query_id, neighbor_id, rank)
    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dense = knn_bruteforce(vecs, q_ids, q_mat, k=_HY_TOPN).to_pandas()

    # lexical half — one scan, per-batch jaccard vs each query set
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def jac_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_q, out_n, out_j = [], [], []
        for nid, tx in zip(ids, texts):
            ws = set(tx.split(" ")) - {""}
            for qid, qws in q_sets.items():
                if nid == qid:
                    continue
                inter = len(qws & ws)
                if inter == 0:
                    continue
                j = float(inter) / float(len(qws | ws))
                out_q.append(qid)
                out_n.append(nid)
                out_j.append(j)
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "nid": pa.array(out_n, pa.int64()),
                "jac": pa.array(out_j, pa.float64()),
            }
        )

    lex = grouped_topk(
        docs.map_batches(jac_batch, batch_format="pyarrow"),
        ["qid"],
        [("jac", False), ("nid", True)],
        _HY_TOPN,
    ).to_pandas()

    # fuse — everything below is Q x top-N sized
    lex = lex.sort_values(["qid", "jac", "nid"], ascending=[True, False, True])
    lex["r"] = lex.groupby("qid").cumcount() + 1
    both = pd.merge(
        lex[["qid", "nid", "r"]].rename(columns={"qid": "query_id", "nid": "neighbor_id", "r": "rl"}),
        dense[["query_id", "neighbor_id", "rank"]].rename(columns={"rank": "rd"}),
        on=["query_id", "neighbor_id"],
        how="outer",
    )
    lt = np.where(both["rl"].notna(), 1.0 / (60.0 + both["rl"].fillna(0.0)), 0.0)
    dt = np.where(both["rd"].notna(), 1.0 / (60.0 + both["rd"].fillna(0.0)), 0.0)
    both["rrf"] = lt + dt
    both = both.sort_values(["query_id", "rrf", "neighbor_id"], ascending=[True, False, True])
    both["rrf_rank"] = both.groupby("query_id").cumcount() + 1
    both = both[both["rrf_rank"] <= _HY_K]
    rrf = both["rrf"].to_numpy()
    return pa.table(
        {
            "query_id": pa.array(both["query_id"].to_numpy().astype(np.int64)),
            "neighbor_id": pa.array(both["neighbor_id"].to_numpy().astype(np.int64)),
            "rrf_score": pa.array(np.copysign(np.floor(np.abs(rrf) * 1e6 + 0.5), rrf) / 1e6),
            "rrf_rank": pa.array(both["rrf_rank"].to_numpy().astype(np.int64)),
        }
    )


# -- MMR diversified re-ranking --------------------------------------------

_MMR_CAND = 20
_MMR_K = 5
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in SQL: step k picks the remaining candidate
    maximizing lam*rel - (1-lam)*max-sim-to-selected, similarities
    QUANTIZED to 1e-6 before the arithmetic on both engines (raw
    float64 cosines agree to ~1e-15 — the knn precedent — so the
    quantized values are identical and the greedy is deterministic
    with the cid tiebreak)."""
    cos = "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(t.embedding AS DOUBLE[]))"
    steps = []
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
s{k} AS MATERIALIZED (
  SELECT c.cid, c.emb, {k} AS mmr_rank
  FROM cand c WHERE c.cid NOT IN (SELECT cid FROM sel{k - 1})
  ORDER BY {_MMR_LAM} * c.rel_r
           - {round(1 - _MMR_LAM, 10)} * (SELECT MAX(ROUND(list_cosine_similarity(c.emb, s.emb), 6))
                                          FROM sel{k - 1} s)
           DESC, c.cid
  LIMIT 1),
sel{k} AS MATERIALIZED (
  SELECT cid, emb FROM sel{k - 1} UNION ALL SELECT cid, emb FROM s{k})""")
    return f"""
WITH cand AS MATERIALIZED (
  SELECT t.vec_id AS cid, CAST(t.embedding AS DOUBLE[]) AS emb,
         ROUND({cos}, 6) AS rel_r
  FROM embeddings q JOIN embeddings t ON t.vec_id != q.vec_id
  WHERE q.vec_id = 0
  QUALIFY ROW_NUMBER() OVER (ORDER BY {cos} DESC, t.vec_id) <= {_MMR_CAND}),
s1 AS MATERIALIZED (
  SELECT cid, emb, 1 AS mmr_rank FROM cand ORDER BY rel_r DESC, cid LIMIT 1),
sel1 AS MATERIALIZED (SELECT cid, emb FROM s1),
{",".join(steps)}
SELECT neighbor_id, mmr_rank FROM (
  {" UNION ALL ".join(f"SELECT cid AS neighbor_id, mmr_rank FROM s{k}" for k in range(1, _MMR_K + 1))}
)
"""


@register("mmr_rerank", oracle=_mmr_oracle())
def mmr_rerank(sf_dir: str):
    """MMR (maximal marginal relevance) diversified top-{0} from the
    query-0 cosine top-{1}: greedy lam*relevance - (1-lam)*redundancy
    re-ranking, the standard retrieval diversifier.  Candidate
    generation is the distributed knn scan; the greedy runs on the
    candidate set (output-sized, 20 vectors) with 1e-6-quantized
    float64 similarities mirroring the oracle exactly.""".format(_MMR_K, _MMR_CAND)
    import pyarrow as pa

    from document_ai_ray.stages.similarity import _to_matrix, knn_bruteforce

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = emb.column("vec_id").to_numpy()
    q_mat = _to_matrix(emb.filter(pa.array(ids == 0)).column("embedding"))

    vecs = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cand = knn_bruteforce(vecs, [0], q_mat, k=_MMR_CAND).to_pandas()
    cand_ids = cand.sort_values("rank")["neighbor_id"].to_numpy()

    sub = emb.filter(pa.array(np.isin(ids, cand_ids)))
    sub_ids = sub.column("vec_id").to_numpy()
    M = _to_matrix(sub.column("embedding"))
    order = {int(v): i for i, v in enumerate(sub_ids)}
    M = M[[order[int(c)] for c in cand_ids]]  # align to rank order

    def cos(a: np.ndarray, b: np.ndarray) -> float:
        v = float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))
        return float(np.copysign(np.floor(abs(v) * 1e6 + 0.5), v) / 1e6)

    q = q_mat[0]
    rel = np.array([cos(q, M[i]) for i in range(len(cand_ids))])
    selected: list[int] = []
    sel_rows = []
    remaining = list(range(len(cand_ids)))
    for step in range(1, _MMR_K + 1):
        best = None
        for i in remaining:
            if step == 1:
                score = rel[i]
            else:
                pen = max(cos(M[i], M[j]) for j in selected)
                score = _MMR_LAM * rel[i] - (1 - _MMR_LAM) * pen
            key = (-score, int(cand_ids[i]))
            if best is None or key < best[0]:
                best = (key, i)
        i = best[1]
        selected.append(i)
        remaining.remove(i)
        sel_rows.append((int(cand_ids[i]), step))

    return pa.table(
        {
            "neighbor_id": pa.array([r[0] for r in sel_rows], pa.int64()),
            "mmr_rank": pa.array([r[1] for r in sel_rows], pa.int32()),
        }
    )


# -- TF-IDF vector-space retrieval -------------------------------------------

_VSM_K = 10

_VSM_ORACLE = f"""
WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
           FROM documents),
tf AS (SELECT doc_id, unnest(ws) AS word FROM w),
tfc AS (SELECT doc_id, word, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
df AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df FROM tfc GROUP BY 1),
wts AS (SELECT t.doc_id, t.word,
               CAST(t.tf AS DOUBLE) * LN((SELECT nd FROM n) / d.df) AS w
        FROM tfc t JOIN df d USING (word)),
nrm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nn FROM wts GROUP BY 1),
q AS (SELECT word, w FROM wts WHERE doc_id = 0),
dots AS (SELECT c.doc_id, SUM(c.w * q.w) AS dot
         FROM wts c JOIN q USING (word) WHERE c.doc_id != 0 GROUP BY 1),
sc AS (SELECT d.doc_id,
              d.dot / ((SELECT nn FROM nrm WHERE doc_id = 0) * nrm.nn) AS raw
       FROM dots d JOIN nrm USING (doc_id))
SELECT doc_id AS neighbor_id, ROUND(raw, 6) AS score
FROM sc WHERE raw > 0
ORDER BY raw DESC, doc_id LIMIT {_VSM_K}
"""


@register("tfidf_text_knn", oracle=_VSM_ORACLE)
def tfidf_text_knn(sf_dir: str):
    """Vector-space-model retrieval: TF-IDF cosine between doc 0 and
    every other doc, top-{0} (completing the lexical trio next to BM25
    and Jaccard).  Shape: the DF map rides a hash(word) combiner; the
    query doc's weighted term vector broadcasts (query-sized); one
    scoring scan computes each doc's dot product and norm vectorized
    from its own term counts, then the streaming top-k (the bm25
    float-precedent: per-term log products summed per doc, raw-score
    ordering with doc_id tiebreak).""".format(_VSM_K)
    import pyarrow as pa

    import ray

    from document_ai_ray.pipelines.ops import get_broadcast, merge_partials, topk
    from document_ai_ray.stages.text_analysis import word_value_counts

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = float(docs.count())

    # distributed DF map (word -> doc count); vocab is dictionary-sized
    def df_partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for tx in t.column("text").to_pylist():
            c.update(set((tx or "").split(" ")) - {""})
        return pa.table(
            {"word": pa.array(list(c.keys()), pa.string()),
             "df": pa.array(list(c.values()), pa.int64())}
        )

    df_tbl = merge_partials(
        docs.map_batches(df_partial, batch_format="pyarrow"), ["word"], {"df": "sum"}
    ).to_pandas()
    df_map = dict(zip(df_tbl["word"], df_tbl["df"].astype(float)))

    qrow = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    qtext = qrow.filter(pa.array(qrow.column("doc_id").to_numpy() == 0)).column("text").to_pylist()[0]
    from collections import Counter as _Counter

    qtf = _Counter(w for w in qtext.split(" ") if w)
    qw = {w: c * np.log(n_docs / df_map[w]) for w, c in qtf.items()}
    qn = float(np.sqrt(sum(v * v for v in qw.values())))
    bref = (ray.put((qw, qn, df_map)),)

    def score(t: pa.Table) -> pa.Table:
        qw_, qn_, dfm = get_broadcast(bref, tag="vsm_q")
        ids_out, scores = [], []
        for did, tx in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            if did == 0:
                continue
            tf = _Counter(w for w in (tx or "").split(" ") if w)
            nn = 0.0
            dot = 0.0
            for w, c in tf.items():
                wt = c * np.log(n_docs / dfm[w])
                nn += wt * wt
                if w in qw_:
                    dot += wt * qw_[w]
            if dot > 0:
                ids_out.append(did)
                scores.append(dot / (qn_ * float(np.sqrt(nn))))
        return pa.table(
            {"neighbor_id": pa.array(ids_out, pa.int64()),
             "raw": pa.array(scores, pa.float64())}
        )

    top = topk(
        docs.map_batches(score, batch_format="pyarrow"),
        [("raw", True), ("neighbor_id", False)],
        _VSM_K,
    )

    def finish(t: pa.Table) -> pa.Table:
        r = t.column("raw").to_numpy(zero_copy_only=False)
        return pa.table(
            {"neighbor_id": t.column("neighbor_id"),
             "score": pa.array(np.copysign(np.floor(np.abs(r) * 1e6 + 0.5), r) / 1e6,
                               pa.float64())}
        )

    return top.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Int8 symmetric quantization of the embedding column — the standard
# 4x storage/bandwidth cut before ANN serving.  Per-element quantize /
# dequantize are identical double expressions on both engines; the
# per-vector reductions (|q| mass, squared-error mass) are integer
# sums, so nothing depends on accumulation order.
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH el AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
sc AS (SELECT vec_id, MAX(ABS(x)) AS scale FROM el GROUP BY 1),
q AS (SELECT el.vec_id,
             CASE WHEN x >= 0 THEN FLOOR(ABS(x) / scale * 127.0 + 0.5)
                  ELSE -FLOOR(ABS(x) / scale * 127.0 + 0.5) END AS qv,
             x, scale
      FROM el JOIN sc ON sc.vec_id = el.vec_id
      WHERE scale > 0)
SELECT vec_id,
       ROUND(ANY_VALUE(scale), 6) AS scale,
       CAST(SUM(CAST(ABS(qv) AS BIGINT)) AS BIGINT) AS sum_q_abs,
       CAST(SUM(CAST(FLOOR((x - qv * scale / 127.0) * (x - qv * scale / 127.0) * 1e12
                           + 0.5) AS BIGINT)) AS BIGINT) AS err_e12
FROM q GROUP BY 1
"""


@register("embedding_int8_quantize", oracle=_QUANT_ORACLE)
def embedding_int8_quantize(sf_dir: str):
    """Symmetric per-vector int8 quantization (scale = max |x|,
    q = round(x/scale*127) half away from zero) with exact
    reconstruction-error accounting: per-element squared errors are
    floored into integer picounits before summing, so the per-vector
    error mass is order-free.  One streaming vectorized pass — the
    quantized tier a 100 TB ANN deployment serves from."""
    import pyarrow as pa
    import pyarrow.compute as pc

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def quantize(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        assert (lens == d).all()
        x = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x.reshape(-1, d)
        scale = np.abs(x).max(axis=1)
        keep = scale > 0
        x, scale = x[keep], scale[keep]
        aq = np.floor(np.abs(x) / scale[:, None] * 127.0 + 0.5)
        qv = np.where(x >= 0, aq, -aq)
        err = x - qv * scale[:, None] / 127.0
        err_units = np.floor(err * err * 1e12 + 0.5).astype(np.int64)
        sc6 = np.floor(scale * 1e6 + 0.5) / 1e6  # positive domain
        return pa.table(
            {
                "vec_id": t.column("vec_id").filter(pa.array(keep)),
                "scale": pa.array(sc6, pa.float64()),
                "sum_q_abs": pa.array(np.abs(qv).sum(axis=1).astype(np.int64)),
                "err_e12": pa.array(err_units.sum(axis=1)),
            }
        )

    return emb.map_batches(quantize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-label centroid cosine matrix — the cluster-separation report an
# embedding-dedup/ANN deployment reads before picking thresholds.
# Centroid arithmetic is order-free: each element is floored into
# integer micro-units per row, summed as exact int64 per (label, dim)
# through the combiner, and the 10x64 integer table reaches one final
# task that takes exact python-int dot products (the oracle's HUGEINT
# twin); n cancels in cosine, so centroids never materialize as floats.
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = """
WITH el AS (SELECT label, unnest(embedding) AS x,
                   unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
s AS (SELECT label, i,
             CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS sv
      FROM el GROUP BY 1, 2),
d AS (SELECT a.label AS label_a, b.label AS label_b,
             SUM(CAST(a.sv AS HUGEINT) * b.sv) AS dot
      FROM s a JOIN s b ON a.i = b.i AND a.label < b.label GROUP BY 1, 2),
nrm AS (SELECT label, SUM(CAST(sv AS HUGEINT) * sv) AS n2 FROM s GROUP BY 1)
SELECT label_a, label_b,
       ROUND(CAST(dot AS DOUBLE)
             / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), 6)
       AS cos_centroid
FROM d JOIN nrm na ON na.label = label_a JOIN nrm nb ON nb.label = label_b
"""


@register("label_centroid_cosine", oracle=_CENTROID_ORACLE)
def label_centroid_cosine(sf_dir: str):
    """Pairwise cosine between per-label embedding centroids.  One
    vectorized pass emits (label, dim, micro-sum) partials (labels x 64
    keys); the combiner merge is exact int64; the one-row-per-pair
    final evaluates dots in arbitrary-precision python ints before the
    single float division (mirrors the oracle's HUGEINT products —
    int64 would overflow at ~2e19)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from document_ai_ray.pipelines.ops import merge_partials

    emb = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        d = int(lens[0])
        assert (lens == d).all()
        x = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(x * 1e6).astype(np.int64).reshape(-1, d)
        labels = t.column("label").to_numpy(zero_copy_only=False)
        uniq = np.unique(labels)
        rows_l, rows_i, rows_s = [], [], []
        for lb in uniq:
            sv = q[labels == lb].sum(axis=0)
            rows_l.extend([int(lb)] * d)
            rows_i.extend(range(1, d + 1))
            rows_s.extend(sv.tolist())
        return pa.table(
            {"label": pa.array(rows_l, pa.int64()), "i": pa.array(rows_i, pa.int64()),
             "sv": pa.array(rows_s, pa.int64())}
        )

    agg = merge_partials(
        emb.map_batches(partial, batch_format="pyarrow"), ["label", "i"], {"sv": "sum"}
    )

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().sort_values(["label", "i"])
        vecs = {
            int(lb): [int(v) for v in g.sort_values("i")["sv"]]
            for lb, g in df.groupby("label")
        }
        labs = sorted(vecs)
        n2 = {lb: sum(v * v for v in vecs[lb]) for lb in labs}
        la, lb_, cosv = [], [], []
        for ai in range(len(labs)):
            for bi in range(ai + 1, len(labs)):
                a, b = labs[ai], labs[bi]
                dot = sum(x * y for x, y in zip(vecs[a], vecs[b]))
                c = float(dot) / (np.sqrt(float(n2[a])) * np.sqrt(float(n2[b])))
                la.append(a); lb_.append(b)
                cosv.append(np.copysign(np.floor(abs(c) * 1e6 + 0.5), c) / 1e6)
        return pa.table(
            {"label_a": pa.array(la, pa.int64()), "label_b": pa.array(lb_, pa.int64()),
             "cos_centroid": pa.array(cosv, pa.float64())}
        )

    # tiny-partials merge: labels x dims rows
    return agg.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)
