"""Product quantization (PQ) for approximate nearest-neighbor search.

Jégou, Douze, Schmid 2011 ("Product quantization for nearest neighbor
search") — the compression layer of FAISS's IVF-PQ, the standard
billion-vector ANN recipe: split each d-dim vector into M contiguous
subvectors, vector-quantize each subspace against its own K-entry
codebook (d/M-dim L2 k-means), and store M uint8 codes per vector.
Search is ADC (asymmetric distance computation): per query, one
(M, K) lookup table of subvector->codeword distances, then each
database vector's approximate distance is a sum of M table lookups —
no float vector ever touched at scan time.

Distributed shape mirrors stages/similarity.py: codebooks train on a
driver-side seeded uniform SAMPLE (FAISS's own practice) and broadcast
once via ray.put; encoding and ADC scans are streaming map_batches
over the vector table; top-k merges through the same local-topk +
single-final-task pattern as knn_bruteforce.

100 TB story: the encoded corpus is d/M * 32x smaller than the floats
(64-dim float32 -> 8 bytes here), so the scan stage reads codes, not
vectors; at that scale you'd persist `pq_encode`'s output as the
search table and keep only it hot.  Cosine ranking is preserved by
normalizing vectors before encoding (L2^2 = 2 - 2cos on unit vectors,
a monotone map).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from document_ai_ray.stages.similarity import _INSTANCES, _normalize, _to_matrix


def _kmeans_l2(sample: np.ndarray, k: int, n_iter: int = 15, seed: int = 23) -> np.ndarray:
    """Seeded L2 k-means on a driver-side sample (numpy-only).  Empty
    clusters keep their previous centroid — deterministic."""
    rng = np.random.RandomState(seed)
    k = min(k, len(sample))
    idx = rng.choice(len(sample), size=k, replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin drops ||x||^2
        d = -2.0 * sample @ cents.T + (cents * cents).sum(axis=1)[None, :]
        assign = np.argmin(d, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_train(
    sample: np.ndarray, n_subspaces: int = 8, n_codes: int = 32, n_iter: int = 15, seed: int = 23
) -> np.ndarray:
    """Train per-subspace codebooks on a (normalized) sample.  Returns
    (M, K, d/M) float64.  d must divide evenly into n_subspaces."""
    sample = _normalize(np.asarray(sample, np.float64))
    d = sample.shape[1]
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible into {n_subspaces} subspaces")
    dsub = d // n_subspaces
    books = np.empty((n_subspaces, min(n_codes, len(sample)), dsub), np.float64)
    for j in range(n_subspaces):
        books[j] = _kmeans_l2(
            sample[:, j * dsub : (j + 1) * dsub], n_codes, n_iter, seed + j
        )
    return books


def _encode_matrix(m: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, M) uint8 codes."""
    n_sub, _, dsub = books.shape
    codes = np.empty((m.shape[0], n_sub), np.uint8)
    for j in range(n_sub):
        sub = m[:, j * dsub : (j + 1) * dsub]
        cb = books[j]
        d = -2.0 * sub @ cb.T + (cb * cb).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def pq_encode(
    vectors: rd.Dataset,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Streaming encode: (id, code:binary[M]) rows.  Codebooks are
    broadcast once; vectors are normalized so ADC L2 ranks by cosine."""
    ref = ray.put(books)

    def enc(t: pa.Table, books_ref: tuple) -> pa.Table:
        key = (books_ref[0].hex(), "pq_books")
        cb = _INSTANCES.get(key)
        if cb is None:
            cb = _INSTANCES[key] = ray.get(books_ref[0])
        m = _normalize(_to_matrix(t.column(vec_col)))
        codes = _encode_matrix(m, cb)
        return pa.table(
            {
                "vec_id": t.column(id_col),
                "code": pa.array([c.tobytes() for c in codes], pa.binary()),
            }
        )

    return vectors.map_batches(enc, fn_kwargs={"books_ref": (ref,)}, batch_format="pyarrow")


class AdcScan:
    """Per-worker warm state: query LUTs built once, reused per batch."""

    def __init__(self, q_ids, q_mat, books, k: int):
        self.q_ids = np.asarray(q_ids)
        self.k = k
        self.books = books
        q = _normalize(np.asarray(q_mat, np.float64))
        n_sub, n_codes, dsub = books.shape
        # LUT[qi, j, c] = ||q_sub - codeword||^2
        self.lut = np.empty((len(q), n_sub, n_codes), np.float64)
        for j in range(n_sub):
            sub = q[:, j * dsub : (j + 1) * dsub]
            cb = books[j]
            self.lut[:, j, :] = (
                (sub * sub).sum(axis=1)[:, None]
                - 2.0 * sub @ cb.T
                + (cb * cb).sum(axis=1)[None, :]
            )

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        raw = t.column("code").to_pylist()
        n_sub = self.books.shape[0]
        codes = np.frombuffer(b"".join(raw), np.uint8).reshape(len(raw), n_sub)
        cols = np.arange(n_sub)
        q_out, n_out, d_out = [], [], []
        for qi in range(len(self.q_ids)):
            dist = self.lut[qi][cols, codes].sum(axis=1)  # (n,) ADC
            mask = ids != self.q_ids[qi]
            sub_ids, sub_d = ids[mask], dist[mask]
            if not len(sub_ids):
                continue
            k = min(self.k, len(sub_ids))
            part = np.argpartition(sub_d, k - 1)[:k]
            q_out.extend([int(self.q_ids[qi])] * k)
            n_out.extend(int(x) for x in sub_ids[part])
            d_out.extend(float(x) for x in sub_d[part])
        return pa.Table.from_arrays(
            [
                pa.array(q_out, pa.int64()),
                pa.array(n_out, pa.int64()),
                pa.array(d_out, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "adc_dist"],
        )


def knn_pq(
    codes: rd.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    books: np.ndarray,
    k: int = 10,
) -> rd.Dataset:
    """ADC top-k over a PQ-encoded table.  Output: query_id,
    neighbor_id, rank (1-based, ascending ADC distance, neighbor_id
    tie-break)."""
    ref = ray.put((query_ids, query_matrix, books))

    def scan(t: pa.Table, state_ref: tuple) -> pa.Table:
        key = (state_ref[0].hex(), "adc", k)
        inst = _INSTANCES.get(key)
        if inst is None:
            q_ids, q_mat, cb = ray.get(state_ref[0])
            inst = _INSTANCES[key] = AdcScan(q_ids, q_mat, cb, k)
        return inst(t)

    local = codes.map_batches(scan, fn_kwargs={"state_ref": (ref,)}, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401

        df = t.to_pandas()
        df = df.sort_values(
            ["query_id", "adc_dist", "neighbor_id"], ascending=[True, True, True]
        )
        df = df.groupby("query_id", as_index=False).head(k)
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rank"]], preserve_index=False
        )

    # repartition(1): exactly one final top-k task (candidate set is
    # k x n_queries x n_blocks — output-sized, never corpus-sized)
    return local.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=1 << 30)


def knn_pq_refined(
    vectors: rd.Dataset,
    codes: rd.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """PQ + REFINE (the full FAISS recipe): ADC-scan the codes for a
    `shortlist`-sized candidate set per query, then exactly re-rank
    ONLY the shortlisted vectors by true cosine.  The exact pass
    touches Q x shortlist float vectors — output-sized, broadcast as a
    {vec_id: [query rows]} probe map — so the corpus-wide scan still
    reads 8-byte codes only.  Output: query_id, neighbor_id, rank."""
    short = knn_pq(codes, query_ids, query_matrix, books, k=shortlist).to_pandas()
    return exact_rerank(vectors, short, query_ids, query_matrix, k, id_col, vec_col)


def exact_rerank(
    vectors: rd.Dataset,
    short,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Exact-cosine re-rank of a (query_id, neighbor_id) shortlist
    DataFrame against the float vector table — the refine stage shared
    by knn_pq_refined and knn_ivfpq_refined."""
    probe: dict[int, list[int]] = {}
    for nid, qid in zip(short["neighbor_id"].to_numpy(), short["query_id"].to_numpy()):
        probe.setdefault(int(nid), []).append(int(qid))
    q_index = {int(q): i for i, q in enumerate(query_ids)}
    ref = ray.put((probe, q_index, _normalize(np.asarray(query_matrix, np.float64))))

    def rerank(t: pa.Table, state_ref: tuple) -> pa.Table:
        key = (state_ref[0].hex(), "pq_refine")
        st = _INSTANCES.get(key)
        if st is None:
            st = _INSTANCES[key] = ray.get(state_ref[0])
        pmap, qidx, q = st
        ids = t.column(id_col).to_numpy()
        hit = np.array([int(i) in pmap for i in ids], bool)
        if not hit.any():
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64()), pa.array([], pa.float64())],
                names=["query_id", "neighbor_id", "cosine"],
            )
        m = _normalize(_to_matrix(t.column(vec_col)))[hit]
        sub_ids = ids[hit]
        q_out, n_out, c_out = [], [], []
        for row, nid in enumerate(sub_ids):
            for qid in pmap[int(nid)]:
                q_out.append(qid)
                n_out.append(int(nid))
                c_out.append(float(m[row] @ q[qidx[qid]]))
        return pa.Table.from_arrays(
            [pa.array(q_out, pa.int64()), pa.array(n_out, pa.int64()), pa.array(c_out, pa.float64())],
            names=["query_id", "neighbor_id", "cosine"],
        )

    from document_ai_ray.stages.similarity import _final_topk_fn

    local = vectors.map_batches(rerank, fn_kwargs={"state_ref": (ref,)}, batch_format="pyarrow")
    return local.repartition(1).map_batches(
        _final_topk_fn(k), batch_format="pyarrow", batch_size=1 << 30
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted-file partition + residual product codes
# ---------------------------------------------------------------------------


def ivfpq_train(
    sample: np.ndarray,
    n_cells: int = 16,
    n_subspaces: int = 8,
    n_codes: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """The literal FAISS IVF-PQ recipe: a coarse spherical-k-means
    quantizer picks a cell, PQ encodes the RESIDUAL (x − centroid) —
    residuals are far more compressible than raw vectors, so the same
    code budget buys more recall.  Returns (centroids (C, d),
    codebooks (M, K, d/M)), both trained on the driver-side sample."""
    from document_ai_ray.stages.similarity import train_centroids

    sample = _normalize(np.asarray(sample, np.float64))
    cents = train_centroids(sample, n_cells=n_cells)
    assign = np.argmax(sample @ cents.T, axis=1)
    residuals = sample - cents[assign]
    books = _train_books_raw(residuals, n_subspaces, n_codes)
    return cents, books


def _train_books_raw(mat: np.ndarray, n_subspaces: int, n_codes: int) -> np.ndarray:
    """pq_train without the normalization step (residuals are NOT unit
    vectors and must not be renormalized)."""
    d = mat.shape[1]
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible into {n_subspaces} subspaces")
    dsub = d // n_subspaces
    books = np.empty((n_subspaces, min(n_codes, len(mat)), dsub), np.float64)
    for j in range(n_subspaces):
        books[j] = _kmeans_l2(mat[:, j * dsub : (j + 1) * dsub], n_codes, 15, 23 + j)
    return books


def ivfpq_encode(
    vectors: rd.Dataset,
    cents: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Streaming encode: (vec_id, cell:int32, code:binary[M])."""
    ref = ray.put((cents, books))

    def enc(t: pa.Table, state_ref: tuple) -> pa.Table:
        key = (state_ref[0].hex(), "ivfpq_books")
        st = _INSTANCES.get(key)
        if st is None:
            st = _INSTANCES[key] = ray.get(state_ref[0])
        c, cb = st
        m = _normalize(_to_matrix(t.column(vec_col)))
        cell = np.argmax(m @ c.T, axis=1)
        codes = _encode_matrix(m - c[cell], cb)
        return pa.table(
            {
                "vec_id": t.column(id_col),
                "cell": pa.array(cell.astype(np.int32), pa.int32()),
                "code": pa.array([x.tobytes() for x in codes], pa.binary()),
            }
        )

    return vectors.map_batches(enc, fn_kwargs={"state_ref": (ref,)}, batch_format="pyarrow")


class IvfPqScan:
    """Per-worker warm state: per-(query, probed-cell) residual LUTs."""

    def __init__(self, q_ids, q_mat, cents, books, k: int, n_probe: int):
        self.q_ids = np.asarray(q_ids)
        self.k = k
        q = _normalize(np.asarray(q_mat, np.float64))
        qc = q @ cents.T
        self.q_cells = np.argsort(-qc, axis=1)[:, :n_probe]  # (Q, n_probe)
        n_sub, n_codes, dsub = books.shape
        # LUT[qi, pi, j, c] = ||(q - cent)_sub - codeword||^2
        self.lut = np.empty((len(q), n_probe, n_sub, n_codes), np.float64)
        for qi in range(len(q)):
            for pi, cell in enumerate(self.q_cells[qi]):
                r = q[qi] - cents[cell]
                for j in range(n_sub):
                    sub = r[j * dsub : (j + 1) * dsub]
                    cb = books[j]
                    self.lut[qi, pi, j, :] = (
                        (sub * sub).sum() - 2.0 * cb @ sub + (cb * cb).sum(axis=1)
                    )
        self.n_sub = n_sub

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        cell = t.column("cell").to_numpy()
        raw = t.column("code").to_pylist()
        codes = np.frombuffer(b"".join(raw), np.uint8).reshape(len(raw), self.n_sub)
        cols = np.arange(self.n_sub)
        q_out, n_out, d_out = [], [], []
        for qi in range(len(self.q_ids)):
            for pi, pc in enumerate(self.q_cells[qi]):
                in_cell = cell == pc
                in_cell &= ids != self.q_ids[qi]
                if not in_cell.any():
                    continue
                sub_codes = codes[in_cell]
                dist = self.lut[qi, pi][cols, sub_codes].sum(axis=1)
                sub_ids = ids[in_cell]
                k = min(self.k, len(sub_ids))
                part = np.argpartition(dist, k - 1)[:k]
                q_out.extend([int(self.q_ids[qi])] * k)
                n_out.extend(int(x) for x in sub_ids[part])
                d_out.extend(float(x) for x in dist[part])
        return pa.Table.from_arrays(
            [
                pa.array(q_out, pa.int64()),
                pa.array(n_out, pa.int64()),
                pa.array(d_out, pa.float64()),
            ],
            names=["query_id", "neighbor_id", "adc_dist"],
        )


def knn_ivfpq(
    codes: rd.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    cents: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> rd.Dataset:
    """ADC top-k restricted to each query's `n_probe` nearest cells —
    the scan touches codes of probed cells only (at scale the encoded
    table is partitioned BY CELL, so unprobed partitions are never
    read; here the filter is per batch)."""
    ref = ray.put((query_ids, query_matrix, cents, books))

    def scan(t: pa.Table, state_ref: tuple) -> pa.Table:
        key = (state_ref[0].hex(), "ivfpq", k, n_probe)
        inst = _INSTANCES.get(key)
        if inst is None:
            q_ids, q_mat, c, cb = ray.get(state_ref[0])
            inst = _INSTANCES[key] = IvfPqScan(q_ids, q_mat, c, cb, k, n_probe)
        return inst(t)

    local = codes.map_batches(scan, fn_kwargs={"state_ref": (ref,)}, batch_format="pyarrow")

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["query_id", "adc_dist", "neighbor_id"])
        df = df.groupby("query_id", as_index=False).head(k)
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rank"]], preserve_index=False
        )

    return local.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=1 << 30)


def knn_ivfpq_refined(
    vectors: rd.Dataset,
    codes: rd.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    cents: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    n_probe: int = 6,
    shortlist: int = 50,
) -> rd.Dataset:
    """IVF-PQ + refine: ADC shortlist from the probed cells, exact
    re-rank of the shortlist.  Recall is bounded by the cell-probe
    miss rate alone (PQ distortion is repaired by the refine)."""
    short = knn_ivfpq(
        codes, query_ids, query_matrix, cents, books, k=shortlist, n_probe=n_probe
    ).to_pandas()
    return exact_rerank(vectors, short, query_ids, query_matrix, k)
