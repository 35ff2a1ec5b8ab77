"""Similarity search over an embedding column (`list<float>`).

Brute-force cosine top-k is the baseline: the query matrix is
broadcast (`ray.put` once, read per actor), each batch does ONE numpy
matmul against it, and per-batch local top-k rows flow to a tiny final
top-k — the same streaming-top-k shape as `ops.topk`, so no stage ever
holds the full corpus.

The scale path is IVF: coarse k-means centroids (trained on a driver-
side sample, deterministic seeded init), batches assign vectors to
cells, and queries probe only the nearest `n_probe` cells.  Recall vs
brute force is measured in tests, not assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy-ish via
    flattened values + reshape; embeddings are fixed-length)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


# per-worker warm stage instances (no actor-pool startup; see
# pipelines/extract.py for the measured tradeoff)
_INSTANCES: dict[tuple, object] = {}


def _local_topk_ties(sims_row: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Indices of the local top-k by (cosine DESC, id ASC) — exact ties
    at the k-th boundary are broken by the smaller id, matching the
    final deterministic sort, so results never depend on how Ray split
    the batches."""
    k = min(k, len(sims_row))
    if k == len(sims_row):
        return np.arange(len(sims_row))
    part = np.argpartition(-sims_row, kth=k - 1)[:k]
    thresh = sims_row[part].min()
    gt = np.nonzero(sims_row > thresh)[0]
    eq = np.nonzero(sims_row == thresh)[0]
    eq = eq[np.argsort(ids[eq], kind="stable")][: k - len(gt)]
    return np.concatenate([gt, eq])


class BruteForceKnn:
    """Warm stage: batch of vectors vs the broadcast query matrix.
    Emits (query_id, neighbor_id, cosine) rows for the per-batch local
    top-k of every query; a final coalesced top-k reduces."""

    def __init__(self, q_ids, q_mat, k: int, id_col: str, vec_col: str):
        self.q_ids = np.asarray(q_ids)
        self.q = _normalize(np.asarray(q_mat, dtype=np.float64))  # (Q, d)
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy()
        m = _normalize(_to_matrix(t.column(self.vec_col)))            # (n, d)
        sims = self.q @ m.T                                            # (Q, n)
        # exclude self-matches
        for qi, qid in enumerate(self.q_ids):
            hit = np.nonzero(ids == qid)[0]
            if hit.size:
                sims[qi, hit] = -np.inf
        q_out, n_out, s_out = [], [], []
        for qi in range(sims.shape[0]):
            cols = _local_topk_ties(sims[qi], ids, self.k)
            q_out.extend([int(self.q_ids[qi])] * len(cols))
            n_out.extend(int(x) for x in ids[cols])
            s_out.extend(float(x) for x in sims[qi, cols])
        return pa.Table.from_arrays(
            [pa.array(q_out, pa.int64()), pa.array(n_out, pa.int64()), pa.array(s_out, pa.float64())],
            names=["query_id", "neighbor_id", "cosine"],
        )


def knn_bruteforce(
    vectors: rd.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 8,
) -> rd.Dataset:
    """Top-k cosine neighbors for each query vector.  Output columns:
    query_id, neighbor_id, rank (1-based; ties broken by neighbor_id)."""
    ref = ray.put((query_ids, query_matrix))

    def bf_batch(t: pa.Table, queries_ref: tuple) -> pa.Table:
        key = (queries_ref[0].hex(), "bf", k, id_col, vec_col)
        inst = _INSTANCES.get(key)
        if inst is None:
            q_ids, q_mat = ray.get(queries_ref[0])
            inst = _INSTANCES[key] = BruteForceKnn(q_ids, q_mat, k, id_col, vec_col)
        return inst(t)

    local = vectors.map_batches(
        bf_batch, fn_kwargs={"queries_ref": (ref,)}, batch_format="pyarrow"
    )
    # repartition(1): exactly one final top-k task by construction
    return local.repartition(1).map_batches(
        _final_topk_fn(k), batch_format="pyarrow", batch_size=1 << 30
    )


def _final_topk_fn(k: int):
    def final_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["query_id", "cosine", "neighbor_id"], ascending=[True, False, True])
        df = df.groupby("query_id", as_index=False).head(k)
        df["rank"] = df.groupby("query_id").cumcount() + 1
        return pa.Table.from_pandas(df[["query_id", "neighbor_id", "rank"]], preserve_index=False)

    return final_topk


def cosine_pairs(
    vectors: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_size: int = 2048,
) -> rd.Dataset:
    """All pairs with cosine >= threshold (embedding near-dup) —
    EXACT output via IVF-cell-bucketed pair generation:

    1. train coarse centroids on a driver-side SAMPLE (small by
       construction; the only driver-side materialization);
    2. per-cell angular radius r_c = max angle(member, centroid),
       computed as a distributed partial-max aggregate;
    3. prune cell pairs by the triangle inequality — a cross-cell pair
       (u in i, v in j) can reach cos(u,v) >= t only if
       angle(c_i, c_j) <= arccos(t) + r_i + r_j, so pruned cell pairs
       are provably below threshold (the result stays exact even when
       pruning is weak, e.g. low thresholds on a cosine continuum);
    4. replicate each vector to the surviving cell-pair groups its cell
       participates in and score each group with one block matmul
       (groupby on the cell-pair id) — per-task memory is two cells'
       members, never the corpus, and each unordered vector pair is
       examined in exactly one group.

    At near-dup thresholds (t >= ~0.8, arccos(t) <= 37°) pruning kills
    most of the n_cells² pairs; at loose thresholds the cost degrades
    toward a block-decomposed all-pairs — which is what exactness costs
    (the approximate regime belongs to `knn_ivf`).
    """
    from document_ai_ray.pipelines.ops import get_broadcast, merge_partials

    sample = sample_vectors(vectors, sample_size, id_col, vec_col)
    cents = train_centroids(sample, n_cells=n_cells)
    n_cells = len(cents)                               # may be < requested
    c_ref = ray.put(cents)

    def radius_partial(t: pa.Table, cents_ref: tuple) -> pa.Table:
        c = get_broadcast(cents_ref, tag="cos-cells")
        m = _normalize(_to_matrix(t.column(vec_col)))
        sims = m @ c.T
        cell = np.argmax(sims, axis=1)
        ang = np.arccos(np.clip(sims[np.arange(len(m)), cell], -1.0, 1.0))
        maxang = np.zeros(len(c))
        np.maximum.at(maxang, cell, ang)
        return pa.Table.from_arrays(
            [pa.array(np.arange(len(c)), pa.int32()), pa.array(maxang, pa.float64())],
            names=["cell", "radius"],
        )

    radii_rows = merge_partials(
        vectors.map_batches(
            radius_partial, fn_kwargs={"cents_ref": (c_ref,)}, batch_format="pyarrow"
        ),
        keys=["cell"],
        agg_funcs={"radius": "max"},
    ).take_all()                                       # n_cells rows — tiny
    radius = np.zeros(n_cells)
    for r in radii_rows:
        radius[r["cell"]] = r["radius"]

    gid_pair, cell_gids = plan_cell_pairs(cents, radius, threshold)
    plan_ref = ray.put((cell_gids,))                   # O(n_cells²) — tiny

    def replicate(t: pa.Table, cents_ref: tuple, plan: tuple) -> pa.Table:
        c = get_broadcast(cents_ref, tag="cos-cells")
        (cgids,) = get_broadcast(plan, tag="cos-plan")
        m = _normalize(_to_matrix(t.column(vec_col)))
        cell = np.argmax(m @ c.T, axis=1)
        counts = np.fromiter((len(cgids[x]) for x in cell), dtype=np.int64, count=len(cell))
        idx = np.repeat(np.arange(len(cell)), counts)
        gids = np.concatenate([np.asarray(cgids[x], dtype=np.int32) for x in cell]) if len(cell) else np.array([], dtype=np.int32)
        out = t.select([id_col, vec_col]).take(pa.array(idx))
        out = out.append_column("__cell", pa.array(cell[idx].astype(np.int32)))
        return out.append_column("__g", pa.array(gids, pa.int32()))

    rep = vectors.map_batches(
        replicate,
        fn_kwargs={"cents_ref": (c_ref,), "plan": (plan_ref,)},
        batch_format="pyarrow",
        batch_size=1 << 16,
    )

    def pair_block(g: pa.Table) -> pa.Table:
        gid = g.column("__g")[0].as_py()
        i, j = gid_pair[gid]
        ids = g.column(id_col).to_numpy()
        cell = g.column("__cell").to_numpy()
        m = _normalize(_to_matrix(g.column(vec_col)))
        if i == j:
            sims = m @ m.T
            r, c = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
            a, b = ids[r], ids[c]
        else:
            ai = cell == i
            A, B = m[ai], m[~ai]
            ida, idb = ids[ai], ids[~ai]
            sims = A @ B.T
            r, c = np.nonzero(sims >= threshold)
            a, b = np.minimum(ida[r], idb[c]), np.maximum(ida[r], idb[c])
        return pa.Table.from_arrays(
            [pa.array(a.astype(np.int64), pa.int64()), pa.array(b.astype(np.int64), pa.int64())],
            names=["id_a", "id_b"],
        )

    return rep.groupby("__g").map_groups(pair_block, batch_format="pyarrow")


def sample_vectors(
    vectors: rd.Dataset,
    sample_size: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
) -> np.ndarray:
    """Seeded UNIFORM row sample (~sample_size rows) for centroid
    training.  `limit()` would take the FIRST blocks — on id-sorted or
    cluster-ordered input that biases the centroids toward the head
    clusters, inflating tail-cell radii and degrading the
    triangle-inequality cell-pair pruning toward all-pairs (r2-verdict
    item).  random_sample keeps each row independently, so the sample
    covers every cluster regardless of the input's physical order."""
    n = vectors.count()
    frac = min(1.0, sample_size / max(1, n))
    ds = vectors if frac >= 1.0 else vectors.random_sample(frac, seed=seed)
    _, m = _collect_matrix(ds, id_col, vec_col)
    return m


def plan_cell_pairs(
    cents: np.ndarray, radius: np.ndarray, threshold: float
) -> tuple[list[tuple[int, int]], dict[int, list[int]]]:
    """Triangle-inequality cell-pair pruning plan: the surviving
    (i, j) cell pairs and, per cell, the group ids it must replicate
    into.  A cross-cell pair (u in i, v in j) can reach
    cos(u, v) >= threshold only if
    angle(c_i, c_j) <= arccos(threshold) + r_i + r_j."""
    n_cells = len(cents)
    theta_t = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    cang = np.arccos(np.clip(cents @ cents.T, -1.0, 1.0))
    gid_pair: list[tuple[int, int]] = []
    cell_gids: dict[int, list[int]] = {c: [] for c in range(n_cells)}
    for i in range(n_cells):
        for j in range(i, n_cells):
            if cang[i, j] <= theta_t + radius[i] + radius[j]:
                g = len(gid_pair)
                gid_pair.append((i, j))
                cell_gids[i].append(g)
                if j != i:
                    cell_gids[j].append(g)
    return gid_pair, cell_gids


def _collect_matrix(vectors: rd.Dataset, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Materialize (ids, matrix) driver-side — only for small reference
    sets (queries, centroid training samples, test-scale corpora)."""
    tbls = [b for b in vectors.iter_batches(batch_format="pyarrow")]
    t = pa.concat_tables(tbls)
    return t.column(id_col).to_numpy(), _to_matrix(t.column(vec_col))


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search — the 100 TB path
# ---------------------------------------------------------------------------


def train_centroids(sample: np.ndarray, n_cells: int, n_iter: int = 10, seed: int = 11) -> np.ndarray:
    """Deterministic mini k-means (seeded init, fixed iterations) on a
    driver-side sample.  numpy-only; no sklearn in this environment."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        sims = sample @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


class IvfKnn:
    """Probe only the `n_probe` cells nearest to each query."""

    def __init__(self, q_ids, q_mat, cents, k: int, n_probe: int, id_col: str, vec_col: str):
        self.q_ids = np.asarray(q_ids)
        self.q = _normalize(np.asarray(q_mat, dtype=np.float64))
        self.cents = cents
        self.k, self.n_probe = k, n_probe
        self.id_col, self.vec_col = id_col, vec_col
        qc = self.q @ self.cents.T
        self.q_cells = np.argsort(-qc, axis=1)[:, : n_probe]          # (Q, n_probe)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_numpy()
        m = _normalize(_to_matrix(t.column(self.vec_col)))
        cell = np.argmax(m @ self.cents.T, axis=1)                    # batch-side assignment
        q_out, n_out, s_out = [], [], []
        for qi in range(len(self.q_ids)):
            probe = np.isin(cell, self.q_cells[qi])
            probe &= ids != self.q_ids[qi]
            if not probe.any():
                continue
            sims = m[probe] @ self.q[qi]
            sub_ids = ids[probe]
            part = _local_topk_ties(sims, sub_ids, self.k)
            q_out.extend([int(self.q_ids[qi])] * len(part))
            n_out.extend(int(x) for x in sub_ids[part])
            s_out.extend(float(x) for x in sims[part])
        return pa.Table.from_arrays(
            [pa.array(q_out, pa.int64()), pa.array(n_out, pa.int64()), pa.array(s_out, pa.float64())],
            names=["query_id", "neighbor_id", "cosine"],
        )


def knn_ivf(
    vectors: rd.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 8,
) -> rd.Dataset:
    q_ref = ray.put((query_ids, query_matrix))
    c_ref = ray.put(centroids)

    def ivf_batch(t: pa.Table, queries_ref: tuple, cents_ref: tuple) -> pa.Table:
        key = (queries_ref[0].hex(), cents_ref[0].hex(), "ivf", k, n_probe, id_col, vec_col)
        inst = _INSTANCES.get(key)
        if inst is None:
            q_ids, q_mat = ray.get(queries_ref[0])
            cents = ray.get(cents_ref[0])
            inst = _INSTANCES[key] = IvfKnn(q_ids, q_mat, cents, k, n_probe, id_col, vec_col)
        return inst(t)

    local = vectors.map_batches(
        ivf_batch,
        fn_kwargs={"queries_ref": (q_ref,), "cents_ref": (c_ref,)},
        batch_format="pyarrow",
    )
    return local.repartition(1).map_batches(
        _final_topk_fn(k), batch_format="pyarrow", batch_size=1 << 30
    )


# ---------------------------------------------------------------------------
# Full-corpus distributed Lloyd refinement (spherical k-means)
# ---------------------------------------------------------------------------


def kmeans_lloyd(
    vectors: rd.Dataset,
    k: int,
    n_iter: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 1000,
    tol: float = 1e-9,
) -> tuple[np.ndarray, np.ndarray, list[float], int]:
    """Distributed spherical k-means over the WHOLE corpus (not just a
    driver sample — that is `train_centroids`' job, reused here only
    for the seeded init).

    Per Lloyd iteration: centroids are broadcast once (`ray.put`, read
    via the per-worker `get_broadcast` cache), every batch does one
    matmul to assign its vectors and emits ONE partial row per touched
    cell — (cell, n, simsum, s0..s{d-1}) — and the partials collapse
    through the two-level combiner merge (`ops.merge_partials`), so the
    only thing the driver ever holds is the k x (d+3) partial table.
    The objective sum-of-cosines is monotone non-decreasing (standard
    spherical-Lloyd argument); iteration stops at `n_iter` or when the
    gain drops below `tol`.

    The input is materialized once up front: an iterative algorithm
    re-scans its input every round, and the object store (with spill)
    is the cheaper home for those scans than the source parquet.

    Returns (centroids (k, d) unit-norm, member counts (k,), objective
    history, iterations run).
    """
    from document_ai_ray.pipelines.ops import get_broadcast, merge_partials

    if n_iter < 1:
        raise ValueError("kmeans_lloyd needs n_iter >= 1")

    sample = sample_vectors(vectors, sample_size, id_col, vec_col, seed=seed)
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    d = cents.shape[1]
    mat = vectors.select_columns([vec_col]).materialize()

    def partial_of(cents_ref, tag):
        def fn(t: pa.Table) -> pa.Table:
            c = get_broadcast(cents_ref, tag=tag)
            m = _normalize(_to_matrix(t.column(vec_col)))
            sims = m @ c.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(m)), assign]
            cells, inv = np.unique(assign, return_inverse=True)
            n = np.bincount(inv, minlength=len(cells))
            simsum = np.bincount(inv, weights=best, minlength=len(cells))
            sums = np.zeros((len(cells), d))
            np.add.at(sums, inv, m)
            cols = {
                "cell": pa.array(cells.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "simsum": pa.array(simsum),
            }
            for j in range(d):
                cols[f"s{j}"] = pa.array(sums[:, j])
            return pa.Table.from_pydict(cols)

        return fn

    history: list[float] = []
    counts = np.zeros(k, dtype=np.int64)
    it = 0
    for it in range(1, n_iter + 1):
        ref = (ray.put(cents),)  # 1-tuple: get_broadcast contract
        partials = mat.map_batches(
            partial_of(ref, tag=f"kmeans-{ref[0].hex()}"), batch_format="pyarrow"
        )
        agg = merge_partials(
            partials,
            keys=["cell"],
            agg_funcs={"n": "sum", "simsum": "sum", **{f"s{j}": "sum" for j in range(d)}},
        )
        rows = agg.take_all()  # k tiny rows
        obj = float(sum(r["simsum"] for r in rows))
        counts = np.zeros(k, dtype=np.int64)
        new_cents = cents.copy()  # empty cells keep their centroid
        for r in rows:
            c = int(r["cell"])
            counts[c] = int(r["n"])
            v = np.array([r[f"s{j}"] for j in range(d)])
            nv = np.linalg.norm(v)
            if nv > 0:
                new_cents[c] = v / nv
        history.append(obj)
        cents = new_cents
        if len(history) >= 2 and history[-1] - history[-2] < tol:
            break
    return cents, counts, history, it
