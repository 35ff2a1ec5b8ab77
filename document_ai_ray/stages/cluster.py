"""Near-dup cluster assignment: connected components over candidate
pair edges via distributed min-label propagation.

The operator an LLM training-data pipeline runs right after near-dup
detection: collapse each connected component of near-dup pairs to one
canonical document (cluster_id = min doc id in the component), so a
"keep one per cluster" filter falls out of a groupby.

Scale shape: edges are output-sized but at web dup rates still
O(corpus), so NOTHING here is driver-side —
  - labels start as (node, node) over the distinct edge endpoints;
  - each round, one bucketed groupby co-locates every node's current
    label with its incident edges and emits min-label messages to the
    neighbors; a second bucketed groupby takes the min per node;
  - labels only ever DECREASE, so sum(label) is a strict monotone:
    the loop stops when it is unchanged (convergence certificate, no
    fixed iteration guess).  Rounds needed = graph diameter in the
    label-propagation metric (tiny for near-dup clusters).
  - per-round datasets are materialize()d: an iterative LAZY chain
    would re-execute the whole history every round.
Docs not in any pair are their own singleton cluster (attached with a
final bucketed join against the docs table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from document_ai_ray.functions.scale import auto_buckets

CC_BUCKETS = 32  # fallback when a caller passes an explicit count


def _bucket_on(ds: rd.Dataset, col: str, n_buckets: int) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (v * np.uint64(2654435761)) % np.uint64(n_buckets)
        return t.append_column("__cb", pa.array(b.astype(np.int32)))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1 << 18)


_CC_SCHEMA = pa.schema(
    [pa.field("node", pa.int64()), pa.field("peer", pa.int64()), pa.field("label", pa.int64())]
)


def connected_components(
    edges: rd.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_buckets: int | None = None,
    max_rounds: int = 64,
) -> rd.Dataset:
    """(node, cluster_id) for every node appearing in `edges`;
    cluster_id = min node id of the connected component.

    n_buckets=None sizes the label-propagation buckets from the
    (materialized) symmetric edge count, so per-round task memory
    stays flat as the graph grows."""

    def sym_batch(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([a, b])),
                pa.array(np.concatenate([b, a])),
                pa.nulls(2 * len(a), pa.int64()),
            ],
            schema=_CC_SCHEMA,
        )

    sym_edges = edges.map_batches(sym_batch, batch_format="pyarrow").materialize()
    if n_buckets is None:
        n_buckets = auto_buckets(sym_edges.count())

    # initial labels: label[node] = node, from the distinct endpoints
    def init_labels(g: pa.Table) -> pa.Table:
        nodes = pc.unique(g.column("node"))
        return pa.Table.from_arrays(
            [nodes, pa.nulls(len(nodes), pa.int64()), nodes], schema=_CC_SCHEMA
        )

    # NOTE: the manual hash exchange (ops.bucket_map_groups) was tried
    # here and REGRESSED 2-6x: inside an iterative loop each round's
    # from_arrow_refs output feeds the next round's re-execution and the
    # ref-plumbing overhead multiplies across rounds.  The Dataset-native
    # groupby amortizes better per round — keep it.
    labels = (
        _bucket_on(sym_edges, "node", n_buckets)
        .groupby("__cb")
        .map_groups(lambda g: init_labels(g.drop_columns(["__cb"])), batch_format="pyarrow")
        .materialize()
    )
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # round: co-locate labels with incident edges, emit messages
        def propagate(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            is_lab = df["peer"].isna()
            lab = df.loc[is_lab, ["node", "label"]]
            edg = df.loc[~is_lab, ["node", "peer"]]
            # self rows keep the current label; message rows carry it to
            # peers — one vectorized merge per bucket
            msgs = edg.merge(lab, on="node")[["peer", "label"]].rename(columns={"peer": "node"})
            out = pd.concat([lab, msgs], ignore_index=True)
            return pa.Table.from_arrays(
                [
                    pa.array(out["node"].to_numpy(dtype=np.int64)),
                    pa.nulls(len(out), pa.int64()),
                    pa.array(out["label"].to_numpy(dtype=np.int64)),
                ],
                schema=_CC_SCHEMA,
            )

        def min_label(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            out = df.groupby("node", as_index=False)["label"].min()
            return pa.Table.from_arrays(
                [
                    pa.array(out["node"].to_numpy(), pa.int64()),
                    pa.nulls(len(out), pa.int64()),
                    pa.array(out["label"].to_numpy(), pa.int64()),
                ],
                schema=_CC_SCHEMA,
            )

        messages = (
            _bucket_on(labels.union(sym_edges), "node", n_buckets)
            .groupby("__cb")
            .map_groups(lambda g: propagate(g.drop_columns(["__cb"])), batch_format="pyarrow")
        )
        labels = (
            _bucket_on(messages, "node", n_buckets)
            .groupby("__cb")
            .map_groups(lambda g: min_label(g.drop_columns(["__cb"])), batch_format="pyarrow")
            .materialize()
        )
        # labels only decrease -> sum(label) strictly decreases until fixed point
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # never return silently-wrong labels: a component whose
        # propagation distance exceeds max_rounds has unstable labels
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} rounds "
            "(a component's diameter exceeds max_rounds); raise max_rounds"
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t.column("node"), t.column("label")], names=["node", "cluster_id"]
        )

    return labels.map_batches(finish, batch_format="pyarrow")


def assign_clusters(
    docs: rd.Dataset,
    components: rd.Dataset,
    id_col: str = "doc_id",
    n_buckets: int = CC_BUCKETS,
) -> rd.Dataset:
    """(doc_id, cluster_id) for EVERY document: component label if the
    doc is in any near-dup pair, else its own id (singleton cluster).
    Bucketed hash join — nothing driver-side."""

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64())
        return pa.Table.from_arrays(
            [ids, pa.nulls(len(t), pa.int64())], names=["node", "cluster_id"]
        )

    def comp_rows(t: pa.Table) -> pa.Table:
        return t.select(["node", "cluster_id"])

    union = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        components.map_batches(comp_rows, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        lab = df[df["cluster_id"].notna()]
        lmap = dict(zip(lab["node"], lab["cluster_id"]))
        d = df[df["cluster_id"].isna()]
        nodes = d["node"].to_numpy(dtype=np.int64)
        out = np.fromiter((lmap.get(n, n) for n in nodes), dtype=np.int64, count=len(nodes))
        return pa.Table.from_arrays(
            [pa.array(nodes), pa.array(out)], names=["doc_id", "cluster_id"]
        )

    return (
        _bucket_on(union, "node", n_buckets)
        .groupby("__cb")
        .map_groups(lambda g: resolve(g.drop_columns(["__cb"])), batch_format="pyarrow")
    )


def keep_canonical(assigned: rd.Dataset, out_col: str = "doc_id") -> rd.Dataset:
    """Keep-if-own-cluster dedup filter over an `assign_clusters`
    output: retain exactly the canonical (min-id == own-id) row of each
    component, emitting the single id column renamed to `out_col`.
    Vectorized per-batch, no extra shuffle — shared by the text and
    embedding (SemDeDup) dedup queries."""

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.equal(t.column("doc_id"), t.column("cluster_id"))
        return pa.Table.from_arrays([t.filter(m).column("doc_id")], names=[out_col])

    return assigned.map_batches(keep, batch_format="pyarrow")


def triangle_count(
    edges: rd.Dataset, a_col: str = "a", b_col: str = "b", n_buckets: int | None = None
) -> int:
    """Distributed exact triangle count (compact node-iterator with
    low→high orientation): canonicalize + dedupe edges, group by the
    LOW endpoint to emit each wedge's closing candidate (x, y), then
    verify candidates against the edge set in one bucketed pass of the
    UNIONED (edges ⊎ candidates) stream — triangles = candidates whose
    closing edge exists.  Every stage is hash-bucketed; the driver sees
    only per-bucket counts.

    Skew note: a hub of degree D emits O(D²) wedges; at web scale the
    standard mitigation is degree-based orientation (orient every edge
    toward the higher-degree endpoint, bounding wedge fan-out by the
    arboricity) — the low→high orientation here is its id-ordered
    special case."""
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    P = n_buckets or auto_buckets(edges.count())

    def canon(t: pa.Table) -> pa.Table:
        x = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = x != y
        x, y = x[keep], y[keep]
        a = np.minimum(x, y)
        b = np.maximum(x, y)
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "bucket": pa.array(((a * 1000003 + b) % P).astype(np.int32)),
            }
        )

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    e = bucket_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"), "bucket", dedupe, P,
        batch_format="pandas",
    ).materialize()  # consumed twice: wedge generation + closure check

    def add_low_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((a % P).astype(np.int32)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("a"):
            nb = np.sort(g["b"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"a": nb[i], "b": nb[j]}))
        if not outs:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    cand = bucket_map_groups(
        e.map_batches(add_low_bucket, batch_format="pyarrow"), "bucket", wedges, P,
        batch_format="pandas",
    )

    def tag(ds, val):
        return ds.map_batches(
            lambda t, v=val: t.select(["a", "b"]).append_column(
                "is_edge", pa.array([v] * len(t), pa.int8())
            ),
            batch_format="pyarrow",
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(((a * 1000003 + b) % P).astype(np.int32)))

    def close_count(df: pd.DataFrame) -> pd.DataFrame:
        edges_set = df[df["is_edge"] == 1][["a", "b"]].drop_duplicates()
        cands = df[df["is_edge"] == 0]
        n = len(cands.merge(edges_set, on=["a", "b"]))
        return pd.DataFrame({"n": pd.Series([n], dtype="int64")})

    unioned = tag(e, 1).union(tag(cand, 0))
    counts = bucket_map_groups(
        unioned.map_batches(pair_bucket, batch_format="pyarrow"), "bucket", close_count, P,
        batch_format="pandas",
    )
    total = 0
    for bt in counts.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(bt.column("n")).as_py() or 0)
    return total


def clustering_coefficient(
    edges: rd.Dataset, a_col: str = "a", b_col: str = "b", n_buckets: int | None = None
) -> rd.Dataset:
    """Per-node local clustering coefficient: cc(v) = 2·T(v) /
    (deg(v)·(deg(v)−1)), T(v) = triangles through v.  Same bucketed
    wedge-closure substrate as `triangle_count`, with the wedge APEX
    carried so each verified closure credits all three corners; node
    degrees come from a combiner aggregate.  Returns (node, degree,
    n_triangles, clustering_coeff ROUND 6)."""
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups, partial_group_agg

    P = n_buckets or auto_buckets(edges.count())

    def canon(t: pa.Table) -> pa.Table:
        x = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = x != y
        x, y = x[keep], y[keep]
        a = np.minimum(x, y)
        b = np.maximum(x, y)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b),
             "bucket": pa.array(((a * 1000003 + b) % P).astype(np.int32))}
        )

    e = bucket_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"), "bucket",
        lambda df: df.drop_duplicates(["a", "b"]), P, batch_format="pandas",
    ).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [t.column("a").to_numpy(zero_copy_only=False), t.column("b").to_numpy(zero_copy_only=False)]
        )
        return pa.table({"node": pa.array(nodes, pa.int64())})

    deg = partial_group_agg(
        e.map_batches(node_partial, batch_format="pyarrow"), ["node"], count_alias="degree"
    )

    def add_low_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((a % P).astype(np.int32)))

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for v, g in df.groupby("a"):
            nb = np.sort(g["b"].to_numpy())
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"a": nb[i], "b": nb[j], "apex": int(v)}))
        if not outs:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "apex": pd.Series([], dtype="int64")}
            )
        return pd.concat(outs, ignore_index=True)

    cand = bucket_map_groups(
        e.map_batches(add_low_bucket, batch_format="pyarrow"), "bucket", wedges, P,
        batch_format="pandas",
    )

    def tag_edges(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"]).append_column(
            "apex", pa.array(np.full(len(t), -1, np.int64))
        )

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(((a * 1000003 + b) % P).astype(np.int32)))

    def close_credit(df: pd.DataFrame) -> pd.DataFrame:
        edges_set = df[df["apex"] == -1][["a", "b"]].drop_duplicates()
        cands = df[df["apex"] != -1]
        hit = cands.merge(edges_set, on=["a", "b"])
        if hit.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        nodes = np.concatenate(
            [hit["apex"].to_numpy(), hit["a"].to_numpy(), hit["b"].to_numpy()]
        )
        return pd.DataFrame({"node": nodes.astype(np.int64)})

    unioned = e.map_batches(tag_edges, batch_format="pyarrow").union(cand)
    tri_nodes = bucket_map_groups(
        unioned.map_batches(pair_bucket, batch_format="pyarrow"), "bucket", close_credit, P,
        batch_format="pandas",
    )
    tri = partial_group_agg(tri_nodes, ["node"], count_alias="n_triangles")

    # node-keyed merge of two node-cardinality tables
    P2 = auto_buckets(deg.count())

    def nb2(t: pa.Table) -> pa.Table:
        k = t.column("node").to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array((k % P2).astype(np.int32)))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).agg(
            degree=("degree", "sum"), n_triangles=("n_triangles", "sum")
        )
        d = g["degree"].to_numpy(np.float64)
        t_ = g["n_triangles"].to_numpy(np.float64)
        cc = np.where(d >= 2, 2.0 * t_ / np.maximum(d * (d - 1), 1.0), 0.0)
        g["clustering_coeff"] = np.copysign(np.floor(np.abs(cc) * 1e6 + 0.5), cc) / 1e6
        g["degree"] = g["degree"].astype(np.int64)
        g["n_triangles"] = g["n_triangles"].astype(np.int64)
        return g[["node", "degree", "n_triangles", "clustering_coeff"]]

    both = (
        deg.map_batches(
            lambda t: t.append_column("n_triangles", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow",
        ).union(
            tri.map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "degree": pa.array(np.zeros(len(t), np.int64)),
                        "n_triangles": t.column("n_triangles"),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    )
    return bucket_map_groups(
        both.map_batches(nb2, batch_format="pyarrow"), "bucket", finish, P2,
        batch_format="pandas",
    )
