"""Property-based checks for the core shuffle-minimizing primitives:
merge_partials / partial_group_agg / distinct_rows / grouped_topk must
agree with a plain pandas reference on arbitrary keyed data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_ray.pipelines.ops import (
    distinct_rows,
    grouped_topk,
    merge_partials,
    partial_group_agg,
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),          # key
        st.integers(-1000, 1000),                        # int value
    ),
    min_size=1,
    max_size=60,
)


def _ds(rows, blocks=3):
    t = pa.Table.from_arrays(
        [pa.array([k for k, _ in rows]), pa.array([v for _, v in rows], pa.int64())],
        names=["k", "v"],
    )
    return rd.from_arrow(t).repartition(blocks)


@settings(max_examples=15, deadline=None)
@given(rows_strategy)
def test_partial_group_agg_matches_pandas(rows):
    got = (
        partial_group_agg(_ds(rows), keys=["k"], sum_cols={"v": "sum_v"}, count_alias="n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(rows, columns=["k", "v"])
        .groupby("k", as_index=False)
        .agg(sum_v=("v", "sum"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got["k"]) == list(want["k"])
    assert list(got["sum_v"]) == list(want["sum_v"])
    assert list(got["n"]) == list(want["n"])


@settings(max_examples=10, deadline=None)
@given(rows_strategy)
def test_merge_partials_min_max(rows):
    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "min"), ("v", "max")])
        return pa.Table.from_arrays(
            [g.column("k"), g.column("v_min"), g.column("v_max")], names=["k", "lo", "hi"]
        )

    got = (
        merge_partials(
            _ds(rows).map_batches(partial, batch_format="pyarrow"),
            keys=["k"],
            agg_funcs={"lo": "min", "hi": "max"},
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(rows, columns=["k", "v"])
        .groupby("k", as_index=False)
        .agg(lo=("v", "min"), hi=("v", "max"))
    )
    assert list(got["lo"]) == list(want["lo"]) and list(got["hi"]) == list(want["hi"])


@settings(max_examples=10, deadline=None)
@given(rows_strategy)
def test_distinct_rows_matches_pandas(rows):
    got = distinct_rows(_ds(rows), ["k", "v"]).to_pandas()
    want = pd.DataFrame(rows, columns=["k", "v"]).drop_duplicates()
    assert sorted(map(tuple, got.itertuples(index=False))) == sorted(
        map(tuple, want.itertuples(index=False))
    )


@settings(max_examples=10, deadline=None)
@given(rows_strategy, st.integers(1, 4))
def test_grouped_topk_matches_pandas(rows, k):
    got = grouped_topk(_ds(rows), keys=["k"], sort_cols=[("v", False), ("k", True)], k=k).to_pandas()
    want = (
        pd.DataFrame(rows, columns=["k", "v"])
        .sort_values(["v", "k"], ascending=[False, True], kind="mergesort")
        .groupby("k", as_index=False, sort=False)
        .head(k)
    )
    # same multiset of (k, v) per key (sort order within equal v is
    # block-dependent distributively, but the selected VALUES must match)
    g1 = got.groupby("k")["v"].apply(lambda s: sorted(s)).to_dict()
    g2 = want.groupby("k")["v"].apply(lambda s: sorted(s)).to_dict()
    assert g1 == g2


def test_bloom_semi_anti_join_matches_broadcast(sf_tiny):
    """Force the Bloom path (max_broadcast_keys=0) and require
    hash-identical results vs the exact broadcast-keyset branch for
    both semi and anti joins."""
    import ray.data as rd

    from document_ai_ray.pipelines.ops import semi_anti_join_auto

    import pyarrow.compute as pc

    # semi: parts referenced by lineitem; anti: customers with no
    # URGENT order — both non-empty at sf0.001
    cases = [
        (False, "part", ["p_partkey", "p_name"], "p_partkey", "lineitem", ["l_partkey"], "l_partkey", None),
        (True, "customer", ["c_custkey", "c_name"], "c_custkey", "orders", ["o_custkey"], "o_custkey",
         pc.field("o_orderpriority") == "1-URGENT"),
    ]
    for anti, lt, lcols, lkey, rt, rcols, rkey, rfilter in cases:
        def load():
            left = rd.read_parquet(f"{sf_tiny}/{lt}.parquet", columns=lcols)
            right = rd.read_parquet(f"{sf_tiny}/{rt}.parquet", columns=rcols, filter=rfilter)
            return left, right

        left, right = load()
        want = (
            semi_anti_join_auto(left, right, lkey, rkey, anti=anti)
            .to_pandas().sort_values(lkey).reset_index(drop=True)
        )
        left, right = load()
        got = (
            semi_anti_join_auto(left, right, lkey, rkey, anti=anti, max_broadcast_keys=0)
            .to_pandas().sort_values(lkey).reset_index(drop=True)
        )
        assert len(want) > 0
        assert got.equals(want), f"anti={anti}"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=200, unique=True),
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=200, unique=True),
)
def test_bloom_probe_no_false_negatives(keys, probes):
    """Every inserted key must probe positive (Bloom filters may lie
    positive, never negative) — the property the anti-join's
    keep-negatives-outright shortcut rests on."""
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import BLOOM_K, _bloom_mask, _bloom_positions, _key_hashes

    m_bits = 1 << 13
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    h1, h2 = _key_hashes(pa.array(keys, pa.int64()), "k")
    for i in range(BLOOM_K):
        pos = _bloom_positions(h1, h2, m_bits, i)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
    mask = _bloom_mask(pa.array(keys, pa.int64()), "k", words, m_bits)
    assert mask.all()                                  # no false negatives
    pm = _bloom_mask(pa.array(probes, pa.int64()), "k", words, m_bits)
    ks = set(keys)
    for v, hit in zip(probes, pm):
        if v in ks:
            assert hit


def test_grouped_topk_bucketed_matches_single_task():
    """High-cardinality bucketed final pass must produce exactly the
    rows of the repartition(1) path (r2-verdict scale fix)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.pipelines.ops import grouped_topk

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table(
        {
            "g": rng.integers(0, 400, n).astype(np.int64),
            "v": rng.standard_normal(n),
            "tie": np.arange(n, dtype=np.int64),
        }
    )
    sort_cols = [("v", False), ("tie", True)]
    one = grouped_topk(rd.from_arrow(t), ["g"], sort_cols, k=3).to_pandas()
    bk = grouped_topk(rd.from_arrow(t), ["g"], sort_cols, k=3, n_buckets=16).to_pandas()
    key = ["g", "tie"]
    a = one.sort_values(key).reset_index(drop=True)
    b = bk.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_bucket_map_groups_matches_dataset_groupby(monkeypatch):
    """The manual hash exchange must produce exactly the rows of the
    Dataset-native groupby path, including with empty buckets, and the
    ref-cap fallback must agree too."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.pipelines import ops

    rng = np.random.default_rng(3)
    n = 2000
    # buckets only in {0, 2, 5} of 8 -> several buckets are EMPTY
    t = pa.table(
        {
            "__b": rng.choice([0, 2, 5], n).astype(np.int32),
            "v": rng.integers(0, 100, n).astype(np.int64),
        }
    )

    def agg(g: pa.Table) -> pa.Table:
        tot = 0 if g.num_rows == 0 else int(pa.compute.sum(g.column("v")).as_py())
        return pa.table({"n": pa.array([g.num_rows], pa.int64()),
                         "sum_v": pa.array([tot], pa.int64())})

    def run():
        out = ops.bucket_map_groups(rd.from_arrow(t), "__b", agg, 8).to_pandas()
        return out.sort_values(["n", "sum_v"]).reset_index(drop=True)

    exchanged = run()
    monkeypatch.setattr(ops, "_EXCHANGE_MAX_REFS", 1)   # force the fallback
    fellback = run()
    # fallback (Dataset groupby) skips empty buckets; exchange emits a
    # row per bucket — compare the NON-EMPTY groups
    ex_nonempty = exchanged[exchanged["n"] > 0].reset_index(drop=True)
    pd.testing.assert_frame_equal(ex_nonempty, fellback[fellback["n"] > 0].reset_index(drop=True))
    assert len(ex_nonempty) == 3
    assert ex_nonempty["n"].sum() == n


def test_with_group_ranks_prefix_sum_matches_pandas():
    """value_col attaches the exact exclusive per-group prefix sum
    under the sort order, across many small blocks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.pipelines.ops import with_group_ranks

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "k": rng.permutation(n).astype(np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(13)
    out = (
        with_group_ranks(ds, "g", ["k"], value_col="v")
        .to_pandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "k"]).reset_index(drop=True)
    grp = exp.groupby("g", sort=False)["v"]
    expected_cum = (grp.cumsum() - exp["v"]).to_numpy()
    np.testing.assert_array_equal(out["__cum"].to_numpy(), expected_cum)
    np.testing.assert_array_equal(
        out["__rank"].to_numpy(), exp.groupby("g", sort=False).cumcount().to_numpy()
    )
    np.testing.assert_array_equal(
        out["__gn"].to_numpy(), exp.groupby("g", sort=False)["v"].transform("size").to_numpy()
    )


def test_heavy_keys_finds_hot_key(ray_session):
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import heavy_keys

    keys = [7] * 5000 + list(range(100, 600))
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(4)
    hot = heavy_keys(ds, "k", threshold_rows=1000)
    assert hot == [7]


def test_skew_join_matches_pandas_merge(ray_session):
    import numpy as np
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import skew_join

    rng = np.random.RandomState(3)
    # zipf-ish: key 0 carries half the fact rows; tail uniform over 1..49
    k = np.where(rng.rand(4000) < 0.5, 0, rng.randint(1, 50, size=4000))
    left = pa.table(
        {"k": pa.array(k, pa.int64()), "v": pa.array(np.arange(4000), pa.int64())}
    )
    # right covers keys 0..39 -> keys 40..49 must drop (inner join)
    right = pa.table(
        {"rk": pa.array(range(40), pa.int64()), "seg": [f"s{i%4}" for i in range(40)]}
    )
    out = (
        skew_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right),
            on="k",
            right_on="rk",
            num_partitions=4,
            hot_frac=0.1,  # threshold 400 -> key 0 is hot, tail is not
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")
        .drop(columns=["rk"])[out.columns]
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want)


def test_skew_join_no_hot_falls_back(ray_session):
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import skew_join

    left = pa.table({"k": pa.array(range(100), pa.int64()), "v": pa.array(range(100))})
    right = pa.table({"k": pa.array(range(100), pa.int64()), "w": pa.array(range(100))})
    out = skew_join(
        rd.from_arrow(left), rd.from_arrow(right), on="k", num_partitions=2
    ).to_pandas()
    assert len(out) == 100 and set(out.columns) == {"k", "v", "w"}


def test_skew_join_hot_both_sides_raises(ray_session):
    import pytest as _pytest
    import pyarrow as pa

    from document_ai_ray.pipelines.ops import skew_join

    left = pa.table({"k": pa.array([1] * 1000, pa.int64())})
    right = pa.table({"k": pa.array([1] * 200, pa.int64())})
    with _pytest.raises(ValueError, match="both sides are hot"):
        skew_join(
            rd.from_arrow(left),
            rd.from_arrow(right),
            on="k",
            hot_frac=0.1,
            max_hot_right_rows=100,
        ).to_pandas()


def test_with_group_ranks_high_cardinality_guard():
    """r3 verdict #6: per-doc-cardinality group keys must raise cleanly
    (the offset metadata is O(n_blocks x n_groups)) instead of silently
    blowing up the driver."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from document_ai_ray.pipelines.ops import MAX_RANK_GROUPS, with_group_ranks

    n = MAX_RANK_GROUPS + 10
    ds = rd.from_arrow(
        pa.table({"g": np.arange(n, dtype=np.int64), "v": np.ones(n, np.int64)})
    )
    with pytest.raises(ValueError, match="distinct"):
        with_group_ranks(ds, "g", ["v"]).materialize()
