"""Tests for the crawl-discovery roundtrips and layout operators."""

from __future__ import annotations

import glob
import os

import pytest


def test_feed_parse_tolerance():
    from document_ai_ray.sources.sitemap import parse_feed, write_atom, write_rss

    rss = write_rss("ch", [{"title": "A & B", "link": "http://h/x?a=1&b=2", "pubDate": "d1"}])
    got = parse_feed(rss)
    assert got == [{"title": "A & B", "link": "http://h/x?a=1&b=2", "ts": "d1"}]

    atom = write_atom("f", [{"title": "T", "link": "http://h/y", "updated": "u1"}])
    got = parse_feed(atom)
    assert got == [{"title": "T", "link": "http://h/y", "ts": "u1"}]

    # entry with no link is skipped; messy namespaces + self-closing link
    messy = b'<feed xmlns:a="x"><a:entry><a:title>n</a:title></a:entry>' \
            b'<a:entry a="1"><a:title>m</a:title><a:link href="http://m/1"/></a:entry></feed>'
    got = parse_feed(messy)
    assert got == [{"title": "m", "link": "http://m/1", "ts": ""}]


@pytest.mark.usefixtures("ray_session")
def test_partition_pruned_scan_layout(sf_tiny):
    from document_ai_ray.pipelines.relational import partition_pruned_scan

    from document_ai_ray.functions.scratch import scratch_dir

    df = partition_pruned_scan(sf_tiny).to_pandas()
    assert len(df) > 0
    # layout proof: the lang=en directory holds only a fraction of the
    # files; the pruned read never touches the rest
    out_dir = scratch_dir("partition_demo", fresh=False)
    all_files = glob.glob(f"{out_dir}/lang=*/*.parquet")
    en_files = glob.glob(f"{out_dir}/lang=en/*.parquet")
    assert 0 < len(en_files) < len(all_files)
    langs = {os.path.basename(os.path.dirname(f)) for f in all_files}
    assert len(langs) >= 3  # several partitions exist on disk


@pytest.mark.usefixtures("ray_session")
def test_scd2_islands_and_intervals(tmp_path):
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_ai_ray.pipelines.relational import scd2_priority_history

    d = lambda day: datetime.datetime(2024, 1, day)  # noqa: E731
    rows = [
        # cust 1: A A B A  -> 3 versions (A x2, B, A)
        (1, 10, d(1), "A"),
        (1, 11, d(2), "A"),
        (1, 12, d(3), "B"),
        (1, 13, d(4), "A"),
        # cust 2: same-date tie broken by orderkey: B(5,#20) A(5,#21)
        (2, 20, d(5), "B"),
        (2, 21, d(5), "A"),
    ]
    t = pa.table(
        {
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderdate": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    out = scd2_priority_history(str(tmp_path)).to_pandas()
    got = {
        (r.custkey, r.version): (
            r.priority,
            r.valid_from.day,
            None if pd_isna(r.valid_to) else r.valid_to.day,
            r.n_obs,
        )
        for r in out.itertuples()
    }
    assert got[(1, 1)] == ("A", 1, 3, 2)
    assert got[(1, 2)] == ("B", 3, 4, 1)
    assert got[(1, 3)] == ("A", 4, None, 1)
    assert got[(2, 1)] == ("B", 5, 5, 1)
    assert got[(2, 2)] == ("A", 5, None, 1)
    assert len(got) == 5


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_rowgroup_pruning_statistics(sf_tiny):
    """The sorted, bounded-row-group layout really enables pruning: the
    fraction of row groups whose [min,max] o_orderdate range overlaps
    the queried year is a strict minority of the file's row groups
    (the whole point of sorting on the predicate column at write time),
    and the query's rows match an unpruned recompute."""
    import datetime
    import os

    import pyarrow.parquet as pq

    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.pipelines import registry

    out = registry.queries()["rowgroup_pruned_scan"](sf_tiny).to_pandas()
    d = scratch_dir("rg-pruned-orders", fresh=False)  # written by the query
    lo, hi = datetime.datetime(1995, 1, 1), datetime.datetime(1996, 1, 1)
    total = overlapping = 0
    for f in os.listdir(d):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(d, f))
        idx = md.schema.to_arrow_schema().get_field_index("o_orderdate")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st.max >= lo and st.min < hi:
                overlapping += 1
    assert total >= 7                      # bounded row groups, several per file
    assert overlapping < total / 2         # the year is a minority of the span
    assert overlapping >= 1
    # row-exactness vs a straight filter on the source table
    from document_ai_ray.sources.tables import read_table

    src = read_table(sf_tiny, "orders", columns=["o_orderkey", "o_orderdate"]).to_pandas()
    want = src[(src["o_orderdate"] >= lo) & (src["o_orderdate"] < hi)]["o_orderkey"]
    assert sorted(out["o_orderkey"]) == sorted(want)
