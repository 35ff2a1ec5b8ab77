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
