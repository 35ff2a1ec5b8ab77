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
