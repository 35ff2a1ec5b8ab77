"""Out-link / host-graph queries (CommonCrawl WAT-style link analysis).

Link pages are built deterministically from the `documents` table: the
first 6 space-split words of each doc become content anchors
`http://{slug}.example/{doc_id}` with slug = lower(word) stripped to
[a-z0-9] — the same derivation the DuckDB oracle replays with
regexp_replace, so the REAL HTML href extraction is value-checked end
to end."""

from __future__ import annotations

import html as html_mod
import re

import pyarrow as pa

from document_ai_ray.pipelines.registry import register
from document_ai_ray.sources.tables import read_table

_SLUG = re.compile(r"[^a-z0-9]")
_N_WORDS = 6


def _link_pages(docs, src_host_url: bool = False):
    """documents -> (url, html) pages whose <main> holds one anchor per
    leading word.  With src_host_url the page url carries the doc's
    source as a host (http://{source}.example/{doc_id}) so the page
    graph has real src->dst host edges."""

    def build(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        srcs = (
            t.column("source").to_pylist()
            if src_host_url
            else [None] * t.num_rows
        )
        for did, txt, src in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist(), srcs
        ):
            anchors = []
            for w in (txt or "").split(" ")[:_N_WORDS]:
                slug = _SLUG.sub("", w.lower())
                if slug:
                    anchors.append(
                        f'<a href="http://{slug}.example/{did}">{html_mod.escape(w)}</a>'
                    )
            page = (
                f"<html><head><title>d{did}</title></head>"
                f'<body><header>site chrome</header><main>{" ".join(anchors)}</main>'
                f"</body></html>"
            )
            urls.append(
                f"http://{src}.example/{did}" if src_host_url else f"doc://{did}"
            )
            htmls.append(page.encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    return docs.map_batches(build, batch_format="pyarrow")


_HOST_DEGREE_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT doc_id, unnest(generate_series(1, LEAST(len(ws), 6))) AS i, ws FROM w),
s AS (SELECT regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k)
SELECT slug || '.example' AS host, COUNT(*) AS n_links
FROM s WHERE slug <> '' GROUP BY 1
"""


@register("outlink_host_degree", oracle=_HOST_DEGREE_ORACLE)
def outlink_host_degree(sf_dir: str):
    """Host in-link degree through REAL HTML anchor extraction: pages
    are parsed with the stdlib-attribute link collector
    (stages/links.py), hrefs resolve to hosts, counts aggregate with
    the shuffle-free combiner pattern."""
    from document_ai_ray.stages.links import outlink_host_counts, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return outlink_host_counts(page_outlinks(_link_pages(docs)))


@register("pagerank_hosts")
def pagerank_hosts_query(sf_dir: str):
    """Host-graph PageRank (rows-only: iterative float fixpoint has no
    SQL analogue here; the power iteration is numpy-equality-tested in
    tests/test_links.py).  Edges come from the real extraction path:
    page url host (the doc's source) -> each anchor's host."""
    from document_ai_ray.stages.links import (
        href_host,
        page_outlinks,
        pagerank_hosts,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    edges = links.map_batches(to_edges, batch_format="pyarrow")
    return pagerank_hosts(edges, iters=10)
