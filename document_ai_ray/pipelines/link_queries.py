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


_N_TWORDS = 8

_TABLE_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT doc_id, unnest(generate_series(1, LEAST(len(ws), {_N_TWORDS}))) AS i, ws FROM w)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS row_idx, CAST(0 AS BIGINT) AS col_idx,
       CAST(i - 1 AS VARCHAR) AS cell_text
FROM k
UNION ALL
SELECT doc_id, CAST(i - 1 AS BIGINT), CAST(1 AS BIGINT), ws[i] FROM k
"""


@register("html_table_cells", oracle=_TABLE_ORACLE)
def html_table_cells(sf_dir: str):
    """Structured-data mining from HTML tables (the WebTables corpus
    step): pages embedding a 2-column <table> (row index, word) are
    parsed by the tolerant stdlib table collector
    (stages/html_tables.py) into one Arrow row per CELL — the real
    parse is value-checked cell-for-cell against the SQL
    reconstruction of the same derived table."""
    import html as html_mod

    from document_ai_ray.stages.html_tables import page_tables

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def build(t: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for did, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
            rows = [
                f"<tr><td>{i}</td><td>{html_mod.escape(w)}</td></tr>"
                for i, w in enumerate((txt or "").split(" ")[:_N_TWORDS])
            ]
            urls.append(f"doc://{did}")
            htmls.append(
                f'<html><body><header>chrome</header><table>{"".join(rows)}</table>'
                f"</body></html>".encode()
            )
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    cells = page_tables(docs.map_batches(build, batch_format="pyarrow"))

    def project(t: pa.Table) -> pa.Table:
        ids = [int(u.removeprefix("doc://")) for u in t.column("url").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "row_idx": t.column("row_idx"),
                "col_idx": t.column("col_idx"),
                "cell_text": t.column("cell_text"),
            }
        )

    return cells.map_batches(project, batch_format="pyarrow")


_ANCHOR_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT doc_id, unnest(generate_series(1, LEAST(len(ws), 6))) AS i, ws FROM w),
a AS (SELECT regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug, ws[i] AS anchor FROM k),
f AS (SELECT slug || '.example' AS host, anchor FROM a WHERE slug <> '')
SELECT host, COUNT(*) AS n_links,
       COUNT(DISTINCT anchor) AS n_distinct_anchors,
       string_agg(DISTINCT anchor, '|' ORDER BY anchor) AS anchors
FROM f GROUP BY host
"""


@register("anchor_text_per_host", oracle=_ANCHOR_ORACLE)
def anchor_text_per_host(sf_dir: str):
    """WAT-style anchor-text aggregation: the visible text of every
    <a href> pointing at a host, collected per host (total link count,
    distinct anchor count, sorted '|'-joined distinct anchors) — the
    signal web-corpus quality filters and search rankers mine.  Anchors
    come from the REAL HTML parse (stages/links.py collects each
    anchor's unescaped text).  Shape: per-batch (host, anchor) combiner
    partials, then one hash-bucketed exchange on host — anchor VOCAB
    moves, never pages."""
    from document_ai_ray.functions.hashing import crc_bucket
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.stages.links import href_host, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    links = page_outlinks(_link_pages(docs), with_text=True)
    P = auto_buckets(docs.count())

    def combine(t: pa.Table) -> pa.Table:
        hosts = [href_host(h) for h in t.column("href").to_pylist()]
        g = (
            pa.table({"host": pa.array(hosts, pa.string()), "anchor": t.column("anchor")})
            .filter(pa.compute.not_equal(pa.array(hosts, pa.string()), ""))
            .group_by(["host", "anchor"])
            .aggregate([([], "count_all")])
        )
        bucket = pa.array(
            [crc_bucket(h, P) for h in g.column("host").to_pylist()], pa.int32()
        )
        return pa.Table.from_arrays(
            [g.column("host"), g.column("anchor"), g.column("count_all"), bucket],
            names=["host", "anchor", "n", "bucket"],
        )

    def per_host(df):
        import pandas as pd

        if len(df) == 0:
            return pd.DataFrame(
                {
                    "host": pd.Series(dtype="object"),
                    "n_links": pd.Series(dtype="int64"),
                    "n_distinct_anchors": pd.Series(dtype="int64"),
                    "anchors": pd.Series(dtype="object"),
                }
            )
        # a (host, anchor) pair may arrive from several batches: re-sum
        pairs = df.groupby(["host", "anchor"], as_index=False)["n"].sum()
        out = pairs.sort_values("anchor").groupby("host", as_index=False).agg(
            n_links=("n", "sum"),
            n_distinct_anchors=("anchor", "size"),
            anchors=("anchor", lambda s: "|".join(s)),
        )
        return out[["host", "n_links", "n_distinct_anchors", "anchors"]]

    return bucket_map_groups(
        links.map_batches(combine, batch_format="pyarrow"),
        "bucket",
        per_host,
        P,
        batch_format="pandas",
    )


def _pagerank_oracle(iters: int = 10, d: float = 0.85, round_to: int = 6) -> str:
    """Unrolled power-iteration PageRank as DuckDB SQL: one MATERIALIZED
    CTE per iteration (plain CTEs are inlined, and each r_k references
    r_{k-1} twice — contribution join + dangling-mass scalar — so
    inlining would blow up 2^iters).  The iteration body mirrors
    stages/links.py:pagerank_hosts exactly: rank' = (1-d)/n +
    d*(sum_in w*rank/outdeg + dangling_mass/n), ranks rounded only at
    the end (both sides accumulate in float64; the sum orders differ
    but 10 damped iterations keep the drift ~1e-15, far under the 1e-6
    rounding grid — verified exact at sf0.01)."""
    its = []
    prev = "r0"
    for k in range(1, iters + 1):
        cur = f"r{k}"
        its.append(f"""
{cur} AS MATERIALIZED (
  SELECT h.host, h.outdeg,
         {1.0 - d} / (SELECT n FROM nn)
         + {d} * (COALESCE(c.s, 0.0)
                  + (SELECT COALESCE(SUM(rank), 0.0) FROM {prev} WHERE outdeg = 0.0)
                    / (SELECT n FROM nn)) AS rank
  FROM h
  LEFT JOIN (SELECT e.dst AS host, SUM(e.w * r.rank / r.outdeg) AS s
             FROM edges e JOIN {prev} r ON e.src = r.host GROUP BY 1) c
  USING (host))""")
        prev = cur
    return f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT src, slug || '.example' AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM e0 WHERE slug <> '' GROUP BY 1, 2),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
odeg AS (SELECT src AS host, SUM(w) AS outdeg FROM edges GROUP BY 1),
h AS MATERIALIZED (
  SELECT host, COALESCE(odeg.outdeg, 0.0) AS outdeg
  FROM hosts LEFT JOIN odeg USING (host)),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM h),
r0 AS MATERIALIZED (SELECT host, outdeg, 1.0 / (SELECT n FROM nn) AS rank FROM h),
{",".join(its)}
SELECT host, ROUND(rank, {round_to}) AS rank FROM {prev}
"""


@register("pagerank_hosts", oracle=_pagerank_oracle())
def pagerank_hosts_query(sf_dir: str):
    """Host-graph PageRank, oracle-checked: the derived edge table is
    SQL-reconstructible (source host -> per-word slug host), so the
    10-iteration power fixpoint is replayed in DuckDB as unrolled
    MATERIALIZED CTEs (`_pagerank_oracle`) — the distributed sparse
    contribute/merge loop is value-checked end to end (also
    numpy-equality-tested in tests/test_links.py).  Edges come from the
    real extraction path: page url host (the doc's source) -> each
    anchor's host."""
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


def _bfs_oracle(max_hops: int = 8) -> str:
    """Unrolled level-synchronous BFS as DuckDB SQL (MATERIALIZED CTEs —
    same inlining hazard as `_pagerank_oracle`): f_k = hosts reachable
    in exactly k steps (DISTINCT per level, so each CTE is host-sized);
    dist = MIN(k) over the tagged union — exactly the BFS first-visit
    level.  Edges are the consecutive-anchor slug pairs the Ray side
    extracts from the real HTML parse; the seed is MIN(src), computed
    not assumed."""
    levels = []
    prev = "f0"
    for k in range(1, max_hops + 1):
        cur = f"f{k}"
        levels.append(f"""
{cur} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS host, {k} AS d
  FROM edges e JOIN {prev} ON e.src = {prev}.host)""")
        prev = cur
    union = " UNION ALL ".join(f"SELECT host, d FROM f{k}" for k in range(max_hops + 1))
    return f"""
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
W AS (SELECT list_filter(
        list_transform(ws[1:LEAST(len(ws), {_N_WORDS})],
                       x -> regexp_replace(lower(x), '[^a-z0-9]', '', 'g')),
        s -> s <> '') AS sl FROM t),
p AS (SELECT unnest(generate_series(1, len(sl) - 1)) AS i, sl FROM W WHERE len(sl) >= 2),
edges AS MATERIALIZED (
  SELECT DISTINCT sl[i] || '.example' AS src, sl[i + 1] || '.example' AS dst FROM p),
f0 AS MATERIALIZED (SELECT MIN(src) AS host, 0 AS d FROM edges),
{",".join(levels)}
SELECT host, CAST(MIN(d) AS BIGINT) AS dist FROM ({union}) GROUP BY 1
"""


@register("bfs_host_distance", oracle=_bfs_oracle())
def bfs_host_distance_query(sf_dir: str):
    """Single-source shortest hop distance over the consecutive-anchor
    host graph (the crawl-frontier "how far from the seed" question).
    The REAL HTML parse produces adjacent-anchor (src, dst) host pairs;
    distributed level-synchronous BFS runs over the materialized
    distinct edge table; the oracle replays both the edge derivation
    and the BFS (unrolled MATERIALIZED frontier CTEs + MIN over
    levels)."""
    from document_ai_ray.stages.links import bfs_host_distance, page_outlink_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    edges = page_outlink_pairs(_link_pages(docs))
    return bfs_host_distance(edges, max_hops=8)


# ---------------------------------------------------------------------------
# robots.txt URL gate + sitemap roundtrip (crawl-side discovery formats)
# ---------------------------------------------------------------------------

_ROBOTS_TXT = """
# graft test corpus policy
User-agent: *
Disallow: /private/

User-agent: graftbot
Disallow: /private/
Allow: /private/public/
Disallow: /*.pdf$
Allow: /tmp/open/
Disallow: /tmp/
"""

# path kinds exercised (doc_id % 6) — covers default-allow, plain
# disallow, longer-allow override, wildcard-$ rule, and nested allow
_PATH_CASE_SQL = """CASE doc_id % 6
      WHEN 0 THEN '/public/p' || doc_id
      WHEN 1 THEN '/private/p' || doc_id
      WHEN 2 THEN '/private/public/p' || doc_id
      WHEN 3 THEN '/tmp/p' || doc_id
      WHEN 4 THEN '/tmp/open/p' || doc_id
      ELSE '/files/p' || doc_id || '.pdf' END"""

_PATH_PREFIXES = ["/public/p", "/private/p", "/private/public/p", "/tmp/p", "/tmp/open/p"]


def _doc_path(doc_id: int) -> str:
    kind = doc_id % 6
    if kind == 5:
        return f"/files/p{doc_id}.pdf"
    return f"{_PATH_PREFIXES[kind]}{doc_id}"


@register(
    "robots_filter_urls",
    # the oracle EVALUATES the same rule table (longest pattern wins,
    # Allow wins ties, default allow) — it does not hardcode answers
    oracle=f"""
    WITH u AS (SELECT doc_id, {_PATH_CASE_SQL} AS path FROM documents),
    rules(pat, is_allow, plen) AS (VALUES
      ('/private/%', false, 9),
      ('/private/public/%', true, 16),
      ('%.pdf', false, 7),
      ('/tmp/open/%', true, 10),
      ('/tmp/%', false, 5)),
    m AS (SELECT u.doc_id, r.is_allow,
                 ROW_NUMBER() OVER (PARTITION BY u.doc_id
                                    ORDER BY r.plen DESC, r.is_allow DESC) AS rn
          FROM u JOIN rules r ON u.path LIKE r.pat)
    SELECT u.doc_id, u.path, COALESCE(m.is_allow, true) AS allowed
    FROM u LEFT JOIN m ON m.doc_id = u.doc_id AND m.rn = 1
    """,
)
def robots_filter_urls(sf_dir: str):
    """robots.txt URL gate (RFC 9309 longest-match semantics,
    functions/robots.py): parse the policy ONCE on the driver, ship the
    compiled rule list to every task, and evaluate each document's
    derived fetch path in a streaming pass.  The DuckDB oracle replays
    the same longest-pattern-wins/Allow-breaks-ties evaluation over a
    VALUES rule table, so the REP semantics are value-checked, not
    hardcoded."""
    from document_ai_ray.functions.robots import parse_robots, robots_allowed

    rules = parse_robots(_ROBOTS_TXT, agent="graftbot")
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def gate(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        paths = [_doc_path(i) for i in ids]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "path": pa.array(paths, pa.string()),
                "allowed": pa.array([robots_allowed(rules, p) for p in paths]),
            }
        )

    return docs.map_batches(gate, batch_format="pyarrow")


@register(
    "sitemap_roundtrip",
    oracle="""
    SELECT 'http://' || source || '.example/doc/' || doc_id AS loc,
           '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS lastmod,
           CAST(doc_id % 10 AS DOUBLE) / 10.0 AS priority
    FROM documents
    """,
)
def sitemap_roundtrip(sf_dir: str):
    """Sitemap protocol roundtrip: documents -> per-source <urlset> XML
    blobs (one sitemap per source host, the real publishing layout) ->
    tolerant re-parse -> URL rows.  Value-checks the XML writer AND
    parser end-to-end against the SQL derivation of the same entries
    (same discipline as extract_warc_roundtrip).  Shape: building and
    parsing both happen inside map_batches; sitemap blobs never
    leave their task."""
    from document_ai_ray.sources.sitemap import parse_sitemap, write_sitemap_xml

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def roundtrip(t: pa.Table) -> pa.Table:
        by_source: dict[str, list[dict]] = {}
        for did, src in zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()):
            by_source.setdefault(src, []).append(
                {
                    "loc": f"http://{src}.example/doc/{did}",
                    "lastmod": f"2024-01-{1 + did % 28:02d}",
                    "priority": (did % 10) / 10.0,
                }
            )
        locs, mods, prios = [], [], []
        for src in sorted(by_source):
            xml = write_sitemap_xml(by_source[src])  # -> bytes on the "wire"
            for e in parse_sitemap(xml):
                locs.append(e["loc"])
                mods.append(e["lastmod"])
                prios.append(e["priority"])
        return pa.table(
            {
                "loc": pa.array(locs, pa.string()),
                "lastmod": pa.array(mods, pa.string()),
                "priority": pa.array(prios, pa.float64()),
            }
        )

    return docs.map_batches(roundtrip, batch_format="pyarrow")


_TRI_ORACLE = """
WITH raw AS (
  SELECT (doc_id * doc_id + doc_id) % 40 AS x, (doc_id * doc_id * 3 + 5) % 40 AS y
  FROM documents
  UNION ALL
  SELECT (doc_id * 7 + 11) % 40, (doc_id * doc_id * 5 + doc_id * 2) % 40
  FROM documents
  UNION ALL
  SELECT (doc_id * doc_id * 7 + 1) % 40, (doc_id * 11 + doc_id * doc_id) % 40
  FROM documents
),
e AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM raw WHERE x != y)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM e e1
             JOIN e e2 ON e2.a = e1.b
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT) AS n_triangles
"""


@register("triangle_count_graph", oracle=_TRI_ORACLE)
def triangle_count_graph(sf_dir: str):
    """Exact distributed TRIANGLE COUNT (the classic clustering-
    coefficient / spam-farm-detection graph kernel) over an
    arithmetically-derived graph the oracle replays with a three-way
    self-join: canonical dedupe → wedge generation grouped by the low
    endpoint → bucketed closure check against the edge set
    (stages/cluster.py `triangle_count`).  Every stage hash-bucketed;
    the wedge-skew mitigation (degree orientation) is documented at
    the stage."""
    import numpy as np

    from document_ai_ray.stages.cluster import triangle_count

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def derive(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        xs = np.concatenate([(d * d + d) % 40, (d * 7 + 11) % 40, (d * d * 7 + 1) % 40])
        ys = np.concatenate(
            [(d * d * 3 + 5) % 40, (d * d * 5 + d * 2) % 40, (d * 11 + d * d) % 40]
        )
        return pa.table({"a": pa.array(xs), "b": pa.array(ys)})

    edges = docs.map_batches(derive, batch_format="pyarrow")
    n_tri = triangle_count(edges)
    # n_edges via the same canonical dedupe path the counter used
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    P = auto_buckets(edges.count())

    def canon(t: pa.Table) -> pa.Table:
        x = t.column("a").to_numpy(zero_copy_only=False)
        y = t.column("b").to_numpy(zero_copy_only=False)
        keep = x != y
        x, y = x[keep], y[keep]
        a, b = np.minimum(x, y), np.maximum(x, y)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b),
             "bucket": pa.array(((a * 1000003 + b) % P).astype(np.int32))}
        )

    def ded_count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": pd.Series([len(df.drop_duplicates(["a", "b"]))], dtype="int64")})

    n_edges = 0
    for bt in bucket_map_groups(
        edges.map_batches(canon, batch_format="pyarrow"), "bucket", ded_count, P,
        batch_format="pandas",
    ).iter_batches(batch_format="pyarrow"):
        n_edges += int(sum(bt.column("n").to_pylist()))

    return pa.table(
        {"n_edges": pa.array([n_edges], pa.int64()), "n_triangles": pa.array([n_tri], pa.int64())}
    )


@register(
    "feed_roundtrip",
    oracle="""
    SELECT 'Doc ' || doc_id AS title,
           'http://' || source || '.example/post/' || doc_id AS link,
           CASE WHEN doc_id % 2 = 0
                THEN 'Mon, 0' || (1 + doc_id % 7) || ' Jan 2024 00:00:00 GMT'
                ELSE '2024-01-0' || (1 + doc_id % 7) || 'T00:00:00Z' END AS ts
    FROM documents
    """,
)
def feed_roundtrip(sf_dir: str):
    """RSS 2.0 / Atom feed roundtrip (sources/sitemap.py feed codecs):
    even doc_ids publish through an RSS channel per source, odd ones
    through an Atom feed (href-attribute links) — BOTH parse back
    through the one tolerant scanner, value-checked against the SQL
    derivation of the same entries.  Completes the crawl-discovery
    trio: robots gate, sitemap, feeds."""
    from document_ai_ray.sources.sitemap import parse_feed, write_atom, write_rss

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def roundtrip(t: pa.Table) -> pa.Table:
        rss: dict[str, list[dict]] = {}
        atom: dict[str, list[dict]] = {}
        for did, src in zip(t.column("doc_id").to_pylist(), t.column("source").to_pylist()):
            link = f"http://{src}.example/post/{did}"
            title = f"Doc {did}"
            if did % 2 == 0:
                rss.setdefault(src, []).append(
                    {"title": title, "link": link,
                     "pubDate": f"Mon, 0{1 + did % 7} Jan 2024 00:00:00 GMT"}
                )
            else:
                atom.setdefault(src, []).append(
                    {"title": title, "link": link,
                     "updated": f"2024-01-0{1 + did % 7}T00:00:00Z"}
                )
        titles, links, tss = [], [], []
        for src in sorted(rss):
            for e in parse_feed(write_rss(f"{src} feed", rss[src])):
                titles.append(e["title"]); links.append(e["link"]); tss.append(e["ts"])
        for src in sorted(atom):
            for e in parse_feed(write_atom(f"{src} feed", atom[src])):
                titles.append(e["title"]); links.append(e["link"]); tss.append(e["ts"])
        return pa.table(
            {
                "title": pa.array(titles, pa.string()),
                "link": pa.array(links, pa.string()),
                "ts": pa.array(tss, pa.string()),
            }
        )

    return docs.map_batches(roundtrip, batch_format="pyarrow")


@register(
    "clustering_coeff_graph",
    oracle="""
WITH raw AS (
  SELECT (doc_id * doc_id + doc_id) % 40 AS x, (doc_id * doc_id * 3 + 5) % 40 AS y
  FROM documents
  UNION ALL
  SELECT (doc_id * 7 + 11) % 40, (doc_id * doc_id * 5 + doc_id * 2) % 40
  FROM documents
  UNION ALL
  SELECT (doc_id * doc_id * 7 + 1) % 40, (doc_id * 11 + doc_id * doc_id) % 40
  FROM documents
),
e AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM raw WHERE x != y),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
       FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
       GROUP BY 1)
SELECT deg.node, deg.degree, COALESCE(tn.n_triangles, 0) AS n_triangles,
       ROUND(CASE WHEN deg.degree >= 2
                  THEN 2.0 * COALESCE(tn.n_triangles, 0) / (deg.degree * (deg.degree - 1))
                  ELSE 0 END, 6) AS clustering_coeff
FROM deg LEFT JOIN tn USING (node)
""",
)
def clustering_coeff_graph(sf_dir: str):
    """Per-node LOCAL CLUSTERING COEFFICIENT over the same derived
    graph as `triangle_count_graph`: the wedge-closure substrate with
    the apex carried, so each verified triangle credits all three
    corners (stages/cluster.py `clustering_coefficient`).  Oracle
    replays triangles-per-node with the 3-way self-join unnested to
    corners."""
    import numpy as np

    from document_ai_ray.stages.cluster import clustering_coefficient

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def derive(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        xs = np.concatenate([(d * d + d) % 40, (d * 7 + 11) % 40, (d * d * 7 + 1) % 40])
        ys = np.concatenate(
            [(d * d * 3 + 5) % 40, (d * d * 5 + d * 2) % 40, (d * 11 + d * d) % 40]
        )
        return pa.table({"a": pa.array(xs), "b": pa.array(ys)})

    return clustering_coefficient(docs.map_batches(derive, batch_format="pyarrow"))


def _hits_oracle(iters: int = 10, round_to: int = 6) -> str:
    """Unrolled HITS as DuckDB SQL, one pair of MATERIALIZED CTEs per
    half-iteration (raw contribution + L2-normalized), mirroring
    stages/links.py:hits_hosts exactly: authority_k(d) = Σ w·hub_{k-1}(s)
    then /sqrt(Σv²); hub_k(s) = Σ w·authority_k(d) then /sqrt(Σv²).
    Both sides accumulate in float64; sum-order drift stays ~1e-15 over
    10 rounds, far under the 1e-6 rounding grid (the `_pagerank_oracle`
    precedent, plus one sqrt per half-round)."""
    its = []
    prev_h = "h0"
    for k in range(1, iters + 1):
        its.append(f"""
a{k}r AS MATERIALIZED (
  SELECT h.host, COALESCE(s.v, 0.0) AS v
  FROM h LEFT JOIN (SELECT e.dst AS host, SUM(e.w * p.v) AS v
                    FROM edges e JOIN {prev_h} p ON e.src = p.host GROUP BY 1) s
  USING (host)),
a{k} AS MATERIALIZED (
  SELECT host, v / (SELECT sqrt(SUM(v * v)) FROM a{k}r) AS v FROM a{k}r),
h{k}r AS MATERIALIZED (
  SELECT h.host, COALESCE(s.v, 0.0) AS v
  FROM h LEFT JOIN (SELECT e.src AS host, SUM(e.w * a.v) AS v
                    FROM edges e JOIN a{k} a ON e.dst = a.host GROUP BY 1) s
  USING (host)),
h{k} AS MATERIALIZED (
  SELECT host, v / (SELECT sqrt(SUM(v * v)) FROM h{k}r) AS v FROM h{k}r)""")
        prev_h = f"h{k}"
    return f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT src, slug || '.example' AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM e0 WHERE slug <> '' GROUP BY 1, 2),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
h AS MATERIALIZED (SELECT host FROM hosts),
nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM h),
h0 AS MATERIALIZED (SELECT host, 1.0 / sqrt((SELECT n FROM nn)) AS v FROM h),
{",".join(its)}
SELECT h{iters}.host, ROUND(h{iters}.v, {round_to}) AS hub,
       ROUND(a{iters}.v, {round_to}) AS authority
FROM h{iters} JOIN a{iters} USING (host)
"""


@register("hits_hosts", oracle=_hits_oracle())
def hits_hosts_query(sf_dir: str):
    """HITS hubs/authorities over the same real-HTML-extracted host
    graph as `pagerank_hosts` — the other classic link-quality prior a
    crawl frontier consumes.  The 10-round L2-normalized fixpoint is
    replayed in DuckDB as unrolled MATERIALIZED CTEs; the distributed
    sparse contribute/merge halves are value-checked end to end."""
    from document_ai_ray.stages.links import (
        hits_hosts,
        href_host,
        page_outlinks,
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
    return hits_hosts(edges, iters=10)


_RECIPROCITY_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT DISTINCT src, slug || '.example' AS dst FROM e0 WHERE slug <> ''),
r AS (SELECT e.src, CASE WHEN EXISTS (SELECT 1 FROM edges x
                                      WHERE x.src = e.dst AND x.dst = e.src)
                         THEN 1 ELSE 0 END AS rec
      FROM edges e)
SELECT src AS host, COUNT(*) AS n_out, CAST(SUM(rec) AS BIGINT) AS n_reciprocal,
       ROUND(SUM(rec) / CAST(COUNT(*) AS DOUBLE), 6) AS reciprocity
FROM r GROUP BY src
"""


@register("host_reciprocity", oracle=_RECIPROCITY_ORACLE)
def host_reciprocity(sf_dir: str):
    """Per-host link reciprocity over the DISTINCT directed host graph:
    fraction of a host's out-edges whose reverse edge exists (self-loops
    count as reciprocal — EXISTS finds the edge itself, both sides).
    Both directions of an unordered pair hash to the SAME bucket, so
    the reverse-existence probe is one vectorized per-bucket merge; the
    per-host rollup rides the combiner."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        distinct_rows,
        partial_group_agg,
        round_cols,
    )
    from document_ai_ray.stages.links import href_host, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    edges = distinct_rows(
        links.map_batches(to_edges, batch_format="pyarrow"), ["src", "dst"]
    )
    P = auto_buckets(edges.count())

    def pair_bucket(t: pa.Table) -> pa.Table:
        srcs = t.column("src").to_pylist()
        dsts = t.column("dst").to_pylist()
        bk = [
            stable64("|".join(sorted((s, d)))) % P for s, d in zip(srcs, dsts)
        ]
        return t.append_column("bk", pa.array(bk, pa.int64()))

    def rec_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        rev = df.rename(columns={"src": "dst", "dst": "src"})[["src", "dst"]]
        m = df[["src", "dst"]].merge(
            rev.drop_duplicates(), on=["src", "dst"], how="left", indicator=True
        )
        return pd.DataFrame(
            {
                "src": m["src"],
                "rec": (m["_merge"] == "both").to_numpy().astype(np.int64),
            }
        )

    per_edge = bucket_map_groups(
        edges.map_batches(pair_bucket, batch_format="pyarrow"),
        "bk",
        rec_in_bucket,
        P,
        batch_format="pandas",
    )
    agg = partial_group_agg(
        per_edge, ["src"], {"rec": "n_reciprocal"}, count_alias="n_out"
    )

    def ratio(t: pa.Table) -> pa.Table:
        r = t.column("n_reciprocal").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n_out").to_numpy(zero_copy_only=False).astype(np.float64)
        out = pa.table(
            {
                "host": t.column("src"),
                "n_out": t.column("n_out"),
                "n_reciprocal": t.column("n_reciprocal"),
                "reciprocity": pa.array(r / n, pa.float64()),
            }
        )
        return round_cols(out, {"reciprocity": 6})

    return agg.map_batches(ratio, batch_format="pyarrow")


_FRONTIER_CAP = 5

_FRONTIER_ORACLE = f"""
WITH u AS (SELECT doc_id, {_PATH_CASE_SQL} AS path FROM documents),
c AS (SELECT DISTINCT 'example' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS host,
             'http://example' || CAST(doc_id % 50 AS VARCHAR) || '.com' || path AS url,
             path
      FROM u),
rules(pat, is_allow, plen) AS (VALUES
  ('/private/%', false, 9),
  ('/private/public/%', true, 16),
  ('%.pdf', false, 7),
  ('/tmp/open/%', true, 10),
  ('/tmp/%', false, 5)),
m AS (SELECT c.url, r.is_allow,
             ROW_NUMBER() OVER (PARTITION BY c.url
                                ORDER BY r.plen DESC, r.is_allow DESC) AS rn
      FROM c JOIN rules r ON c.path LIKE r.pat),
a AS (SELECT c.host, c.url, c.path
      FROM c LEFT JOIN m ON m.url = c.url AND m.rn = 1
      WHERE COALESCE(m.is_allow, true)),
r2 AS (SELECT host, url,
              ROW_NUMBER() OVER (PARTITION BY host ORDER BY path, url) AS rn
       FROM a)
SELECT host, url FROM r2 WHERE rn <= {_FRONTIER_CAP}
"""


@register("build_crawl_frontier", oracle=_FRONTIER_ORACLE)
def build_crawl_frontier(sf_dir: str):
    """The crawl-side FLAGSHIP composition — the pipeline a crawler runs
    between "seen URLs" and "fetch queue": three raw spellings per
    candidate URL (case/port/fragment, www+trailing-slash, utm params)
    → `canonicalize_url` → exact canonical dedup (shuffle-free distinct)
    → robots.txt gate (RFC 9309 longest-match, rules parsed ONCE on the
    driver) → per-host politeness cap (bucketed grouped top-k, K=5,
    path order).  Every stage is a proven component; the oracle
    composes their specs into one CTE chain, so the whole frontier is
    value-checked end to end."""
    from urllib.parse import urlsplit

    from document_ai_ray.functions.robots import parse_robots, robots_allowed
    from document_ai_ray.functions.urls import canonicalize_url
    from document_ai_ray.pipelines.ops import distinct_rows, grouped_topk

    rules = parse_robots(_ROBOTS_TXT, agent="graftbot")
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def variants(t: pa.Table) -> pa.Table:
        raw = []
        for i in t.column("doc_id").to_pylist():
            h = i % 50
            p = _doc_path(i)
            raw.append(f"HTTP://WWW.Example{h}.COM:80{p}#frag")
            raw.append(f"http://www.example{h}.com{p}/")
            raw.append(f"http://example{h}.com{p}?utm_source=feed")
        return pa.table({"raw": pa.array(raw, pa.string())})

    def canon(t: pa.Table) -> pa.Table:
        urls, hosts, paths = [], [], []
        for raw in t.column("raw").to_pylist():
            cu = canonicalize_url(raw)
            sp = urlsplit(cu)
            urls.append(cu)
            hosts.append(sp.hostname or "")
            paths.append(sp.path)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "url": pa.array(urls, pa.string()),
                "path": pa.array(paths, pa.string()),
            }
        )

    cand = distinct_rows(
        docs.map_batches(variants, batch_format="pyarrow").map_batches(
            canon, batch_format="pyarrow"
        ),
        ["host", "url", "path"],
    )

    def gate(t: pa.Table) -> pa.Table:
        ok = pa.array([robots_allowed(rules, p) for p in t.column("path").to_pylist()])
        return t.filter(ok)

    allowed = cand.map_batches(gate, batch_format="pyarrow")
    capped = grouped_topk(
        allowed, keys=["host"], sort_cols=[("path", True), ("url", True)], k=_FRONTIER_CAP
    )
    return capped.map_batches(
        lambda t: t.select(["host", "url"]), batch_format="pyarrow"
    )


_DEGREE_HIST_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS (SELECT DISTINCT src, slug || '.example' AS dst FROM e0 WHERE slug <> ''),
und AS (SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM edges
        WHERE src <> dst
        GROUP BY 1, 2),
deg AS (SELECT host, COUNT(*) AS d
        FROM (SELECT u AS host FROM und UNION ALL SELECT v FROM und)
        GROUP BY host)
SELECT d AS degree, COUNT(*) AS n_hosts FROM deg GROUP BY d
"""


@register("host_degree_hist", oracle=_DEGREE_HIST_ORACLE)
def host_degree_hist(sf_dir: str):
    """Undirected host-graph degree distribution — the first chart of
    any web-graph study.  Distinct undirected edges (shuffle-free
    two-level dedup), endpoint explode, then two combiner aggregates
    (per-host degree, then count-of-counts)."""
    import pyarrow.compute as pc

    from document_ai_ray.pipelines.ops import distinct_rows, partial_group_agg
    from document_ai_ray.stages.links import href_host, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_und(t: pa.Table) -> pa.Table:
        src = pa.array([href_host(u) for u in t.column("url").to_pylist()], pa.string())
        dst = pa.array([href_host(h) for h in t.column("href").to_pylist()], pa.string())
        lo = pc.min_element_wise(src, dst)
        hi = pc.max_element_wise(src, dst)
        out = pa.table({"u": lo, "v": hi})
        return out.filter(pc.invert(pc.equal(out.column("u"), out.column("v"))))

    und = distinct_rows(links.map_batches(to_und, batch_format="pyarrow"), ["u", "v"])

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"host": t.column("u")}), pa.table({"host": t.column("v")})]
        )

    deg = partial_group_agg(
        und.map_batches(endpoints, batch_format="pyarrow"), ["host"], count_alias="degree"
    )
    return partial_group_agg(
        deg.select_columns(["degree"]), ["degree"], count_alias="n_hosts"
    )


def _kcore_oracle(k: int = 3, rounds: int = 12) -> str:
    """Unrolled k-core peeling as DuckDB SQL (MATERIALIZED CTEs — each
    round references the previous alive set several times, the same
    inlining hazard as `_pagerank_oracle`).  a_r = hosts whose degree
    over edges with BOTH ends in a_{r-1} is >= k; once a_r == a_{r-1}
    further rounds are no-ops, so unrolling past convergence is safe
    (engine raises past 64 rounds; these host graphs converge in a
    handful — verified at sf0.001/0.01/0.1)."""
    its = []
    prev = "a0"
    for r in range(1, rounds + 1):
        cur = f"a{r}"
        its.append(f"""
{cur} AS MATERIALIZED (
  SELECT host FROM (
    SELECT e.u AS host FROM und e
    WHERE e.u IN (SELECT host FROM {prev}) AND e.v IN (SELECT host FROM {prev})
    UNION ALL
    SELECT e.v FROM und e
    WHERE e.u IN (SELECT host FROM {prev}) AND e.v IN (SELECT host FROM {prev})
  ) GROUP BY host HAVING COUNT(*) >= {k})""")
        prev = cur
    return f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
kk AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM kk),
de AS (SELECT DISTINCT src, slug || '.example' AS dst FROM e0 WHERE slug <> ''),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM de WHERE src <> dst),
a0 AS MATERIALIZED (SELECT u AS host FROM und UNION SELECT v FROM und),
{",".join(its)}
SELECT host, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
  SELECT e.u AS host FROM und e
  WHERE e.u IN (SELECT host FROM {prev}) AND e.v IN (SELECT host FROM {prev})
  UNION ALL
  SELECT e.v FROM und e
  WHERE e.u IN (SELECT host FROM {prev}) AND e.v IN (SELECT host FROM {prev})
) GROUP BY host
"""


@register("kcore_hosts", oracle=_kcore_oracle())
def kcore_hosts_query(sf_dir: str):
    """3-core of the undirected host graph, ORACLE-CHECKED (r5
    promotion): the peeling fixpoint is replayed in DuckDB as unrolled
    MATERIALIZED CTEs (`_kcore_oracle` — the `_pagerank_oracle`
    pattern), on the same SQL-reconstructible edge table.  Also pinned
    by a dense-reference equality test in tests/test_links.py.  Every
    emitted member carries its in-core degree — all core_degree >= 3."""
    from document_ai_ray.stages.links import href_host, kcore_hosts, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    return kcore_hosts(links.map_batches(to_edges, batch_format="pyarrow"), k=3)


_CRAWL_BUDGET = 1000

_BUDGET_ALLOC_ORACLE = f"""
WITH pr AS ({_pagerank_oracle()}),
mr AS (SELECT host, CAST(ROUND(rank * 1000000, 0) AS BIGINT) AS m FROM pr),
s AS (SELECT SUM(m) AS sm FROM mr),
q AS (SELECT host, m,
             ({_CRAWL_BUDGET} * m) // s.sm AS fl,
             ({_CRAWL_BUDGET} * m) % s.sm AS rem
      FROM mr, s),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rn,
             (SELECT {_CRAWL_BUDGET} - SUM(fl) FROM q) AS leftover
      FROM q)
SELECT host, CAST(fl + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r
"""


@register("crawl_budget_alloc", oracle=_BUDGET_ALLOC_ORACLE)
def crawl_budget_alloc(sf_dir: str):
    """Per-host crawl-budget apportionment: 1000 fetches split across
    hosts PROPORTIONAL TO PAGERANK by the largest-remainder method —
    the politeness-aware scheduler step between link analysis and the
    fetch queue.  All allocation arithmetic is INTEGER (micro-ranks
    from the ROUND(rank,6) PageRank output, floor = B*m // Σm,
    remainder seats by B*m % Σm DESC then host), so engine and oracle
    agree bit-for-bit with no float-order risk; the oracle composes
    the unrolled PageRank fixpoint CTE.  The rank table is
    host-cardinality — the same driver bound PageRank itself accepts."""
    import numpy as np

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

    pr = pagerank_hosts(links.map_batches(to_edges, batch_format="pyarrow"), iters=10)
    t = pr.to_pandas()  # host-cardinality (the PageRank driver bound)
    m = np.floor(t["rank"].to_numpy() * 1_000_000 + 0.5).astype(np.int64)
    sm = int(m.sum())
    fl = (_CRAWL_BUDGET * m) // sm
    rem = (_CRAWL_BUDGET * m) % sm
    leftover = _CRAWL_BUDGET - int(fl.sum())
    order = np.lexsort((t["host"].to_numpy(), -rem))  # rem DESC, host ASC
    quota = fl.copy()
    quota[order[:leftover]] += 1
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "host": pa.array(t["host"].to_list(), pa.string()),
                "quota": pa.array(quota, pa.int64()),
            }
        )
    )


_PAGINATION_ORACLE = """
SELECT doc_id, CAST((doc_id // 4) * 4 AS BIGINT) AS chain_id,
       CAST(doc_id % 4 AS BIGINT) AS pos
FROM documents
"""


@register("pagination_chains", oracle=_PAGINATION_ORACLE)
def pagination_chains(sf_dir: str):
    """Multi-page article reconstruction from `<link rel=next/prev>`
    pagination links — the crawl step that stitches page 1/2/3/4 of one
    article back into a unit before extraction.  Pages carry REAL head
    links (plus decoys: a commented-out rel=next and a body-region link
    that the head-terminated scan must ignore); the rel=next edges feed
    the distributed connected-components labeler (chain id = min page id
    in the chain), and within-chain position is a per-chain rank in a
    chain-hash bucketed pass (chains are bucket-disjoint; page order ==
    page id order, the fixture's pagination order).  The oracle rebuilds
    chain/pos from the construction spec."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.stages.cluster import assign_clusters, connected_components
    from document_ai_ray.stages.html_meta import head_rel_links

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()

    def build(t: pa.Table) -> pa.Table:
        ids, htmls = [], []
        for d in t.column("doc_id").to_pylist():
            pos = d % 4
            links = []
            if pos > 0:
                links.append(f'<link rel="prev" href="doc://{d - 1}">')
            if pos < 3 and d + 1 < n_docs:
                links.append(f'<LINK REL="next" HREF="doc://{d + 1}">')
            page = (
                "<html><head><title>p</title>"
                '<!-- <link rel="next" href="doc://999999"> -->'
                f'{"".join(links)}</head>'
                '<body><link rel="next" href="doc://888888"></body></html>'
            )
            ids.append(d)
            htmls.append(page.encode("utf-8"))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "html": pa.array(htmls, pa.binary())}
        )

    pages = docs.map_batches(build, batch_format="pyarrow")

    def to_edges(t: pa.Table) -> pa.Table:
        a, b = [], []
        for d, h in zip(t.column("doc_id").to_pylist(), t.column("html").to_pylist()):
            rel = head_rel_links(h, rels=("next",))
            nxt = rel.get("next")
            if nxt:
                other = int(nxt.removeprefix("doc://"))
                a.append(min(d, other))
                b.append(max(d, other))
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    comps = connected_components(pages.map_batches(to_edges, batch_format="pyarrow"))
    assigned = assign_clusters(docs, comps)  # singleton tail chains keep own id
    P = auto_buckets(n_docs)

    def tag(t: pa.Table) -> pa.Table:
        c = t.column("cluster_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "bk", pa.array(((c * np.uint64(2654435761)) % np.uint64(P)).astype(np.int64))
        )

    def rank_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "doc_id"], kind="mergesort")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "chain_id": df["cluster_id"].astype("int64"),
                "pos": df.groupby("cluster_id").cumcount().astype("int64"),
            }
        )

    return bucket_map_groups(
        assigned.map_batches(tag, batch_format="pyarrow"),
        "bk",
        rank_in_bucket,
        P,
        batch_format="pandas",
    )


# -- Host co-citation ------------------------------------------------------

_COCITATION_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT DISTINCT src, slug || '.example' AS dst FROM e0 WHERE slug <> '')
SELECT a.src AS host_a, b.src AS host_b, COUNT(*) AS n_common
FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
GROUP BY 1, 2
"""


@register("host_cocitation_pairs", oracle=_COCITATION_ORACLE)
def host_cocitation_pairs(sf_dir: str):
    """Co-citation strength between source hosts: for every unordered
    host pair, the number of DISTINCT destination hosts both link to —
    the classic related-site signal (two sites are similar if the web
    cites them onto the same targets).  Shape: real-HTML edge
    extraction -> distinct edges -> one hash(dst) exchange (every edge
    of a destination lands in one bucket, so the pair expansion is a
    bucket-local self-merge) -> per-bucket (host_a, host_b) partial
    counts ride the combiner.  Pair cardinality is bounded by the
    source-host vocabulary, never by the edge count."""
    import pandas as pd

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        distinct_rows,
        merge_partials,
    )
    from document_ai_ray.stages.links import href_host, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    edges = distinct_rows(
        links.map_batches(to_edges, batch_format="pyarrow"), ["src", "dst"]
    )
    P = auto_buckets(edges.count())

    def dst_bucket(t: pa.Table) -> pa.Table:
        bk = [stable64(d) % P for d in t.column("dst").to_pylist()]
        return t.append_column("bk", pa.array(bk, pa.int64()))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"host_a": pd.Series([], dtype="object"),
                 "host_b": pd.Series([], dtype="object"),
                 "n": pd.Series([], dtype="int64")}
            )
        m = df.merge(df, on="dst")
        m = m[m["src_x"] < m["src_y"]]
        g = m.groupby(["src_x", "src_y"], as_index=False).size()
        return pd.DataFrame(
            {"host_a": g["src_x"], "host_b": g["src_y"], "n": g["size"].astype("int64")}
        )

    parts = bucket_map_groups(
        edges.map_batches(dst_bucket, batch_format="pyarrow"),
        "bk",
        pairs_in_bucket,
        P,
        batch_format="pandas",
    )
    merged = merge_partials(parts, ["host_a", "host_b"], {"n": "sum"})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host_a": t.column("host_a"),
                "host_b": t.column("host_b"),
                "n_common": t.column("n"),
            }
        )

    return merged.map_batches(rename, batch_format="pyarrow")


# -- Degree assortativity --------------------------------------------------

_ASSORT_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT DISTINCT src, slug || '.example' AS dst FROM e0 WHERE slug <> ''),
od AS (SELECT src, COUNT(*) AS xd FROM edges GROUP BY 1),
idg AS (SELECT dst, COUNT(*) AS yd FROM edges GROUP BY 1),
j AS (SELECT od.xd AS x, idg.yd AS y
      FROM edges e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst),
m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM j)
SELECT n,
       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0.0
            ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                          * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)
       END AS assortativity
FROM m
"""


@register("host_assortativity", oracle=_ASSORT_ORACLE)
def host_assortativity(sf_dir: str):
    """Degree assortativity of the directed host graph: Pearson
    correlation, over DISTINCT edges, of (out-degree of source,
    in-degree of destination) — do hubby sites link to hubby sites?
    Degrees are integers, so every shuffled moment partial is exact
    int64 and the single float division happens once in the one-row
    final.  The source-side out-degree map is source-vocabulary sized
    (broadcast); the destination in-degrees join through one hash(dst)
    exchange."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        distinct_rows,
        merge_partials,
    )
    from document_ai_ray.stages.links import href_host, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    edges = distinct_rows(
        links.map_batches(to_edges, batch_format="pyarrow"), ["src", "dst"]
    ).materialize()
    P = auto_buckets(edges.count())

    # out-degree per source host: source-vocabulary sized -> driver map
    def src_one(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t.column("src"),
             "one": pa.array(np.ones(len(t), np.int64))}
        )

    od = {
        r["src"]: r["one"]
        for r in merge_partials(
            edges.map_batches(src_one, batch_format="pyarrow"), ["src"], {"one": "sum"}
        ).take_all()
    }

    def dst_bucket(t: pa.Table) -> pa.Table:
        bk = [stable64(d) % P for d in t.column("dst").to_pylist()]
        return t.append_column("bk", pa.array(bk, pa.int64()))

    _M = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in _M})
        yd = df.groupby("dst")["src"].transform("size").to_numpy().astype(np.int64)
        x = df["src"].map(od).to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"n": [len(df)], "sx": [int(x.sum())], "sy": [int(yd.sum())],
             "sxx": [int(np.dot(x, x))], "syy": [int(np.dot(yd, yd))],
             "sxy": [int(np.dot(x, yd))]}
        )

    parts = bucket_map_groups(
        edges.map_batches(dst_bucket, batch_format="pyarrow"), "bk", moments, P,
        batch_format="pandas",
    )

    def finish(t: pa.Table) -> pa.Table:
        n, sx, sy, sxx, syy, sxy = (
            int(t.column(c).to_numpy(zero_copy_only=False).sum()) for c in _M
        )
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        if vx == 0 or vy == 0:
            # degenerate (all degrees equal on one axis, e.g. a
            # saturated bipartite-complete graph): define r = 0,
            # mirrored in the oracle's CASE
            r = 0.0
        else:
            num = float(n * sxy - sx * sy)
            den = float(np.sqrt(float(vx))) * float(np.sqrt(float(vy)))
            r = num / den
            r = float(np.copysign(np.floor(abs(r) * 1e6 + 0.5), r) / 1e6)
        return pa.table({"n": pa.array([n], pa.int64()),
                         "assortativity": pa.array([r], pa.float64())})

    return parts.repartition(1).map_batches(finish, batch_format="pyarrow", batch_size=1 << 30)


# -- Personalized PageRank ---------------------------------------------------

_PPR_ITERS = 10


def _ppr_oracle(iters: int = _PPR_ITERS, round_to: int = 6) -> str:
    """Unrolled personalized PageRank as DuckDB SQL, one MATERIALIZED
    CTE pair (dangling mass, next vector) per iteration — mirroring the
    engine expression exactly: v_k(h) = 0.85 * sum_e w*(v/W) +
    [h = seed]*(0.15 + 0.85*dangling).  Sum-order drift ~1e-15 under
    the 1e-6 grid (the hits/pagerank precedent)."""
    its = []
    prev = "v0"
    for k in range(1, iters + 1):
        its.append(f"""
d{k} AS MATERIALIZED (
  SELECT COALESCE(SUM(p.v), 0.0) AS dm
  FROM {prev} p LEFT JOIN outw o ON o.src = p.host WHERE o.src IS NULL),
v{k} AS MATERIALIZED (
  SELECT h.host,
         0.85 * COALESCE(s.c, 0.0)
         + CASE WHEN h.host = (SELECT s FROM seed)
                THEN 0.15 + 0.85 * (SELECT dm FROM d{k}) ELSE 0.0 END AS v
  FROM h LEFT JOIN (SELECT e.dst AS host, SUM(e.w * (p.v / o.wout)) AS c
                    FROM edges e JOIN {prev} p ON e.src = p.host
                    JOIN outw o ON o.src = e.src GROUP BY 1) s
  USING (host))""")
        prev = f"v{k}"
    return f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT src, slug || '.example' AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM e0 WHERE slug <> '' GROUP BY 1, 2),
outw AS MATERIALIZED (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1),
hosts AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges),
h AS MATERIALIZED (SELECT host FROM hosts),
seed AS MATERIALIZED (SELECT MIN(src) AS s FROM edges),
v0 AS MATERIALIZED (
  SELECT host, CASE WHEN host = (SELECT s FROM seed) THEN 1.0 ELSE 0.0 END AS v
  FROM h),
{",".join(its)}
SELECT host, ROUND(v, {round_to}) AS ppr FROM v{iters}
"""


@register("ppr_from_host", oracle=_ppr_oracle())
def ppr_from_host(sf_dir: str):
    """Personalized PageRank seeded at the lexicographically-first
    source host (damping 0.85, dangling mass returned to the seed, 10
    iterations) — the related-site / crawl-prioritization walk from a
    trust seed.  Same scale shape as pagerank/HITS: weighted host-pair
    edges materialized ONCE, each iteration is one streaming pass
    emitting sparse (dst_idx, contrib) partials, only host-sized
    vectors on the driver."""
    import numpy as np
    import pandas as pd

    import ray

    from document_ai_ray.pipelines.ops import (
        get_broadcast,
        merge_partials,
        partial_group_agg,
    )
    from document_ai_ray.stages.links import (
        _collect,
        _sparse_contrib,
        distinct_rows,
        href_host,
        page_outlinks,
    )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    wedges = partial_group_agg(
        links.map_batches(to_edges, batch_format="pyarrow"), keys=["src", "dst"],
        count_alias="w",
    ).materialize()

    src_tbl = _collect(distinct_rows(wedges.select_columns(["src"]), ["src"]))
    dst_tbl = _collect(distinct_rows(wedges.select_columns(["dst"]), ["dst"]))
    srcs = set(src_tbl.column("src").to_pylist())
    hosts = sorted(srcs | set(dst_tbl.column("dst").to_pylist()))
    n = len(hosts)
    host_idx = pd.Index(hosts)
    seed = min(srcs)
    seed_i = host_idx.get_loc(seed)

    # out-strength per host (0 for dangling dst-only hosts)
    ow = _collect(
        merge_partials(
            wedges.map_batches(
                lambda t: pa.table(
                    {"src": t.column("src"),
                     "w": t.column("w").cast(pa.float64())}
                ),
                batch_format="pyarrow",
            ),
            ["src"],
            {"w": "sum"},
        )
    )
    W = np.zeros(n, np.float64)
    W[host_idx.get_indexer(ow.column("src").to_pylist())] = ow.column("w").to_numpy(
        zero_copy_only=False
    )
    static_ref = (ray.put(host_idx),)

    v = np.zeros(n, np.float64)
    v[seed_i] = 1.0
    for _ in range(_PPR_ITERS):
        ratio = np.divide(v, W, out=np.zeros_like(v), where=W > 0)
        vref = (ray.put(ratio),)

        def contrib(t: pa.Table, _vref=vref) -> pa.Table:
            idx = get_broadcast(static_ref, tag="ppr_static")
            r = get_broadcast(_vref, tag="ppr_vec")
            si = idx.get_indexer(t.column("src").to_pylist())
            di = idx.get_indexer(t.column("dst").to_pylist())
            ew = t.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
            return _sparse_contrib(di, ew * r[si])

        merged = _collect(
            merge_partials(
                wedges.map_batches(contrib, batch_format="pyarrow"),
                keys=["dst_idx"],
                agg_funcs={"c": "sum"},
            )
        )
        c = np.zeros(n, np.float64)
        c[merged.column("dst_idx").to_numpy(zero_copy_only=False)] = merged.column(
            "c"
        ).to_numpy(zero_copy_only=False)
        dang = float(v[W == 0].sum())
        v = 0.85 * c
        v[seed_i] += 0.15 + 0.85 * dang

    out = np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6
    return pa.table(
        {"host": pa.array(hosts, pa.string()), "ppr": pa.array(out, pa.float64())}
    )


# -- Resource-allocation link prediction -------------------------------------

_RA_ORACLE = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
k AS (SELECT source, unnest(generate_series(1, LEAST(len(ws), {_N_WORDS}))) AS i, ws FROM w),
e0 AS (SELECT source || '.example' AS src,
              regexp_replace(lower(ws[i]), '[^a-z0-9]', '', 'g') AS slug FROM k),
edges AS MATERIALIZED (
  SELECT DISTINCT src, slug || '.example' AS dst FROM e0 WHERE slug <> ''),
idg AS (SELECT dst, COUNT(*) AS m FROM edges GROUP BY 1),
pairs AS (SELECT a.src AS host_a, b.src AS host_b, 1000000000 // i.m AS wgt
          FROM edges a JOIN edges b ON a.dst = b.dst AND a.src < b.src
          JOIN idg i ON i.dst = a.dst)
SELECT host_a, host_b, CAST(SUM(wgt) AS BIGINT) AS ra_nano, COUNT(*) AS n_common
FROM pairs GROUP BY 1, 2
"""


@register("resource_allocation_linkpred", oracle=_RA_ORACLE)
def resource_allocation_linkpred(sf_dir: str):
    """Resource-allocation link prediction (Zhou/Lu/Zhang 2009) over
    the source-host out-link graph: for every host pair sharing >= 1
    common out-neighbor, RA = sum over common neighbors w of
    1/indeg(w).  Each term is the EXACT integer 10^9 // indeg (integer
    division on both engines), so the per-pair sums are order-free —
    no cross-engine float accumulation.  Same single hash(dst)
    exchange as co-citation: an edge's destination owns its bucket, so
    indeg and the pair expansion are both bucket-local; only
    (pair, weight) partials ride the combiner."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import (
        bucket_map_groups,
        distinct_rows,
        merge_partials,
    )
    from document_ai_ray.stages.links import href_host, page_outlinks

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    links = page_outlinks(_link_pages(docs, src_host_url=True))

    def to_edges(t: pa.Table) -> pa.Table:
        src = [href_host(u) for u in t.column("url").to_pylist()]
        dst = [href_host(h) for h in t.column("href").to_pylist()]
        return pa.table(
            {"src": pa.array(src, pa.string()), "dst": pa.array(dst, pa.string())}
        )

    edges = distinct_rows(
        links.map_batches(to_edges, batch_format="pyarrow"), ["src", "dst"]
    )
    P = auto_buckets(edges.count())

    def dst_bucket(t: pa.Table) -> pa.Table:
        bk = [stable64(d) % P for d in t.column("dst").to_pylist()]
        return t.append_column("bk", pa.array(bk, pa.int64()))

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"host_a": "object", "host_b": "object", "ra": "int64", "n": "int64"}
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        # indeg is exact here: every edge of a dst hashes to this bucket
        df = df.merge(df.groupby("dst", as_index=False).size(), on="dst")
        df["wgt"] = (10**9 // df["size"]).astype("int64")
        m = df.merge(df, on="dst")
        m = m[m["src_x"] < m["src_y"]]
        g = m.groupby(["src_x", "src_y"], as_index=False).agg(
            ra=("wgt_x", "sum"), n=("wgt_x", "size")
        )
        return pd.DataFrame(
            {"host_a": g["src_x"], "host_b": g["src_y"],
             "ra": g["ra"].astype("int64"), "n": g["n"].astype("int64")}
        )

    parts = bucket_map_groups(
        edges.map_batches(dst_bucket, batch_format="pyarrow"),
        "bk",
        pairs_in_bucket,
        P,
        batch_format="pandas",
    )
    merged = merge_partials(parts, ["host_a", "host_b"], {"ra": "sum", "n": "sum"})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host_a": t.column("host_a"),
                "host_b": t.column("host_b"),
                "ra_nano": t.column("ra"),
                "n_common": t.column("n"),
            }
        )

    return merged.map_batches(rename, batch_format="pyarrow")


# -- Redirect-chain resolution (pointer jumping) -----------------------------

_REDIR_ORACLE = """
WITH RECURSIVE e AS (SELECT doc_id AS u, doc_id - (doc_id % 8) + (doc_id % 8 - 1) AS v
                     FROM documents WHERE doc_id % 8 <> 0),
walk AS (
  SELECT u AS start, v AS cur, 1 AS hops FROM e
  UNION ALL
  SELECT w.start, e.v, w.hops + 1 FROM walk w JOIN e ON e.u = w.cur
)
SELECT w.start AS doc_id, w.cur AS final_target, w.hops
FROM walk w
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = w.cur)
"""


@register("resolve_redirect_chains", oracle=_REDIR_ORACLE)
def resolve_redirect_chains(sf_dir: str):
    """Transitive redirect resolution by POINTER JUMPING: each round
    composes the mapping with itself (m <- m[m]) through a bucketed
    hash join, so an L-hop chain resolves in ceil(log2 L) rounds of
    bounded shuffles — the parallel-graph classic (no per-chain
    walking anywhere).  The synthetic redirect graph chains every
    non-multiple-of-8 doc one step down (chains of length 1-7); the
    oracle walks the same edges with a recursive CTE.  Hop counts are
    carried through the composition (hops(u) = hops(u) + hops(m(u)))
    so the output also certifies the chain LENGTHS, not just the
    endpoints."""
    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.ops import bucket_map_groups

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()
    P = auto_buckets(n_docs)

    def edges(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (d % 8) != 0
        u = d[keep]
        v = u - 1
        return pa.table(
            {"u": pa.array(u), "v": pa.array(v),
             "hops": pa.array(np.ones(len(u), np.int64)),
             "done": pa.array(np.zeros(len(u), bool))}
        )

    m = docs.map_batches(edges, batch_format="pyarrow").materialize()

    # pointer jumping: join m against itself on v = u'.  A row whose
    # target is terminal (no outgoing edge) freezes.  log2(7) < 3 ->
    # at most 3 rounds here; the loop detects the fixpoint generically.
    for _ in range(40):  # 2^40 hops >> any real redirect chain
        if m.filter(expr="done == False").count() == 0:
            break

        def bucket_both(t: pa.Table) -> pa.Table:
            # probe copy hashes on its TARGET v; build copy on its key u
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            bk_p = (v.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
            bk_b = (u.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(P)
            n = len(u)
            both = pa.table(
                {"u": pa.array(np.concatenate([u, u])),
                 "v": pa.array(np.concatenate([v, v])),
                 "hops": pa.array(
                     np.concatenate([t.column("hops").to_numpy(zero_copy_only=False)] * 2)
                 ),
                 "done": pa.array(
                     np.concatenate([t.column("done").to_numpy(zero_copy_only=False)] * 2)
                 ),
                 "is_build": pa.array(
                     np.concatenate([np.zeros(n, bool), np.ones(n, bool)])
                 ),
                 "bk": pa.array(
                     np.concatenate([bk_p, bk_b]).astype(np.int64)
                 )}
            )
            return both

        def compose(df: pd.DataFrame) -> pd.DataFrame:
            left = df[~df["is_build"]][["u", "v", "hops", "done"]]
            right = df[df["is_build"]][["u", "v", "hops"]].rename(
                columns={"u": "u2", "v": "v2", "hops": "hops2"}
            )
            j = left.merge(right, left_on="v", right_on="u2", how="left")
            hit = j["u2"].notna() & ~j["done"]
            j.loc[hit, "v"] = j.loc[hit, "v2"]
            j.loc[hit, "hops"] = j.loc[hit, "hops"] + j.loc[hit, "hops2"]
            j.loc[~hit, "done"] = True  # target is terminal: frozen
            return pd.DataFrame(
                {"u": j["u"].astype("int64"), "v": j["v"].astype("int64"),
                 "hops": j["hops"].astype("int64"), "done": j["done"].astype(bool)}
            )

        m = bucket_map_groups(
            m.map_batches(bucket_both, batch_format="pyarrow"), "bk", compose, P,
            batch_format="pandas",
        ).materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("u"), "final_target": t.column("v"),
             "hops": t.column("hops")}
        )

    return m.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Closeness centrality over the consecutive-anchor host graph: BFS from
# EVERY host (8-hop horizon, the same edge derivation as
# bfs_host_distance), closeness = (n_reach) / sum(dist).  The oracle
# replays the all-pairs BFS as unrolled MATERIALIZED frontier CTEs
# keyed by (root, host).
# ---------------------------------------------------------------------------


def _allpairs_bfs_cte(max_hops: int = 8) -> str:
    """Shared WITH-body: anchor-pair edge derivation + all-pairs BFS to
    `dist(root, host, d)` — composed by the closeness and
    mutual-reachability oracles."""
    levels = []
    prev = "r0"
    for k in range(1, max_hops + 1):
        cur = f"r{k}"
        levels.append(f"""
{cur} AS MATERIALIZED (
  SELECT DISTINCT p.root, e.dst AS host, {k} AS d
  FROM {prev} p JOIN edges e ON e.src = p.host)""")
        prev = cur
    union = " UNION ALL ".join(f"SELECT root, host, d FROM r{k}" for k in range(max_hops + 1))
    return f"""
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
W AS (SELECT list_filter(
        list_transform(ws[1:LEAST(len(ws), {_N_WORDS})],
                       x -> regexp_replace(lower(x), '[^a-z0-9]', '', 'g')),
        s -> s <> '') AS sl FROM t),
p AS (SELECT unnest(generate_series(1, len(sl) - 1)) AS i, sl FROM W WHERE len(sl) >= 2),
edges AS MATERIALIZED (
  SELECT DISTINCT sl[i] || '.example' AS src, sl[i + 1] || '.example' AS dst FROM p),
hosts AS MATERIALIZED (
  SELECT DISTINCT h AS host FROM (SELECT src AS h FROM edges UNION SELECT dst FROM edges)),
r0 AS MATERIALIZED (SELECT host AS root, host, 0 AS d FROM hosts),
{",".join(levels)},
dist AS (SELECT root, host, MIN(d) AS d FROM ({union}) GROUP BY 1, 2)"""


def _closeness_oracle(max_hops: int = 8) -> str:
    return _allpairs_bfs_cte(max_hops) + """
SELECT root AS host,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reach,
       CAST(SUM(d) AS BIGINT) AS sum_dist,
       CASE WHEN SUM(d) > 0
            THEN ROUND(CAST(COUNT(*) - 1 AS DOUBLE) / SUM(d), 6)
            ELSE 0.0 END AS closeness
FROM dist GROUP BY 1
"""  # noqa: E501


@register("closeness_centrality_hosts", oracle=_closeness_oracle())
def closeness_centrality_hosts(sf_dir: str):
    """8-hop closeness centrality per host (the 'how central is this
    site' rank behind crawl prioritization).  Edge extraction + the
    distinct-edge dedup run distributed; the all-pairs BFS itself runs
    on the driver over the HOST-sized adjacency — the same documented
    host-cardinality bound as PageRank's rank table (closeness is
    inherently O(H*E); at web scale you run it on sampled pivot roots,
    which this driver loop models exactly)."""
    from collections import deque

    import numpy as np

    from document_ai_ray.pipelines.ops import distinct_rows
    from document_ai_ray.stages.links import page_outlink_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    edges = page_outlink_pairs(_link_pages(docs))
    e = distinct_rows(edges, ["src", "dst"]).take_all()  # host^2-bounded
    adj: dict[str, list[str]] = {}
    hosts: set[str] = set()
    for r in e:
        hosts.add(r["src"])
        hosts.add(r["dst"])
        adj.setdefault(r["src"], []).append(r["dst"])
    out = {"host": [], "n_reach": [], "sum_dist": [], "closeness": []}
    for root in sorted(hosts):
        dist = {root: 0}
        dq = deque([root])
        while dq:
            u = dq.popleft()
            d = dist[u]
            if d == 8:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d + 1
                    dq.append(v)
        n_reach = len(dist) - 1
        sum_d = sum(dist.values())
        clos = float(np.floor(n_reach / sum_d * 1e6 + 0.5) / 1e6) if sum_d > 0 else 0.0
        out["host"].append(root)
        out["n_reach"].append(n_reach)
        out["sum_dist"].append(sum_d)
        out["closeness"].append(clos)
    return pa.table(
        {"host": pa.array(out["host"], pa.string()),
         "n_reach": pa.array(out["n_reach"], pa.int64()),
         "sum_dist": pa.array(out["sum_dist"], pa.int64()),
         "closeness": pa.array(out["closeness"], pa.float64())}
    )


# ---------------------------------------------------------------------------
# Mutual-reachability components (8-hop SCC approximation): hosts u, v
# share a component iff each reaches the other within the BFS horizon;
# the component id is the MIN host label of the mutual set.  Same
# all-pairs BFS substrate as closeness.
# ---------------------------------------------------------------------------


def _mutual_reach_oracle(max_hops: int = 8) -> str:
    return _allpairs_bfs_cte(max_hops) + """,
m AS (SELECT a.root AS u, a.host AS v
      FROM dist a JOIN dist b ON b.root = a.host AND b.host = a.root)
SELECT u AS host, MIN(v) AS comp_id, CAST(COUNT(*) AS BIGINT) AS comp_size
FROM m GROUP BY 1
"""


@register("mutual_reach_components", oracle=_mutual_reach_oracle())
def mutual_reach_components(sf_dir: str):
    """Strongly-connected-style components under 8-hop MUTUAL
    reachability (u and v each reach the other), labeled by the MIN
    host of the set — the link-graph spam/cluster lens next to the
    undirected connected components.  Same distributed edge build +
    driver-side host-bounded BFS as closeness_centrality_hosts."""
    from collections import deque

    from document_ai_ray.pipelines.ops import distinct_rows
    from document_ai_ray.stages.links import page_outlink_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    edges = page_outlink_pairs(_link_pages(docs))
    e = distinct_rows(edges, ["src", "dst"]).take_all()  # host^2-bounded
    adj: dict[str, list[str]] = {}
    hosts: set[str] = set()
    for r in e:
        hosts.add(r["src"])
        hosts.add(r["dst"])
        adj.setdefault(r["src"], []).append(r["dst"])
    reach: dict[str, set[str]] = {}
    for root in hosts:
        dist = {root: 0}
        dq = deque([root])
        while dq:
            u = dq.popleft()
            d = dist[u]
            if d == 8:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d + 1
                    dq.append(v)
        reach[root] = set(dist)
    out = {"host": [], "comp_id": [], "comp_size": []}
    for u in sorted(hosts):
        mutual = [v for v in reach[u] if u in reach[v]]
        out["host"].append(u)
        out["comp_id"].append(min(mutual))
        out["comp_size"].append(len(mutual))
    return pa.table(
        {"host": pa.array(out["host"], pa.string()),
         "comp_id": pa.array(out["comp_id"], pa.string()),
         "comp_size": pa.array(out["comp_size"], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Betweenness + stress centrality (8-hop horizon): how much shortest-
# path traffic flows THROUGH each host — the crawl-chokepoint /
# link-spam lens next to closeness.  All arithmetic is exact: stress
# is the integer count of shortest paths through v (Shimbel), and
# betweenness is accumulated as per-(s,t) floor-quantized micro terms
# floor(1e6 * sig(s,v)*sig(v,t) / sig(s,t)) — per-term flooring makes
# the sum order-free, so both engines add the SAME integers (the int8
# quantization / MWU trick).  The oracle extends the shared all-pairs
# BFS CTE with unrolled sigma (shortest-path count) levels.
# ---------------------------------------------------------------------------


def _betweenness_oracle(max_hops: int = 8) -> str:
    levels = []
    prev = "s0"
    for k in range(1, max_hops + 1):
        cur = f"s{k}"
        levels.append(f"""
{cur} AS MATERIALIZED (
  SELECT p.root, e.dst AS host, {k} AS d, CAST(SUM(p.sig) AS BIGINT) AS sig
  FROM {prev} p JOIN edges e ON e.src = p.host
  JOIN dist dd ON dd.root = p.root AND dd.host = e.dst AND dd.d = {k}
  GROUP BY 1, 2, 3)""")
        prev = cur
    union = " UNION ALL ".join(
        f"SELECT root, host, d, sig FROM s{k}" for k in range(max_hops + 1)
    )
    return _allpairs_bfs_cte(max_hops) + f""",
s0 AS MATERIALIZED (SELECT host AS root, host, 0 AS d, CAST(1 AS BIGINT) AS sig FROM hosts),
{",".join(levels)},
sg AS MATERIALIZED (SELECT * FROM ({union})),
pr AS (SELECT root AS s, host AS t, d AS D, sig AS s_st FROM sg WHERE root <> host),
mid AS (SELECT m1.host AS v, CAST(m1.sig AS HUGEINT) * m2.sig AS np, p.s_st
        FROM pr p
        JOIN sg m1 ON m1.root = p.s AND m1.host <> p.s AND m1.host <> p.t
        JOIN sg m2 ON m2.root = m1.host AND m2.host = p.t
        WHERE m1.d + m2.d = p.D),
agg AS (SELECT v AS host, CAST(SUM(np) AS BIGINT) AS stress,
               CAST(SUM(CAST(1000000 AS HUGEINT) * np // s_st) AS BIGINT) AS btw_micro
        FROM mid GROUP BY 1)
SELECT h.host, COALESCE(a.stress, 0) AS stress,
       COALESCE(a.btw_micro, 0) AS btw_micro
FROM hosts h LEFT JOIN agg a ON a.host = h.host
"""


@register("betweenness_centrality_hosts", oracle=_betweenness_oracle())
def betweenness_centrality_hosts(sf_dir: str):
    """Directed betweenness (micro-quantized) + stress centrality per
    host under the 8-hop BFS horizon.  Edge extraction + distinct-edge
    dedup run distributed; the Brandes-style all-pairs pass runs on the
    driver over the HOST-bounded adjacency (same documented
    O(H^2)-state bound as closeness; at web scale you sample pivot
    roots).  Python big-ints throughout — sigma products can exceed
    int64 after the 1e6 scaling, and numpy would wrap silently."""
    from collections import deque

    from document_ai_ray.pipelines.ops import distinct_rows
    from document_ai_ray.stages.links import page_outlink_pairs

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    edges = page_outlink_pairs(_link_pages(docs))
    e = distinct_rows(edges, ["src", "dst"]).take_all()  # host^2-bounded
    adj: dict[str, list[str]] = {}
    hosts: set[str] = set()
    for r in e:
        hosts.add(r["src"])
        hosts.add(r["dst"])
        adj.setdefault(r["src"], []).append(r["dst"])

    dist: dict[str, dict[str, int]] = {}
    sig: dict[str, dict[str, int]] = {}
    for root in hosts:
        d = {root: 0}
        s = {root: 1}
        dq = deque([root])
        while dq:
            u = dq.popleft()
            du = d[u]
            if du == 8:
                continue
            for v in adj.get(u, ()):
                if v not in d:
                    d[v] = du + 1
                    dq.append(v)
                if d[v] == du + 1:
                    s[v] = s.get(v, 0) + s[u]
        dist[root] = d
        sig[root] = s

    stress = {h: 0 for h in hosts}
    btw = {h: 0 for h in hosts}
    for s_ in hosts:
        ds, ss = dist[s_], sig[s_]
        for t, D in ds.items():
            if t == s_:
                continue
            s_st = ss[t]
            for v, dsv in ds.items():
                if v == s_ or v == t:
                    continue
                dvt = dist[v].get(t)
                if dvt is None or dsv + dvt != D:
                    continue
                np_ = ss[v] * sig[v][t]
                stress[v] += np_
                btw[v] += (1000000 * np_) // s_st

    ordered = sorted(hosts)
    return pa.table(
        {"host": pa.array(ordered, pa.string()),
         "stress": pa.array([stress[h] for h in ordered], pa.int64()),
         "btw_micro": pa.array([btw[h] for h in ordered], pa.int64())}
    )
