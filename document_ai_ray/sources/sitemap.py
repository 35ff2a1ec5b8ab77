"""Sitemap XML source + sink (sitemaps.org protocol) — the crawl-side
URL-discovery format next to WARC (sources/warc.py) and robots
(functions/robots.py).

`<urlset>` carries per-URL entries (loc, lastmod, changefreq,
priority); a `<sitemapindex>` points at child sitemaps.  The parser is
a tolerant tag scanner in the same spirit as stages/html_meta.py —
attribute noise, namespace prefixes, whitespace and CDATA are
accepted; anything unparseable is skipped rather than raised (a crawl
meets malformed sitemaps constantly).
"""

from __future__ import annotations

import re

import pyarrow as pa

SITEMAP_SCHEMA = pa.schema(
    [
        ("loc", pa.string()),
        ("lastmod", pa.string()),
        ("priority", pa.float64()),
    ]
)

_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}


def _unescape(s: str) -> str:
    for k, v in _ENT.items():
        s = s.replace(k, v)
    return s


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def write_sitemap_xml(rows: list[dict]) -> bytes:
    """rows: [{loc, lastmod?, priority?}] -> <urlset> XML bytes."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for r in rows:
        parts.append("  <url>")
        parts.append(f"    <loc>{_escape(r['loc'])}</loc>")
        if r.get("lastmod"):
            parts.append(f"    <lastmod>{_escape(r['lastmod'])}</lastmod>")
        if r.get("priority") is not None:
            parts.append(f"    <priority>{r['priority']:.1f}</priority>")
        parts.append("  </url>")
    parts.append("</urlset>")
    return "\n".join(parts).encode("utf-8")


def write_sitemap_index(locs: list[str]) -> bytes:
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for loc in locs:
        parts.append(f"  <sitemap><loc>{_escape(loc)}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "\n".join(parts).encode("utf-8")


# tolerant: namespace prefixes (ns:loc), attributes, CDATA, any casing
_TAG = re.compile(
    rb"<(?:\w+:)?(url|sitemap|loc|lastmod|priority)(?:\s[^>]*)?>(.*?)</(?:\w+:)?\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_CDATA = re.compile(rb"^\s*<!\[CDATA\[(.*?)\]\]>\s*$", re.DOTALL)


def _text(payload: bytes) -> str:
    m = _CDATA.match(payload)
    if m:
        payload = m.group(1)
    return _unescape(payload.decode("utf-8", "replace").strip())


def parse_sitemap(b: bytes) -> list[dict]:
    """Sitemap bytes -> [{loc, lastmod, priority}] for a <urlset>, or
    [{loc, lastmod: '', priority: None}] per child for a
    <sitemapindex>.  Tolerant: entries without a <loc> are skipped;
    bad priorities become None."""
    out = []
    for m in _TAG.finditer(b):
        tag = m.group(1).lower()
        if tag not in (b"url", b"sitemap"):
            continue
        loc, lastmod, prio = None, "", None
        for im in _TAG.finditer(m.group(2)):
            itag = im.group(1).lower()
            if itag == b"loc":
                loc = _text(im.group(2))
            elif itag == b"lastmod":
                lastmod = _text(im.group(2))
            elif itag == b"priority":
                try:
                    prio = float(_text(im.group(2)))
                except ValueError:
                    prio = None
        if loc:
            out.append({"loc": loc, "lastmod": lastmod, "priority": prio})
    return out


# ---------------------------------------------------------------------------
# RSS 2.0 / Atom feeds — the other crawl-discovery XML family
# ---------------------------------------------------------------------------

_FEED_TAG = re.compile(
    rb"<(?:\w+:)?(item|entry|title|link|pubDate|updated|guid|id)(?:\s[^>]*)?"
    rb"(?:/>|>(.*?)</(?:\w+:)?\1\s*>)",
    re.DOTALL | re.IGNORECASE,
)
_HREF = re.compile(rb"""<(?:\w+:)?link[^>]*\bhref\s*=\s*["']([^"']+)["']""", re.IGNORECASE)


def write_rss(channel_title: str, items: list[dict]) -> bytes:
    """items: [{title, link, pubDate?, guid?}] -> RSS 2.0 bytes."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<rss version="2.0"><channel>',
        f"  <title>{_escape(channel_title)}</title>",
    ]
    for it in items:
        parts.append("  <item>")
        parts.append(f"    <title>{_escape(it['title'])}</title>")
        parts.append(f"    <link>{_escape(it['link'])}</link>")
        if it.get("pubDate"):
            parts.append(f"    <pubDate>{_escape(it['pubDate'])}</pubDate>")
        if it.get("guid"):
            parts.append(f"    <guid>{_escape(it['guid'])}</guid>")
        parts.append("  </item>")
    parts.append("</channel></rss>")
    return "\n".join(parts).encode("utf-8")


def write_atom(feed_title: str, entries: list[dict]) -> bytes:
    """entries: [{title, link, updated?, id?}] -> Atom 1.0 bytes (link
    carried the Atom way, as an href attribute)."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<feed xmlns="http://www.w3.org/2005/Atom">',
        f"  <title>{_escape(feed_title)}</title>",
    ]
    for e in entries:
        parts.append("  <entry>")
        parts.append(f"    <title>{_escape(e['title'])}</title>")
        parts.append(f'    <link href="{_escape(e["link"])}"/>')
        if e.get("updated"):
            parts.append(f"    <updated>{_escape(e['updated'])}</updated>")
        if e.get("id"):
            parts.append(f"    <id>{_escape(e['id'])}</id>")
        parts.append("  </entry>")
    parts.append("</feed>")
    return "\n".join(parts).encode("utf-8")


def parse_feed(b: bytes) -> list[dict]:
    """RSS <item> / Atom <entry> bytes -> [{title, link, ts}] — ts is
    pubDate (RSS) or updated (Atom), '' if absent.  Tolerant: either
    <link>text</link> or <link href="..."/>; entries without a link
    are skipped."""
    out = []
    for m in _FEED_TAG.finditer(b):
        tag = m.group(1).lower()
        if tag not in (b"item", b"entry") or m.group(2) is None:
            continue
        body = m.group(2)
        title, link, ts = "", "", ""
        for im in _FEED_TAG.finditer(body):
            itag = im.group(1).lower()
            payload = im.group(2)
            if itag == b"title" and payload is not None:
                title = _text(payload)
            elif itag == b"link" and payload is not None and payload.strip():
                link = _text(payload)
            elif itag in (b"pubdate", b"updated") and payload is not None:
                ts = _text(payload)
        if not link:
            hm = _HREF.search(body)
            if hm:
                link = _unescape(hm.group(1).decode("utf-8", "replace"))
        if link:
            out.append({"title": title, "link": link, "ts": ts})
    return out
