"""robots.txt REP semantics + sitemap tolerant-parse tests."""

from __future__ import annotations

from document_ai_ray.functions.robots import parse_robots, robots_allowed
from document_ai_ray.sources.sitemap import (
    parse_sitemap,
    write_sitemap_index,
    write_sitemap_xml,
)

ROBOTS = """
User-agent: *
Disallow: /private/

User-agent: graftbot
Disallow: /private/
Allow: /private/public/
Disallow: /*.pdf$
Allow: /tmp/open/
Disallow: /tmp/
"""


def test_robots_longest_match_and_wildcards():
    rules = parse_robots(ROBOTS, agent="graftbot")
    assert robots_allowed(rules, "/public/p1")  # no rule -> allow
    assert not robots_allowed(rules, "/private/p1")
    assert robots_allowed(rules, "/private/public/p1")  # longer allow wins
    assert not robots_allowed(rules, "/tmp/p1")
    assert robots_allowed(rules, "/tmp/open/p1")
    assert not robots_allowed(rules, "/files/p1.pdf")  # /*.pdf$
    assert robots_allowed(rules, "/files/p1.pdfx")  # $ anchors the end


def test_robots_group_fallback_and_comments():
    rules = parse_robots(ROBOTS, agent="otherbot")  # falls back to *
    assert not robots_allowed(rules, "/private/x")
    assert robots_allowed(rules, "/tmp/x")  # * group has no /tmp rule
    # comments + empty Disallow are ignored
    r2 = parse_robots("User-agent: a\nDisallow:  # nothing\nDisallow: /x/\n", agent="a")
    assert robots_allowed(r2, "/anything")
    assert not robots_allowed(r2, "/x/y")


def test_robots_shared_agent_record():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /q/\n"
    for agent in ("a", "b"):
        rules = parse_robots(txt, agent=agent)
        assert not robots_allowed(rules, "/q/1")


def test_robots_allow_wins_equal_length():
    txt = "User-agent: x\nDisallow: /same/\nAllow: /same*\n"  # both len 6... not equal
    # construct a genuine tie: patterns of equal length
    txt = "User-agent: x\nDisallow: /ab/\nAllow: /ab/$\n"
    rules = parse_robots(txt, agent="x")
    # for exactly '/ab/' both match; allow pattern is LONGER (5) -> allow
    assert robots_allowed(rules, "/ab/")
    # deeper path: only the disallow matches
    assert not robots_allowed(rules, "/ab/c")


def test_sitemap_roundtrip_and_tolerance():
    rows = [
        {"loc": "http://h.example/a?x=1&y=2", "lastmod": "2024-01-05", "priority": 0.5},
        {"loc": "http://h.example/<b>", "lastmod": "", "priority": None},
    ]
    xml = write_sitemap_xml(rows)
    got = parse_sitemap(xml)
    assert got[0]["loc"] == "http://h.example/a?x=1&y=2"
    assert got[0]["priority"] == 0.5
    assert got[1]["loc"] == "http://h.example/<b>"
    assert got[1]["priority"] is None

    # tolerant bits: namespace prefixes, attributes, CDATA, bad priority
    messy = b"""<?xml version="1.0"?>
    <ns:urlset xmlns:ns="x">
      <ns:url attr="1"><ns:loc><![CDATA[http://m.example/1]]></ns:loc>
        <ns:priority>oops</ns:priority></ns:url>
      <url><lastmod>2024-02-02</lastmod></url>  <!-- no loc: skipped -->
    </ns:urlset>"""
    got = parse_sitemap(messy)
    assert len(got) == 1
    assert got[0]["loc"] == "http://m.example/1"
    assert got[0]["priority"] is None


def test_sitemap_index():
    idx = write_sitemap_index(["http://h.example/s1.xml", "http://h.example/s2.xml"])
    got = parse_sitemap(idx)
    assert [e["loc"] for e in got] == [
        "http://h.example/s1.xml",
        "http://h.example/s2.xml",
    ]
