"""Head-metadata tokenizer: decoys, quoting variants, differential vs
stdlib HTMLParser over the generated corpus."""

import html as html_mod
from html.parser import HTMLParser

from document_ai_ray.stages.html_meta import META_FIELDS, parse_head_meta


def test_basic_fields_and_decoys():
    page = (
        "<!doctype html><html><head>"
        "<!-- <meta name='description' content='DECOY'> -->"
        "<title> A &amp; B </title>"
        "<meta name=\"description\" content=\"desc &quot;q&quot; here\">"
        "<meta name=robots content=noindex,nofollow>"
        "<meta property='og:locale' content='fr'>"
        "<link href='/x' rel='alternate'><link rel=canonical href='https://e/x'>"
        "</head><body><meta property='og:locale' content='BODY'></body></html>"
    )
    m = parse_head_meta(page)
    assert m["title"] == "A & B"
    assert m["description"] == 'desc "q" here'
    assert m["robots"] == "noindex,nofollow"
    assert m["og_locale"] == "fr"
    assert m["canonical"] == "https://e/x"


def test_unclosed_head_and_missing_fields():
    # crawl reality: no </head>, <body> terminates the scan
    m = parse_head_meta("<html><head><title>t</title><body><meta name=description content=late>")
    assert m["title"] == "t"
    assert m["description"] is None
    # no head at all
    m2 = parse_head_meta(b"plain text, no tags")
    assert all(m2[f] is None for f in META_FIELDS)


def test_first_occurrence_wins_and_case():
    m = parse_head_meta(
        "<head><TITLE>first</TITLE><title>second</title>"
        '<META NAME="Description" CONTENT="d1"><meta name="description" content="d2"></head>'
    )
    assert m["title"] == "first"
    assert m["description"] == "d1"


def test_bytes_input_bad_utf8():
    m = parse_head_meta(b"<head><title>caf\xe9</title></head>")  # latin-1 bytes
    assert m["title"].startswith("caf")  # replacement char, no crash


class _StdlibHead(HTMLParser):
    """Same field rules via the stdlib parser — differential oracle."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.out = {f: None for f in META_FIELDS}
        self.in_title = False
        self.done = False
        self.title_parts = []

    def handle_starttag(self, tag, attrs):
        if self.done:
            return
        a = {}
        for k, v in attrs:
            a.setdefault(k.lower(), v if v is not None else "")
        if tag == "title" and self.out["title"] is None:
            self.in_title = True
            self.title_parts = []
        elif tag == "meta":
            key = (a.get("name") or a.get("property") or "").lower()
            c = a.get("content")
            if c is None:
                return
            if key == "description" and self.out["description"] is None:
                self.out["description"] = c
            elif key == "robots" and self.out["robots"] is None:
                self.out["robots"] = c
            elif key == "og:locale" and self.out["og_locale"] is None:
                self.out["og_locale"] = c
        elif tag == "link":
            if (a.get("rel") or "").lower() == "canonical" and self.out["canonical"] is None:
                self.out["canonical"] = a.get("href")
        elif tag == "body":
            self.done = True

    def handle_endtag(self, tag):
        if tag == "title" and self.in_title:
            self.in_title = False
            self.out["title"] = "".join(self.title_parts).strip()
        elif tag == "head":
            self.done = True

    def handle_data(self, data):
        if self.in_title and not self.done:
            self.title_parts.append(data)


def test_differential_vs_stdlib_on_generated_corpus():
    from document_ai_ray.pipelines.extract_queries import _meta_page_html

    for i in range(200):
        page = _meta_page_html(i, f"text body {i} & <tag> é", "de", f"src{i % 20}")
        mine = parse_head_meta(page)
        ref = _StdlibHead()
        ref.feed(page.decode("utf-8"))
        # NB: stdlib tokenizes the decoy inside <script> as a tag (it is
        # not a script-aware parser either), so compare on fields the
        # decoy can't touch when stdlib got them first — all fields
        # here: robots is set before the script decoy in every variant.
        assert mine == ref.out, (i, mine, ref.out)


def test_extract_head_meta_stage():
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.html_meta import extract_head_meta

    rows = [
        {"url": f"u{i}", "html": f"<head><title>t{i}</title></head>".encode()}
        for i in range(10)
    ]
    out = extract_head_meta(rd.from_arrow(pa.Table.from_pylist(rows))).take_all()
    assert sorted(r["title"] for r in out) == sorted(f"t{i}" for i in range(10))
    assert all(r["canonical"] is None for r in out)


def test_parse_jsonld_decoys_and_recovery():
    from document_ai_ray.stages.html_meta import parse_jsonld

    html = (
        "<html><head>"
        '<!-- <script type="application/ld+json">{"@type":"Decoy"}</script> -->'
        '<script type="text/javascript">var x = {"@type": "No"};</script>'
        '<script type="application/ld+json">{broken</script>'
        '<script type="application/ld+json">'
        '[{"@type": "Article", "name": "N1", "datePublished": "2024-02-03",'
        ' "author": "Plain Name"}]'
        "</script></head><body></body></html>"
    )
    got = parse_jsonld(html)
    assert got["ld_type"] == "Article"
    assert got["headline"] == "N1"  # name fallback
    assert got["date_published"] == "2024-02-03"
    assert got["author"] == "Plain Name"  # string author accepted

    # no ld block at all -> all-None row, never a raise
    empty = parse_jsonld("<html><head><title>t</title></head></html>")
    assert all(v is None for v in empty.values())


def test_microdata_value_rules_and_decoys():
    from document_ai_ray.stages.html_meta import parse_microdata

    html = (
        "<body>"
        '<b itemprop="orphan">ignored</b>'
        '<!-- <div itemscope itemtype="X"><i itemprop="name">no</i></div> -->'
        '<div itemscope itemtype="https://schema.org/Book">'
        '<h1 itemprop="name">The <em>Long</em> Title</h1>'
        '<meta itemprop="isbn" content="978-3-16">'
        '<a itemprop="url" href="/b/1">link text not value</a>'
        '<img itemprop="cover" src="/c.jpg">'
        '<time itemprop="pubDate" datetime="2020-01-02">Jan 2</time>'
        "</div>"
        '<div itemscope itemtype="https://schema.org/Movie">'
        '<span itemprop="name">second ignored</span></div>'
        "</body>"
    )
    md = parse_microdata(html)
    assert md["item_type"] == "https://schema.org/Book"
    p = md["props"]
    assert p["name"] == "The Long Title"       # nested tag text concatenated
    assert p["isbn"] == "978-3-16"             # meta -> content
    assert p["url"] == "/b/1"                  # a -> href
    assert p["cover"] == "/c.jpg"              # img -> src
    assert p["pubDate"] == "2020-01-02"        # time -> datetime
    assert "orphan" not in p                   # outside any itemscope


def test_microdata_unclosed_and_no_item():
    from document_ai_ray.stages.html_meta import parse_microdata

    assert parse_microdata("<body><p>nothing structured</p>")["item_type"] is None
    md = parse_microdata(
        '<div itemscope itemtype="T"><span itemprop="a">val'  # never closed
    )
    assert md["item_type"] == "T"
    assert md["props"] == {"a": "val"}  # unclosed capture flushed at EOF


def test_head_rel_links_decoys_and_termination():
    from document_ai_ray.stages.html_meta import head_rel_links

    html = (
        "<html><head>"
        '<!-- <link rel="next" href="doc://9"> -->'      # comment decoy
        '<LINK REL="next" HREF="doc://2">'               # case-insensitive
        '<link rel="prev" href="doc://0">'
        '<link rel="next" href="doc://7">'               # first wins
        "</head><body>"
        '<link rel="next" href="doc://8">'               # body: out of scope
        "</body></html>"
    )
    got = head_rel_links(html)
    assert got == {"next": "doc://2", "prev": "doc://0"}
    assert head_rel_links("<head><link rel=canonical href=x></head>") == {}
