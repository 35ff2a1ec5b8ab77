"""HTML head-metadata extraction: title / meta / canonical / og tags.

The crawl-index side of a webtext pipeline: every Common-Crawl-style
page carries machine-readable metadata in `<head>` (title, description,
robots directives, canonical URL, OpenGraph properties) that downstream
curation keys on (URL canonicalization, locale routing, noindex
filtering).  Reference analogue: the per-document field-extraction
projection (/root/reference/ai_documents/analysis/document_analysis.py
clean_predicted_data) — pull named fields out of one document into flat
columns.

Parsing is a real tolerant tag tokenizer (comments skipped, CDATA-free
head assumption, single/double/unquoted attributes, any attribute
order, case-insensitive names, entity unescaping) — NOT a naive
substring grep: a decoy `og:title` inside an HTML comment must not
leak, and the differential tests pin that.  Work is per-document by
nature (parsing does not vectorize), but the regexes are compiled once
at module import and each map_batches task reuses them — same shape as
the main extractor's scanner.
"""

from __future__ import annotations

import html as html_mod
import re
from html.parser import HTMLParser

import pyarrow as pa

# one tag or comment per match; attributes blob keeps quoted '>' safe
_TAG_RE = re.compile(
    r"<!--.*?-->|<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>",
    re.S,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+)))?",
    re.S,
)

# fields surfaced as flat columns, in output order
META_FIELDS = ("title", "description", "canonical", "og_locale", "robots")


def _attrs(blob: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        val = next((g for g in m.groups()[1:] if g is not None), "")
        if name not in out:  # first occurrence wins, like browsers
            out[name] = html_mod.unescape(val)
    return out


def parse_head_meta(payload: bytes | str) -> dict[str, str | None]:
    """Parse one page's head metadata -> {field: value-or-None}.

    Only the region before `</head>` (or the whole doc if the tag is
    missing — crawls are full of unclosed heads) is scanned; `<body>`
    also terminates the scan so body content can never pollute head
    fields."""
    text = payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload
    out: dict[str, str | None] = {f: None for f in META_FIELDS}
    in_title = False
    title_parts: list[str] = []
    pos = 0
    for m in _TAG_RE.finditer(text):
        if m.group(2) is None:  # comment — decoys in comments must not leak
            continue
        closing, name, blob = m.group(1) == "/", m.group(2).lower(), m.group(3)
        if in_title:
            title_parts.append(text[pos : m.start()])
        pos = m.end()
        if name == "title":
            if not closing and out["title"] is None:
                in_title = True
                title_parts = []
            elif closing and in_title:
                in_title = False
                out["title"] = html_mod.unescape("".join(title_parts)).strip()
        elif name == "meta" and not closing:
            a = _attrs(blob)
            key = (a.get("name") or a.get("property") or "").lower()
            content = a.get("content")
            if content is None:
                continue
            if key == "description" and out["description"] is None:
                out["description"] = content
            elif key == "robots" and out["robots"] is None:
                out["robots"] = content
            elif key == "og:locale" and out["og_locale"] is None:
                out["og_locale"] = content
        elif name == "link" and not closing:
            a = _attrs(blob)
            if (a.get("rel") or "").lower() == "canonical" and out["canonical"] is None:
                out["canonical"] = a.get("href")
        elif name == "body" or (closing and name == "head"):
            break
    return out


def extract_head_meta(pages_ds, url_col: str = "url", html_col: str = "html"):
    """pages dataset -> (url, title, description, canonical, og_locale,
    robots) — one flat metadata row per page (task stage; the compiled
    regexes are module-level warm state)."""

    def batch(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        metas = [parse_head_meta(p or b"") for p in t.column(html_col).to_pylist()]
        cols = [pa.array(urls, pa.string())] + [
            pa.array([m[f] for m in metas], pa.string()) for f in META_FIELDS
        ]
        return pa.Table.from_arrays(cols, names=[url_col, *META_FIELDS])

    return pages_ds.map_batches(batch, batch_format="pyarrow", batch_size=512)


# ---------------------------------------------------------------------------
# JSON-LD structured data (schema.org) — <script type="application/ld+json">
# ---------------------------------------------------------------------------

JSONLD_FIELDS = ("ld_type", "headline", "date_published", "author")


def parse_jsonld(payload: bytes | str) -> dict[str, str | None]:
    """First VALID schema.org JSON-LD block -> flat fields (@type,
    headline/name, datePublished, author.name).  Rides the same
    tolerant tokenizer as head-meta, so commented-out decoy blocks and
    non-ld script types never leak; blocks that fail json.loads are
    skipped (real crawls are full of truncated JSON-LD)."""
    import json

    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", "replace")
    out: dict[str, str | None] = {k: None for k in JSONLD_FIELDS}
    in_ld_since: int | None = None
    for m in _TAG_RE.finditer(payload):
        if m.group(2) is None:  # comment
            continue
        closing, tag = m.group(1) == "/", m.group(2).lower()
        if tag != "script":
            continue
        if not closing and in_ld_since is None:
            attrs = _attrs(m.group(3) or "")
            if attrs.get("type", "").strip().lower() == "application/ld+json":
                in_ld_since = m.end()
        elif closing and in_ld_since is not None:
            body = payload[in_ld_since : m.start()]
            in_ld_since = None
            try:
                data = json.loads(body)
            except (ValueError, TypeError):
                continue
            if isinstance(data, list):
                data = data[0] if data else {}
            if not isinstance(data, dict):
                continue
            out["ld_type"] = data.get("@type")
            out["headline"] = data.get("headline") or data.get("name")
            out["date_published"] = data.get("datePublished")
            author = data.get("author")
            if isinstance(author, dict):
                out["author"] = author.get("name")
            elif isinstance(author, str):
                out["author"] = author
            return out  # first valid block wins
    return out


def extract_jsonld(pages_ds, url_col: str = "url", html_col: str = "html"):
    """pages (url, html) -> one flat row per page with JSONLD_FIELDS."""

    def batch(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        rows = [parse_jsonld(h) for h in t.column(html_col).to_pylist()]
        cols: dict = {"url": pa.array(urls, pa.string())}
        for f in JSONLD_FIELDS:
            cols[f] = pa.array([r[f] for r in rows], pa.string())
        return pa.table(cols)

    return pages_ds.map_batches(batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Microdata (HTML spec §5: itemscope/itemtype/itemprop) — the third
# structured-data vehicle next to head-meta and JSON-LD.  Flat items
# (the overwhelmingly common e-commerce/article shape): the FIRST
# itemscope+itemtype element opens the item; descendant itemprop
# elements contribute values per the spec's per-tag value rules.
# ---------------------------------------------------------------------------

_MD_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_MD_URL_ATTR = {"a": "href", "link": "href", "area": "href"}
_MD_SRC_ATTR = {
    "img": "src", "audio": "src", "video": "src", "embed": "src",
    "iframe": "src", "source": "src",
}


class _MicrodataCollector(HTMLParser):
    """First flat microdata item: itemtype + {prop: value}.  Value per
    spec: meta→content, a/link/area→href, img/...→src, time→datetime,
    else the element's text content.  Comments are skipped by the
    parser itself; itemprop outside the item is ignored."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.itemtype: str | None = None
        self.props: dict[str, str] = {}
        self._depth = 0
        self._item_depth: int | None = None
        self._done = False
        self._cap_prop: str | None = None
        self._cap_depth = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        inside = self._item_depth is not None and not self._done
        if (
            self.itemtype is None
            and "itemscope" in a
            and a.get("itemtype")
        ):
            self.itemtype = a["itemtype"]
            self._item_depth = self._depth
        elif inside and "itemprop" in a and a["itemprop"] not in self.props:
            prop = a["itemprop"]
            if tag == "meta":
                self.props[prop] = a.get("content", "")
            elif tag in _MD_URL_ATTR:
                self.props[prop] = a.get(_MD_URL_ATTR[tag], "")
            elif tag in _MD_SRC_ATTR:
                self.props[prop] = a.get(_MD_SRC_ATTR[tag], "")
            elif tag == "time" and "datetime" in a:
                self.props[prop] = a["datetime"]
            elif tag not in _MD_VOID and self._cap_prop is None:
                self._cap_prop = prop
                self._cap_depth = self._depth
                self._buf = []
        if tag not in _MD_VOID:
            self._depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _MD_VOID:
            return
        self._depth = max(0, self._depth - 1)
        if self._cap_prop is not None and self._depth == self._cap_depth:
            self.props[self._cap_prop] = "".join(self._buf).strip()
            self._cap_prop = None
        if (
            self._item_depth is not None
            and not self._done
            and self._depth == self._item_depth
        ):
            self._done = True  # the item's element closed; later scopes ignored

    def handle_data(self, data: str) -> None:
        if self._cap_prop is not None:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        if self._cap_prop is not None:  # unclosed element: flush at EOF
            self.props[self._cap_prop] = "".join(self._buf).strip()
            self._cap_prop = None


def parse_microdata(payload: bytes | str) -> dict[str, str | None]:
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", "replace")
    p = _MicrodataCollector()
    try:
        p.feed(payload)
        p.close()
    except Exception:
        pass
    return {"item_type": p.itemtype, "props": p.props}


def extract_microdata(
    pages_ds, props: dict[str, str], url_col: str = "url", html_col: str = "html"
):
    """(url, item_type, <props...>) — one row per page, first item.
    `props` maps OUTPUT column name -> itemprop name (so an item's own
    'url' prop can land in a column that doesn't collide with the page
    url column)."""
    if url_col in props or "item_type" in props:
        raise ValueError("prop output column collides with url/item_type")

    def batch(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        types: list = []
        vals: dict[str, list] = {c: [] for c in props}
        for h in t.column(html_col).to_pylist():
            md = parse_microdata(h)
            types.append(md["item_type"])
            for c, pn in props.items():
                vals[c].append(md["props"].get(pn))
        return pa.table(
            {
                url_col: pa.array(urls, pa.string()),
                "item_type": pa.array(types, pa.string()),
                **{c: pa.array(vals[c], pa.string()) for c in props},
            }
        )

    return pages_ds.map_batches(batch, batch_format="pyarrow")


def head_rel_links(payload: bytes | str, rels: tuple[str, ...] = ("next", "prev")) -> dict[str, str]:
    """{rel: href} for the requested <link rel=...> relations in the
    head region — the pagination / alternate / canonical navigation
    links a crawler follows.  Same tolerant scan + head/body
    termination as `parse_head_meta` (comments skipped, first
    occurrence wins)."""
    text = payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload
    want = set(rels)
    out: dict[str, str] = {}
    for m in _TAG_RE.finditer(text):
        if m.group(2) is None:
            continue
        closing, name, blob = m.group(1) == "/", m.group(2).lower(), m.group(3)
        if name == "link" and not closing:
            a = _attrs(blob)
            rel = (a.get("rel") or "").lower()
            if rel in want and rel not in out and a.get("href"):
                out[rel] = a["href"]
        elif name == "body" or (closing and name == "head"):
            break
    return out


# ---------------------------------------------------------------------------
# HTML <table> extraction: flatten every table on a page into
# (table_idx, row_idx, col_idx, is_header, cell-text) tuples — the
# data-table mining side of structured extraction (WDC-web-tables
# style), next to JSON-LD and microdata.  Reference analogue: the
# block-rectangle -> words flattening of the layout parse
# (/root/reference/ai_documents/analysis/document_analysis.py) — turn a
# 2-D document region into addressable cells.
# ---------------------------------------------------------------------------


class _TableCollector(HTMLParser):
    """Event-driven table flattener over the tolerant stdlib parser.

    Semantics (kept deliberately explicit so the SQL oracles can replay
    page constructions): top-level tables only (a nested <table> is
    folded into its enclosing cell's text); cell text is the
    concatenated character data of the cell subtree, stripped;
    `is_header` is True iff the cell element is <th>.  Missing </td> /
    </tr> close implicitly on the next cell/row like browsers do."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: list[tuple[int, int, int, bool, str]] = []
        self._table = -1       # current top-level table index
        self._in_table = 0     # <table> nesting depth
        self._row = -1
        self._col = -1
        self._in_cell = False
        self._is_th = False
        self._buf: list[str] = []

    def _flush_cell(self) -> None:
        if self._in_cell:
            self.cells.append(
                (
                    self._table,
                    self._row,
                    self._col,
                    self._is_th,
                    "".join(self._buf).strip(),
                )
            )
            self._in_cell = False
            self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            if self._in_table == 0:
                self._table += 1
                self._row = -1
                self._col = -1
            self._in_table += 1
        elif self._in_table == 1:
            if tag == "tr":
                self._flush_cell()
                self._row += 1
                self._col = -1
            elif tag in ("td", "th"):
                self._flush_cell()
                self._col += 1
                self._in_cell = True
                self._is_th = tag == "th"
                self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "table":
            if self._in_table == 1:
                self._flush_cell()
            self._in_table = max(0, self._in_table - 1)
        elif self._in_table == 1 and tag in ("td", "th", "tr"):
            self._flush_cell()

    def handle_data(self, data: str) -> None:
        if self._in_cell and self._in_table >= 1:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush_cell()


def parse_tables(payload: bytes | str) -> list[tuple[int, int, int, bool, str]]:
    """All (table_idx, row_idx, col_idx, is_header, text) cells of the
    page's top-level tables, in document order."""
    text = payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload
    p = _TableCollector()
    try:
        p.feed(text)
        p.close()
    except Exception:
        pass  # tolerate malformed markup; keep whatever was collected
    return p.cells


def extract_tables(pages_ds, url_col: str = "url", html_col: str = "html"):
    """pages -> one row per table cell (url, table_idx, row_idx,
    col_idx, is_header, cell).  Stateless vectorized-per-batch map."""

    def batch(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        ti: list[int] = []
        ri: list[int] = []
        ci: list[int] = []
        hd: list[bool] = []
        tx: list[str] = []
        for u, payload in zip(
            t.column(url_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            for tab, row, col, is_h, cell in parse_tables(payload):
                urls.append(u)
                ti.append(tab)
                ri.append(row)
                ci.append(col)
                hd.append(is_h)
                tx.append(cell)
        return pa.table(
            {
                url_col: pa.array(urls, pa.string()),
                "table_idx": pa.array(ti, pa.int64()),
                "row_idx": pa.array(ri, pa.int64()),
                "col_idx": pa.array(ci, pa.int64()),
                "is_header": pa.array(hd, pa.bool_()),
                "cell": pa.array(tx, pa.string()),
            }
        )

    return pages_ds.map_batches(batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Document-structure extraction: heading outlines (h1-h6 with computed
# hierarchical section numbers) and nested list flattening — the
# reading-order / layout-tree side of main-content extraction
# (reference analogue: the layout tree + reading-order reconstruction
# of the PDF parse, /root/reference/ai_documents/analysis/cv/
# document_parsing.py).
# ---------------------------------------------------------------------------

_H_TAGS = {f"h{i}": i for i in range(1, 7)}


class _OutlineCollector(HTMLParser):
    """(pos, level, section-path, text) per heading.  The section path
    is computed with a counter stack: entering a heading of level L
    increments counter[L] and clears every deeper counter; the path is
    the dot-joined counters of levels 1..L that are nonzero (levels
    skipped in the markup are simply absent from the path)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.headings: list[tuple[int, int, str, str]] = []
        self._counters = [0] * 7  # index by level 1..6
        self._level = 0
        self._buf: list[str] = []
        self._pos = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        lvl = _H_TAGS.get(tag)
        if lvl is not None:
            self._flush()
            self._level = lvl
            self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag in _H_TAGS:
            self._flush()

    def _flush(self) -> None:
        if self._level:
            lvl = self._level
            self._counters[lvl] += 1
            for d in range(lvl + 1, 7):
                self._counters[d] = 0
            path = ".".join(
                str(self._counters[d]) for d in range(1, lvl + 1) if self._counters[d]
            )
            self.headings.append(
                (self._pos, lvl, path, "".join(self._buf).strip())
            )
            self._pos += 1
            self._level = 0
            self._buf = []

    def handle_data(self, data: str) -> None:
        if self._level:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def parse_outline(payload: bytes | str) -> list[tuple[int, int, str, str]]:
    """All (pos, level, section_path, text) headings of the page in
    document order."""
    text = payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload
    p = _OutlineCollector()
    try:
        p.feed(text)
        p.close()
    except Exception:
        pass
    return p.headings


class _ListCollector(HTMLParser):
    """Flatten nested <ul>/<ol> lists: one tuple per <li> —
    (list_idx, depth, item_path, ordered, text).  list_idx numbers
    top-level lists; item_path is the dot-joined 1-based item ordinals
    down the nesting ("2.1" = first sub-item of the second item); text
    is the li's OWN character data (a nested list's items are their own
    rows, not part of the parent's text).  Missing </li> closes
    implicitly on the next <li> at the same depth, like browsers."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.items: list[tuple[int, int, str, bool, str]] = []
        self._top = -1
        self._stack: list[tuple[bool, int]] = []  # (ordered, item counter)
        self._ords: list[int] = []
        self._buf: list[str] = []
        self._cap = False

    def _flush_item(self) -> None:
        if self._cap:
            self.items.append(
                (
                    self._top,
                    len(self._stack) - 1,
                    ".".join(str(o) for o in self._ords),
                    self._stack[-1][0],
                    "".join(self._buf).strip(),
                )
            )
            self._buf = []
            self._cap = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("ul", "ol"):
            self._flush_item()
            if not self._stack:
                self._top += 1
            self._stack.append((tag == "ol", 0))
            self._ords.append(0)
        elif tag == "li" and self._stack:
            self._flush_item()
            ordered, cnt = self._stack[-1]
            self._stack[-1] = (ordered, cnt + 1)
            self._ords[-1] = cnt + 1
            self._cap = True
            self._buf = []

    def handle_endtag(self, tag: str) -> None:
        if tag in ("ul", "ol") and self._stack:
            self._flush_item()
            self._stack.pop()
            self._ords.pop()
        elif tag == "li":
            self._flush_item()

    def handle_data(self, data: str) -> None:
        if self._cap:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush_item()


def parse_list_items(payload: bytes | str) -> list[tuple[int, int, str, bool, str]]:
    """All (list_idx, depth, item_path, ordered, text) list items of
    the page in document order."""
    text = payload.decode("utf-8", "replace") if isinstance(payload, bytes) else payload
    p = _ListCollector()
    try:
        p.feed(text)
        p.close()
    except Exception:
        pass
    return p.items


def extract_outline_rows(pages_ds, url_col: str = "url", html_col: str = "html"):
    """pages -> one row per heading (url, pos, level, path, text)."""

    def batch(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        pos: list[int] = []
        lvl: list[int] = []
        path: list[str] = []
        txt: list[str] = []
        for u, payload in zip(
            t.column(url_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            for p, l, pth, tx in parse_outline(payload):
                urls.append(u)
                pos.append(p)
                lvl.append(l)
                path.append(pth)
                txt.append(tx)
        return pa.table(
            {
                url_col: pa.array(urls, pa.string()),
                "pos": pa.array(pos, pa.int64()),
                "level": pa.array(lvl, pa.int64()),
                "path": pa.array(path, pa.string()),
                "text": pa.array(txt, pa.string()),
            }
        )

    return pages_ds.map_batches(batch, batch_format="pyarrow")


def extract_list_rows(pages_ds, url_col: str = "url", html_col: str = "html"):
    """pages -> one row per list item (url, list_idx, depth, item_path,
    ordered, item_text)."""

    def batch(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        li: list[int] = []
        dp: list[int] = []
        ip: list[str] = []
        od: list[bool] = []
        tx: list[str] = []
        for u, payload in zip(
            t.column(url_col).to_pylist(), t.column(html_col).to_pylist()
        ):
            for lidx, depth, ipath, ordered, text in parse_list_items(payload):
                urls.append(u)
                li.append(lidx)
                dp.append(depth)
                ip.append(ipath)
                od.append(ordered)
                tx.append(text)
        return pa.table(
            {
                url_col: pa.array(urls, pa.string()),
                "list_idx": pa.array(li, pa.int64()),
                "depth": pa.array(dp, pa.int64()),
                "item_path": pa.array(ip, pa.string()),
                "ordered": pa.array(od, pa.bool_()),
                "item_text": pa.array(tx, pa.string()),
            }
        )

    return pages_ds.map_batches(batch, batch_format="pyarrow")
