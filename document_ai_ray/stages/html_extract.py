"""The flagship stage: HTML/PDF main-content extraction.

Re-expresses the reference's geometric pipeline for web text
(SURVEY.md §2.2/§2.3 mapping):

  - strip head/script/style/comments        ≙ SAM page crop
    (/root/reference/detection/sam.py:49-102)
  - DOM walk -> text nodes with tag paths   ≙ doctr OCR word boxes
    (/root/reference/analysis/cv/boxes_processing.py:5-23)
  - per-block text/link-density scoring     ≙ multi-scale template
    matching block location (/root/reference/detection/
    template_matching.py:23-78, 550-583); jusText/boilerpipe-style
  - chrome priors (nav/header/footer/aside) ≙ search-region isolation
    (/root/reference/detection/template_matching.py:230-261)
  - fuzzy label -> value field extraction   ≙ find_next_right_word
    spatial join (/root/reference/analysis/cv/document_parsing.py:132-198)
  - quality / presence classification       ≙ LMM quality & signature
    stages, made deterministic (/root/reference/analysis/lmm/gpt.py:116-164)

``Extractor`` binds its config + tables once per WORKER (built lazily
and cached module-level by the task stage in pipelines/extract.py;
``use_actors=True`` keeps the explicit actor-pool form) and processes
Arrow batches in ``__call__`` — either way the fix for the reference's
re-instantiate-doctr-per-image bug
(/root/reference/analysis/cv/boxes_processing.py:8).

THE WHITESPACE CANON (frozen — byte-identity of `extracted_text`
depends on it; regenerate goldens if it ever changes):
  1. bytes are decoded utf-8-strict, falling back to latin-1
     (charset_ok=False);
  2. character references are decoded (`&amp;` -> `&`);
  3. within one block, text-node data is concatenated in document
     order, then every run of `[ \\t\\r\\n\\f\\v\\xa0]+` collapses to a
     single ASCII space and ends are stripped;
  4. kept blocks are joined with exactly "\\n\\n" in document order.

UDFs here NEVER raise: a failing row gets `error` set and empty output
columns (≙ the per-document try/except + SAM fallback,
/root/reference/performances.py:282-294, analysis/entities.py:121-135).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from functools import lru_cache
from html.parser import HTMLParser

import pyarrow as pa

from document_ai_ray.config import (
    BLOCK_STRUCT,
    DEFAULT_CONFIG,
    RESULT_SCHEMA,
    STATUS_EMPTY,
    STATUS_FOUND,
    STATUS_NOT_FOUND,
    ExtractConfig,
)
from document_ai_ray.functions.strings import collapse_ws, levenshtein, normalize_str
from document_ai_ray.stages.pdf_extract import parse_pdf
from document_ai_ray.stages.text_analysis import langid_text

BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th dt dd article section main aside header "
    "footer nav ul ol table tr blockquote pre figure figcaption form fieldset "
    "address hr body".split()
)
SKIP_TAGS = frozenset("script style noscript template svg head title iframe".split())
VOID_TAGS = frozenset("br img hr meta link input area base col embed source track wbr".split())
CHROME_TAGS = frozenset("nav header footer aside".split())
HEADING_TAGS = frozenset("h1 h2 h3 h4 h5 h6".split())

_LABEL_RE = re.compile(r"^\s*([^\s:][^:]{0,30}?)\s*:\s*(.*)$", re.DOTALL)
_EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_BYLINE_RE = re.compile(r"^\s*(by|par|von|por|di)\s+\S", re.IGNORECASE)
_TAG_STRIP_RE = re.compile(r"<[^>]*>")


@dataclass(slots=True)
class Block:
    tag_path: str
    heading: bool
    chrome: bool
    heading_level: int = 0              # 1..6 for h1..h6, 0 otherwise
    pieces: list[str] = dc_field(default_factory=list)       # raw text-node data
    link_chars: int = 0
    text: str = ""                                           # canonical (set at finish)
    kept: bool = False
    start: int = -1
    end: int = -1
    # derived once by finish() after `text` is final (plain attributes:
    # score_blocks/heading smoothing read these in a tight loop)
    n_chars: int = 0
    link_density: float = 0.0
    score: float = 0.0

    def finish(self) -> None:
        self.n_chars = len(self.text)
        self.link_density = self.link_chars / self.n_chars if self.n_chars else 0.0
        self.score = self.n_chars * (1.0 - self.link_density)


class _Dom(HTMLParser):
    """One-pass DOM walk collecting text blocks (no tree is built —
    blocks are emitted at block-level tag boundaries)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.skip_depth = 0
        self.link_depth = 0
        self.chrome_depth = 0
        self.blocks: list[Block] = []
        self._cur: Block | None = None

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        b = self._cur
        if b is not None and b.pieces:
            self.blocks.append(b)
        self._cur = None

    def _ensure_block(self) -> Block:
        if self._cur is None:
            path = "/".join(self.stack) or "(root)"
            last = self.stack[-1] if self.stack else ""
            self._cur = Block(
                tag_path=path,
                heading=last in HEADING_TAGS,
                chrome=self.chrome_depth > 0,
                heading_level=int(last[1]) if last in HEADING_TAGS else 0,
            )
        return self._cur

    # -- parser events ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        if tag in VOID_TAGS:
            return
        if tag == "a":
            self.link_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in CHROME_TAGS:
            self.chrome_depth += 1
        self.stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self.skip_depth > 0:
                self.skip_depth -= 1
            return
        if tag in VOID_TAGS:
            return
        if tag == "a" and self.link_depth > 0:
            self.link_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush()
        # tolerant pop: unwind to the matching open tag if present
        if tag in self.stack:
            while self.stack and self.stack[-1] != tag:
                popped = self.stack.pop()
                if popped in CHROME_TAGS:
                    self.chrome_depth -= 1
            if self.stack:
                popped = self.stack.pop()
                if popped in CHROME_TAGS:
                    self.chrome_depth -= 1

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not data or data.isspace():
            return
        b = self._ensure_block()
        b.pieces.append(data)
        if self.link_depth > 0:
            b.link_chars += len(collapse_ws(data))

    def close(self) -> None:
        super().close()
        self._flush()


# ---------------------------------------------------------------------------
# Fast HTML scanner.  Produces the IDENTICAL handle_starttag/handle_
# endtag/handle_data event stream as stdlib HTMLParser(convert_charrefs
# =True) single-shot feed+close — verified event-for-event against the
# stdlib parser in tests (golden corpus + hypothesis mutations) — but
# ~2x faster by skipping what we never use: attribute materialization,
# line/column tracking (updatepos), incremental-feed buffering, and
# comment/decl/PI payload capture.  The stdlib's own tokenization
# regexes are reused so the tag grammar cannot drift.
# ---------------------------------------------------------------------------

from html import unescape as _unescape
from html.parser import (
    commentclose as _commentclose,
    endtagfind as _endtagfind,
    locatestarttagend_tolerant as _locatestart,
    piclose as _piclose,
    tagfind_tolerant as _tagfind,
)
from html.parser import attrfind_tolerant as _attrfind

_GT = re.compile(">")
_MARKEDSECTIONCLOSE = re.compile(r"]\s*]\s*>")
_MSMARKEDSECTIONCLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_ATTR_TAIL = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_CDATA_CLOSE = {
    e: re.compile(r"</\s*%s\s*>" % e, re.IGNORECASE) for e in ("script", "style")
}


def _fast_feed(dom: "_Dom", rawdata: str) -> None:
    """Single-shot equivalent of HTMLParser.feed(rawdata)+close() for a
    handler that ignores attributes/comments/decls/PIs (each branch
    mirrors goahead/parse_* in cpython's html/parser.py)."""
    handle_data = dom.handle_data
    handle_start = dom.handle_starttag
    handle_end = dom.handle_endtag
    i, n = 0, len(rawdata)
    cdata_elem: str | None = None
    while i < n:
        if cdata_elem is None:
            j = rawdata.find("<", i)
            if j < 0:
                j = n
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                return  # unclosed cdata at EOF: stdlib drops the tail
            j = m.start()
        if i < j:
            seg = rawdata[i:j]
            if cdata_elem is None:
                handle_data(_unescape(seg) if "&" in seg else seg)
            else:
                handle_data(seg)
        i = j
        if i == n:
            break
        # rawdata[i] == '<'
        k = -2  # sentinel: branch must set k (-1 = incomplete at EOF)
        m = _locatestart.match(rawdata, i)                    # < + letter ...
        if m is not None:                                     # start tag
            j2 = m.end()
            nxt = rawdata[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/":
                endpos = j2 + 2 if rawdata.startswith("/>", j2) else -1
            elif nxt == "" or nxt in _ATTR_TAIL:
                endpos = -1
            else:
                endpos = j2 if j2 > i else i + 1
            if endpos < 0:
                k = -1
            else:
                tm = _tagfind.match(rawdata, i + 1)
                tag = tm.group(1).lower()
                ak = tm.end()
                while ak < endpos:                            # validate attrs
                    am = _attrfind.match(rawdata, ak)
                    if am is None:
                        break
                    ak = am.end()
                end = rawdata[ak:endpos].strip()
                if end not in (">", "/>"):
                    handle_data(rawdata[i:endpos])            # junky start tag
                elif end == "/>":
                    handle_start(tag, [])
                    handle_end(tag)
                else:
                    handle_start(tag, [])
                    if tag in ("script", "style"):
                        cdata_elem = tag
                k = endpos
        elif rawdata.startswith("</", i):                     # end tag
            em = _endtagfind.match(rawdata, i)
            if em is not None:
                # well-formed '</name >': the pattern's '>' is the
                # first '>' after i+1, so gtpos == em.end()
                elem = em.group(1).lower()
                if cdata_elem is not None and elem != cdata_elem:
                    handle_data(rawdata[i : em.end()])
                    k = em.end()
                else:
                    handle_end(elem)
                    cdata_elem = None
                    k = em.end()
            else:
                gtm = _GT.search(rawdata, i + 1)
                if gtm is None:
                    k = -1
                else:
                    gtpos = gtm.end()
                    if cdata_elem is not None:
                        handle_data(rawdata[i:gtpos])
                        k = gtpos
                    else:
                        nm = _tagfind.match(rawdata, i + 2)
                        if nm is None:
                            if rawdata[i : i + 3] == "</>":
                                k = i + 3
                            else:                             # bogus comment
                                pos = rawdata.find(">", i + 2)
                                k = -1 if pos == -1 else pos + 1
                        else:
                            gtpos = rawdata.find(">", nm.end())
                            handle_end(nm.group(1).lower())
                            k = gtpos + 1                     # may be 0 if not found (== stdlib)
        elif rawdata.startswith("<!--", i):                   # comment
            m = _commentclose.search(rawdata, i + 4)
            k = -1 if m is None else m.end()
        elif rawdata.startswith("<?", i):                     # processing instr
            m = _piclose.search(rawdata, i + 2)
            k = -1 if m is None else m.end()
        elif rawdata.startswith("<!", i):                     # declaration
            if rawdata[i : i + 3] == "<![":                   # marked section
                nm = _DECLNAME.match(rawdata, i + 3)
                if nm is None:
                    raise ValueError("malformed marked section")
                sect = nm.group().strip().lower()
                if sect in {"temp", "cdata", "ignore", "include", "rcdata"}:
                    m = _MARKEDSECTIONCLOSE.search(rawdata, i + 3)
                elif sect in {"if", "else", "endif"}:
                    m = _MSMARKEDSECTIONCLOSE.search(rawdata, i + 3)
                else:
                    raise ValueError(f"unknown status keyword {sect!r} in marked section")
                k = -1 if m is None else m.end()
            elif rawdata[i : i + 9].lower() == "<!doctype":
                pos = rawdata.find(">", i + 9)
                k = -1 if pos == -1 else pos + 1
            else:                                             # bogus comment
                pos = rawdata.find(">", i + 2)
                k = -1 if pos == -1 else pos + 1
        else:                                                 # lone '<'
            handle_data("<")
            k = i + 1
        if k < 0:                                             # incomplete at EOF
            k = rawdata.find(">", i + 1)
            if k < 0:
                k = rawdata.find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            seg = rawdata[i:k]
            if cdata_elem is None:
                handle_data(_unescape(seg) if "&" in seg else seg)
            else:
                handle_data(seg)
        i = k
    if i < n and cdata_elem is None:                          # final flush
        seg = rawdata[i:n]
        handle_data(_unescape(seg) if "&" in seg else seg)


# ---------------------------------------------------------------------------
# Fused scanner + block builder.  Same scan structure as _fast_feed,
# but the _Dom handler logic is INLINED at every event site — no
# per-event function dispatch, no handler indirection.  Equivalence to
# the stdlib-parser block stream is enforced by the same differential +
# hypothesis tests that pin _fast_feed (tests/test_fast_parser.py
# checks fast, fused and stdlib against each other).
# ---------------------------------------------------------------------------


# One-shot pattern for the overwhelmingly common tag shapes (plain
# names, quoted/unquoted attrs, optional self-close).  It only ACCEPTS
# when its end position and verdict provably coincide with the stdlib
# tokenization (anything unusual fails the match and falls through to
# the exact branch chain below), so equivalence is preserved by
# construction — and enforced by the differential tests.
_SIMPLE_TAG = re.compile(
    r"<(?:"
    r"(?P<start>[a-zA-Z][a-zA-Z0-9]*)"
    r"(?:\s+[^\s/=>]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?![\"'])[^\s>]*))?)*"
    r"\s*(?P<sc>/?)>"
    r"|/(?P<end>[a-zA-Z][a-zA-Z0-9]*)\s*>"
    r")"
)


def _fused_parse(rawdata: str) -> list[Block]:
    blocks: list[Block] = []
    stack: list[str] = []
    skip_depth = 0
    link_depth = 0
    chrome_depth = 0
    cur: Block | None = None
    i, n = 0, len(rawdata)
    cdata_elem: str | None = None
    find_lt = rawdata.find
    simple_match = _SIMPLE_TAG.match
    while i < n:
        if cdata_elem is None:
            j = find_lt("<", i)
            if j < 0:
                j = n
        else:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                if cur is not None:
                    blocks.append(cur)
                return blocks  # unclosed cdata at EOF: stdlib drops the tail
            j = m.start()
        if i < j and skip_depth == 0:
            seg = rawdata[i:j]
            if cdata_elem is None and "&" in seg:
                seg = _unescape(seg)
            if seg and not seg.isspace():
                if cur is None:
                    last = stack[-1] if stack else ""
                    cur = Block(
                        tag_path="/".join(stack) or "(root)",
                        heading=last in HEADING_TAGS,
                        chrome=chrome_depth > 0,
                        heading_level=int(last[1]) if last in HEADING_TAGS else 0,
                    )
                cur.pieces.append(seg)
                if link_depth > 0:
                    cur.link_chars += len(collapse_ws(seg))
        i = j
        if i == n:
            break
        # rawdata[i] == '<'
        start_tag = None          # set to emit a start tag event
        end_tag = None            # set to emit an end tag event
        data_seg = None           # set to emit a raw data event
        sm = None
        if cdata_elem is None:
            # string-ops fast path for the dominant attribute-free
            # shapes <name> / </name> (ASCII letter + alnums, no ws, no
            # self-close — ~78% of tags on web boilerplate): one bounded
            # find + isascii/isalnum in place of the regex engine.  It
            # only ACCEPTS when its end position and verdict provably
            # coincide with the stdlib tokenization (the '>' found is
            # the tag end because an alnum-only body can contain no
            # quote that could hide a '>'); anything else falls through
            # to _SIMPLE_TAG / the exact branch chain.
            gt = find_lt(">", i + 1, i + 66)
            if gt != -1:
                body = rawdata[i + 1 : gt]
                if body:
                    if body[0] == "/":
                        nm = body[1:]
                        if nm and nm.isascii() and nm.isalnum() and not nm[0].isdigit():
                            end_tag = nm if nm.islower() else nm.lower()
                            k = gt + 1
                    elif body.isascii() and body.isalnum() and not body[0].isdigit():
                        start_tag = tag = body if body.islower() else body.lower()
                        if tag in ("script", "style"):
                            cdata_elem = tag
                        k = gt + 1
            if start_tag is None and end_tag is None:
                sm = simple_match(rawdata, i)                 # common-case regex path
        if sm is not None or start_tag is not None or end_tag is not None:
            if sm is not None:
                # groups 1/2/3 == start/sc/end — one C call instead of three
                s_tag, sc, e_tag = sm.group(1, 2, 3)
                if e_tag is not None:
                    end_tag = e_tag.lower()
                else:
                    start_tag = tag = s_tag.lower()
                    if sc:
                        end_tag = tag
                    elif tag in ("script", "style"):
                        cdata_elem = tag
                k = sm.end()
            # fall through to the shared event emission below
            if start_tag is not None:
                if start_tag in SKIP_TAGS:
                    skip_depth += 1
                    if end_tag is not None:                   # <script/> form
                        skip_depth -= 1
                        end_tag = None
                elif start_tag in VOID_TAGS:
                    end_tag = None
                else:
                    if start_tag == "a":
                        link_depth += 1
                    if start_tag in BLOCK_TAGS and cur is not None:
                        blocks.append(cur)
                        cur = None
                    if start_tag in CHROME_TAGS:
                        chrome_depth += 1
                    stack.append(start_tag)
            if end_tag is not None:
                tag = end_tag
                if tag in SKIP_TAGS:
                    if skip_depth > 0:
                        skip_depth -= 1
                elif tag in VOID_TAGS:
                    pass
                else:
                    if tag == "a" and link_depth > 0:
                        link_depth -= 1
                    if tag in BLOCK_TAGS and cur is not None:
                        blocks.append(cur)
                        cur = None
                    if tag in stack:            # tolerant pop
                        while stack and stack[-1] != tag:
                            popped = stack.pop()
                            if popped in CHROME_TAGS:
                                chrome_depth -= 1
                        if stack:
                            popped = stack.pop()
                            if popped in CHROME_TAGS:
                                chrome_depth -= 1
            i = k
            continue
        k = -2  # sentinel: branch must set k (-1 = incomplete at EOF)
        m = _locatestart.match(rawdata, i)                    # < + letter ...
        if m is not None:                                     # start tag
            j2 = m.end()
            nxt = rawdata[j2 : j2 + 1]
            if nxt == ">":
                endpos = j2 + 1
            elif nxt == "/":
                endpos = j2 + 2 if rawdata.startswith("/>", j2) else -1
            elif nxt == "" or nxt in _ATTR_TAIL:
                endpos = -1
            else:
                endpos = j2 if j2 > i else i + 1
            if endpos < 0:
                k = -1
            else:
                tm = _tagfind.match(rawdata, i + 1)
                tag = tm.group(1).lower()
                ak = tm.end()
                while ak < endpos:                            # validate attrs
                    am = _attrfind.match(rawdata, ak)
                    if am is None:
                        break
                    ak = am.end()
                end = rawdata[ak:endpos].strip()
                if end not in (">", "/>"):
                    data_seg = rawdata[i:endpos]              # junky start tag
                elif end == "/>":
                    start_tag = tag
                    end_tag = tag
                else:
                    start_tag = tag
                    if tag in ("script", "style"):
                        cdata_elem = tag
                k = endpos
        elif rawdata.startswith("</", i):                     # end tag
            em = _endtagfind.match(rawdata, i)
            if em is not None:
                elem = em.group(1).lower()
                if cdata_elem is not None and elem != cdata_elem:
                    data_seg = rawdata[i : em.end()]
                    k = em.end()
                else:
                    end_tag = elem
                    cdata_elem = None
                    k = em.end()
            else:
                gtm = _GT.search(rawdata, i + 1)
                if gtm is None:
                    k = -1
                else:
                    gtpos = gtm.end()
                    if cdata_elem is not None:
                        data_seg = rawdata[i:gtpos]
                        k = gtpos
                    else:
                        nm = _tagfind.match(rawdata, i + 2)
                        if nm is None:
                            if rawdata[i : i + 3] == "</>":
                                k = i + 3
                            else:                             # bogus comment
                                pos = rawdata.find(">", i + 2)
                                k = -1 if pos == -1 else pos + 1
                        else:
                            gtpos = rawdata.find(">", nm.end())
                            end_tag = nm.group(1).lower()
                            k = gtpos + 1                     # may be 0 if not found (== stdlib)
        elif rawdata.startswith("<!--", i):                   # comment
            m = _commentclose.search(rawdata, i + 4)
            k = -1 if m is None else m.end()
        elif rawdata.startswith("<?", i):                     # processing instr
            m = _piclose.search(rawdata, i + 2)
            k = -1 if m is None else m.end()
        elif rawdata.startswith("<!", i):                     # declaration
            if rawdata[i : i + 3] == "<![":                   # marked section
                nm = _DECLNAME.match(rawdata, i + 3)
                if nm is None:
                    raise ValueError("malformed marked section")
                sect = nm.group().strip().lower()
                if sect in {"temp", "cdata", "ignore", "include", "rcdata"}:
                    m = _MARKEDSECTIONCLOSE.search(rawdata, i + 3)
                elif sect in {"if", "else", "endif"}:
                    m = _MSMARKEDSECTIONCLOSE.search(rawdata, i + 3)
                else:
                    raise ValueError(f"unknown status keyword {sect!r} in marked section")
                k = -1 if m is None else m.end()
            elif rawdata[i : i + 9].lower() == "<!doctype":
                pos = rawdata.find(">", i + 9)
                k = -1 if pos == -1 else pos + 1
            else:                                             # bogus comment
                pos = rawdata.find(">", i + 2)
                k = -1 if pos == -1 else pos + 1
        else:                                                 # lone '<'
            data_seg = "<"
            k = i + 1
        if k < 0:                                             # incomplete at EOF
            k = rawdata.find(">", i + 1)
            if k < 0:
                k = rawdata.find("<", i + 1)
                if k < 0:
                    k = i + 1
            else:
                k += 1
            seg = rawdata[i:k]
            if cdata_elem is None and "&" in seg:
                seg = _unescape(seg)
            data_seg = seg
        # --- emit the (at most one of each) pending events inline ----------
        if data_seg is not None:
            if skip_depth == 0 and data_seg and not data_seg.isspace():
                if cur is None:
                    last = stack[-1] if stack else ""
                    cur = Block(
                        tag_path="/".join(stack) or "(root)",
                        heading=last in HEADING_TAGS,
                        chrome=chrome_depth > 0,
                        heading_level=int(last[1]) if last in HEADING_TAGS else 0,
                    )
                cur.pieces.append(data_seg)
                if link_depth > 0:
                    cur.link_chars += len(collapse_ws(data_seg))
        if start_tag is not None:
            tag = start_tag
            if tag in SKIP_TAGS:
                skip_depth += 1
                if end_tag is not None:                       # <script/> form
                    skip_depth -= 1
                    end_tag = None
            elif tag in VOID_TAGS:
                end_tag = None
            else:
                if tag == "a":
                    link_depth += 1
                if tag in BLOCK_TAGS and cur is not None:
                    blocks.append(cur)
                    cur = None
                if tag in CHROME_TAGS:
                    chrome_depth += 1
                stack.append(tag)
        if end_tag is not None:
            tag = end_tag
            if tag in SKIP_TAGS:
                if skip_depth > 0:
                    skip_depth -= 1
            elif tag in VOID_TAGS:
                pass
            else:
                if tag == "a" and link_depth > 0:
                    link_depth -= 1
                if tag in BLOCK_TAGS and cur is not None:
                    blocks.append(cur)
                    cur = None
                if tag in stack:                # tolerant pop
                    while stack and stack[-1] != tag:
                        popped = stack.pop()
                        if popped in CHROME_TAGS:
                            chrome_depth -= 1
                    if stack:
                        popped = stack.pop()
                        if popped in CHROME_TAGS:
                            chrome_depth -= 1
        i = k
    if i < n and cdata_elem is None and skip_depth == 0:      # final flush
        seg = rawdata[i:n]
        if "&" in seg:
            seg = _unescape(seg)
        if seg and not seg.isspace():
            if cur is None:
                last = stack[-1] if stack else ""
                cur = Block(
                    tag_path="/".join(stack) or "(root)",
                    heading=last in HEADING_TAGS,
                    chrome=chrome_depth > 0,
                    heading_level=int(last[1]) if last in HEADING_TAGS else 0,
                )
            cur.pieces.append(seg)
            if link_depth > 0:
                cur.link_chars += len(collapse_ws(seg))
    if cur is not None:
        blocks.append(cur)
    return blocks


def parse_html_blocks(html_text: str, engine: str = "fused") -> tuple[list[Block], bool]:
    """-> (blocks with canonical text, parse_ok).  On parser failure,
    falls back to UNGUIDED paragraph segmentation (see
    `_fallback_blocks`; ≙ the reference's landmark-free geometric page
    division, /root/reference/detection/pre_ocr_division.py:9-53).

    engine='fused' (default) is the fused scanner+block-builder;
    engine='fast' is the event-stream scanner driving _Dom;
    engine='stdlib' drives html.parser.HTMLParser — kept as the
    reference implementation for the differential tests (all three must
    produce identical block streams)."""
    try:
        if engine == "fused":
            raw_blocks = _fused_parse(html_text)
        else:
            dom = _Dom()
            if engine == "fast":
                _fast_feed(dom, html_text)
                dom._flush()
            else:
                dom.feed(html_text)
                dom.close()
            raw_blocks = dom.blocks
        blocks = []
        for b in raw_blocks:
            b.text = collapse_ws("".join(b.pieces))
            if b.text:
                b.finish()
                blocks.append(b)
        return blocks, True
    except Exception:
        return _fallback_blocks(html_text), False


_PARA_SPLIT_RE = re.compile(
    r"(?i)</?(?:p|div|h[1-6]|li|tr|br|section|article|td|th|blockquote|pre)\b[^>]*>"
    r"|\n\s*\n"
)


def _fallback_blocks(html_text: str) -> list[Block]:
    """Unguided segmentation when the parser fails (≙ reference
    `pre_ocr_division.py:9-53,107-140`: when landmarks fail, divide the
    page geometrically).  Block-level tag boundaries and blank lines
    split the tag-stripped payload into paragraph blocks, so a
    malformed-but-rich page keeps block structure, field extraction and
    density scoring instead of collapsing into ONE blob."""
    blocks: list[Block] = []
    for part in _PARA_SPLIT_RE.split(html_text):
        if part is None or not part or part.isspace():
            continue
        stripped = collapse_ws(_TAG_STRIP_RE.sub(" ", part))
        if not stripped:
            continue
        fb = Block(tag_path="(fallback)", heading=False, chrome=False, pieces=[stripped])
        fb.text = stripped
        fb.finish()
        blocks.append(fb)
    return blocks


def score_blocks(blocks: list[Block], cfg: ExtractConfig) -> None:
    """Keep/drop classification (jusText/boilerpipe-style) + heading
    smoothing.  Mutates ``kept`` in place; deterministic."""
    for b in blocks:
        if b.chrome:
            b.kept = b.n_chars >= cfg.chrome_min_chars and b.link_density <= cfg.chrome_max_link_density
        else:
            b.kept = b.n_chars >= cfg.min_block_chars and b.link_density <= cfg.max_link_density
    if cfg.heading_smoothing:
        # a short heading is kept iff the next substantial SIBLING block
        # (same parent tag-path) is kept — a sidebar <h3> must not ride
        # on the main article's paragraphs.
        for i, b in enumerate(blocks):
            if b.heading and not b.kept and not b.chrome and b.link_density == 0.0:
                parent = b.tag_path.rsplit("/", 1)[0]
                for nb in blocks[i + 1 :]:
                    if nb.n_chars >= cfg.min_block_chars and nb.tag_path.rsplit("/", 1)[0] == parent:
                        b.kept = nb.kept
                        break


@lru_cache(maxsize=8)
def _label_tables(field_labels: tuple[str, ...]):
    """Per-config normalized-label tables, built once (normalize_str's
    NFD pass per label per DOCUMENT measured ~3% of extraction wall)."""
    norm_labels = {lbl: normalize_str(lbl) for lbl in field_labels}
    # exact normalized label -> first config label carrying it (dict
    # iteration order == cfg order, matching the scan-loop tie-break)
    exact: dict[str, str] = {}
    for lbl, nlbl in norm_labels.items():
        exact.setdefault(nlbl, lbl)
    return norm_labels, exact


def extract_fields(
    candidates: list[str], blocks: list[Block], cfg: ExtractConfig
) -> tuple[dict[str, str], dict[str, str]]:
    """Label -> value extraction over candidate lines.

    ≙ `find_next_right_word` (/root/reference/analysis/cv/
    document_parsing.py:132-198): fuzzy label match within
    ``distance_margin`` (≙ `get_box_corresponding_to_word`
    `document_parsing.py:87-99`), value = trailing text after ':'
    (≙ nearest following box), with the three-way FOUND/EMPTY/NOT_FOUND
    sentinel semantics (`document_parsing.py:167,195`).
    """
    fields: dict[str, str] = {}
    status: dict[str, str] = {lbl: STATUS_NOT_FOUND for lbl in cfg.field_labels}

    norm_labels, exact = _label_tables(cfg.field_labels)
    for line in candidates:
        if ":" not in line:  # _LABEL_RE requires a ':' — skip the regex
            continue
        m = _LABEL_RE.match(line)
        if not m:
            continue
        raw_label, raw_value = m.group(1), m.group(2).strip()
        nl = normalize_str(raw_label)
        best = exact.get(nl)  # distance 0 is unbeatable; skip the DP scan
        if best is None:
            best_d = cfg.distance_margin + 1
            for lbl, nlbl in norm_labels.items():
                d = levenshtein(nl, nlbl, limit=cfg.distance_margin)
                if d < best_d:
                    best, best_d = lbl, d
        if best is None or status[best] == STATUS_FOUND:
            continue
        if raw_value:
            fields[best] = raw_value[: cfg.max_value_chars]
            status[best] = STATUS_FOUND
        else:
            status[best] = STATUS_EMPTY

    # title: first KEPT heading block of the lowest level present (h1
    # wins over h2/h3...; sidebar/nav headings never qualify) — ≙
    # block-2 driver-name extraction role
    if "title" in status and status["title"] != STATUS_FOUND:
        best_b = None
        for b in blocks:
            if b.heading and b.kept and b.text and (best_b is None or b.heading_level < best_b.heading_level):
                best_b = b
        if best_b is not None:
            fields["title"] = best_b.text[: cfg.max_value_chars]
            status["title"] = STATUS_FOUND
    # contact: first email anywhere (≙ stamp-presence analogue)
    if "contact" in status and status["contact"] != STATUS_FOUND:
        for line in candidates:
            em = _EMAIL_RE.search(line)
            if em:
                fields["contact"] = em.group(0)
                status["contact"] = STATUS_FOUND
                break
    return fields, status


def _empty_result(url, warc_ts, lang, content_type, error) -> dict:
    return {
        "url": url,
        "warc_ts": warc_ts,
        "lang": lang,
        "content_type": content_type,
        "extracted_text": "",
        "fields": {},
        "field_status": {},
        "blocks": [],
        "quality": {
            "is_readable": False,
            "charset_ok": False,
            "parse_ok": False,
            "yield_ratio": 0.0,
            "n_blocks": 0,
            "n_kept": 0,
            "has_byline": False,
            "has_contact": False,
        },
        "pred_lang": "und",
        "error": error,
    }


def extract_row(url, warc_ts, lang, payload: bytes, cfg: ExtractConfig, _raw_blocks: bool = False) -> dict:
    """Extract one page.  Pure; never raises.

    ``_raw_blocks=True`` (internal, used by the batch path) returns the
    ``Block`` objects themselves under "blocks" instead of per-block
    dicts — the batch assembler builds the Arrow list<struct> column
    columnar from their attributes, skipping ~n_blocks dict
    allocations per page."""
    try:
        if payload is None:
            return _empty_result(url, warc_ts, lang, "unknown", "empty_payload")
        # --- content sniff + branch ---------------------------------------
        if payload[:5] == b"%PDF-":
            content_type = "application/pdf"
            charset_ok = True
            pdf_blocks, pdf_lines, err = parse_pdf(payload)
            if err is not None:
                return _empty_result(url, warc_ts, lang, content_type, err)
            blocks = []
            for pb in pdf_blocks:
                b = Block(tag_path=f"pdf/size{pb.size}", heading=pb.heading, chrome=False)
                b.text = collapse_ws(pb.text)
                b.finish()
                blocks.append(b)
            candidates = pdf_lines
            parse_ok = True
            # metadata blocks (label lines) are not main content
            for b in blocks:
                if _LABEL_RE.match(b.text) and len(b.text.split(":")[0]) <= 12:
                    b.chrome = True
        else:
            content_type = "text/html"
            try:
                html_text = payload.decode("utf-8")
                charset_ok = True
            except UnicodeDecodeError:
                html_text = payload.decode("latin-1")
                charset_ok = False
            blocks, parse_ok = parse_html_blocks(html_text)
            candidates = [b.text for b in blocks]

        # --- score + assemble text ----------------------------------------
        score_blocks(blocks, cfg)
        parts = []
        offset = 0
        for b in blocks:
            if b.kept:
                b.start = offset + (2 if parts else 0)
                b.end = b.start + b.n_chars
                offset = b.end
                parts.append(b.text)
        extracted = "\n\n".join(parts)

        fields, field_status = extract_fields(candidates, blocks, cfg)

        total_chars = sum(b.n_chars for b in blocks)
        yield_ratio = len(extracted) / total_chars if total_chars else 0.0
        # lang-ID needs evidence: short extractions stay "und"
        if extracted and len(extracted.split()) >= 15:
            pred_lang, _ = langid_text(extracted)
        else:
            pred_lang = "und"
        has_byline = field_status.get("author") == STATUS_FOUND or any(
            _BYLINE_RE.match(c) for c in candidates
        )
        has_contact = field_status.get("contact") == STATUS_FOUND
        quality = {
            "is_readable": bool(
                charset_ok
                and parse_ok
                and len(extracted) >= cfg.min_readable_chars
                and yield_ratio >= cfg.min_yield_ratio
            ),
            "charset_ok": charset_ok,
            "parse_ok": parse_ok,
            "yield_ratio": yield_ratio,
            "n_blocks": len(blocks),
            "n_kept": sum(1 for b in blocks if b.kept),
            "has_byline": bool(has_byline),
            "has_contact": bool(has_contact),
        }
        return {
            "url": url,
            "warc_ts": warc_ts,
            "lang": lang,
            "content_type": content_type,
            "extracted_text": extracted,
            "fields": fields,
            "field_status": field_status,
            "blocks": blocks if _raw_blocks else [
                {
                    "start": b.start,
                    "end": b.end,
                    "score": b.score,
                    "kept": b.kept,
                    "tag_path": b.tag_path,
                    "link_density": b.link_density,
                }
                for b in blocks
            ],
            "quality": quality,
            "pred_lang": pred_lang,
            "error": None,
        }
    except Exception as exc:  # absolute backstop: rows never kill a batch
        return _empty_result(url, warc_ts, lang, "unknown", f"extract_error:{type(exc).__name__}")


class Extractor:
    """Actor-pool stage: ``map_batches(Extractor, fn_constructor_kwargs=
    {'cfg': cfg}, concurrency=N, batch_size=B, batch_format='pyarrow')``.

    ``__init__`` runs once per actor (compiled regexes / config / stop
    tables are module-level constants, warmed on first import in the
    actor process); ``__call__`` runs per batch and is pure.
    """

    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or DEFAULT_CONFIG

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("html").to_pylist()
        cfg = self.cfg
        # url/warc_ts/lang pass through ZERO-COPY from the input batch
        # (extract_row only ever echoes them; round-tripping 3 columns
        # through Python objects — datetime included — was pure
        # allocator traffic on the 32-worker hot path)
        #
        # blocks: columnar list<struct> assembly straight from the Block
        # attributes (one flat child array per field + offsets), no
        # per-block dicts — and flattened PER ROW so the Block objects
        # die immediately: keeping ~batch_size*n_blocks slotted objects
        # alive for a whole-batch flatten measured 23% SLOWER than the
        # dict path purely from cyclic-GC generation scans over the
        # live-object pile (gc.disable() recovers it — the streaming
        # flatten keeps the live set one row deep instead).
        offsets = [0]
        starts: list[int] = []
        ends: list[int] = []
        scores: list[float] = []
        kepts: list[bool] = []
        paths: list[str] = []
        lds: list[float] = []
        rows: list[dict] = []
        for p in payloads:
            r = extract_row(None, None, None, p, cfg, _raw_blocks=True)
            for b in r["blocks"]:
                starts.append(b.start)
                ends.append(b.end)
                scores.append(b.score)
                kepts.append(b.kept)
                paths.append(b.tag_path)
                lds.append(b.link_density)
            r["blocks"] = None  # Blocks die here, not at batch end
            offsets.append(len(starts))
            rows.append(r)
        # NOTE: `html` is dropped here on purpose — downstream stages and
        # shuffles never move the raw payload (SURVEY.md §7 "very wide rows").
        struct = pa.StructArray.from_arrays(
            [
                pa.array(starts, pa.int64()),
                pa.array(ends, pa.int64()),
                pa.array(scores, pa.float64()),
                pa.array(kepts, pa.bool_()),
                pa.array(paths, pa.string()),
                pa.array(lds, pa.float64()),
            ],
            fields=list(BLOCK_STRUCT),
        )
        blocks_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        built = {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "blocks": blocks_arr,
        }
        cols = [
            built.get(name)
            if name in built
            else pa.array([r[name] for r in rows], type=RESULT_SCHEMA.field(name).type)
            for name in RESULT_SCHEMA.names
        ]
        return pa.Table.from_arrays(cols, schema=RESULT_SCHEMA)
