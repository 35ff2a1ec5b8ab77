"""Differential equivalence: fast scanner AND fused scanner+block-
builder vs stdlib HTMLParser.

Both fast engines must produce the IDENTICAL block stream (text,
tag_path, chrome/heading flags, link chars) as the stdlib parser for
every input we can throw at it: the full synthetic corpus (including
truncated and bad-charset pages), arbitrary prefixes (EOF mid-
construct), and hypothesis-mutated documents."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from document_ai_ray.stages.html_extract import parse_html_blocks
from document_ai_ray.synth import gen_page


def _sig(blocks):
    return [
        (b.text, b.tag_path, b.chrome, b.heading, b.heading_level, b.link_chars)
        for b in blocks
    ]


def _assert_equiv(html_text: str):
    fast, ok_f = parse_html_blocks(html_text, engine="fast")
    fused, ok_u = parse_html_blocks(html_text, engine="fused")
    std, ok_s = parse_html_blocks(html_text, engine="stdlib")
    assert ok_f == ok_s == ok_u
    sig_std = _sig(std)
    assert _sig(fast) == sig_std
    assert _sig(fused) == sig_std


def test_equivalence_on_corpus():
    for i in range(600):
        p = gen_page(i)
        if p["html"][:5] == b"%PDF-":
            continue
        try:
            text = p["html"].decode("utf-8")
        except UnicodeDecodeError:
            text = p["html"].decode("latin-1")
        _assert_equiv(text)


def test_equivalence_on_prefixes():
    # EOF in every construct: tags, attrs, comments, scripts, entities
    p = gen_page(0)
    text = p["html"].decode("utf-8")
    for cut in range(0, len(text), 37):
        _assert_equiv(text[:cut])


def test_equivalence_edge_cases():
    cases = [
        "",
        "plain text only",
        "a &amp; b &lt;tag&gt; &unknown; &#65; &#x41; &#xZZ; tail",
        "<p>a<p>b</p>",                      # unclosed
        "<P CLASS='x'>UPPER</P>",            # case
        "<a href='x>y'>quoted gt</a>",       # '>' inside quoted attr
        '<a href="x>y">quoted gt</a>',
        "<br/><hr />text",                   # self-closing
        "<script>var x = '<p>not a tag</p>';</script>after",
        "<script>no closer at eof",
        "<style>p{}</style>done",
        "<!-- comment <p>inside</p> -->after",
        "<!-- unterminated comment",
        "<!DOCTYPE html><p>x</p>",
        "<!doctype junk",
        "<?php echo '>' ?>tail",
        "<?unterminated pi",
        "</>empty end",
        "</ bogus>tail",
        "</123>tail",
        "< p>not a tag</p>",
        "<p attr>bare attr</p>",
        "<p attr=>empty val</p>",
        "<p/ >weird slash</p>",
        "<p",                                # EOF in tag
        "<p class",                          # EOF in attr name
        "<p class=",                         # EOF before value
        "<p class='x",                       # EOF in quoted value
        "text <",                            # lone '<' at EOF
        "text < x",
        "a<![CDATA[raw]]>b",
        "a<![include[x]]>b",
        "<p>&aamp;half&</p>",
        "&#",
        "tail &unterminated",
    ]
    for c in cases:
        _assert_equiv(c)


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>/!&;#abcPSZ '\"=-\n\tä€𝄞")),
        max_size=80,
    )
)
def test_equivalence_hypothesis_soup(s):
    _assert_equiv(s)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 199), st.integers(0, 3000), st.integers(0, 40))
def test_equivalence_hypothesis_mutations(idx, cut, ins):
    p = gen_page(idx)
    if p["html"][:5] == b"%PDF-":
        return
    text = p["html"].decode("utf-8", "replace")
    mutated = text[:cut] + "<scr<!--&am" [: ins % 12] + text[cut + ins :]
    _assert_equiv(mutated)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_collapse_ws_canon_properties(s):
    """Whitespace-canon invariants: idempotent, no canonical whitespace
    other than single ASCII spaces, never leading/trailing space."""
    from document_ai_ray.functions.strings import collapse_ws

    c = collapse_ws(s)
    assert collapse_ws(c) == c
    assert "  " not in c
    for ch in "\t\r\n\f\v\xa0":
        assert ch not in c
    assert c == c.strip(" ")


def test_collapse_ws_fast_path_differential():
    """The clean-string fast path must be byte-equivalent to the frozen
    canon sub+strip on every input — including Unicode whitespace
    OUTSIDE the collapse class (U+2028/U+3000/\x85/\x1c...) that
    .strip() removes at edges but sub() leaves in the interior."""
    import random
    import re

    from document_ai_ray.functions.strings import collapse_ws

    ws = re.compile("[ \t\r\n\f\v\xa0]+")

    def ref(s: str) -> str:
        return ws.sub(" ", s).strip()

    explicit = [
        "", " ", "  ", "ok", "a b", "a  b", "\ta", "a\xa0b", " a ",
        "hello　", " abc", "hello\x85", "hello\x1c", "　",
        "a b", "x y", "a b c ", " x",
    ]
    for s in explicit:
        assert collapse_ws(s) == ref(s), repr(s)
    rng = random.Random(7)
    chars = "ab \t\n\xa0　\x85\x1c "
    for _ in range(5000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 10)))
        assert collapse_ws(s) == ref(s), repr(s)
