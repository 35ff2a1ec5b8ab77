"""Deterministic synthetic page corpus (FIXTURES.md F1).

Mirrors the role of the reference's labeled image corpus
(/root/reference/data/performances_data/valid_data/arval_classic_restitution_images/)
as the ground truth for extraction tests: every page is generated from a
per-row RNG keyed by (seed, row index) so generation is order-independent
and parallelizable — a batch of rows [i..j) can be produced by any worker
and is byte-identical wherever it runs.

Page anatomy (what the extractor must cope with):
  - head/script/style noise, link-dense header/nav/sidebar/footer chrome
  - a <main><article> with h1 + labeled meta fields + paragraphs
  - ~5%% rows carry a synthetic ``%%PDF-`` payload instead of HTML
  - ~2%% malformed rows (truncated tags / bad encoding)
  - deliberate label pathologies: missing field (NOT_FOUND), label with
    no value (EMPTY), typo'd label (fuzzy match), link-farm pages,
    tiny-content pages, lang-mismatched pages
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from document_ai_ray.config import PAGES_SCHEMA

WORDS = {
    "en": (
        "the quick brown fox jumps over a lazy dog while morning light settles "
        "across quiet fields and distant hills carry echoes of passing trains "
        "toward small towns where people gather near warm windows reading stories "
        "about rivers bridges harvest seasons and the slow work of growing things"
    ).split(),
    "fr": (
        "le renard brun saute par dessus un chien tranquille pendant que la "
        "lumière du matin traverse les champs et les collines portent les échos "
        "des trains vers les petites villes où les gens lisent des histoires sur "
        "les rivières les ponts les saisons et le travail lent des choses"
    ).split(),
    "de": (
        "der braune fuchs springt über einen ruhigen hund während das morgenlicht "
        "über stille felder zieht und ferne hügel das echo der züge zu kleinen "
        "städten tragen wo menschen geschichten über flüsse brücken ernte und die "
        "langsame arbeit des wachsens lesen"
    ).split(),
    "es": (
        "el zorro marrón salta sobre un perro tranquilo mientras la luz de la "
        "mañana cruza los campos silenciosos y las colinas llevan los ecos de los "
        "trenes hacia pueblos pequeños donde la gente lee historias sobre ríos "
        "puentes cosechas y el trabajo lento de las cosas que crecen"
    ).split(),
    "it": (
        "la volpe marrone salta sopra un cane tranquillo mentre la luce del "
        "mattino attraversa i campi silenziosi e le colline portano gli echi dei "
        "treni verso piccoli paesi dove la gente legge storie su fiumi ponti "
        "raccolti e il lavoro lento delle cose che crescono"
    ).split(),
}
LANGS = ["en", "fr", "de", "es", "it"]
FIRST = ["Jane", "Omar", "Li", "Ana", "Pierre", "Sofia", "Kenji", "Tara", "Mikael", "Nour"]
LAST = ["Martin", "Okafor", "Chen", "Silva", "Dupont", "Rossi", "Tanaka", "Haddad", "Berg", "Khan"]
NAV_WORDS = ["home", "about", "products", "pricing", "blog", "careers", "contact", "login", "terms", "privacy", "help", "docs"]

EPOCH = datetime(2024, 1, 1)


def _sentence(rng: random.Random, words: list[str], lo: int = 8, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(words) for _ in range(n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: random.Random, words: list[str], n_sent: int | None = None) -> str:
    n = n_sent if n_sent is not None else rng.randint(2, 4)
    return " ".join(_sentence(rng, words) for _ in range(n))


def _links(rng: random.Random, n: int) -> str:
    return "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in (rng.choice(NAV_WORDS) for _ in range(n))
    )


def make_pdf_bytes(title: str, fields: dict[str, str], paragraphs: list[str], rng: random.Random) -> bytes:
    """Synthetic PDF-like payload (our own deterministic subset).

    Mirrors the reference's PDF branch (pdf2image rasterize,
    /root/reference/analysis/cv/document_parsing.py:5-14) as a layout
    problem: text lines carry (x, y, size) coordinates, are emitted in
    SHUFFLED object order, and the extractor must reconstruct reading
    order by (-y, x) then group lines into blocks by vertical gaps.
    Real-PDF decoding would need poppler/pdfminer (not in this
    container); anything outside this subset yields `pdf_parse_error`.
    """
    lines: list[tuple[float, float, int, str]] = []  # (x, y, size, text)
    y = 760.0
    lines.append((72.0, y, 18, title))
    y -= 28
    for k, v in fields.items():
        lines.append((72.0, y, 10, f"{k.capitalize()}: {v}".strip()))
        y -= 14
    y -= 10
    for p in paragraphs:
        # wrap ~70 chars per line
        words, cur = p.split(" "), ""
        for w in words:
            if cur and len(cur) + 1 + len(w) > 70:
                lines.append((72.0, y, 12, cur))
                y -= 15
                cur = w
            else:
                cur = f"{cur} {w}".strip() if cur else w
        if cur:
            lines.append((72.0, y, 12, cur))
            y -= 15
        y -= 12  # paragraph gap
    order = list(range(len(lines)))
    rng.shuffle(order)  # exercise reading-order reconstruction
    body_parts = []
    for i in order:
        x, yy, size, text = lines[i]
        esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        body_parts.append(f"BT /F1 {size} Tf {x:.1f} {yy:.1f} Td ({esc}) Tj ET")
    body = "\n".join(body_parts)
    return (f"%PDF-1.4\n% synthetic layout subset\n{body}\n%%EOF\n").encode("utf-8")


def make_html(
    rng: random.Random,
    *,
    k: int,
    lang: str,
    title: str,
    fields: dict[str, str | None],
    paragraphs: list[str],
    contact_email: str | None,
    link_farm: bool = False,
) -> str:
    meta_items = []
    for label, value in fields.items():
        if value is None:
            continue
        meta_items.append(f"<li>{label.capitalize()}: {value}</li>")
    meta = f'<ul class="meta">{"".join(meta_items)}</ul>' if meta_items else ""
    if link_farm:
        # a true link farm carries NO article content — no h1, no meta,
        # only link listings (keeps every downstream cause deterministic
        # across languages instead of riding the density threshold)
        body_main = f'<ul class="listing">{_links(rng, 40)}</ul>'
        meta = ""
        title_h1 = ""
    else:
        body_main = "\n".join(f"<p>{p}</p>" for p in paragraphs)
        title_h1 = f"<h1>{title}</h1>\n"
    contact = (
        f'<p class="contact">Contact: <a href="mailto:{contact_email}">{contact_email}</a></p>'
        if contact_email
        else ""
    )
    return (
        "<!DOCTYPE html>\n"
        f'<html lang="{lang}">\n'
        f"<head><title>{title}</title><meta charset=\"utf-8\">"
        "<style>body{font:14px/1.4 sans-serif;color:#222}</style>"
        "<script>var t=Date.now();console.log(t);</script></head>\n"
        "<body>\n"
        f'<header><div class="logo"><a href="/">Site {k}</a></div>'
        f"<ul class=\"topnav\">{_links(rng, 8)}</ul></header>\n"
        f"<nav><ul>{_links(rng, 10)}</ul></nav>\n"
        f'<div class="sidebar"><h3>More</h3><ul>{_links(rng, 12)}</ul></div>\n'
        "<main><article>\n"
        f"{title_h1}"
        f"{meta}\n"
        f"{body_main}\n"
        f"{contact}\n"
        "</article></main>\n"
        f"<footer><ul>{_links(rng, 6)}</ul><p>© 2024 Site {k}. All rights reserved.</p></footer>\n"
        "</body></html>\n"
    )


def gen_page(i: int, seed: int = 42) -> dict:
    """Generate row ``i`` of the synthetic pages table (order-independent)."""
    rng = random.Random((seed << 32) ^ i)
    lang = LANGS[i % len(LANGS)]
    words = WORDS[lang]
    k = i % 37
    url = f"https://site{k}.example/{lang}/page{i}"
    ts = EPOCH + timedelta(seconds=137 * i)
    title = _sentence(rng, words, 4, 8)[:-1]  # no trailing period in titles
    author = f"{rng.choice(FIRST)} {rng.choice(LAST)}"
    date = (EPOCH + timedelta(days=rng.randint(0, 400))).strftime("%Y-%m-%d")
    ref = f"REF-{rng.randint(1000, 9999)}-{rng.choice('ABCDEFGH')}"
    email = f"{author.split()[0].lower()}@site{k}.example"
    n_para = rng.randint(2, 5)
    paragraphs = [_paragraph(rng, words) for _ in range(n_para)]

    mod = i % 100
    fields: dict[str, str | None] = {"author": author, "date": date, "reference": ref}
    link_farm = False
    contact: str | None = email
    body_lang = lang
    if mod in (7, 57):          # missing author -> NOT_FOUND
        fields["author"] = None
    if mod in (11, 61):         # empty date -> EMPTY ("Date:" with no value)
        fields["date"] = ""
    if mod in (13,):            # typo'd label -> fuzzy match ("Athor")
        fields = {("athor" if f == "author" else f): v for f, v in fields.items()}
    if mod in (17, 67):         # link farm page
        link_farm = True
        contact = None
    if mod in (19,):            # tiny content
        paragraphs = [_sentence(rng, words, 3, 4)]
    if mod in (23,):            # lang mismatch: body words from another lang
        body_lang = LANGS[(i + 2) % len(LANGS)]
        paragraphs = [_paragraph(rng, WORDS[body_lang]) for _ in range(n_para)]
    if mod in (29,):            # no contact
        contact = None

    text_plain = "\n".join(paragraphs)

    if mod in (3, 53, 83):      # ~3% synthetic PDF payload
        pdf_fields = {kk: vv for kk, vv in fields.items() if vv}
        if contact:
            pdf_fields["contact"] = contact
        payload = make_pdf_bytes(title, pdf_fields, paragraphs, rng)
    else:
        html = make_html(
            rng,
            k=k,
            lang=lang,
            title=title,
            fields=fields,
            paragraphs=paragraphs,
            contact_email=contact,
            link_farm=link_farm,
        )
        if mod in (41,):        # truncated page (malformed)
            html = html[: int(len(html) * 0.6)]
        if mod in (43,):        # bad encoding: latin-1 bytes with utf-8 charset claim
            payload = html.replace("©", "©").encode("latin-1", "replace")
        else:
            payload = html.encode("utf-8")

    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": text_plain,
        "lang": lang,
    }


def pages_table(n: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Arrow table of rows [start, start+n) of the synthetic corpus."""
    rows = [gen_page(i, seed) for i in range(start, start + n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_dataset(n: int, seed: int = 42, parallelism: int = 8):
    """Distributed generation: `ray.data.range(n)` -> map_batches(gen).

    The generator itself runs inside tasks (order-independent per-row
    RNG), so a 10^12-row corpus never exists on the driver.
    """
    import ray.data as rd

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.Table.from_pylist([gen_page(i, seed) for i in ids], schema=PAGES_SCHEMA)

    return (
        rd.range(n, override_num_blocks=parallelism)
        .map_batches(_gen, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Roundtrip wrapper over the driver's `documents` table: wrap each
# document's text in deterministic boilerplate so extraction must recover
# `text` byte-identically (the DuckDB-oracle form of the golden-fixture
# byte-identity check).
# ---------------------------------------------------------------------------

def wrap_documents_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, ...) -> pages rows with url='doc://<id>'.

    The whole text goes into ONE <p> inside <main> (html-escaped);
    chrome is link-dense nav/footer the extractor must strip.  Because
    the source text is single-spaced, the collapse-whitespace canon is
    the identity on it.
    """
    import html as html_mod

    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    rows = []
    for doc_id, text, lang in zip(doc_ids, texts, langs):
        rng = random.Random(doc_id ^ 0x5EED)
        html = (
            "<!DOCTYPE html>\n"
            f'<html lang="{lang}"><head><title>doc {doc_id}</title>'
            "<script>var n=0;</script><style>p{margin:0}</style></head>\n"
            f"<body><nav><ul>{_links(rng, 9)}</ul></nav>\n"
            f"<main><p>{html_mod.escape(text)}</p></main>\n"
            f"<footer><ul>{_links(rng, 5)}</ul></footer></body></html>\n"
        )
        rows.append(
            {
                "url": f"doc://{doc_id}",
                "warc_ts": EPOCH + timedelta(seconds=int(doc_id)),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def expected_causes(i: int) -> list[str] | None:
    """Intended refusal causes for row ``i`` of the synthetic corpus —
    the analogue of the reference's admin-labeled ground-truth cause
    CSVs (/root/reference/data/performances_data/*_ground_truth.csv).

    Only pathologies with an unambiguous intent are labeled; rows whose
    outcome depends on heuristic calibration (truncation, charset
    repair) return None and are excluded from the labeled subset, like
    docs absent from the reference's ground-truth CSV.
    """
    mod = i % 100
    if mod in (41, 43):          # truncated / bad-charset: outcome heuristic
        return None
    causes = []
    if mod in (7, 57):
        causes += ["author_is_not_filled", "byline_is_not_present"]
    if mod in (11, 61):
        causes.append("date_is_not_filled")
    if mod in (17, 67):
        causes += [
            "quality_is_not_ok", "extracted_text_is_empty", "link_farm",
            "contact_is_not_present", "byline_is_not_present",
            "title_is_not_filled", "author_is_not_filled",
            "date_is_not_filled", "reference_is_not_filled",
        ]
    if mod in (19,):
        causes += ["quality_is_not_ok", "too_short"]
    if mod in (23,):
        causes.append("lang_mismatch")
    if mod in (29,):
        causes.append("contact_is_not_present")
    if mod in (3, 53, 83):       # pdf rows never carry the html contact link
        pass
    return sorted(set(causes))


def golden_causes_table(n: int, seed: int = 42) -> pa.Table:
    """(url, causes, validated) for the labeled subset of rows [0, n)."""
    rows = []
    for i in range(n):
        causes = expected_causes(i)
        if causes is None:
            continue
        rows.append(
            {"url": gen_page(i, seed)["url"], "causes": causes, "validated": not causes}
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("url", pa.string()), ("causes", pa.list_(pa.string())), ("validated", pa.bool_())]
        ),
    )


def skewed_pages_table(n: int, seed: int = 42, giant_every: int = 50, giant_mb: int = 2) -> pa.Table:
    """F1 `pages_skewed`: mostly ~kB rows with periodic multi-MB rows —
    exercises size-bucketed salting / bytes-capped batching."""
    rows = []
    for i in range(n):
        row = gen_page(i, seed)
        if i % giant_every == 0:
            rng = random.Random((seed << 32) ^ i ^ 0xB16)
            words = WORDS[LANGS[i % len(LANGS)]]
            big = " ".join(_paragraph(rng, words) for _ in range(giant_mb * 300))
            row = dict(row)
            row["html"] = make_html(
                rng, k=i % 37, lang=row["lang"], title="big", fields={},
                paragraphs=[big], contact_email=None,
            ).encode("utf-8")
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def _rle_encode(data: bytes) -> bytes:
    """PDF /RunLengthDecode encoder: repeat runs >= 3 as (257-n, byte),
    literal runs as (n-1, bytes), 128 EOD."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            if lit_start < i:
                for k in range(lit_start, i, 128):
                    chunk = data[k : min(k + 128, i)]
                    out += bytes([len(chunk) - 1]) + chunk
            out += bytes([257 - (j - i), data[i]])
            i = j
            lit_start = i
        else:
            i = j
    if lit_start < n:
        for k in range(lit_start, n, 128):
            chunk = data[k : min(k + 128, n)]
            out += bytes([len(chunk) - 1]) + chunk
    out.append(128)
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """PDF /LZWDecode encoder (EarlyChange=1): greedy longest-match,
    9..12-bit MSB-first codes, leading clear (256), trailing EOD (257),
    table reset at 4095."""
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int):
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # the decoder adds its k-th entry one code LATER than we do
        # (its first code after clear adds nothing), so its table holds
        # next_code-1 entries when it reads our next emission; mirror
        # its EarlyChange widen (len >= 2^w - 1) in those terms
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code == 4095:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
    emit(257, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _encode_filters(content: bytes, filters: list[str]) -> bytes:
    """Apply stream encoders so that DECODING in `filters` order
    recovers `content` (i.e. encode in reverse order)."""
    import base64
    import binascii
    import zlib

    data = content
    for name in reversed(filters):
        if name == "FlateDecode":
            data = zlib.compress(data)
        elif name == "ASCIIHexDecode":
            data = binascii.hexlify(data) + b">"
        elif name == "ASCII85Decode":
            data = base64.a85encode(data, adobe=True)[2:]  # keep '~>' EOD
        elif name == "RunLengthDecode":
            data = _rle_encode(data)
        elif name == "LZWDecode":
            data = _lzw_encode(data)
        else:
            raise ValueError(f"no encoder for {name}")
    return data


def make_real_pdf_bytes(
    title: str,
    paragraphs: list[str],
    compress: bool = True,
    filters: list[str] | None = None,
    xref_stream: bool = False,
    hex_strings: bool = False,
    cid_font: bool = False,
    images: list[tuple[bytes, int, int]] | None = None,
) -> bytes:
    """A minimal REAL-format single-page PDF (header, catalog/pages/
    page/font objects, filtered content stream, xref, trailer) whose
    content stream uses the standard text operators (BT/Tf/Td/Tj/ET).
    Unlike `make_pdf_bytes` (the bare synthetic subset) this exercises
    the real-PDF branch of `pdf_extract.parse_pdf`: object/stream
    scanning + /Filter chain decode + content-stream tokenization.

    `filters` (decode order, e.g. ["ASCII85Decode", "FlateDecode"])
    overrides `compress`.  `xref_stream=True` emits a PDF 1.5-style
    layout instead of a classic xref table: the content stream's
    /Length is an INDIRECT reference whose integer object lives inside
    a FlateDecode /ObjStm, and the file ends with a /Type /XRef
    cross-reference STREAM (no `trailer` keyword).

    `images` = [(jpeg_bytes, width, height), ...] embeds each as a
    /Subtype /Image XObject with /Filter /DCTDecode (classic layout
    only), referenced from the page resources and painted by a
    `cm /ImN Do` pair in the content stream — the layout real PDFs use
    for photos (≙ the reference rasterizing whole pages images
    included, /root/reference/ai_documents/analysis/cv/document_parsing.py:5-14)."""
    import zlib

    lines: list[tuple[float, float, int, str]] = []
    y = 760.0
    if title:
        lines.append((72.0, y, 18, title))
        y -= 30
    for p in paragraphs:
        words, cur = p.split(" "), ""
        for w in words:
            if cur and len(cur) + 1 + len(w) > 70:
                lines.append((72.0, y, 12, cur))
                y -= 15
                cur = w
            else:
                cur = f"{cur} {w}".strip() if cur else w
        if cur:
            lines.append((72.0, y, 12, cur))
            y -= 15
        y -= 12
    cmap_stream: bytes | None = None
    parts = []
    if cid_font:
        # Identity-H-style Type0 font: every distinct char gets a
        # 2-byte CID, text shows as <code code ...>, and a /ToUnicode
        # CMap stream maps the CIDs back to Unicode
        assert not xref_stream, "cid_font fixture uses the classic layout"
        chars = sorted({c for _, _, _, text in lines for c in text})
        code_of = {c: i + 1 for i, c in enumerate(chars)}
        for x, yy, size, text in lines:
            codes = "".join(f"{code_of[c]:04x}" for c in text)
            parts.append(f"BT /F1 {size} Tf {x:.1f} {yy:.1f} Td <{codes}> Tj ET")
        cm = [
            "/CIDInit /ProcSet findresource begin",
            "12 dict begin",
            "begincmap",
            "1 begincodespacerange",
            "<0000> <ffff>",
            "endcodespacerange",
        ]
        items = [(code_of[c], c) for c in chars]
        for i in range(0, len(items), 100):        # spec: <=100 per bfchar block
            chunk = items[i : i + 100]
            cm.append(f"{len(chunk)} beginbfchar")
            for code, ch in chunk:
                cm.append(f"<{code:04x}> <{ch.encode('utf-16-be').hex()}>")
            cm.append("endbfchar")
        cm += ["endcmap", "end", "end"]
        import zlib as _z

        cmap_stream = _z.compress("\n".join(cm).encode("ascii"))
    else:
        for x, yy, size, text in lines:
            if hex_strings:
                # hex-string form <48656c6c6f> Tj — common in real PDFs
                parts.append(
                    f"BT /F1 {size} Tf {x:.1f} {yy:.1f} Td <{text.encode('utf-8').hex()}> Tj ET"
                )
            else:
                esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
                parts.append(f"BT /F1 {size} Tf {x:.1f} {yy:.1f} Td ({esc}) Tj ET")
    content = "\n".join(parts).encode("utf-8")
    if filters is None:
        filters = ["FlateDecode"] if compress else []
    body_stream = _encode_filters(content, filters) if filters else content
    if not filters:
        filt = b""
    elif len(filters) == 1:
        filt = b"/Filter /%s " % filters[0].encode()
    else:
        filt = b"/Filter [%s] " % b" ".join(b"/" + f.encode() for f in filters)

    if xref_stream:
        # PDF 1.5 layout: content /Length is indirect (object 7, packed
        # in a FlateDecode /ObjStm), xref is itself a stream object
        objs: list[bytes] = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
            b"<< /Length 7 0 R %s>>\nstream\n%s\nendstream" % (filt, body_stream),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ]
        objstm_payload = b"7 0\n%d" % len(body_stream)
        objstm_body = zlib.compress(objstm_payload)
        objs.append(
            b"<< /Type /ObjStm /N 1 /First 4 /Length %d /Filter /FlateDecode >>"
            b"\nstream\n%s\nendstream" % (len(objstm_body), objstm_body)
        )
        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, obj in enumerate(objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
        # xref STREAM (object 8): /W [1 4 1] entries for objects 0..8
        xref_pos = len(out)
        entries = bytearray(b"\x00" + (0).to_bytes(4, "big") + b"\xff")
        for off in offsets[1:]:
            entries += b"\x01" + off.to_bytes(4, "big") + b"\x00"
        entries += b"\x02" + (6).to_bytes(4, "big") + b"\x00"   # obj 7 in ObjStm 6
        entries += b"\x01" + xref_pos.to_bytes(4, "big") + b"\x00"
        xbody = zlib.compress(bytes(entries))
        out += (
            b"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 1] /Root 1 0 R "
            b"/Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
            % (len(xbody), xbody)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
        return bytes(out)

    assert not (images and xref_stream), "image fixture uses the classic layout"
    n_base = 6 if cid_font else 5  # last object number before the images
    res = b"<< /Font << /F1 5 0 R >> "
    if images:
        xrefs = b" ".join(
            b"/Im%d %d 0 R" % (i + 1, n_base + 1 + i) for i in range(len(images))
        )
        res += b"/XObject << %s >> " % xrefs
    res += b">>"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources %s >>" % res,
        b"<< /Length %d %s>>\nstream\n%s\nendstream" % (len(body_stream), filt, body_stream),
        (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
            if cid_font
            else b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        ),
    ]
    if cid_font:
        objs.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(cmap_stream), cmap_stream)
        )
    for jpeg, iw, ih in images or []:
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            b"/Filter /DCTDecode /Length %d >>\nstream\n%s\nendstream"
            % (iw, ih, len(jpeg), jpeg)
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# F5 classifier corpus: quality / presence labels encoded BY CONSTRUCTION
# (≙ the reference's label-in-path few-shot corpus,
# /root/reference/data/few_shots/{quality,signatures_and_stamps,...}/).
# ---------------------------------------------------------------------------

_F5_KINDS = [  # (label_quality, label_presence)
    ("goodQuality", "both"),
    ("goodQuality", "byline"),
    ("goodQuality", "contact"),
    ("goodQuality", "none"),
    ("badQuality", "none"),      # link farm
    ("badQuality", "none"),      # tiny content
    ("goodQuality", "both"),
    ("badQuality", "contact"),   # tiny but carries a contact line
]


def classifier_corpus(n: int = 80, seed: int = 9) -> pa.Table:
    """(url, html, label_quality, label_presence) — deterministic pages
    whose classifier ground truth is encoded by construction:
    byline = a 'By <name>' line, contact = an email line, badQuality =
    link-farm or tiny-content page.  The classifier stages must score
    100% on this corpus (see tests)."""
    words = WORDS["en"]
    rows = []
    for i in range(n):
        rng = random.Random((seed << 40) ^ i)
        quality, presence = _F5_KINDS[i % len(_F5_KINDS)]
        kind = i % len(_F5_KINDS)
        body: list[str] = []
        if kind == 4:
            body_main = f'<ul class="listing">{_links(rng, 30)}</ul>'
        elif kind in (5, 7):
            body_main = "<p>Short.</p>"
        else:
            body_main = "\n".join(f"<p>{_paragraph(rng, words)}</p>" for _ in range(3))
        if presence in ("both", "byline"):
            body.append(f"<p>By {rng.choice(FIRST)} {rng.choice(LAST)}</p>")
        body.append(body_main)
        if presence in ("both", "contact"):
            body.append(f'<p>Contact: <a href="mailto:team{i}@site.example">team{i}@site.example</a></p>')
        html = (
            "<!DOCTYPE html><html lang=\"en\"><head><title>t</title></head><body>"
            f"<nav><ul>{_links(rng, 8)}</ul></nav><main><article>"
            + "\n".join(body)
            + "</article></main></body></html>"
        )
        rows.append(
            {
                "url": f"f5://{i}",
                "html": html.encode("utf-8"),
                "label_quality": quality,
                "label_presence": presence,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("url", pa.string()), ("html", pa.binary()),
             ("label_quality", pa.string()), ("label_presence", pa.string())]
        ),
    )
