"""Extraction-pipeline queries with DuckDB oracles.

The byte-identity invariant as an oracle check: the Ray pipeline wraps
each `documents` row in deterministic boilerplate HTML, extracts the
main content, and must return exactly the original text per url.
"""

from __future__ import annotations

import pyarrow as pa

from document_ai_ray.pipelines.registry import register


@register(
    "extract_roundtrip",
    oracle=(
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, text AS extracted_text "
        "FROM documents"
    ),
)
def extract_roundtrip(sf_dir: str):
    """Byte-identical main-content extraction (the flagship invariant)."""
    from document_ai_ray.pipelines.extract import flagship

    return flagship(sf_dir).select_columns(["url", "extracted_text"])


@register(
    "extract_validated_count",
    oracle=(
        "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang"
    ),
)
def extract_validated_count(sf_dir: str):
    """Per-lang document counts THROUGH the extraction pipeline (the
    wrapped pages are all clean, so every row survives extraction; the
    oracle counts the source table).  Exercises extraction -> combiner
    aggregate (partial per-batch count + shuffle-free merge)."""
    from document_ai_ray.pipelines.extract import flagship
    from document_ai_ray.pipelines.ops import merge_partials

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["lang"]).group_by("lang").aggregate([([], "count_all")])
        return pa.Table.from_arrays([g.column("lang"), g.column("count_all")], names=["lang", "n_docs"])

    partials = flagship(sf_dir).map_batches(partial, batch_format="pyarrow")
    return merge_partials(partials, keys=["lang"], agg_funcs={"n_docs": "sum"})


# The flagship's oracle EVALUATES the validator spec in SQL (r3 verdict
# #5): byte-identity (extracted_text = text), the evidence-gated
# stopword-argmax langid (same tables as langid_docs, plus the >= 15
# whitespace-token gate from html_extract.py), and the validator rule
# battery (validate.py) replayed over the documents table.  On wrapped
# pages the charset/parse/readability rules pass and no labeled fields
# or byline exist BY CONSTRUCTION of the wrapper (synth.py
# wrap_documents_batch: one <main><p> plus link-only chrome), so the
# field causes are constants of the wrapper spec; too_short /
# extracted_text_is_empty / lang_mismatch are live rules the SQL
# evaluates per row.
_FLAGSHIP_ORACLE = r"""
    WITH w AS (SELECT doc_id, lower(unnest(regexp_extract_all(text, '\p{L}+'))) AS w FROM documents),
    st AS (SELECT doc_id,
                  SUM(CASE WHEN w IN ('am','auf','bei','das','dem','den','der','des','die','ein','eine','einen','für','im','ist','mit','nach','sind','und','von','wo','während','zu','über') THEN 1 ELSE 0 END) AS h_de,
                  SUM(CASE WHEN w IN ('a','about','across','an','and','are','as','at','be','by','for','from','in','is','it','near','not','of','on','or','over','that','the','this','to','toward','was','where','while','with') THEN 1 ELSE 0 END) AS h_en,
                  SUM(CASE WHEN w IN ('al','con','de','del','donde','el','en','es','hacia','la','las','los','mientras','para','por','que','se','sobre','son','su','un','una','y') THEN 1 ELSE 0 END) AS h_es,
                  SUM(CASE WHEN w IN ('au','aux','avec','ce','cette','dans','de','des','du','elle','est','et','il','la','le','les','où','par','pendant','pour','que','qui','sont','sur','un','une','vers') THEN 1 ELSE 0 END) AS h_fr,
                  SUM(CASE WHEN w IN ('che','con','dei','del','della','delle','di','dove','e','gli','i','il','in','la','le','lo','mentre','per','sono','sopra','su','un','una','verso','è') THEN 1 ELSE 0 END) AS h_it
           FROM w GROUP BY doc_id),
    g AS (SELECT *, GREATEST(h_de, h_en, h_es, h_fr, h_it) AS g FROM st),
    p AS (SELECT doc_id,
                 CASE WHEN g = 0 THEN 'und' WHEN h_de = g THEN 'de' WHEN h_en = g THEN 'en' WHEN h_es = g THEN 'es' WHEN h_fr = g THEN 'fr' ELSE 'it' END AS pl
          FROM g),
    pred AS (SELECT d.doc_id,
                    CASE WHEN LENGTH(regexp_extract_all(d.text, '\S+')) >= 15
                         THEN COALESCE(p.pl, 'und') ELSE 'und' END AS pred_lang
             FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id),
    rows_ AS (SELECT 'doc://' || CAST(d.doc_id AS VARCHAR) AS url,
                     d.lang AS lang,
                     'text/html' AS content_type,
                     d.text AS extracted_text,
                     pr.pred_lang AS pred_lang,
                     CASE WHEN d.text = '' THEN 'extracted_text_is_empty,'
                          WHEN LENGTH(d.text) < 50 THEN 'too_short,' ELSE '' END
                     || 'title_is_not_filled,author_is_not_filled,date_is_not_filled,reference_is_not_filled,contact_is_not_present,byline_is_not_present'
                     || CASE WHEN pr.pred_lang <> 'und' AND pr.pred_lang <> d.lang
                             THEN ',lang_mismatch' ELSE '' END AS causes
              FROM documents d JOIN pred pr ON d.doc_id = pr.doc_id)
    SELECT url, lang, content_type, extracted_text, pred_lang, causes,
           causes = '' AS validated
    FROM rows_
"""


@register("extract_flagship_full", oracle=_FLAGSHIP_ORACLE)
def extract_flagship_full(sf_dir: str):
    """The headline pipeline, oracle-checked (r3 verdict #5): the FULL
    wrap -> normalize -> parse -> segment -> score -> extract ->
    classify -> validate chain runs, then the scalar per-row view
    (byte-exact text, pred_lang, refused-cause list as CSV, validated)
    is hash-compared against the SQL replay of the validator spec."""
    from document_ai_ray.pipelines.extract import flagship

    def project(t: pa.Table) -> pa.Table:
        causes = pa.array(
            [",".join(c) for c in t.column("refused_causes").to_pylist()], pa.string()
        )
        return pa.Table.from_arrays(
            [
                t.column("url"),
                t.column("lang"),
                t.column("content_type"),
                t.column("extracted_text"),
                t.column("pred_lang"),
                causes,
                t.column("validated"),
            ],
            names=["url", "lang", "content_type", "extracted_text", "pred_lang", "causes", "validated"],
        )

    return flagship(sf_dir).map_batches(project, batch_format="pyarrow")


@register(
    "extract_pdf_roundtrip",
    oracle=(
        "SELECT 'pdfdoc://' || CAST(doc_id AS VARCHAR) AS url, text AS extracted_text "
        "FROM documents"
    ),
)
def extract_pdf_roundtrip(sf_dir: str):
    """Byte-identity through the REAL-PDF branch: each document's text
    becomes a real-format PDF (objects + FlateDecode content stream,
    standard Tf/Td/Tj operators), the pipeline parses it back (zlib
    inflate + content-stream tokenize + reading-order + block grouping)
    and must return exactly the original text per url."""
    import pyarrow as pa

    from document_ai_ray.config import PAGES_SCHEMA
    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.synth import EPOCH, make_real_pdf_bytes

    def to_pdf_pages(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text, lang in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist(), t.column("lang").to_pylist()
        ):
            rows.append(
                {
                    "url": f"pdfdoc://{doc_id}",
                    "warc_ts": EPOCH,
                    "html": make_real_pdf_bytes("", [text]),
                    "text": text,
                    "lang": lang,
                }
            )
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    pages = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        to_pdf_pages, batch_format="pyarrow"
    )
    return extract_pipeline(pages).select_columns(["url", "extracted_text"])


# Synth-corpus census oracle: lang (i%5), the PDF payload classes
# (i%100 in {3,53,83}) and the page index i itself are pure arithmetic
# over the generator's row id (synth.py:gen_page), so a per-lang census
# of (row count, index checksum, pdf count) replays exactly in SQL.
# sum_i is the strong cell: any page the extraction pipeline drops,
# duplicates or mis-routes shifts a lang's index sum.  (validated /
# pred_lang are NOT mod-constant at 20k pages — link-farm langid and
# truncation-class validation are content-dependent — so they stay out
# of the oracle; the validator battery is oracle-checked on
# extract_flagship_full instead.)
_SYNTH_PDF_MODS = "3,53,83"


def _synth_census_oracle() -> str:
    import os

    n = int(os.environ.get("BENCH_SYNTH_N", "20000"))
    return f"""
    WITH p AS (SELECT i, i % 100 AS m,
                      ['en','fr','de','es','it'][CAST(i % 5 AS INTEGER) + 1] AS lang
               FROM range({n}) t(i))
    SELECT lang,
           COUNT(*) AS n_pages,
           CAST(SUM(i) AS BIGINT) AS sum_i,
           CAST(SUM(CASE WHEN m IN ({_SYNTH_PDF_MODS}) THEN 1 ELSE 0 END) AS BIGINT) AS n_pdf
    FROM p GROUP BY lang
    """


@register("extract_synth_corpus", oracle=_synth_census_oracle())
def extract_synth_corpus(sf_dir: str):
    """Extraction+validation over the DISTRIBUTED synthetic corpus
    (generation happens inside tasks; nothing driver-side), reduced to
    a per-lang census the oracle replays from the generator's i%5 /
    i%100 arithmetic — ORACLE-CHECKED since r5 (verdict item #8: the
    scaling workload itself now carries a driver-checkable row).  A
    page dropped, duplicated or mis-langed anywhere in the generate ->
    extract -> validate chain shifts n_pages or the sum_i index
    checksum; a content-type sniff/charset-repair regression shifts
    n_pdf.  Corpus size via $BENCH_SYNTH_N (default 20k; bench.py
    --scaling sets 400k so compute dominates startup — the census
    aggregate is 5 rows and adds nothing to the measured stage).
    sf_dir unused."""
    import os

    import pyarrow.compute as pc

    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.pipelines.ops import partial_group_agg
    from document_ai_ray.synth import pages_dataset

    n = int(os.environ.get("BENCH_SYNTH_N", "20000"))
    res = extract_pipeline(pages_dataset(n, parallelism=max(64, n // 2000)))

    def census_cols(t: pa.Table) -> pa.Table:
        # url = https://site{k}.example/{lang}/page{i}
        i = pc.cast(
            pc.replace_substring_regex(t.column("url"), r"^.*page", ""), pa.int64()
        )
        is_pdf = pc.cast(
            pc.equal(t.column("content_type"), "application/pdf"), pa.int64()
        )
        return pa.table(
            {"lang": t.column("lang"), "i": i, "is_pdf": is_pdf}
        )

    return partial_group_agg(
        res.map_batches(census_cols, batch_format="pyarrow"),
        ["lang"],
        {"i": "sum_i", "is_pdf": "n_pdf"},
        count_alias="n_pages",
    )


@register(
    "extract_warc_roundtrip",
    oracle=(
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, text AS extracted_text "
        "FROM documents"
    ),
)
def extract_warc_roundtrip(sf_dir: str):
    """Byte-identity through the CC-NATIVE ingest path: the wrapped
    pages are spooled to gzip'd WARC shard files (one per task batch —
    the distributed write shape; nothing corpus-sized on the driver),
    re-read with `read_warc` (ray.data.read_binary_files + record
    parse), and extracted — must return exactly the original text per
    url (same oracle as extract_roundtrip)."""
    import hashlib
    import os

    from document_ai_ray.functions.scratch import scratch_dir
    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.sources.tables import pages_from_documents
    from document_ai_ray.sources.warc import read_warc, write_warc_file

    out_dir = scratch_dir("warc_rt")
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        if not rows:
            return pa.table({"path": pa.array([], pa.string())})
        name = hashlib.blake2s(rows[0]["url"].encode(), digest_size=8).hexdigest()
        path = os.path.join(out_dir, f"part-{name}.warc.gz")
        write_warc_file(rows, path, compress=True)
        return pa.table({"path": [path]})

    # one WARC shard per task batch; the collected manifest is
    # paths-only (tiny), the page bytes never touch the driver
    manifest = (
        pages_from_documents(sf_dir)
        .map_batches(write_shard, batch_format="pyarrow", batch_size=256)
        .take_all()
    )
    paths = sorted(r["path"] for r in manifest)
    pages = read_warc(paths)
    return extract_pipeline(pages).select_columns(["url", "extracted_text"])


@register(
    "extract_pdf_filters_roundtrip",
    oracle=(
        "SELECT 'fpdf://' || CAST(doc_id AS VARCHAR) AS url, text AS extracted_text "
        "FROM documents"
    ),
)
def extract_pdf_filters_roundtrip(sf_dir: str):
    """Byte-identity through a MIXED real-PDF corpus: each document is
    written with a doc_id-rotated /Filter chain (FlateDecode,
    ASCIIHexDecode, ASCII85Decode, RunLengthDecode, LZWDecode, an
    ASCII85+Flate chain), every third doc uses the PDF 1.5 xref-stream
    layout (indirect /Length via /ObjStm), every other doc encodes its
    text as hex strings, and every fifth classic-layout doc uses a
    Type0/Identity-H CID font with a /ToUnicode CMap — the
    heterogeneous mix a real Common-Crawl PDF slice contains.  The
    pipeline must return exactly the original text per url."""
    from document_ai_ray.config import PAGES_SCHEMA
    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.synth import EPOCH, make_real_pdf_bytes

    chains = [
        ["FlateDecode"],
        ["ASCIIHexDecode"],
        ["ASCII85Decode"],
        ["RunLengthDecode"],
        ["LZWDecode"],
        ["ASCII85Decode", "FlateDecode"],
    ]

    def to_pdf_pages(t: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text, lang in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist(), t.column("lang").to_pylist()
        ):
            rows.append(
                {
                    "url": f"fpdf://{doc_id}",
                    "warc_ts": EPOCH,
                    "html": make_real_pdf_bytes(
                        "",
                        [text],
                        filters=chains[doc_id % len(chains)],
                        xref_stream=(doc_id % 3 == 0),
                        hex_strings=(doc_id % 2 == 0),
                        cid_font=(doc_id % 3 != 0 and doc_id % 5 == 0),
                    ),
                    "text": text,
                    "lang": lang,
                }
            )
        return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)

    pages = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"]).map_batches(
        to_pdf_pages, batch_format="pyarrow"
    )
    return extract_pipeline(pages).select_columns(["url", "extracted_text"])


def _meta_page_html(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """Deterministic head-metadata page for one documents row.

    doc_id-keyed variation exercises the tolerant parser: attribute
    order, single/double/unquoted values, tag-name case, whitespace,
    plus decoys (a commented-out description, a body og:locale) that a
    substring grep WOULD pick up and the real tokenizer must not."""
    import html as html_mod

    title = f"{source} item {doc_id}"
    desc = html_mod.escape(text[:64], quote=True)
    canonical = f"https://{source}.example/items/{doc_id}"
    robots = "noindex,nofollow" if doc_id % 7 == 0 else "index,follow"
    v = doc_id % 4
    if v == 0:
        desc_tag = f'<meta name="description" content="{desc}">'
        canon_tag = f'<link rel="canonical" href="{canonical}">'
        robots_tag = f'<META NAME="robots" CONTENT="{robots}">'
    elif v == 1:
        desc_tag = f"<meta content='{desc}' name='description'/>"
        canon_tag = f"<link href='{canonical}' rel='canonical' />"
        robots_tag = f"<meta name=robots content={robots}>"
    elif v == 2:
        desc_tag = f'<meta\n  name="description"\n  content="{desc}" >'
        canon_tag = f'<LINK REL="canonical" HREF="{canonical}">'
        robots_tag = f"<meta name='robots' content='{robots}'>"
    else:
        desc_tag = f'<meta property="x" content="nope"><meta name="description" content="{desc}">'
        canon_tag = f'<link rel="stylesheet" href="/s.css"><link rel="canonical" href="{canonical}">'
        robots_tag = f'<meta name="robots" content="{robots}">'
    return (
        "<!DOCTYPE html><html>\n<head>\n"
        '<!-- <meta name="description" content="DECOY comment"> -->\n'
        f"<title>{html_mod.escape(title)}</title>\n"
        f"{desc_tag}\n{robots_tag}\n"
        f'<meta property="og:locale" content="{lang}">\n'
        f"{canon_tag}\n"
        '<script>var s = "</head> <meta name=robots content=DECOY>";</script>\n'
        "</head>\n<body>\n"
        '<meta property="og:locale" content="BODY-DECOY">\n'
        f"<p>{html_mod.escape(text[:120])}</p>\n</body></html>\n"
    ).encode("utf-8")


@register(
    "html_meta_extract",
    oracle=(
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "source || ' item ' || CAST(doc_id AS VARCHAR) AS title, "
        "substr(text, 1, 64) AS description, "
        "'https://' || source || '.example/items/' || CAST(doc_id AS VARCHAR) AS canonical, "
        "lang AS og_locale, "
        "CASE WHEN doc_id % 7 = 0 THEN 'noindex,nofollow' ELSE 'index,follow' END AS robots "
        "FROM documents"
    ),
)
def html_meta_extract(sf_dir: str):
    """Head-metadata extraction (title / description / canonical /
    og:locale / robots) through the real tolerant tag tokenizer
    (stages/html_meta.py), over pages whose quoting, attribute order
    and tag case vary per doc and which carry comment/script/body
    decoys.  The oracle rebuilds every field from the source columns."""
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import extract_head_meta

    def to_pages(t: pa.Table) -> pa.Table:
        rows = [
            {
                "url": f"doc://{d}",
                "html": _meta_page_html(d, txt, lang, src),
            }
            for d, txt, lang, src in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
                t.column("lang").to_pylist(),
                t.column("source").to_pylist(),
            )
        ]
        return pa.Table.from_pylist(rows)

    pages = read_table(
        sf_dir, "documents", columns=["doc_id", "text", "lang", "source"]
    ).map_batches(to_pages, batch_format="pyarrow")
    return extract_head_meta(pages)


def _jsonld_page_html(d: int, lang: str, src: str) -> bytes:
    """Page with one real JSON-LD block + decoys: a commented-out block
    with WRONG values, a non-ld script with JSON-looking text, and a
    truncated (invalid) ld block BEFORE the real one that must be
    skipped, not fatal."""
    real = (
        '{"@context": "https://schema.org", "@type": "%s", '
        '"headline": "%s story %d", "datePublished": "2024-01-%02d", '
        '"author": {"@type": "Person", "name": "Writer %d"}}'
        % ("Article" if d % 2 == 0 else "NewsArticle", src, d, 1 + d % 28, d % 20)
    )
    html = (
        "<!DOCTYPE html><html><head><title>t</title>"
        '<!-- <script type="application/ld+json">{"@type":"Decoy","headline":"nope"}</script> -->'
        '<script type="text/javascript">var x = {"@type": "AlsoDecoy"};</script>'
        '<SCRIPT TYPE="application/ld+json">{"@type": "Broken", "headline": </SCRIPT>'
        f'<script type="application/ld+json">{real}</script>'
        f"</head><body><p>body {lang}</p></body></html>"
    )
    return html.encode("utf-8")


@register(
    "jsonld_extract",
    oracle=(
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "CASE WHEN doc_id % 2 = 0 THEN 'Article' ELSE 'NewsArticle' END AS ld_type, "
        "source || ' story ' || CAST(doc_id AS VARCHAR) AS headline, "
        "'2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS date_published, "
        "'Writer ' || CAST(doc_id % 20 AS VARCHAR) AS author "
        "FROM documents"
    ),
)
def jsonld_extract(sf_dir: str):
    """schema.org JSON-LD extraction (the machine-readable article
    metadata modern pages ship in <script type=application/ld+json>):
    the tolerant tokenizer skips a commented-out decoy block, a
    JavaScript block with JSON-looking text, and a TRUNCATED invalid
    ld block before the real one.  Every field oracle-rebuilt from the
    source columns (same discipline as html_meta_extract)."""
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import extract_jsonld

    def to_pages(t: pa.Table) -> pa.Table:
        rows = [
            {"url": f"doc://{d}", "html": _jsonld_page_html(d, lang, src)}
            for d, lang, src in zip(
                t.column("doc_id").to_pylist(),
                t.column("lang").to_pylist(),
                t.column("source").to_pylist(),
            )
        ]
        return pa.Table.from_pylist(rows)

    pages = read_table(
        sf_dir, "documents", columns=["doc_id", "lang", "source"]
    ).map_batches(to_pages, batch_format="pyarrow")
    return extract_jsonld(pages)


@register(
    "extract_pdf_images",
    # every column the SQL can know is oracle-evaluated: the image
    # dimensions are deterministic functions of doc_id (the fixture
    # spec), and the evidence columns (pixel_exact, phash_ham) are
    # exact by the round-trip invariant — the embedded /DCTDecode
    # stream must come back byte-equivalent, so decoding it matches the
    # in-task reference decode bit-for-bit and the pHash distance is 0
    oracle="""
    SELECT 'pdfimg://' || CAST(doc_id AS VARCHAR) AS url,
           1 AS n_images,
           24 + (doc_id % 5) * 8 AS img_w,
           16 + (doc_id % 3) * 8 AS img_h,
           TRUE AS pixel_exact,
           0 AS phash_ham
    FROM documents
    """,
)
def extract_pdf_images(sf_dir: str):
    """Embedded-image extraction through the real-PDF branch (r3
    verdict #4): each document becomes a real PDF carrying its text
    AND a deterministic /DCTDecode image XObject (the repo's own JPEG
    encoder), `pdf_images` locates + decodes the XObject with the
    repo's JPEG decoder, and the query reports per-url image count,
    parsed dimensions, pixel-exactness vs the in-task reference
    decode, and the pHash hamming distance (0 by construction).
    Pure per-batch map in warm workers — no shuffle."""
    import numpy as np

    from document_ai_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from document_ai_ray.functions.phash import hamming64, phash64
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.pdf_extract import pdf_images
    from document_ai_ray.synth import make_real_pdf_bytes

    def doc_image(doc_id: int) -> tuple[np.ndarray, int, int]:
        w = 24 + (doc_id % 5) * 8
        h = 16 + (doc_id % 3) * 8
        x = np.linspace(0, 255, w).astype(np.uint8)[None, :].repeat(h, 0)
        y = np.linspace(0, 255, h).astype(np.uint8)[:, None].repeat(w, 1)
        px = np.stack([x, y, np.full((h, w), doc_id % 256, np.uint8)], axis=2)
        return px, w, h

    def roundtrip(t: pa.Table) -> pa.Table:
        urls, n_imgs, ws, hs, exact, ham = [], [], [], [], [], []
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            px, w, h = doc_image(doc_id)
            jpeg = encode_jpeg(px, quality=85)
            pdf = make_real_pdf_bytes("", [text], images=[(jpeg, w, h)])
            imgs = [i for i in pdf_images(pdf) if i["error"] is None]
            ref = decode_jpeg(jpeg)
            got = imgs[0]["pixels"] if imgs else None
            urls.append(f"pdfimg://{doc_id}")
            n_imgs.append(len(imgs))
            ws.append(imgs[0]["width"] if imgs else -1)
            hs.append(imgs[0]["height"] if imgs else -1)
            exact.append(bool(got is not None and np.array_equal(got, ref)))
            ham.append(
                int(hamming64(phash64(got), phash64(ref))) if got is not None else 64
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "n_images": pa.array(n_imgs, pa.int64()),
                "img_w": pa.array(ws, pa.int64()),
                "img_h": pa.array(hs, pa.int64()),
                "pixel_exact": pa.array(exact, pa.bool_()),
                "phash_ham": pa.array(ham, pa.int64()),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        roundtrip, batch_format="pyarrow"
    )


def _microdata_page_html(d: int, src: str) -> bytes:
    """Page with one real Product microdata item + decoys: an itemprop
    OUTSIDE any itemscope (must be ignored), a commented-out item with
    wrong values, a script whose text looks like microdata, and a
    SECOND itemscope after the real one (first-item-wins)."""
    price = f"{(d % 900) + 100}.{d % 100:02d}"
    html = (
        "<!DOCTYPE html><html><head><title>t</title></head><body>"
        '<span itemprop="name">orphan prop must be ignored</span>'
        '<!-- <div itemscope itemtype="https://schema.org/Decoy">'
        '<span itemprop="name">nope</span></div> -->'
        "<script>var md = '<div itemscope itemtype=Decoy2>';</script>"
        f'<div ItemScope itemtype="https://schema.org/Product">'
        f'<h1><span itemprop="name">{src} item {d}</span></h1>'
        f'<meta itemprop="price" content="{price}">'
        f'<a itemprop="url" href="https://{src}.example/p/{d}">buy</a>'
        f'<img itemprop="image" src="https://cdn.{src}.example/img/{d}.jpg">'
        f'<time itemprop="releaseDate" datetime="2024-{1 + d % 12:02d}-01">spring</time>'
        "</div>"
        '<div itemscope itemtype="https://schema.org/Ignored">'
        '<span itemprop="name">second item ignored</span></div>'
        "</body></html>"
    )
    return html.encode("utf-8")


@register(
    "microdata_extract",
    oracle="""
    SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
           'https://schema.org/Product' AS item_type,
           source || ' item ' || CAST(doc_id AS VARCHAR) AS name,
           CAST((doc_id % 900) + 100 AS VARCHAR) || '.' ||
             lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS price,
           'https://' || source || '.example/p/' || CAST(doc_id AS VARCHAR) AS item_url,
           'https://cdn.' || source || '.example/img/' || CAST(doc_id AS VARCHAR) || '.jpg' AS image,
           '2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || '-01' AS "releaseDate"
    FROM documents
    """,
)
def microdata_extract(sf_dir: str):
    """Microdata (itemscope/itemprop) extraction — the third
    structured-data vehicle next to head-meta and JSON-LD, through a
    real HTMLParser walk with the spec's per-tag value rules
    (meta→content, a→href, img→src, time→datetime, else text).  Decoys
    exercised: an orphan itemprop outside any scope, a commented-out
    item, script text that LOOKS like microdata, mixed attribute case,
    and a second itemscope that first-item-wins must ignore.  Every
    emitted field is oracle-rebuilt from the source columns."""
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import extract_microdata

    def to_pages(t: pa.Table) -> pa.Table:
        rows = [
            {"url": f"doc://{d}", "html": _microdata_page_html(d, src)}
            for d, src in zip(
                t.column("doc_id").to_pylist(), t.column("source").to_pylist()
            )
        ]
        return pa.Table.from_pylist(rows)

    pages = read_table(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        to_pages, batch_format="pyarrow"
    )
    return extract_microdata(
        pages,
        {
            "name": "name",
            "price": "price",
            "item_url": "url",   # the item's own url prop, not the page url
            "image": "image",
            "releaseDate": "releaseDate",
        },
    )


# ---------------------------------------------------------------------------
# HTML <table> extraction, value-hash checked: each documents row is
# wrapped in a page whose tables are built from the doc's first six
# cleaned words by a fixed law, so the oracle replays the expected
# cells from the text column alone while the engine must round-trip
# REAL markup (attributes, ragged whitespace, inline <b>, entity refs,
# implicitly-closed rows) through the tolerant table parser.
# ---------------------------------------------------------------------------

_TBL_ORACLE = r"""
WITH wl AS (SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> w != '') AS ws
            FROM documents),
w6 AS (SELECT doc_id,
              list_transform(generate_series(0, 5), i ->
                  CASE WHEN len(ws) > i
                            AND regexp_replace(lower(ws[i + 1]), '[^a-z0-9]', '', 'g') != ''
                       THEN regexp_replace(lower(ws[i + 1]), '[^a-z0-9]', '', 'g')
                       ELSE 'x' END) AS w
       FROM wl),
tabs AS (SELECT doc_id, w, unnest(generate_series(0, doc_id % 2)) AS table_idx FROM w6),
hdr AS (SELECT doc_id, table_idx, 0 AS row_idx, c AS col_idx, TRUE AS is_header,
               'h' || c AS cell
        FROM tabs, (SELECT unnest(generate_series(0, 2)) AS c)),
body AS (SELECT doc_id, table_idx, r AS row_idx, c AS col_idx, FALSE AS is_header,
                w[1 + (((r - 1) * 3 + c + table_idx) % 6)] AS cell
         FROM tabs,
              (SELECT unnest(generate_series(1, 2)) AS r),
              (SELECT unnest(generate_series(0, 2)) AS c))
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       table_idx, row_idx, col_idx, is_header, cell
FROM (SELECT * FROM hdr UNION ALL SELECT * FROM body)
"""


@register("extract_html_tables", oracle=_TBL_ORACLE)
def extract_html_tables(sf_dir: str):
    """Data-table mining through the real HTML table parser: pages get
    1 + doc_id%2 tables of 1 header row ('h0'..'h2') + 2x3 body cells
    drawn from the doc's first six cleaned words (law: cell(r,c,t) =
    w[((r-1)*3 + c + t) % 6]); the markup is deliberately hostile
    (attribute noise, newlines, inline <b>, &amp; entities, the LAST
    row's </tr> omitted) and a nested decoy table is folded into its
    cell, invisible to the flat cell law."""
    import re as _re

    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import extract_tables

    clean = _re.compile(r"[^a-z0-9]")

    def to_pages(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            ws = [w for w in (txt or "").split(" ") if w != ""][:6]
            w6 = [(clean.sub("", w.lower()) or "x") for w in ws]
            w6 += ["x"] * (6 - len(w6))
            parts = [
                "<html><head><title>t</title></head><body>",
                '<nav class="chrome"><a href="/">home</a></nav>',
            ]
            for tab in range(1 + did % 2):
                parts.append(f'<table class="data" id="t{tab}">\n  <tr>')
                parts.append("".join(f"<th scope=col>h{c}</th>" for c in range(3)))
                parts.append("</tr>")
                for r in (1, 2):
                    parts.append("\n  <tr>")
                    for c in range(3):
                        w = w6[((r - 1) * 3 + c + tab) % 6]
                        cell = f"<b>{w}</b>" if (r + c) % 2 else f" {w}\n"
                        parts.append(f'<td data-r="{r}">{cell}</td>')
                    if r == 1:  # last row of markup left implicitly closed
                        parts.append("</tr>")
                parts.append("\n</table><p>&amp; between</p>")
            parts.append("</body></html>")
            urls.append(f"doc://{did}")
            htmls.append("".join(parts).encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    pages = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )
    return extract_tables(pages)


# ---------------------------------------------------------------------------
# Heading-outline extraction: hierarchical section numbers (1 / 1.2 /
# 1.2.1) computed by the real parser's counter stack; the oracle
# replays the page law and re-derives the numbering with window
# functions.  A commented-out <h2> decoy pins that the parser is a real
# tokenizer, not a regex grep.
# ---------------------------------------------------------------------------

_W6_CTE = """
wl AS (SELECT doc_id,
              list_filter(string_split(text, ' '), w -> w != '') AS ws
       FROM documents),
w6 AS (SELECT doc_id,
              list_transform(generate_series(0, 5), i ->
                  CASE WHEN len(ws) > i
                            AND regexp_replace(lower(ws[i + 1]), '[^a-z0-9]', '', 'g') != ''
                       THEN regexp_replace(lower(ws[i + 1]), '[^a-z0-9]', '', 'g')
                       ELSE 'x' END) AS w
       FROM wl)
"""

_OUTLINE_ORACLE = f"""
WITH {_W6_CTE},
seq AS (
  SELECT doc_id, 0 AS pos, 1 AS level, w[1] AS txt FROM w6
  UNION ALL
  SELECT doc_id, i, CASE WHEN i = 1 THEN 2 ELSE 2 + (doc_id + i) % 2 END, w[i + 1]
  FROM w6, (SELECT unnest(generate_series(1, 4)) AS i)
  UNION ALL
  SELECT doc_id, 5, 1, w[6] FROM w6 WHERE doc_id % 3 = 0
),
n1 AS (SELECT *, SUM(CASE WHEN level = 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS s1 FROM seq),
n2 AS (SELECT *, SUM(CASE WHEN level = 2 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id, s1 ORDER BY pos) AS s2 FROM n1),
n3 AS (SELECT *, SUM(CASE WHEN level = 3 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id, s1, s2 ORDER BY pos) AS s3 FROM n2)
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       pos, level,
       CASE level WHEN 1 THEN CAST(s1 AS VARCHAR)
                  WHEN 2 THEN s1 || '.' || s2
                  ELSE s1 || '.' || s2 || '.' || s3 END AS path,
       txt AS text
FROM n3
"""


@register("extract_heading_outline", oracle=_OUTLINE_ORACLE)
def extract_heading_outline(sf_dir: str):
    """Document-outline extraction through the real heading parser:
    pages carry h1 + four h2/h3 headings by law (level(i) = 2 unless
    i>1 and (doc_id+i) odd -> 3) plus a second h1 for doc_id%3==0; the
    parser's counter stack must reproduce the window-function numbering
    exactly, through inline <b>, newlines, and a commented-out heading
    decoy."""
    import re as _re

    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import extract_outline_rows

    clean = _re.compile(r"[^a-z0-9]")

    def to_pages(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            ws = [w for w in (txt or "").split(" ") if w != ""][:6]
            w6 = [(clean.sub("", w.lower()) or "x") for w in ws]
            w6 += ["x"] * (6 - len(w6))
            parts = [
                "<html><head><title>o</title></head><body>",
                "<!-- <h2>decoy heading</h2> -->",
                f"<h1 class=t>\n {w6[0]}</h1><p>lead</p>",
            ]
            for i in range(1, 5):
                lvl = 2 if i == 1 else 2 + (did + i) % 2
                body = f"<b>{w6[i]}</b>" if i % 2 else f" {w6[i]}\n"
                parts.append(f"<h{lvl}>{body}</h{lvl}><p>para {i}</p>")
            if did % 3 == 0:
                parts.append(f"<h1>{w6[5]}</h1>")
            parts.append("</body></html>")
            urls.append(f"doc://{did}")
            htmls.append("".join(parts).encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    pages = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )
    return extract_outline_rows(pages)


# ---------------------------------------------------------------------------
# Nested-list extraction: implicit </li> closes, a nested list inside
# item 2, mixed ul/ol.  One row per <li> with its dot-path ordinal.
# ---------------------------------------------------------------------------

_LISTS_ORACLE = f"""
WITH {_W6_CTE},
rows_ AS (
  SELECT doc_id, 0 AS list_idx, 0 AS depth, '1' AS item_path,
         doc_id % 2 = 1 AS ordered, w[1] AS item_text FROM w6
  UNION ALL
  SELECT doc_id, 0, 0, '2', doc_id % 2 = 1, w[2] FROM w6
  UNION ALL
  SELECT doc_id, 0, 1, '2.1', doc_id % 3 = 0, w[4] FROM w6
  UNION ALL
  SELECT doc_id, 0, 1, '2.2', doc_id % 3 = 0, w[5] FROM w6
  UNION ALL
  SELECT doc_id, 0, 0, '3', doc_id % 2 = 1, w[3] FROM w6
  UNION ALL
  SELECT doc_id, 1, 0, '1', FALSE, w[6] FROM w6 WHERE doc_id % 4 = 0
)
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       list_idx, depth, item_path, ordered, item_text
FROM rows_
"""


@register("extract_list_items", oracle=_LISTS_ORACLE)
def extract_list_items(sf_dir: str):
    """Nested-list flattening through the real list parser: a 3-item
    top list (ol when doc_id is odd) whose second item holds a 2-item
    nested list (ol when doc_id%3==0), every <li> implicitly closed,
    plus a second single-item <ul> for doc_id%4==0."""
    import re as _re

    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import extract_list_rows

    clean = _re.compile(r"[^a-z0-9]")

    def to_pages(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            ws = [w for w in (txt or "").split(" ") if w != ""][:6]
            w6 = [(clean.sub("", w.lower()) or "x") for w in ws]
            w6 += ["x"] * (6 - len(w6))
            top, nest = ("ol", "ul") if did % 2 else ("ul", "ol")
            nest = "ol" if did % 3 == 0 else "ul"
            parts = [
                "<html><body><nav><a href='/'>home</a></nav>",
                f"<{top} class=main>",
                f"<li> {w6[0]}\n",                      # no </li>
                f"<li><b>{w6[1]}</b>",
                f"<{nest}><li>{w6[3]}<li> {w6[4]} </{nest}>",
                f"</li><li>{w6[2]}",
                f"</{top}>",
            ]
            if did % 4 == 0:
                parts.append(f"<ul><li>{w6[5]}</ul>")
            parts.append("</body></html>")
            urls.append(f"doc://{did}")
            htmls.append("".join(parts).encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    pages = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_pages, batch_format="pyarrow"
    )
    return extract_list_rows(pages)


# ---------------------------------------------------------------------------
# Paginated-article stitching: the multi-page-article assembly step of
# a web-extraction pipeline.  Each long document is split across three
# REAL pages chained by <link rel="next"> whose urls are opaque
# (md5-derived) — the engine cannot group fragments by any key law; it
# must (1) extract each page's main text through the REAL extractor,
# (2) parse the rel=next link out of the head, (3) resolve every page
# to its chain head by POINTER JUMPING (log-L bucketed rounds), and
# (4) reassemble fragments in hop order.  The oracle is byte-identity:
# the stitched text must equal the original document text.
# ---------------------------------------------------------------------------

_STITCH_MIN_TOKENS = 30

_STITCH_ORACLE = f"""
SELECT 'pg://' || md5(CAST(doc_id AS VARCHAR) || '-0') AS url,
       text AS stitched_text,
       CAST(3 AS BIGINT) AS n_pages
FROM documents
WHERE len(string_split(text, ' ')) >= {_STITCH_MIN_TOKENS}
"""


@register("stitch_paginated_articles", oracle=_STITCH_ORACLE)
def stitch_paginated_articles(sf_dir: str):
    """Stitch 3-page articles back together byte-for-byte.  Fragments
    partition the raw space-split token list (single-space rejoin is
    the identity, empties included), so stitched == original is exact.
    Scale shape: pages materialize ONCE (two consumers: the reverse-
    link map and the fragment table); pointer jumping runs ceil(log2 L)
    bucketed hash exchanges; the fragment->head join and the per-head
    assembly are one bucketed exchange each — nothing corpus-sized ever
    lands on the driver."""
    import hashlib

    import numpy as np
    import pandas as pd

    from document_ai_ray.functions.hashing import stable64
    from document_ai_ray.functions.scale import auto_buckets
    from document_ai_ray.pipelines.extract import extract_batch
    from document_ai_ray.pipelines.ops import bucket_map_groups
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import head_rel_links

    def page_url(did: int, k: int) -> str:
        return "pg://" + hashlib.md5(f"{did}-{k}".encode()).hexdigest()

    def to_pages(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        langs: list[str] = []
        ts: list[int] = []
        for did, txt, lang in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        ):
            toks = (txt or "").split(" ")
            n = len(toks)
            if n < _STITCH_MIN_TOKENS:
                continue
            import html as html_mod

            for k in range(3):
                frag = " ".join(toks[k * n // 3 : (k + 1) * n // 3])
                nxt = (
                    f'<link rel="next" href="{page_url(did, k + 1)}">'
                    if k < 2
                    else ""
                )
                page = (
                    f'<html lang="{lang}"><head><title>a{did} p{k}</title>{nxt}</head>'
                    '<body><nav><ul><li><a href="/">home</a></li>'
                    '<li><a href="/tag">tags</a></li></ul></nav>'
                    f"<main><p>{html_mod.escape(frag)}</p></main>"
                    '<footer><a href="/about">about</a></footer></body></html>'
                )
                urls.append(page_url(did, k))
                htmls.append(page.encode("utf-8"))
                langs.append(lang)
                ts.append(did)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    def extract_and_next(t: pa.Table) -> pa.Table:
        nxt = [
            head_rel_links(h).get("next", "")
            for h in t.column("html").to_pylist()
        ]
        out = extract_batch(t, cfg=None)  # real extractor, row order kept
        return pa.table(
            {
                "url": out.column("url"),
                "frag": out.column("extracted_text"),
                "next_url": pa.array(nxt, pa.string()),
            }
        )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    rows = (
        docs.map_batches(to_pages, batch_format="pyarrow")
        .map_batches(extract_and_next, batch_format="pyarrow")
        .materialize()  # two consumers below share this lineage once
    )
    P = auto_buckets(rows.count())

    # reverse-link map: u = a page that is POINTED TO, v = its
    # predecessor.  Chain heads never appear as u; pointer jumping's
    # "target not found" freeze then resolves every page to its head.
    def rev_edges(t: pa.Table) -> pa.Table:
        mask = pa.compute.not_equal(t.column("next_url"), "")
        f = t.filter(mask)
        n = f.num_rows
        return pa.table(
            {
                "u": f.column("next_url"),
                "v": f.column("url"),
                "hops": pa.array(np.ones(n, np.int64)),
                "done": pa.array(np.zeros(n, bool)),
            }
        )

    m = rows.map_batches(rev_edges, batch_format="pyarrow").materialize()

    for _ in range(40):
        if m.filter(expr="done == False").count() == 0:
            break

        def bucket_both(t: pa.Table) -> pa.Table:
            u = t.column("u").to_pylist()
            v = t.column("v").to_pylist()
            bk_p = [stable64(x) % P for x in v]  # probe hashes its TARGET
            bk_b = [stable64(x) % P for x in u]  # build hashes its key
            n = len(u)
            return pa.table(
                {
                    "u": pa.array(u + u, pa.string()),
                    "v": pa.array(v + v, pa.string()),
                    "hops": pa.array(
                        np.concatenate(
                            [t.column("hops").to_numpy(zero_copy_only=False)] * 2
                        )
                    ),
                    "done": pa.array(
                        np.concatenate(
                            [t.column("done").to_numpy(zero_copy_only=False)] * 2
                        )
                    ),
                    "is_build": pa.array([False] * n + [True] * n),
                    "bk": pa.array(bk_p + bk_b, pa.int64()),
                }
            )

        def compose(df: pd.DataFrame) -> pd.DataFrame:
            left = df[~df["is_build"]][["u", "v", "hops", "done"]]
            right = df[df["is_build"]][["u", "v", "hops"]].rename(
                columns={"u": "u2", "v": "v2", "hops": "hops2"}
            )
            j = left.merge(right, left_on="v", right_on="u2", how="left")
            hit = j["u2"].notna() & ~j["done"]
            j.loc[hit, "v"] = j.loc[hit, "v2"]
            j.loc[hit, "hops"] = j.loc[hit, "hops"] + j.loc[hit, "hops2"]
            j.loc[~hit, "done"] = True
            return pd.DataFrame(
                {
                    "u": j["u"].astype("object"),
                    "v": j["v"].astype("object"),
                    "hops": j["hops"].astype("int64"),
                    "done": j["done"].astype(bool),
                }
            )

        m = bucket_map_groups(
            m.map_batches(bucket_both, batch_format="pyarrow"),
            "bk",
            compose,
            P,
            batch_format="pandas",
        ).materialize()

    # fragment -> (head, pos) join: probe = fragments on hash(url),
    # build = resolution rows on hash(u).  A fragment with NO
    # resolution row IS its chain's head (pos 0) — the left join
    # doubles as the head detector, no separate anti-join.
    def tag_frags(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        return pa.table(
            {
                "url": t.column("url"),
                "frag": t.column("frag"),
                "head": pa.array([""] * len(urls), pa.string()),
                "pos": pa.array(np.zeros(len(urls), np.int64)),
                "is_build": pa.array([False] * len(urls)),
                "bk": pa.array([stable64(x) % P for x in urls], pa.int64()),
            }
        )

    def tag_res(t: pa.Table) -> pa.Table:
        us = t.column("u").to_pylist()
        return pa.table(
            {
                "url": t.column("u"),
                "frag": pa.array([""] * len(us), pa.string()),
                "head": t.column("v"),
                "pos": t.column("hops"),
                "is_build": pa.array([True] * len(us)),
                "bk": pa.array([stable64(x) % P for x in us], pa.int64()),
            }
        )

    tagged = rows.map_batches(tag_frags, batch_format="pyarrow").union(
        m.map_batches(tag_res, batch_format="pyarrow")
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        left = df[~df["is_build"]][["url", "frag"]]
        right = df[df["is_build"]][["url", "head", "pos"]]
        j = left.merge(right, on="url", how="left")
        miss = j["head"].isna() | (j["head"] == "")
        j.loc[miss, "head"] = j.loc[miss, "url"]
        j.loc[miss, "pos"] = 0
        return pd.DataFrame(
            {
                "head": j["head"].astype("object"),
                "pos": j["pos"].astype("int64"),
                "frag": j["frag"].astype("object"),
            }
        )

    placed = bucket_map_groups(tagged, "bk", attach, P, batch_format="pandas")

    def head_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "hbk",
            pa.array([stable64(x) % P for x in t.column("head").to_pylist()], pa.int64()),
        )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.sort_values(["head", "pos"])
            .groupby("head", as_index=False)
            .agg(stitched_text=("frag", " ".join), n_pages=("frag", "size"))
        )
        return pd.DataFrame(
            {
                "url": g["head"].astype("object"),
                "stitched_text": g["stitched_text"].astype("object"),
                "n_pages": g["n_pages"].astype("int64"),
            }
        )

    return bucket_map_groups(
        placed.map_batches(head_bucket, batch_format="pyarrow"),
        "hbk",
        assemble,
        P,
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Structured-metadata FUSION: one page carries up to three competing
# machine-readable sources (JSON-LD, microdata, head meta/title) plus
# the usual decoys; the operator resolves each logical field by source
# precedence (jsonld > microdata > head) and reports which source won.
# This is the metadata-consolidation step every crawl indexer runs; the
# oracle replays the page law + the precedence rule in SQL.
# ---------------------------------------------------------------------------

_FUSION_ORACLE = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 2 = 0 THEN 'J' || doc_id ELSE 'M' || doc_id END AS name,
       CASE WHEN doc_id % 2 = 0 THEN 'jsonld' ELSE 'microdata' END AS name_source,
       CASE WHEN doc_id % 2 = 0 THEN '2024-02-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
            WHEN doc_id % 5 = 0 THEN '2023-03-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
            ELSE '' END AS published,
       CASE WHEN doc_id % 2 = 0 THEN 'jsonld'
            WHEN doc_id % 5 = 0 THEN 'microdata'
            ELSE 'none' END AS published_source
FROM documents
"""


@register("metadata_fusion_extract", oracle=_FUSION_ORACLE)
def metadata_fusion_extract(sf_dir: str):
    """Fuse JSON-LD, microdata and head-title metadata by source
    precedence.  The page law puts a JSON-LD Article on even docs only,
    a microdata item on every doc, a title tag everywhere, and a
    commented-out JSON-LD decoy with WRONG values on every page —
    a fusion that greps instead of parsing would take the decoy."""
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import (
        parse_head_meta,
        parse_jsonld,
        parse_microdata,
    )

    def build(did: int) -> bytes:
        day = 1 + did % 28
        ld = (
            f'<script type="application/ld+json">{{"@context": "https://schema.org", '
            f'"@type": "Article", "headline": "J{did}", '
            f'"datePublished": "2024-02-{day:02d}"}}</script>'
            if did % 2 == 0
            else ""
        )
        rel = (
            f'<time itemprop="releaseDate" datetime="2023-03-{day:02d}">then</time>'
            if did % 5 == 0
            else ""
        )
        return (
            f"<!DOCTYPE html><html><head><title>T{did}</title>"
            '<!-- <script type="application/ld+json">'
            '{"@type":"Decoy","headline":"nope","datePublished":"1999-01-01"}'
            "</script> -->"
            f"{ld}</head><body>"
            f'<div itemscope itemtype="https://schema.org/Product">'
            f'<span itemprop="name">M{did}</span>{rel}</div>'
            "<p>body</p></body></html>"
        ).encode("utf-8")

    def fuse(t: pa.Table) -> pa.Table:
        urls, names, nsrc, pub, psrc = [], [], [], [], []
        for did in t.column("doc_id").to_pylist():
            html = build(did)
            ld = parse_jsonld(html)
            md = parse_microdata(html)["props"]
            head = parse_head_meta(html)
            if ld.get("headline"):
                names.append(ld["headline"])
                nsrc.append("jsonld")
            elif md.get("name"):
                names.append(md["name"])
                nsrc.append("microdata")
            else:
                names.append(head.get("title") or "")
                nsrc.append("head")
            if ld.get("date_published"):
                pub.append(ld["date_published"])
                psrc.append("jsonld")
            elif md.get("releaseDate"):
                pub.append(md["releaseDate"])
                psrc.append("microdata")
            else:
                pub.append("")
                psrc.append("none")
            urls.append(f"doc://{did}")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "name": pa.array(names, pa.string()),
                "name_source": pa.array(nsrc, pa.string()),
                "published": pa.array(pub, pa.string()),
                "published_source": pa.array(psrc, pa.string()),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        fuse, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Markup-driven canonical dedup: variant urls (tracking params, /amp,
# mirrors) declare their canonical via <link rel="canonical">; the
# operator groups variants by the PARSED canonical target and elects
# one representative — the companion to the string-normalization
# url_canonical_dedup (this one trusts the page's own markup).
# ---------------------------------------------------------------------------

_CANON_ORACLE = """
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS canonical_url,
       CAST(2 + doc_id % 2 AS BIGINT) AS n_variants,
       'doc://' || CAST(doc_id AS VARCHAR) || '/amp' AS kept_url
FROM documents
"""


@register("canonical_link_dedup", oracle=_CANON_ORACLE)
def canonical_link_dedup(sf_dir: str):
    """Each doc gets 2 + doc_id%2 variant pages (/amp, ?utm, ?ref)
    whose heads declare <link rel=canonical> to the base url (plus a
    commented-out canonical decoy).  The engine parses the canonical
    out of each page, groups variants by the PARSED target with the
    combiner merge, and keeps the lexicographically-first variant.
    The oracle replays the law ('/amp' sorts before '?...' because '/'
    < '?')."""
    from document_ai_ray.pipelines.ops import merge_partials
    from document_ai_ray.sources.tables import read_table
    from document_ai_ray.stages.html_meta import parse_head_meta

    def to_pages(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        for did in t.column("doc_id").to_pylist():
            base = f"doc://{did}"
            variants = [f"{base}/amp", f"{base}?utm_source=feed"]
            if did % 2:
                variants.append(f"{base}?ref=rss")
            for v in variants:
                page = (
                    "<html><head><title>v</title>"
                    '<!-- <link rel="canonical" href="doc://decoy"> -->'
                    f'<link rel="canonical" href="{base}">'
                    "</head><body><p>variant</p></body></html>"
                )
                urls.append(v)
                htmls.append(page.encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(htmls, pa.binary())}
        )

    def canon_partial(t: pa.Table) -> pa.Table:
        canons = [
            parse_head_meta(h)["canonical"] or ""
            for h in t.column("html").to_pylist()
        ]
        return pa.table(
            {
                "canonical_url": pa.array(canons, pa.string()),
                "n_variants": pa.array([1] * len(canons), pa.int64()),
                "kept_url": t.column("url"),
            }
        )

    pages = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        to_pages, batch_format="pyarrow"
    )
    return merge_partials(
        pages.map_batches(canon_partial, batch_format="pyarrow"),
        ["canonical_url"],
        {"n_variants": "sum", "kept_url": "min"},
    )
