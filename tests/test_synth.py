"""Synthetic corpus: determinism + schema + pathology coverage."""

from document_ai_ray.config import PAGES_SCHEMA
from document_ai_ray.synth import gen_page, make_pdf_bytes, pages_table, skewed_pages_table


def test_gen_page_deterministic():
    a = gen_page(123)
    b = gen_page(123)
    assert a == b
    assert gen_page(124)["url"] != a["url"]


def test_pages_table_schema():
    t = pages_table(50)
    assert t.schema.equals(PAGES_SCHEMA)
    assert t.num_rows == 50
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == 50


def test_pathologies_present():
    rows = [gen_page(i) for i in range(100)]
    payloads = [r["html"] for r in rows]
    assert any(p.startswith(b"%PDF-") for p in payloads)          # pdf branch
    assert any(b"</html>" not in p and not p.startswith(b"%PDF-") for p in payloads)  # truncated


def test_skewed_table_has_giant_rows():
    t = skewed_pages_table(60, giant_every=50)
    sizes = [len(p) for p in t.column("html").to_pylist()]
    assert max(sizes) > 50 * min(sizes)
