"""HTML <table> structured-data extraction.

Web pages carry most of the web's machine-readable facts in <table>
markup; a training-data pipeline mines them into relational rows
(WebTables / TURL-style corpora).  This stage parses each page's
tables into one row per CELL — (url, table_idx, row_idx, col_idx,
cell_text) — with a stdlib-HTMLParser collector (same tolerant
approach as stages/links.py: unclosed <td>/<tr> flush at the next
boundary, charrefs unescaped, nested tables attributed to the
innermost <table>).

The flat cell layout is deliberately Arrow-friendly: downstream can
pivot (`groupby(url, table_idx, row_idx)`) or filter columns without
ragged nested lists, and the per-cell rows stream at any page size.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa
import ray.data as rd


class _TableCollector(HTMLParser):
    """Collect (table_idx, row_idx, col_idx, text) cells in document
    order.  Indices are per page; table_idx counts <table> OPENINGS
    (nested tables get their own index; their cells do not leak into
    the parent's grid)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: list[tuple[int, int, int, str]] = []
        self._n_tables = 0
        # stack of [table_idx, row_idx, col_idx, in_cell]
        self._stack: list[list] = []
        self._buf: list[str] = []

    def _flush_cell(self) -> None:
        if self._stack and self._stack[-1][3]:
            t, r, c, _ = self._stack[-1]
            self.cells.append((t, r, c, "".join(self._buf)))
            self._stack[-1][3] = False
        self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._flush_cell()
            self._stack.append([self._n_tables, -1, -1, False])
            self._n_tables += 1
        elif not self._stack:
            return
        elif tag == "tr":
            self._flush_cell()
            self._stack[-1][1] += 1
            self._stack[-1][2] = -1
        elif tag in ("td", "th"):
            self._flush_cell()
            if self._stack[-1][1] < 0:  # <td> without <tr>: implicit row 0
                self._stack[-1][1] = 0
            self._stack[-1][2] += 1
            self._stack[-1][3] = True

    def handle_endtag(self, tag: str) -> None:
        if not self._stack:
            return
        if tag in ("td", "th"):
            self._flush_cell()
        elif tag == "tr":
            self._flush_cell()
        elif tag == "table":
            self._flush_cell()
            self._stack.pop()

    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1][3]:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush_cell()


def page_tables(
    pages: rd.Dataset, url_col: str = "url", html_col: str = "html"
) -> rd.Dataset:
    """(url, html) pages -> one row per table cell."""

    def fn(t: pa.Table) -> pa.Table:
        urls, tis, ris, cis, texts = [], [], [], [], []
        for u, h in zip(t.column(url_col).to_pylist(), t.column(html_col).to_pylist()):
            if h is None:
                continue
            if isinstance(h, bytes):
                h = h.decode("utf-8", "replace")
            p = _TableCollector()
            try:
                p.feed(h)
                p.close()
            except Exception:
                pass  # broken markup: keep the cells found so far
            for ti, ri, ci, txt in p.cells:
                urls.append(u)
                tis.append(ti)
                ris.append(ri)
                cis.append(ci)
                texts.append(txt)
        return pa.table(
            {
                url_col: pa.array(urls, pa.string()),
                "table_idx": pa.array(tis, pa.int64()),
                "row_idx": pa.array(ris, pa.int64()),
                "col_idx": pa.array(cis, pa.int64()),
                "cell_text": pa.array(texts, pa.string()),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow")
