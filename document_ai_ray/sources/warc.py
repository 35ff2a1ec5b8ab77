"""WARC source + sink — Common Crawl's native archive format
(ISO 28500; the format the north-star's "Common-Crawl-style web pages"
actually arrive in).

A WARC file is a sequence of records: a `WARC/1.0` version line,
`Name: value` headers, CRLFCRLF, `Content-Length` payload bytes,
CRLFCRLF.  `response` records wrap an HTTP response whose body is the
page; crawlers write one ~1 GB file per shard, usually gzip'd with one
member per record (whole-file gzip also decodes — `gzip.decompress`
concatenates members).

Scale shape: `ray.data.read_binary_files` owns file discovery and
parallelism (one task per archive — CC's own processing granularity);
record parsing is pure per-payload work inside `map_batches`, emitting
the engine's pages schema (url, warc_ts, html, text, lang) so every
downstream pipeline runs unchanged on WARC input.  The writer is the
matching sink (and the round-trip test fixture).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd

_CRLF2 = b"\r\n\r\n"


def parse_warc_records(data: bytes) -> list[dict]:
    """All `response` records of one WARC payload (plain or gzip) as
    dicts (url, warc_ts, html).  Tolerant: malformed trailing bytes end
    the scan instead of raising (a truncated archive yields its intact
    prefix, matching the row-level-fallback philosophy everywhere
    else)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    out: list[dict] = []
    i, n = 0, len(data)
    while i < n:
        if not data.startswith(b"WARC/", i):
            break
        hdr_end = data.find(_CRLF2, i)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[i:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        i = hdr_end + 4 + length + 4                     # skip record + CRLFCRLF
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        except ValueError:
            ts = None
        # response payload = HTTP headers + CRLFCRLF + page bytes
        sep = body.find(_CRLF2)
        html = body[sep + 4 :] if (sep >= 0 and body[:5] == b"HTTP/") else body
        out.append({"url": url, "warc_ts": ts, "html": html})
    return out


def read_warc(paths, lang: str = "und") -> rd.Dataset:
    """WARC file(s)/dir -> pages-schema Dataset (url, warc_ts, html,
    text, lang)."""
    files = rd.read_binary_files(paths)

    def to_pages(t: pa.Table) -> pa.Table:
        rows = []
        for data in t.column("bytes").to_pylist():
            for r in parse_warc_records(data):
                rows.append(
                    {"url": r["url"], "warc_ts": r["warc_ts"], "html": r["html"],
                     "text": "", "lang": lang}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    pa.field("url", pa.string()),
                    pa.field("warc_ts", pa.timestamp("us")),
                    pa.field("html", pa.binary()),
                    pa.field("text", pa.string()),
                    pa.field("lang", pa.string()),
                ]
            ),
        )

    return files.map_batches(to_pages, batch_format="pyarrow")


def write_warc_file(rows: list[dict], path: str, compress: bool = False) -> None:
    """pages rows -> one WARC file (response records with an HTTP/1.1
    wrapper, the shape crawlers emit).  The matching sink for
    `read_warc` and the round-trip test fixture."""
    buf = io.BytesIO()
    for r in rows:
        html = r["html"] if isinstance(r["html"], bytes) else bytes(r["html"])
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        ts = r.get("warc_ts")
        ts_s = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if ts is not None
                else "2024-01-01T00:00:00Z")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {ts_s}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
        ).encode()
        buf.write(hdr + b"\r\n" + http + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
