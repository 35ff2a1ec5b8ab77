"""PDF branch: layout parse + reading-order reconstruction.

Mirrors the reference's PDF rasterization branch
(/root/reference/analysis/cv/document_parsing.py:5-14 `convert_pdf_to_jpg`)
re-expressed as a *layout* problem in the style of pdfminer: the payload
carries positioned text lines; we rebuild reading order by (-y, x) —
the analogue of the reference's rotation/orientation normalization
(/root/reference/detection/sam.py:104-145) plus cartesian conversion
(/root/reference/analysis/cv/document_parsing.py:16-29) — then group
lines into blocks by vertical gaps.

Real PDF decoding (poppler / pdfminer) is NOT available in this
container, so the parser handles the deterministic synthetic subset
produced by ``synth.make_pdf_bytes``; any other PDF payload yields a
``pdf_parse_error`` row (never an exception), matching the reference's
row-level fallback semantics (/root/reference/performances.py:282-294).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

_TJ_RE = re.compile(
    rb"BT /F\d+ (\d+) Tf ([0-9.]+) ([0-9.]+) Td \(((?:[^()\\]|\\.)*)\) Tj ET"
)
_UNESC = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\"}
GAP_FACTOR = 1.5

# --- real-PDF content-stream machinery --------------------------------------
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_DICT_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")


def _iter_streams(payload: bytes):
    """Yield raw stream bodies.  Uses the dict's /Length when it is a
    direct integer (binary bodies may legally END with newline bytes, so
    delimiter scanning alone can truncate them); streams whose /Length
    is an indirect reference (or absent) fall back to PER-STREAM
    endstream-delimiter scanning — a mixed PDF loses no streams."""
    any_dict = False
    for dm in _DICT_STREAM_RE.finditer(payload):
        any_dict = True
        start = dm.end()
        lm = _LENGTH_RE.search(dm.group(1))
        if lm is not None:
            yield payload[start : start + int(lm.group(1))]
            continue
        end = payload.find(b"endstream", start)
        if end == -1:
            continue
        body = payload[start:end]
        # strip the single EOL the writer puts before `endstream`
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n") or body.endswith(b"\r"):
            body = body[:-1]
        yield body
    if not any_dict:                     # dict-less streams: raw delimiter scan
        for sm in _STREAM_RE.finditer(payload):
            yield sm.group(1)
# content-stream tokens we care about: strings, numbers, names, operators
_CS_TOKEN = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)"          # literal string
    rb"|(/[^\s\[\]()<>/]+)"             # name
    rb"|(-?[0-9.]+)"                    # number
    rb"|(\[|\])"                        # array delims
    rb"|([A-Za-z'\"*]+)"                # operator
)


def _unescape_pdf_string(b: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = b[i + 1]
            if nxt in b"()\\":
                out.append(nxt)
                i += 2
                continue
            if nxt in b"01234567":   # octal escape \ddd
                j = i + 1
                while j < min(i + 4, n) and b[j] in b"01234567":
                    j += 1
                out.append(int(b[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
            if nxt in mapped:
                out.append(mapped[nxt])
                i += 2
                continue
            i += 1  # lone backslash: dropped (PDF spec)
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _tokenize_content(content: bytes):
    """-> (y, x, size, text) items from BT/ET text blocks.  Supports the
    common operator subset: Tf (font+size), Td/TD (line-matrix
    translate), Tm (set matrix), T* (next line), Tj and TJ (show)."""
    items = []
    x = y = 0.0
    size = 12
    leading = 14.4
    stack_nums: list[float] = []
    pending_str: list[bytes] = []
    in_array = False
    for m in _CS_TOKEN.finditer(content):
        lit, name, num, delim, op = m.groups()
        if lit is not None:
            if in_array:
                pending_str.append(_unescape_pdf_string(lit))
            else:
                pending_str = [_unescape_pdf_string(lit)]
            continue
        if num is not None:
            try:
                stack_nums.append(float(num))
            except ValueError:
                pass
            continue
        if delim == b"[":
            in_array = True
            pending_str = []
            continue
        if delim == b"]":
            in_array = False
            continue
        if name is not None:
            continue
        ops = op
        if ops == b"Tf" and stack_nums:
            size = int(stack_nums[-1])
            leading = size * 1.2
        elif ops in (b"Td", b"TD") and len(stack_nums) >= 2:
            x += stack_nums[-2]
            y += stack_nums[-1]
            if ops == b"TD":
                leading = -stack_nums[-1]
        elif ops == b"Tm" and len(stack_nums) >= 6:
            x, y = stack_nums[-2], stack_nums[-1]
        elif ops == b"T*":
            y -= leading
        elif ops == b"BT":
            x = y = 0.0
        elif ops == b"Tj" and pending_str:
            items.append((y, x, size, b"".join(pending_str).decode("utf-8", "replace")))
            pending_str = []
        elif ops == b"TJ" and pending_str:
            items.append((y, x, size, b"".join(pending_str).decode("utf-8", "replace")))
            pending_str = []
        stack_nums.clear()
    return items


def _real_pdf_items(payload: bytes):
    """Extract (y, x, size, text) items from a real-format PDF: scan
    stream objects, inflate FlateDecode bodies (zlib), tokenize the
    concatenated content streams.  Unsupported filters -> no items
    (caller reports pdf_parse_error)."""
    items = []
    for body in _iter_streams(payload):
        try:
            content = zlib.decompress(body)
        except zlib.error:
            content = body  # uncompressed stream
        if b"BT" in content:
            items.extend(_tokenize_content(content))
    return items


@dataclass
class PdfBlock:
    text: str
    y_top: float
    size: int
    heading: bool
    lines: list[str] = field(default_factory=list)


def parse_pdf(payload: bytes) -> tuple[list[PdfBlock], list[str], str | None]:
    """-> (blocks in reading order, individual lines in reading order,
    error-or-None).  Pure function; never raises."""
    try:
        if not payload.startswith(b"%PDF-"):
            return [], [], "pdf_parse_error:not_pdf"
        if b"endstream" in payload:
            # real-format PDF: objects + (FlateDecode) content streams
            items = _real_pdf_items(payload)
            if not items:
                return [], [], "pdf_parse_error:no_text_objects"
        else:
            # bare synthetic subset (naked BT..ET ops, no objects)
            raw = _TJ_RE.findall(payload)
            if not raw:
                return [], [], "pdf_parse_error:no_text_objects"
            items = []
            for size_b, x_b, y_b, txt_b in raw:
                for esc, rep in _UNESC.items():
                    txt_b = txt_b.replace(esc, rep)
                items.append((float(y_b), float(x_b), int(size_b), txt_b.decode("utf-8", "replace")))
        # reading order: top-to-bottom, then left-to-right
        items.sort(key=lambda t: (-t[0], t[1]))
        blocks: list[PdfBlock] = []
        lines: list[str] = []
        prev_y: float | None = None
        prev_size = 12
        for y, _x, size, text in items:
            lines.append(text)
            new_block = (
                prev_y is None
                or (prev_y - y) > GAP_FACTOR * prev_size
                or size != prev_size
            )
            if new_block:
                blocks.append(PdfBlock(text=text, y_top=y, size=size, heading=size >= 16, lines=[text]))
            else:
                b = blocks[-1]
                b.lines.append(text)
                b.text = f"{b.text} {text}"
            prev_y, prev_size = y, size
        return blocks, lines, None
    except Exception as exc:  # defensive: a bad payload must not kill the batch
        return [], [], f"pdf_parse_error:{type(exc).__name__}"
