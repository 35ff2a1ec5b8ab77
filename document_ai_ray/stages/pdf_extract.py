"""PDF branch: layout parse + reading-order reconstruction.

Mirrors the reference's PDF rasterization branch
(/root/reference/analysis/cv/document_parsing.py:5-14 `convert_pdf_to_jpg`)
re-expressed as a *layout* problem in the style of pdfminer: the payload
carries positioned text lines; we rebuild reading order by (-y, x) —
the analogue of the reference's rotation/orientation normalization
(/root/reference/detection/sam.py:104-145) plus cartesian conversion
(/root/reference/analysis/cv/document_parsing.py:16-29) — then group
lines into blocks by vertical gaps.

Real PDF rendering (poppler / pdfminer) is NOT available in this
container; this module implements the text-extraction subset natively:
object/stream scanning over classic-xref AND PDF 1.5+ xref-stream
layouts, the /Filter chains FlateDecode / LZWDecode / ASCIIHexDecode /
ASCII85Decode / RunLengthDecode, indirect /Length resolution through
/ObjStm object streams, and the BT/ET text-operator set (Tf, Td, TD,
Tm, T*, Tj, TJ).  Out of scope (documented): image codecs
(DCT/JPX/CCITT — pixels, not text), CID/ToUnicode composite fonts,
encrypted files.  Any undecodable payload yields a
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
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_INT_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\s*([+-]?\d+)\s*endobj")
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|\s*/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


# --- stream filter decoders (PDF 32000-1 §7.4) ------------------------------
def _ascii_hex_decode(b: bytes) -> bytes:
    """/ASCIIHexDecode: hex pairs, whitespace ignored, '>' EOD, an odd
    trailing digit is padded with '0'."""
    h = bytes(c for c in b.split(b">")[0] if c not in b" \t\r\n\f\0")
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _ascii85_decode(b: bytes) -> bytes:
    """/ASCII85Decode: whitespace ignored, optional '<~' prefix,
    '~>' EOD, 'z' = four zero bytes."""
    import base64

    d = bytes(c for c in b if c not in b" \t\r\n\f\0")
    if d.startswith(b"<~"):
        d = d[2:]
    end = d.find(b"~>")
    if end != -1:
        d = d[:end]
    return base64.a85decode(d, adobe=False)


def _lzw_decode(b: bytes) -> bytes:
    """/LZWDecode (PDF 32000-1 §7.4.4, EarlyChange=1): 9..12-bit codes
    MSB-first, 256=clear, 257=EOD; the code width grows one code EARLY
    relative to table fill (the PDF default)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    buf = nbits = 0
    for byte in b:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:                         # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:                         # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:                                   # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << width) - 1 and width < 12:   # EarlyChange=1
                width += 1
    return bytes(out)


def _run_length_decode(b: bytes) -> bytes:
    """/RunLengthDecode: length byte L: 0..127 copy next L+1 bytes;
    129..255 repeat next byte 257-L times; 128 EOD."""
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        l = b[i]
        if l == 128:
            break
        if l < 128:
            out += b[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            out += b[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


# full names + the inline-image abbreviations; image codecs
# (DCTDecode, JPXDecode, CCITTFaxDecode, JBIG2Decode) are absent on
# purpose -> _decode_stream returns None and the stream is skipped
# (they carry pixels, not text operators)
_FILTERS = {
    b"FlateDecode": zlib.decompress,
    b"Fl": zlib.decompress,
    b"ASCIIHexDecode": _ascii_hex_decode,
    b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode,
    b"A85": _ascii85_decode,
    b"RunLengthDecode": _run_length_decode,
    b"RL": _run_length_decode,
    b"LZWDecode": _lzw_decode,
    b"LZW": _lzw_decode,
}


def _decode_stream(dict_src: bytes, body: bytes) -> bytes | None:
    """Apply the dict's /Filter chain (array order = decode order).
    No declared filter keeps the historical behavior (try zlib, else
    raw); an unsupported filter returns None (stream skipped)."""
    fm = _FILTER_RE.search(dict_src)
    if fm is None:
        try:
            return zlib.decompress(body)
        except zlib.error:
            return body
    names = _NAME_RE.findall(fm.group(1)) if fm.group(1) is not None else [fm.group(2)]
    data = body
    for nm in names:
        fn = _FILTERS.get(nm)
        if fn is None:
            return None
        data = fn(data)
    return data


def _indirect_ints(payload: bytes) -> dict[int, int]:
    """{obj_num: value} for INTEGER objects — top-level `N 0 obj 123
    endobj` plus integers packed in /ObjStm object streams (the PDF
    1.5+ xref-stream layout stores non-stream objects there, including
    indirect /Length values)."""
    out = {int(m.group(1)): int(m.group(2)) for m in _INT_OBJ_RE.finditer(payload)}
    for dm in _DICT_STREAM_RE.finditer(payload):
        d = dm.group(1)
        if b"/ObjStm" not in d:
            continue
        body = _stream_body(payload, dm, {})
        if body is None:
            continue
        try:
            data = _decode_stream(d, body)
        except Exception:
            continue
        fmm = re.search(rb"/First\s+(\d+)", d)
        nm = re.search(rb"/N\s+(\d+)", d)
        if data is None or fmm is None or nm is None:
            continue
        first, n_objs = int(fmm.group(1)), int(nm.group(1))
        header = data[:first].split()
        pairs = [(int(header[i]), int(header[i + 1])) for i in range(0, 2 * n_objs, 2)]
        ends = sorted(off for _, off in pairs) + [len(data) - first]
        for onum, off in pairs:
            nxt = min(e for e in ends if e > off)
            seg = data[first + off : first + nxt]
            im = re.fullmatch(rb"\s*([+-]?\d+)\s*", seg)
            if im:
                out[onum] = int(im.group(1))
    return out


# --- CID / ToUnicode composite fonts (PDF 32000-1 §9.7, §9.10) --------------
_TOUNICODE_REF_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONT_RES_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_OBJ_BODY_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)


def _parse_cmap(data: bytes) -> dict[int, str]:
    """ToUnicode CMap -> {2-byte code: unicode string} from bfchar and
    bfrange sections (both the increment and the array form)."""
    out: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        for sm in re.finditer(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            src = int(sm.group(1), 16)
            out[src] = bytes.fromhex(sm.group(2).decode("ascii")).decode(
                "utf-16-be", "replace"
            )
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = m.group(1)
        for sm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", body
        ):
            lo, hi = int(sm.group(1), 16), int(sm.group(2), 16)
            dst0 = int(sm.group(3), 16)
            for c in range(lo, min(hi, lo + 0xFFFF) + 1):
                out[c] = chr(dst0 + (c - lo))
        for sm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]", body, re.DOTALL
        ):
            lo = int(sm.group(1), 16)
            for k, d in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", sm.group(3))):
                out[lo + k] = bytes.fromhex(d.decode("ascii")).decode(
                    "utf-16-be", "replace"
                )
    return out


def _font_cmaps(payload: bytes) -> dict[bytes, dict[int, str]]:
    """{font resource name (b"F1"): code->unicode map} for every font
    whose object carries a /ToUnicode CMap stream.  Fonts without one
    keep the simple-font byte decode."""
    cmaps: dict[bytes, dict[int, str]] = {}
    if b"/ToUnicode" not in payload:
        return cmaps
    objs = {int(m.group(1)): m.group(2) for m in _OBJ_BODY_RE.finditer(payload)}
    for fm in _FONT_RES_RE.finditer(payload):
        for em in _FONT_ENTRY_RE.finditer(fm.group(1)):
            fname, onum = em.group(1), int(em.group(2))
            body = objs.get(onum)
            if body is None:
                continue
            tum = _TOUNICODE_REF_RE.search(body)
            if tum is None:
                continue
            tobj = objs.get(int(tum.group(1)))
            if tobj is None:
                continue
            dm = _DICT_STREAM_RE.search(tobj)
            if dm is None:
                continue
            sbody = _stream_body(tobj, dm, {})
            if sbody is None:
                continue
            try:
                data = _decode_stream(dm.group(1), sbody)
            except Exception:
                continue
            if data:
                cmaps[fname] = _parse_cmap(data)
    return cmaps


def _stream_body(payload: bytes, dm: "re.Match", lengths: dict[int, int]) -> bytes | None:
    """Raw body of the stream whose dict matched `dm`: direct /Length,
    else indirect /Length resolved via `lengths`, else endstream
    scanning (binary bodies may legally END with newline bytes, so
    delimiter scanning alone can truncate them — used last)."""
    start = dm.end()
    lm = _LENGTH_RE.search(dm.group(1))
    if lm is not None:
        return payload[start : start + int(lm.group(1))]
    rm = _LENGTH_REF_RE.search(dm.group(1))
    if rm is not None and int(rm.group(1)) in lengths:
        return payload[start : start + lengths[int(rm.group(1))]]
    end = payload.find(b"endstream", start)
    if end == -1:
        return None
    body = payload[start:end]
    # strip the single EOL the writer puts before `endstream`
    if body.endswith(b"\r\n"):
        body = body[:-2]
    elif body.endswith(b"\n") or body.endswith(b"\r"):
        body = body[:-1]
    return body


def _iter_streams(payload: bytes):
    """Yield (dict_src, raw body) per stream object.  Indirect /Length
    references (common in PDF 1.5+ xref-stream files) are resolved
    through a lazily-built integer-object map covering both top-level
    objects and /ObjStm contents; a mixed PDF loses no streams."""
    any_dict = False
    lengths: dict[int, int] | None = None
    for dm in _DICT_STREAM_RE.finditer(payload):
        any_dict = True
        if (
            lengths is None
            and _LENGTH_RE.search(dm.group(1)) is None
            and _LENGTH_REF_RE.search(dm.group(1)) is not None
        ):
            lengths = _indirect_ints(payload)
        body = _stream_body(payload, dm, lengths or {})
        if body is not None:
            yield dm.group(1), body
    if not any_dict:                     # dict-less streams: raw delimiter scan
        for sm in _STREAM_RE.finditer(payload):
            yield b"", sm.group(1)
# content-stream tokens we care about: strings, numbers, names, operators
_CS_TOKEN = re.compile(
    rb"\(((?:[^()\\]|\\.)*)\)"          # literal string
    rb"|<(?!<)([0-9A-Fa-f\s]*)>"        # hex string (not a << dict)
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


def _tokenize_content(content: bytes, cmaps: dict[bytes, dict[int, str]] | None = None):
    """-> (y, x, size, text) items from BT/ET text blocks.  Supports the
    common operator subset: Tf (font+size), Td/TD (line-matrix
    translate), Tm (set matrix), T* (next line), Tj and TJ (show).
    When the current Tf font has a ToUnicode CMap in `cmaps`, show
    strings are decoded as big-endian 2-byte CID codes through it
    (Identity-H composite fonts); otherwise as simple-font bytes."""
    items = []
    x = y = 0.0
    size = 12
    leading = 14.4
    stack_nums: list[float] = []
    pending_str: list[bytes] = []
    in_array = False
    last_name = b""
    cur_cmap: dict[int, str] | None = None

    def show_text() -> str:
        raw = b"".join(pending_str)
        if cur_cmap is not None:
            return "".join(
                cur_cmap.get(int.from_bytes(raw[k : k + 2], "big"), "�")
                for k in range(0, len(raw) - 1, 2)
            )
        return raw.decode("utf-8", "replace")
    for m in _CS_TOKEN.finditer(content):
        lit, hexs, name, num, delim, op = m.groups()
        if hexs is not None:
            # hex string: whitespace ignored, odd trailing digit padded
            h = bytes(c for c in hexs if c not in b" \t\r\n\f\0")
            if len(h) % 2:
                h += b"0"
            lit = bytes.fromhex(h.decode("ascii"))
        if lit is not None:
            s = _unescape_pdf_string(lit) if hexs is None else lit
            if in_array:
                pending_str.append(s)
            else:
                pending_str = [s]
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
            last_name = name[1:]                    # strip leading '/'
            continue
        ops = op
        if ops == b"Tf" and stack_nums:
            size = int(stack_nums[-1])
            leading = size * 1.2
            cur_cmap = (cmaps or {}).get(last_name)
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
        elif ops in (b"Tj", b"TJ") and pending_str:
            items.append((y, x, size, show_text()))
            pending_str = []
        stack_nums.clear()
    return items


def _real_pdf_items(payload: bytes):
    """Extract (y, x, size, text) items from a real-format PDF: scan
    stream objects, decode each through its declared /Filter chain
    (FlateDecode, ASCIIHexDecode, ASCII85Decode, RunLengthDecode and
    chains thereof; image codecs are skipped), tokenize the
    concatenated content streams.  Works on both classic-xref and
    PDF 1.5+ xref-stream layouts: stream DISCOVERY is scan-based (no
    xref walk), and indirect /Length values are resolved through
    top-level and /ObjStm integer objects.  Undecodable streams -> no
    items (caller reports pdf_parse_error)."""
    items = []
    cmaps = _font_cmaps(payload)
    for dict_src, body in _iter_streams(payload):
        try:
            content = _decode_stream(dict_src, body)
        except Exception:
            continue  # corrupt stream: row-level degradation, not a crash
        if content and b"BT" in content:
            items.extend(_tokenize_content(content, cmaps))
    return items


# --- embedded image XObjects (r3 verdict #4) --------------------------------
_IMG_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Image\b")
_WIDTH_RE = re.compile(rb"/Width\s+(\d+)")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)")


def pdf_images(payload: bytes) -> list[dict]:
    """Decode every /Subtype /Image XObject in a real-format PDF.

    The reference rasterizes whole pages images included
    (/root/reference/ai_documents/analysis/cv/document_parsing.py:5-14);
    this is the layout-parse analogue: each image stream is located by
    its dict (same scan as the text path), non-image pre-filters are
    applied in order, and a trailing /DCTDecode is decoded with the
    repo's own JPEG codec (functions/jpeg.py — baseline + progressive).
    Returns one dict per image: {width, height, filter, pixels
    ((h,w,3) uint8 RGB or None), error (None on success)}.  Never
    raises — an undecodable image degrades to pixels=None + error,
    the row-level discipline of the text branch."""
    out: list[dict] = []
    for dict_src, body in _iter_streams(payload):
        if not _IMG_SUBTYPE_RE.search(dict_src):
            continue
        wm, hm = _WIDTH_RE.search(dict_src), _HEIGHT_RE.search(dict_src)
        width = int(wm.group(1)) if wm else -1
        height = int(hm.group(1)) if hm else -1
        fm = _FILTER_RE.search(dict_src)
        names = (
            (_NAME_RE.findall(fm.group(1)) if fm.group(1) is not None else [fm.group(2)])
            if fm
            else []
        )
        img = {
            "width": width,
            "height": height,
            "filter": (names[-1].decode("ascii") if names else "raw"),
            "pixels": None,
            "error": None,
        }
        try:
            data = body
            for nm in names[:-1]:  # pre-filters (e.g. ASCII85 wrapping)
                fn = _FILTERS.get(nm)
                if fn is None:
                    raise ValueError(f"unsupported pre-filter {nm!r}")
                data = fn(data)
            last = names[-1] if names else None
            if last in (b"DCTDecode", b"DCT"):
                from document_ai_ray.functions.jpeg import decode_jpeg

                img["pixels"] = decode_jpeg(data)
            elif last is None:
                # unfiltered /DeviceRGB samples, row-major
                import numpy as np

                arr = np.frombuffer(data[: width * height * 3], np.uint8)
                if arr.size == width * height * 3:
                    img["pixels"] = arr.reshape(height, width, 3).copy()
                else:
                    img["error"] = "image_decode_error:short_raw_stream"
            else:
                fn = _FILTERS.get(last)
                if fn is not None:  # e.g. FlateDecode raw samples
                    import numpy as np

                    raw = fn(data)
                    arr = np.frombuffer(raw[: width * height * 3], np.uint8)
                    if arr.size == width * height * 3:
                        img["pixels"] = arr.reshape(height, width, 3).copy()
                    else:
                        img["error"] = "image_decode_error:short_raw_stream"
                else:
                    img["error"] = f"image_decode_error:unsupported_filter:{last!r}"
        except Exception as exc:
            img["error"] = f"image_decode_error:{type(exc).__name__}"
        out.append(img)
    return out


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
