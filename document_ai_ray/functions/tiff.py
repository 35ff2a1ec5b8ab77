"""Baseline TIFF 6.0 codec — pure stdlib+numpy, like the sibling JPEG /
PNG / GIF codecs (no imaging library exists in this environment, and
the multimodal stages promise REAL decodes wherever a real decode is
implementable without one).

Scope (the baseline-TIFF profile scanners and exporters actually emit):
  - both byte orders ("II" little, "MM" big);
  - 8-bit grayscale (Photometric 0/1, including the 0=WhiteIsZero
    inversion) and 8-bit RGB (Photometric 2), chunky planar only;
  - strips (any RowsPerStrip), Compression 1 (none), 32773 (PackBits)
    and 5 (TIFF-LZW: MSB-first variable 9..12-bit codes with the
    spec's early-change width bump), Predictor 1/2 (horizontal
    differencing);
  - the encoder writes II, single-IFD, with any of the three
    compressions and optional predictor for LZW.

Unsupported-but-valid TIFF features (tiles, 16-bit, CCITT/JPEG-in-TIFF,
planar=2) raise NotImplementedError — the stages degrade that to the
per-row error column, same contract as every other codec here.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9 / Apple PackBits)
# ---------------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned byte
            out.append(data[i])
            i = j + 1
            continue
        # literal stretch: until a 3-byte run starts (2-byte runs are
        # cheaper inside a literal) or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:  # noop
            continue
        if c < 128:  # literal c+1 bytes
            out.extend(data[i : i + c + 1])
            i += c + 1
        else:  # repeat next byte 257-c times
            out.extend(bytes([data[i]]) * (257 - c))
            i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF-LZW (TIFF 6.0 §13): MSB-first bitstream, codes grow 9->12 bits,
# width bumps ONE CODE EARLY (at table sizes 511/1023/2047), Clear=256,
# EOI=257.
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    w = _BitWriter()
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    w.write(_CLEAR, width)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        w.write(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        # TIFF early change: bump width when the NEXT code would not fit
        if next_code == (1 << width) - 1:
            if width == 12:
                w.write(_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            else:
                width += 1
        cur = bytes([b])
    if cur:
        w.write(table[cur], width)
    w.write(_EOI, width)
    return w.done()


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: return what we have
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        acc &= (1 << nbits) - 1
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code < len(table) and (code < 256 or code > 257):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change mirrors the encoder, whose next_code runs ONE
        # ahead of this table (it adds each code's entry at emit time;
        # the decoder only learns it from the FOLLOWING code)
        if len(table) + 1 == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_tiff(
    img: np.ndarray, compression: int = 1, predictor: int = 1,
    big_endian: bool = False,
) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline TIFF (one IFD,
    one strip per image; II by default, MM with big_endian).
    compression: 1 none, 5 LZW, 32773 PackBits; predictor 2
    (horizontal differencing) valid with LZW."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else img.shape[2]
    if not gray and spp != 3:
        raise NotImplementedError("encode_tiff: gray or RGB only")
    raw = img
    if predictor == 2:
        raw = raw.reshape(h, w * spp).astype(np.int16).copy()
        px = raw.reshape(h, w, spp)
        px[:, 1:, :] = (px[:, 1:, :] - px[:, :-1, :]) % 256
        raw = raw.astype(np.uint8)
    data = raw.tobytes()
    if compression == 1:
        strip = data
    elif compression == 5:
        strip = lzw_encode(data)
    elif compression == 32773:
        strip = packbits_encode(data)
    else:
        raise NotImplementedError(f"encode_tiff: compression {compression}")

    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, spp, None),     # inline if spp==1 else offset
        (_TAG_COMPRESSION, 3, 1, compression),
        (_TAG_PHOTOMETRIC, 3, 1, 1 if gray else 2),
        (_TAG_STRIP_OFFSETS, 4, 1, None),
        (_TAG_SPP, 3, 1, spp),
        (_TAG_ROWS_PER_STRIP, 3, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(strip)),
        (_TAG_PLANAR, 3, 1, 1),
        (_TAG_PREDICTOR, 3, 1, predictor),
    ]
    n_ent = len(entries)
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_ent * 12 + 4
    bits_off = after_ifd                      # out-of-line BitsPerSample (RGB)
    extra = 6 if spp == 3 else 0
    strip_off = after_ifd + extra

    e = ">" if big_endian else "<"
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n_ent)
    for tag, typ, cnt, val in entries:
        if tag == _TAG_BITS:
            if spp == 1:
                out += struct.pack(e + "HHIHH", tag, typ, 1, 8, 0)
            else:
                out += struct.pack(e + "HHII", tag, typ, 3, bits_off)
        elif tag == _TAG_STRIP_OFFSETS:
            out += struct.pack(e + "HHII", tag, typ, 1, strip_off)
        elif typ == 3:
            out += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(e + "HHII", tag, typ, cnt, val)
    out += struct.pack(e + "I", 0)            # next-IFD pointer
    if spp == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)
    out += strip
    return bytes(out)


def _read_ifd_value(b: bytes, off: int, endian: str):
    tag, typ, cnt = struct.unpack_from(endian + "HHI", b, off)
    size = _TYPE_SIZES.get(typ, 1) * cnt
    if size <= 4:
        raw = b[off + 8 : off + 8 + size]
    else:
        (ptr,) = struct.unpack_from(endian + "I", b, off + 8)
        raw = b[ptr : ptr + size]
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        return tag, ()
    vals = struct.unpack(endian + fmt * cnt, raw[: _TYPE_SIZES[typ] * cnt])
    return tag, vals


def decode_tiff(b: bytes) -> np.ndarray:
    """Baseline TIFF -> (h, w, 3) uint8 RGB (grayscale stacked), both
    byte orders, strips, Compression 1/5/32773, Predictor 1/2."""
    if b[:4] == b"II*\x00":
        endian = "<"
    elif b[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(endian + "I", b, 4)
    (n_ent,) = struct.unpack_from(endian + "H", b, ifd_off)
    tags: dict[int, tuple] = {}
    for k in range(n_ent):
        tag, vals = _read_ifd_value(b, ifd_off + 2 + k * 12, endian)
        tags[tag] = vals

    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    spp = tags.get(_TAG_SPP, (1,))[0]
    bits = tags.get(_TAG_BITS, (8,))
    comp = tags.get(_TAG_COMPRESSION, (1,))[0]
    photo = tags.get(_TAG_PHOTOMETRIC, (1,))[0]
    planar = tags.get(_TAG_PLANAR, (1,))[0]
    predictor = tags.get(_TAG_PREDICTOR, (1,))[0]
    if any(x != 8 for x in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} unsupported")
    if planar != 1:
        raise NotImplementedError("TIFF planar=2 unsupported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} unsupported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported")

    offs = tags[_TAG_STRIP_OFFSETS]
    cnts = tags[_TAG_STRIP_COUNTS]
    rps = tags.get(_TAG_ROWS_PER_STRIP, (h,))[0]
    row_bytes = w * spp
    chunks = []
    for si, (o, c) in enumerate(zip(offs, cnts)):
        rows = min(rps, h - si * rps)
        expected = rows * row_bytes
        strip = b[o : o + c]
        if comp == 1:
            raw = strip[:expected]
        elif comp == 5:
            raw = lzw_decode(strip, expected)
        elif comp == 32773:
            raw = packbits_decode(strip, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp} unsupported")
        if len(raw) < expected:
            raise ValueError("short TIFF strip")
        chunks.append(raw)
    data = b"".join(chunks)
    img = np.frombuffer(data, dtype=np.uint8)[: h * row_bytes].reshape(h, w, spp)
    if predictor == 2:
        img = np.cumsum(img.astype(np.int64), axis=1).astype(np.uint8).reshape(h, w, spp)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor} unsupported")
    if photo == 0:  # WhiteIsZero
        img = 255 - img
    if spp == 1:
        img = np.repeat(img, 3, axis=2)
    elif spp != 3:
        raise NotImplementedError(f"TIFF samples-per-pixel {spp} unsupported")
    return np.ascontiguousarray(img)
