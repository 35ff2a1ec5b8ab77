"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a
`media_type` string and a `meta` struct; decode / feature-extract /
resize / frame-sample are actor-pool `map_batches` stages.

Decode support is format-tiered:

- REAL pure-Python/numpy decoders:
  BMP (uncompressed 24/32-bit BI_RGB), PPM/PGM (binary P6/P5),
  TIFF (baseline 6.0: II+MM byte orders, strips, none/PackBits/LZW
  with the early-change width bump, Predictor 2, gray WhiteIsZero/
  BlackIsZero + RGB — `functions/tiff.py`, encode AND decode),
  WAV (PCM 8/16-bit, stdlib `wave`), PNG (8/16-bit
  gray/RGB/palette/alpha, non-interlaced or Adam7 — stdlib zlib
  inflate + all five row un-filters, CRC-verified chunk walk), and GIF87a/89a (stdlib-only
  variable-width LZW, multi-frame with sub-rect compositing; the
  encoder web-safe-quantizes, so animated-GIF frame sampling is a
  REAL video demux path), JPEG — baseline SOF0 AND progressive SOF2,
  decode + encode (numpy einsum DCT/IDCT, Annex K / per-scan optimized
  Huffman, 4:2:0/4:4:4, restart markers — `functions/jpeg.py`) — and
  AVI/MJPEG video (RIFF container mux/demux over that JPEG codec —
  `functions/avi.py`): true multi-frame video decode, frame sampling
  and resize-recontainerize.  These decode to pixel/sample arrays and
  feed real feature extraction (4x4 gray-block means for images, 16
  RMS window energies for audio) and real nearest-neighbor image
  resize with re-encode.
- REMAINING compressed codecs (MP3/MP4/WebP, JPEG arithmetic
  coding...) need libraries absent from this container and stay
  STUBBED: strict mode raises NotImplementedError; non-strict emits
  the per-row error column.
- The `SYNM` synthetic payload keeps the deterministic fake decoder
  for plumbing tests.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


# --- real raw-format decoders ----------------------------------------------


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP -> (h, w, 3) uint8 RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    _hsz, w, h = struct.unpack_from("<Iii", b, 14)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={comp} bpp={bpp} unsupported")
    flip = h > 0
    h = abs(h)
    bypp = bpp // 8
    stride = ((w * bypp + 3) // 4) * 4
    arr = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    px = arr.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)[:, :, :3][..., ::-1]
    return px[::-1] if flip else px


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP."""
    h, w, _ = px.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1][..., ::-1].reshape(h, w * 3)      # bottom-up, BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) -> (h, w, 3) uint8 RGB."""
    if b[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":                  # comment to EOL
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    i += 1                                        # single whitespace after maxval
    w, h, maxv = (int(t) for t in toks)
    if maxv > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    ch = 3 if b[:2] == b"P6" else 1
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=i).reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth_rows(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec pseudo-code, elementwise)."""
    p = a + b - c
    pa_, pb_, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _filter_byte_rows(flat: np.ndarray, bpp: int, filter_type: int) -> bytearray:
    """(nrows, stride) int32 BYTE rows -> filtered scanline stream
    (filter byte + filtered bytes per row).  ``bpp`` is bytes per
    pixel — the left-neighbor offset the Sub/Average/Paeth filters
    use."""
    raw = bytearray()
    nrows, stride = flat.shape
    prev = np.zeros(stride, np.int32)
    zero_left = np.zeros(bpp, np.int32)
    for r in range(nrows):
        row = flat[r]
        left = np.concatenate([zero_left, row[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
        upleft = np.concatenate([zero_left, prev[:-bpp]]) if stride > bpp else np.zeros(stride, np.int32)
        if filter_type == 0:
            f = row
        elif filter_type == 1:
            f = row - left
        elif filter_type == 2:
            f = row - prev
        elif filter_type == 3:
            f = row - (left + prev) // 2
        elif filter_type == 4:
            f = row - _paeth_rows(left, prev, upleft)
        else:
            raise ValueError(f"bad PNG filter {filter_type}")
        raw.append(filter_type)
        raw += (f % 256).astype(np.uint8).tobytes()
        prev = row
    return raw


def encode_png(px: np.ndarray, filter_type: int = 0, interlace: bool = False) -> bytes:
    """image -> real PNG via stdlib zlib.  uint8 input encodes 8-bit,
    uint16 input encodes 16-bit (big-endian samples).  Shapes: (h, w)
    gray -> color type 0, (h, w, 3) -> truecolor 2, (h, w, 4) ->
    truecolor+alpha 6.  ``filter_type`` applies one PNG row filter
    (0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth) to every scanline —
    exposed so tests exercise every un-filter branch of `decode_png`.
    ``interlace`` emits Adam7 (7 sub-image passes)."""
    import zlib

    px = np.asarray(px)
    depth = 16 if px.dtype == np.uint16 else 8
    px = np.ascontiguousarray(px, dtype=np.uint16 if depth == 16 else np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    color = {1: 0, 3: 2, 4: 6}[nch]
    bpp = nch * (depth // 8)

    def byte_rows(sub: np.ndarray) -> np.ndarray:
        hh, ww = sub.shape[:2]
        sub = np.ascontiguousarray(sub)
        if depth == 16:
            b = sub.astype(">u2").view(np.uint8).reshape(hh, ww * nch * 2)
        else:
            b = sub.reshape(hh, ww * nch)
        return b.astype(np.int32)

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _filter_byte_rows(byte_rows(sub), bpp, filter_type)
    else:
        raw = _filter_byte_rows(byte_rows(px), bpp, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter_byte_rows(raw: bytes, offset: int, nrows: int, stride: int, bpp: int):
    """Reconstruct ``nrows`` filtered scanlines of ``stride`` bytes
    starting at ``offset`` -> ((nrows, stride) uint8, next offset).
    Filters 1/3/4 reconstruct byte-sequentially within a row
    (spec-mandated data dependence) — fine for thumbnail-scale media;
    a hot loop would want a C kernel."""
    out = np.zeros((nrows, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for r in range(nrows):
        ft = raw[offset]
        line = np.frombuffer(raw, np.uint8, stride, offset + 1).astype(np.int32)
        offset += stride + 1
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + up) // 2
                else:
                    p = a + up - ul
                    pa_, pb_, pc_ = abs(p - a), abs(p - up), abs(p - ul)
                    pred = a if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else ul)
                rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG row filter {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out, offset


def decode_png(b: bytes) -> np.ndarray:
    """REAL PNG decode via stdlib zlib + numpy: chunk walk with CRC
    verify, inflate, per-scanline un-filter (all five PNG filter
    types), channel expansion -> (h, w, 3) uint8 RGB.  Supports 8- and
    16-bit gray (0), truecolor (2), palette (3), gray+alpha (4) and
    RGBA (6), non-interlaced or Adam7-interlaced; alpha is dropped
    like the 32-bit BMP path and 16-bit samples scale to 8-bit
    output."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    plte = None
    hdr = None
    while pos + 12 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(b[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = hdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG compression={comp}/filter-method={filt} invalid")
    if depth not in (8, 16):
        raise NotImplementedError(f"{depth}-bit PNG unsupported")
    if depth == 16 and color == 3:
        raise ValueError("16-bit palette PNG is invalid")
    if interlace not in (0, 1):
        raise NotImplementedError(f"PNG interlace method {interlace} unsupported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None:
        raise NotImplementedError(f"PNG color type {color} unsupported")
    raw = zlib.decompress(bytes(idat))
    bps = depth // 8
    bpp = nch * bps
    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline data length mismatch")
        rows, _ = _unfilter_byte_rows(raw, 0, h, stride, bpp)
        full = rows.reshape(h, w, bpp)
    else:  # Adam7: 7 independently-filtered sub-image passes
        full = np.zeros((h, w, bpp), np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(w - x0) // dx))
            ph = max(0, -(-(h - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            rows, offset = _unfilter_byte_rows(raw, offset, ph, pw * bpp, bpp)
            full[y0::dy, x0::dx] = rows.reshape(ph, pw, bpp)
        if offset != len(raw):
            raise ValueError("PNG interlaced data length mismatch")
    if depth == 16:
        px = (
            np.ascontiguousarray(full.reshape(h, w * nch, 2))
            .view(">u2")
            .reshape(h, w, nch)
            >> 8
        ).astype(np.uint8)
    else:
        px = full
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    if nch == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


_GIF_MAX_CODE = 1 << 12


def _gif_lzw_decode(data: bytes, mcs: int) -> bytearray:
    """GIF-variant LZW (LSB-first variable-width codes, clear/end
    codes, 12-bit table cap) -> palette index bytes."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = mcs + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            if prev is not None and len(table) < _GIF_MAX_CODE:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def _gif_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (data, position after the 0 terminator)."""
    out = bytearray()
    while True:
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += b[pos : pos + n]
        pos += n


def decode_gif(b: bytes) -> list[np.ndarray]:
    """REAL GIF87a/89a decode (stdlib-only LZW): every frame as an
    (h, w, 3) uint8 RGB array.  Sub-rectangle frames composite onto
    the running canvas (replace disposal — the only mode our encoder
    emits; exotic disposal modes are approximated the same way, which
    is the common lossy-player behavior)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", b[6:10])
    packed, _bg, _ar = b[10], b[11], b[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((sh, sw, 3), np.uint8)
    frames: list[np.ndarray] = []
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            _, pos = _gif_subblocks(b, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", b[pos : pos + 8])
        ipacked = b[pos + 8]
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame without a color table")
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        mcs = b[pos]
        pos += 1
        data, pos = _gif_subblocks(b, pos)
        idx = np.frombuffer(_gif_lzw_decode(data, mcs), np.uint8)
        if len(idx) < w * h:
            raise ValueError("GIF frame pixel data truncated")
        rect = pal[np.minimum(idx[: w * h], len(pal) - 1)].reshape(h, w, 3)
        canvas[top : top + h, left : left + w] = rect
        frames.append(canvas.copy())
    return frames


def _gif_lzw_encode_literals(indices: np.ndarray, mcs: int) -> bytes:
    """Valid GIF LZW stream via the clear-code-per-literal scheme: the
    table never grows, so the code width stays mcs+1 throughout (the
    classic 'uncompressed GIF' trick — bigger output, trivially
    correct; our GIFs are test-scale)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i in indices:
        emit(int(i))
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames: list[np.ndarray]) -> bytes:
    """(h, w, 3) uint8 RGB frames -> animated GIF89a.  Colors are
    web-safe-quantized (6x6x6 cube = 216-entry global table) — a real
    quantizing encoder, deterministic, stdlib-only."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    cube = np.stack(
        np.meshgrid(np.arange(6), np.arange(6), np.arange(6), indexing="ij"), -1
    ).reshape(-1, 3) * 51
    pal = np.vstack([cube, np.zeros((256 - 216, 3))]).astype(np.uint8)
    mcs = 8
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    out += pal.tobytes()
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError("all frames must share the screen size")
        q = np.round(fr.astype(np.float64) / 51.0).astype(np.int64).clip(0, 5)
        idx = (q[:, :, 0] * 36 + q[:, :, 1] * 6 + q[:, :, 2]).astype(np.uint8)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out.append(mcs)
        data = _gif_lzw_encode_literals(idx.ravel(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float32 samples in [-1, 1] (mono-mixed), rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(b)) as f:
        nch, sw, rate = f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if sw == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        s = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * sw}-bit WAV unsupported")
    if nch > 1:
        s = s[: len(s) - len(s) % nch].reshape(-1, nch).mean(axis=1)
    return s, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM mono WAV."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes((np.clip(samples, -1.0, 1.0) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _image_features(px: np.ndarray, dim: int = 16) -> np.ndarray:
    """4x4 grid of grayscale block means in [0, 1] — a real, classic
    image descriptor (tiny 'thumbnail embedding')."""
    gray = px.astype(np.float32).mean(axis=2)
    side = int(dim ** 0.5)
    feats = [
        blk.mean() if blk.size else 0.0
        for row in np.array_split(gray, side, axis=0)
        for blk in np.array_split(row, side, axis=1)
    ]
    return (np.array(feats, dtype=np.float32) / 255.0)[:dim]


def _audio_features(samples: np.ndarray, dim: int = 16) -> np.ndarray:
    """RMS energy over `dim` equal windows — a real audio envelope."""
    chunks = np.array_split(samples.astype(np.float64), dim)
    return np.array(
        [np.sqrt((c ** 2).mean()) if len(c) else 0.0 for c in chunks], dtype=np.float32
    )


def stft_spectrogram(
    samples: np.ndarray, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """(n_frames, n_fft//2 + 1) power spectrogram: Hann-windowed rfft
    frames, fully vectorized (stride-tricked framing, batched FFT).
    Short inputs are zero-padded to one frame."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    stride = x.strides[0]
    frames = np.lib.stride_tricks.as_strided(
        x, (n_frames, n_fft), (stride * hop, stride), writeable=False
    )
    spec = np.fft.rfft(frames * np.hanning(n_fft), axis=1)
    return (spec.real**2 + spec.imag**2).astype(np.float32)


def dominant_frequency(power: np.ndarray, sample_rate: int) -> float:
    """Peak frequency (Hz) of a time-averaged power spectrogram, with
    quadratic interpolation on log power around the peak bin for
    sub-bin accuracy (standard spectral-peak refinement)."""
    n_fft = 2 * (power.shape[1] - 1)
    mean_p = power.mean(axis=0)
    k = int(mean_p[1:].argmax()) + 1  # skip DC
    delta = 0.0
    if 1 <= k < len(mean_p) - 1 and mean_p[k] > 0:
        la, lb, lc = (float(np.log(max(mean_p[j], 1e-30))) for j in (k - 1, k, k + 1))
        denom = la - 2 * lb + lc
        if denom < 0:
            delta = float(np.clip(0.5 * (la - lc) / denom, -0.5, 0.5))
    return (k + delta) * sample_rate / n_fft

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),       # image/png-like | audio/pcm-like
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.struct([pa.field("width", pa.int32()), pa.field("height", pa.int32()), pa.field("sample_rate", pa.int32())])),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("features", pa.list_(pa.float32())),   # fixed-dim feature vector
        pa.field("error", pa.string()),
    ]
)

_MAGIC = b"SYNM"  # synthetic media payload: SYNM | u32 w | u32 h | u32 sr | data


def make_media_payload(media_id: int, width: int, height: int, sample_rate: int = 0) -> bytes:
    """Deterministic synthetic payload the fake decoder understands.

    Body byte j is the arithmetic law ``(media_id*31 + j*7) % 256`` —
    SQL-replayable on purpose, so the `media_decode_features` oracle
    can recompute the decoded chunk sums from the law alone (the
    `media_gradient_pixel_stats` pattern)."""
    n = max(16, (width * height) // 64)
    j = np.arange(n, dtype=np.int64)
    body = ((media_id * 31 + j * 7) % 256).astype(np.uint8)
    return _MAGIC + struct.pack("<III", width, height, sample_rate) + body.tobytes()


class DecodeMedia:
    """Actor-pool stage: decode + fixed-dim feature extraction.

    Raw containers (BMP, PPM/PGM, WAV) decode for REAL (see module
    docstring); compressed codecs are stubbed — strict=True raises
    NotImplementedError, strict=False emits the per-row error column;
    the `SYNM` synthetic payload keeps the fake decoder for plumbing
    tests.  Batch size for media stages must be small (payloads
    dominate block size — cap batches by bytes, SURVEY.md §4 skew
    row)."""

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] == b"\xff\xd8":
            from document_ai_ray.functions.jpeg import decode_jpeg

            return _image_features(decode_jpeg(payload), self.FEATURE_DIM)
        if payload[:8] == _PNG_SIG:
            return _image_features(decode_png(payload), self.FEATURE_DIM)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _image_features(decode_gif(payload)[0], self.FEATURE_DIM)
        if payload[:2] == b"BM":
            return _image_features(decode_bmp(payload), self.FEATURE_DIM)
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from document_ai_ray.functions.tiff import decode_tiff

            return _image_features(decode_tiff(payload), self.FEATURE_DIM)
        if payload[:2] in (b"P6", b"P5"):
            return _image_features(decode_ppm(payload), self.FEATURE_DIM)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _audio_features(decode_wav(payload)[0], self.FEATURE_DIM)
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from document_ai_ray.functions.avi import decode_avi

            # video descriptor: feature the temporal mid frame (cheap,
            # deterministic; per-frame features go through sample_frames)
            frames = decode_avi(payload)
            return _image_features(frames[len(frames) // 2], self.FEATURE_DIM)
        if payload[:4] != _MAGIC:
            if self.strict:
                raise NotImplementedError(
                    "compressed codecs (mp3/mp4/webp/...) require libraries not present in this environment"
                )
            raise ValueError("unknown payload format")
        w, h, sr = struct.unpack("<III", payload[4:16])
        body = np.frombuffer(payload[16:], dtype=np.uint8).astype(np.float32)
        # deterministic "features": moments of byte histogram buckets
        chunks = np.array_split(body, self.FEATURE_DIM)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32) / 255.0

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        types = t.column("media_type").to_pylist()
        payloads = t.column("payload").to_pylist()
        feats, errs, sizes = [], [], []
        for p in payloads:
            sizes.append(len(p) if p else 0)
            try:
                feats.append(self._decode(p).tolist())
                errs.append(None)
            except NotImplementedError as exc:  # stubbed codec path
                feats.append([0.0] * self.FEATURE_DIM)
                errs.append(f"decode_stubbed:{exc}")
            except Exception as exc:
                feats.append([0.0] * self.FEATURE_DIM)
                errs.append(f"decode_error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(types, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(feats, pa.list_(pa.float32())),
                pa.array(errs, pa.string()),
            ],
            names=[f.name for f in FEATURE_SCHEMA],
        )


def media_features(media_ds, concurrency: int = 4, batch_size: int = 16):
    """media table -> feature table.  Small batch_size on purpose:
    payload bytes x batch x concurrency must fit the worker heap."""
    return media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class ResizeMedia:
    """Actor-pool stage: payload -> payload at new dimensions (the
    image-resize analogue of the reference's page-height normalization,
    /root/reference/detection/template_matching.py:169-188).  Real
    codecs are stubbed like DecodeMedia; the fake path rewrites the
    header and nearest-neighbor-samples the byte body so output size
    tracks the new dimensions deterministically."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def _nn(self, px: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resample to (self.h, self.w)."""
        h, w, _ = px.shape
        ri = (np.arange(self.h) * h // self.h).clip(0, h - 1)
        ci = (np.arange(self.w) * w // self.w).clip(0, w - 1)
        return px[ri][:, ci]

    def _resize(self, payload: bytes) -> bytes:
        if payload[:2] == b"\xff\xd8":            # real JPEG resize + re-encode
            from document_ai_ray.functions.jpeg import decode_jpeg, encode_jpeg

            return encode_jpeg(self._nn(decode_jpeg(payload)))
        if payload[:8] == _PNG_SIG:               # real image resize + re-encode
            return encode_png(self._nn(decode_png(payload)))
        if payload[:6] in (b"GIF87a", b"GIF89a"):  # every frame resized
            return encode_gif([self._nn(f) for f in decode_gif(payload)])
        if payload[:2] == b"BM":
            return encode_bmp(self._nn(decode_bmp(payload)))
        if payload[:2] in (b"P6", b"P5"):
            return encode_ppm(self._nn(decode_ppm(payload)))
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":  # real video resize
            from document_ai_ray.functions.avi import avi_info, decode_avi, encode_avi_mjpeg

            fps = int(avi_info(payload)["fps"]) or 10
            return encode_avi_mjpeg([self._nn(f) for f in decode_avi(payload)], fps=fps)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return payload                        # resize is an image op; audio passes through
        if payload[:4] != _MAGIC:
            if self.strict:
                raise NotImplementedError("compressed-codec resize requires libraries not present")
            raise ValueError("unknown payload format")
        body = np.frombuffer(payload[16:], dtype=np.uint8)
        _, _, sr = struct.unpack("<III", payload[4:16])
        n_out = max(16, (self.w * self.h) // 64)
        idx = np.linspace(0, len(body) - 1, n_out).astype(np.int64)
        return _MAGIC + struct.pack("<III", self.w, self.h, sr) + body[idx].tobytes()

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payloads, metas = [], []
        for p in t.column("payload").to_pylist():
            try:
                out_payloads.append(self._resize(p))
            except Exception:
                out_payloads.append(p)  # pass-through on failure (row survives)
        metas = [
            {"width": self.w, "height": self.h, "sample_rate": (m or {}).get("sample_rate", 0)}
            for m in t.column("meta").to_pylist()
        ]
        return pa.Table.from_arrays(
            [
                t.column("media_id"),
                t.column("media_type"),
                pa.array(out_payloads, pa.binary()),
                pa.array(metas, MEDIA_SCHEMA.field("meta").type),
            ],
            names=[f.name for f in MEDIA_SCHEMA],
        )


def resize_media(media_ds, width: int, height: int, concurrency: int = 4, batch_size: int = 16):
    return media_ds.map_batches(
        ResizeMedia,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def sample_frames(media_ds, every: int = 4, concurrency: int = 4, batch_size: int = 8):
    """Video-analogue frame sampling: one media row -> many frame rows
    (flat_map shape).  Animated GIFs and AVI/MJPEG clips demux for
    REAL — every k-th frame is decoded and re-emitted as a standalone
    PNG image payload (ready for DecodeMedia/media_features
    downstream).  The `SYNM` synthetic payload keeps the
    fixed-size-chunk fake for plumbing tests; other real video
    containers (mp4...) stay stubbed like decoding."""
    FRAME = 256

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for i, p in zip(t.column("media_id").to_pylist(), t.column("payload").to_pylist()):
            if p and p[:6] in (b"GIF87a", b"GIF89a"):
                try:
                    decoded = decode_gif(p)
                except Exception:
                    continue
                for k in range(0, len(decoded), every):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(encode_png(decoded[k]))
                continue
            if p and p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                from document_ai_ray.functions.avi import demux_avi
                from document_ai_ray.functions.jpeg import decode_jpeg

                try:
                    jpegs = demux_avi(p)
                except Exception:
                    continue
                for k in range(0, len(jpegs), every):
                    try:
                        ids.append(i)
                        idxs.append(k)
                        frames.append(encode_png(decode_jpeg(jpegs[k])))
                    except Exception:
                        ids.pop(), idxs.pop()  # skip undecodable frame
                continue
            if not p or p[:4] != _MAGIC:
                continue
            body = p[16:]
            n_frames = max(1, len(body) // FRAME)
            for k in range(0, n_frames, every):
                ids.append(i)
                idxs.append(k)
                frames.append(body[k * FRAME : (k + 1) * FRAME])
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(idxs, pa.int32()), pa.array(frames, pa.binary())],
            names=["media_id", "frame_idx", "frame"],
        )

    return media_ds.map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size
    )


def audio_landmarks(
    power: np.ndarray,
    peaks_per_frame: int = 3,
    fan_out: int = 4,
    max_dt: int = 6,
) -> np.ndarray:
    """Shazam-style landmark fingerprints (Wang 2003): per STFT frame,
    keep the strongest `peaks_per_frame` bins above the frame mean,
    then pair each anchor peak with up to `fan_out` peaks in the next
    1..`max_dt` frames.  Each landmark packs (anchor_bin, target_bin,
    dt) into one int64 — ABSOLUTE time never enters the hash, so the
    fingerprint is invariant to time shifts (and to amplitude scaling,
    since peak RANKS are scale-free).  Returns a deduped int64 array."""
    n_frames, n_bins = power.shape
    peaks: list[np.ndarray] = []
    for f in range(n_frames):
        row = power[f]
        k = min(peaks_per_frame, n_bins)
        idx = np.argpartition(row, n_bins - k)[-k:]
        idx = idx[row[idx] > row.mean()]
        peaks.append(np.sort(idx))
    out = set()
    for f, anchors in enumerate(peaks):
        if not len(anchors):
            continue
        paired = 0
        for dt in range(1, max_dt + 1):
            if f + dt >= n_frames or paired >= fan_out:
                break
            for b2 in peaks[f + dt]:
                for b1 in anchors:
                    out.add((int(b1) << 20) | (int(b2) << 8) | dt)
                paired += 1
                if paired >= fan_out:
                    break
    return np.fromiter(out, np.int64, len(out))
