"""Real AVI (RIFF) container mux/demux for MJPEG video.

AVI 1.0 is a RIFF file: `RIFF('AVI ', LIST('hdrl', avih, LIST('strl',
strh, strf)), LIST('movi', '00dc' frame chunks...), 'idx1')`.  MJPEG
("Motion JPEG") stores each video frame as a complete baseline JPEG in
a `00dc` chunk, so this module plus `functions/jpeg.py` is a REAL
video decode/encode path — no external codec libraries.

This upgrades the multimodal stage's video tier from "stubbed
container" to real demux: `sample_frames` in `stages/multimodal.py`
fans an AVI row out to decoded frame rows the same way it already does
for animated GIFs.  Reference analogue: the pdf2image page
rasterization fan-out (/root/reference/ai_documents/analysis/cv/
document_parsing.py:5-14) — one binary payload to many image rows.

Parsing is tolerant the way a crawl-scale pipeline must be: the demuxer
walks chunks defensively, honors RIFF even-byte padding, accepts both
`##dc` (compressed) and `##db` (uncompressed DIB) frame chunks from any
stream number, and raises ValueError (never crashes) on truncation —
the caller's per-row error column absorbs it.
"""

from __future__ import annotations

import struct

import numpy as np

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk with the mandatory even-byte pad."""
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """(h, w, 3) uint8 frames -> AVI/MJPEG bytes (one 'vids' stream).

    Every frame is JPEG-encoded independently (that is what MJPEG is),
    wrapped in '00dc' chunks, and indexed in a standard idx1 so any
    player/demuxer can seek.  All frames must share one geometry."""
    from document_ai_ray.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all AVI frames must share one geometry")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        AVIF_HASINDEX,             # dwFlags
        len(jpegs),                # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,                # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids",
        b"MJPG",
        0,              # dwFlags
        0, 0,           # wPriority, wLanguage
        0,              # dwInitialFrames
        1,              # dwScale
        max(fps, 1),    # dwRate -> fps = dwRate/dwScale
        0,              # dwStart
        len(jpegs),     # dwLength (frames)
        max_bytes,      # dwSuggestedBufferSize
        0xFFFFFFFF,     # dwQuality (default)
        0,              # dwSampleSize (0: variable-size samples)
        0, 0, w, h,     # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are from the 'movi' fourcc (the common convention).
        idx += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, 4 + len(movi_payload), len(j))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", bytes(movi_payload))
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size); stop at truncation."""
    i = start
    while i + 8 <= end:
        fourcc = b[i : i + 4]
        size = struct.unpack_from("<I", b, i + 4)[0]
        payload_start = i + 8
        if payload_start + size > end:  # truncated chunk: salvage what's there
            size = max(0, end - payload_start)
            yield fourcc, payload_start, size
            return
        yield fourcc, payload_start, size
        i = payload_start + size + (size & 1)  # even-byte padding


def demux_avi(b: bytes) -> list[bytes]:
    """AVI bytes -> per-frame compressed payloads (JPEGs for MJPEG).

    Walks LIST('movi') collecting `##dc`/`##db` chunks in file order
    (which is presentation order for a single-video-stream AVI).
    Accepts the nested LIST('rec ') grouping some muxers emit."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)

    frames: list[bytes] = []

    def collect(start: int, stop: int) -> None:
        for fourcc, ps, sz in _walk_chunks(b, start, stop):
            if fourcc == b"LIST" and sz >= 4 and b[ps : ps + 4] == b"rec ":
                collect(ps + 4, ps + sz)
            elif fourcc[2:4] in (b"dc", b"db") and sz > 0:
                frames.append(b[ps : ps + sz])

    for fourcc, ps, sz in _walk_chunks(b, 12, end):
        if fourcc == b"LIST" and sz >= 4 and b[ps : ps + 4] == b"movi":
            collect(ps + 4, ps + sz)
    return frames


def avi_info(b: bytes) -> dict:
    """Parse the avih main header -> {width, height, fps, n_frames}."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    for fourcc, ps, sz in _walk_chunks(b, 12, len(b)):
        if fourcc == b"LIST" and sz >= 4 and b[ps : ps + 4] == b"hdrl":
            for f2, p2, s2 in _walk_chunks(b, ps + 4, ps + sz):
                if f2 == b"avih" and s2 >= 40:
                    vals = struct.unpack_from("<10I", b, p2)
                    usec, n_frames, w, h = vals[0], vals[4], vals[8], vals[9]
                    return {
                        "width": w,
                        "height": h,
                        "fps": round(1_000_000 / usec, 3) if usec else 0.0,
                        "n_frames": n_frames,
                    }
    raise ValueError("AVI missing avih header")


def decode_avi(b: bytes) -> list[np.ndarray]:
    """AVI/MJPEG bytes -> list of (h, w, 3) uint8 RGB frames."""
    from document_ai_ray.functions.jpeg import decode_jpeg

    frames = demux_avi(b)
    if not frames:
        raise ValueError("AVI contains no video frames")
    return [decode_jpeg(f) for f in frames]
