"""JPEG codec — pure numpy + stdlib, no external libraries.

This removes JPEG (the dominant web image format) from the stubbed
codec tier of `stages/multimodal.py`: `decode_jpeg` handles baseline
sequential (SOF0/SOF1) and progressive (SOF2) Huffman JPEGs —
grayscale or YCbCr, arbitrary sampling factors up to 2x2 (4:4:4 /
4:2:2 / 4:2:0), spectral selection + successive approximation,
restart markers — and `encode_jpeg` emits interchange-format baseline
JPEG with the Annex K quantization + Huffman tables and
libjpeg-convention quality scaling, or (``progressive=True``) an
SOF2 stream with the standard luma/chroma scan script and per-scan
optimized Huffman tables.

Reference parity note: the reference rasterizes PDFs to JPEG pages via
pdf2image and feeds JPEG bytes to its CV stack
(/root/reference/ai_documents/analysis/cv/document_parsing.py:5-14);
this module gives the Ray engine a real JPEG ingest path for the same
payloads without any native dependency.

Everything here derives from the public JPEG ITU-T T.81 spec (Annex F
sequential and Annex G progressive entropy coding, Annex K tables) and
the public libjpeg quality-scaling convention.  Arithmetic coding,
hierarchical/lossless layouts, 12-bit precision and CMYK raise
NotImplementedError — the honest-stub convention.

Per-pixel work is vectorized (batched einsum DCT/IDCT over all blocks
of a component); only the entropy coder is a Python bit loop, which is
fine for the thumbnail-scale payloads media stages carry — a 100 TB
image pipeline would swap this one function for a C kernel behind the
same signature.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ----------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_Q_CHR = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# (bits-per-length[1..16], symbol values) for the four standard tables.
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II basis; forward F = C B C^T, inverse B = C^T F C.
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        )


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 Annex C): symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-convention quality scaling of the Annex K tables."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUM * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHR * scale + 50) // 100, 1, 255)
    return ql, qc


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC amplitude coding: value -> (category size, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1-bits to a byte edge


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficients -> (n, 8, 8) samples (pre level-shift)."""
    return np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T, optimize=True)


def _plane_blocks(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Pad plane to (8*bh, 8*bw) by edge replication and split into
    (bh*bw, 8, 8) raster-ordered blocks."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, 8 * bh - h), (0, 8 * bw - w)), mode="edge")
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )


def _encode_component_blocks(
    plane: np.ndarray, bw: int, bh: int, qtab: np.ndarray
) -> np.ndarray:
    """Plane -> (bh*bw, 64) zigzag-ordered quantized coefficients."""
    blocks = _plane_blocks(plane.astype(np.float64) - 128.0, bw, bh)
    coef = _fdct_blocks(blocks)
    q = np.round(coef / qtab[None, :, :]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float64 YCbCr (JFIF full-range)."""
    f = px.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def _flat_huff_spec(symbols) -> tuple[list[int], list[int]]:
    """(bits, vals) giving every used symbol one common code length L
    with 2^L - 1 > n, so the reserved all-ones code stays unused
    (T.81 C.2).  Suboptimal vs true Huffman but valid and tiny."""
    syms = sorted(symbols) or [0]
    n = len(syms)
    length = max(1, n.bit_length())
    if n >= (1 << length):
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def _code_progressive_scan(
    sym, bits, restart, comps_sel, params, mcus, frame_dims, restart_interval
):
    """Entropy-code one progressive scan (T.81 G.1.2) through emitter
    callbacks, so the same traversal runs twice: once counting symbols
    to build the scan's Huffman table, once writing bits.

    ``comps_sel``: dicts with ``blocks`` ((n, 64) zigzag quantized
    coefficients), ``bw``, ``h``, ``v``.  EOB runs and the correction
    bits of blocks they cover are buffered and flushed with the EOBn
    symbol, exactly where the decoder consumes them."""
    ss, se, ah, al = params
    mcus_x, mcus_y = mcus
    fw, fh, hmax, vmax = frame_dims
    st = {"eobrun": 0, "ebits": []}
    pred = [0] * len(comps_sel)
    unit = 0

    def flush_eob():
        e = st["eobrun"]
        if e:
            r = e.bit_length() - 1
            sym((r << 4) | 0)
            bits(e - (1 << r), r)
            st["eobrun"] = 0
        for v in st["ebits"]:
            bits(v, 1)
        st["ebits"] = []

    def bump_eob(extra_bits):
        st["eobrun"] += 1
        st["ebits"].extend(extra_bits)
        if st["eobrun"] == 0x7FFF:  # EOBn extension field is 14 bits max
            flush_eob()

    def dc_code(ci, blk):
        if ah == 0:  # first scan: DPCM over the point-transformed DC
            v = int(blk[0]) >> al  # arithmetic shift (T.81 A.4, DC)
            diff = v - pred[ci]
            pred[ci] = v
            size, mb = _magnitude(diff)
            sym(size)
            bits(mb, size)
        else:  # refinement: one raw bit per block
            bits((int(blk[0]) >> al) & 1, 1)

    def ac_first(blk):
        # AC point transform truncates toward zero (T.81 A.4, AC)
        tv = []
        for k in range(ss, se + 1):
            v = int(blk[k])
            tv.append((abs(v) >> al) * (1 if v >= 0 else -1))
        nz = [i for i, t in enumerate(tv) if t]
        if not nz:
            bump_eob(())
            return
        flush_eob()
        r = 0
        for t in tv[: nz[-1] + 1]:
            if t == 0:
                r += 1
                continue
            while r > 15:
                sym(0xF0)
                r -= 16
            size, mb = _magnitude(t)
            sym((r << 4) | size)
            bits(mb, size)
            r = 0
        if nz[-1] < se - ss:
            bump_eob(())

    def ac_refine(blk):
        # T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine: newly-significant
        # coefficients are coded run/1 + sign; already-nonzero ones get a
        # correction bit, buffered until the next symbol (or EOB) flush.
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:  # ==1 at this precision <=> newly significant
                eobpos = i
        r = 0
        br: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush_eob()
                sym(0xF0)
                r -= 16
                for v in br:
                    bits(v, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob()
            sym((r << 4) | 1)
            bits(1 if int(blk[ss + i]) > 0 else 0, 1)
            for v in br:
                bits(v, 1)
            br = []
            r = 0
        if r > 0 or br:
            bump_eob(br)

    def maybe_restart():
        nonlocal pred
        if restart_interval and unit and unit % restart_interval == 0:
            flush_eob()
            restart()
            pred = [0] * len(comps_sel)

    if len(comps_sel) > 1:  # interleaved scan: DC only, MCU order
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                unit += 1
                for ci, c in enumerate(comps_sel):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = c["blocks"][
                                (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            ]
                            dc_code(ci, blk)
    else:  # non-interleaved: the component's own ceil-grid, raster order
        c = comps_sel[0]
        cw = -(-fw * c["h"] // hmax)
        ch = -(-fh * c["v"] // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                unit += 1
                blk = c["blocks"][by * c["bw"] + bx]
                if ss == 0:
                    dc_code(0, blk)
                elif ah == 0:
                    ac_first(blk)
                else:
                    ac_refine(blk)
    flush_eob()


# Standard progressive scan script (the libjpeg default): interleaved
# DC with one bit of successive approximation, spectrally-selected AC
# first scans, then AC + DC refinement.  Entries: (comp idxs, ss, se, ah, al).
_PROG_SCRIPT_COLOR = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([1], 1, 63, 0, 1),
    ([2], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([1], 1, 63, 1, 0),
    ([2], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_PROG_SCRIPT_GRAY = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


def _emit_progressive_scans(
    out, comps, comp_blocks, comp_dims, mcus, frame_dims, restart_interval
):
    """Append DHT + SOS + entropy data for every scan of the script."""
    script = _PROG_SCRIPT_COLOR if len(comps) == 3 else _PROG_SCRIPT_GRAY
    for comp_idxs, ss, se, ah, al in script:
        comps_sel = []
        for ci in comp_idxs:
            cid, (hi, vi), _qi, _dt, _at = comps[ci]
            comps_sel.append(
                {"id": cid, "h": hi, "v": vi, "bw": comp_dims[ci][0],
                 "blocks": comp_blocks[ci]}
            )
        params = (ss, se, ah, al)
        is_dc_refine = ss == 0 and ah != 0
        if not is_dc_refine:  # DC refinement scans emit raw bits only
            seen: set[int] = set()
            _code_progressive_scan(
                seen.add, lambda v, n: None, lambda: None,
                comps_sel, params, mcus, frame_dims, restart_interval,
            )
            hbits, hvals = _flat_huff_spec(seen)
            table = _huff_codes(hbits, hvals)
            tc_th = 0x00 if ss == 0 else 0x10  # redefine table id 0 per scan
            body = bytes([tc_th]) + bytes(hbits) + bytes(hvals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

            wr = _BitWriter()
            rst = [0]

            def write_sym(s):
                code, ln = table[s]
                wr.put(code, ln)

            def write_restart():
                wr.flush()
                wr.buf += bytes([0xFF, 0xD0 + rst[0]])
                rst[0] = (rst[0] + 1) & 7

            _code_progressive_scan(
                write_sym, wr.put, write_restart,
                comps_sel, params, mcus, frame_dims, restart_interval,
            )
        else:
            wr = _BitWriter()
            rst = [0]

            def write_restart():
                wr.flush()
                wr.buf += bytes([0xFF, 0xD0 + rst[0]])
                rst[0] = (rst[0] + 1) & 7

            _code_progressive_scan(
                lambda s: None, wr.put, write_restart,
                comps_sel, params, mcus, frame_dims, restart_interval,
            )
        wr.flush()
        sos = bytearray([len(comps_sel)])
        for c in comps_sel:
            sos += bytes([c["id"], 0x00])  # DC table 0 / AC table 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += wr.buf


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: bool = True,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """uint8 image -> JPEG bytes (baseline, or SOF2 ``progressive``).

    (h, w, 3) RGB encodes as 3-component YCbCr (4:2:0 when
    ``subsample`` else 4:4:4); (h, w) or (h, w, 1) encodes as
    single-component grayscale.  Annex K quant tables, libjpeg quality
    convention, JFIF APP0 header.  A nonzero ``restart_interval``
    emits DRI + RSTn markers every that many MCUs/blocks (the
    error-resilience feature real camera JPEGs use).  ``progressive``
    emits the standard successive-approximation scan script with
    per-scan optimized Huffman tables; the quantized coefficients are
    identical to the baseline encoding, so both decode to the same
    pixels."""
    px = np.asarray(px)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql, qc = _quality_tables(quality)
    ql_z = ql.reshape(64)[ZIGZAG]
    qc_z = qc.reshape(64)[ZIGZAG]

    if gray:
        comps = [(1, (1, 1), 0, 0, 0)]  # id, (hi, vi), qtab idx, dc tab, ac tab
        planes = [px.astype(np.float64)]
        hmax = vmax = 1
    else:
        sub = 2 if (subsample and min(h, w) >= 2) else 1
        comps = [(1, (sub, sub), 0, 0, 0), (2, (1, 1), 1, 1, 1), (3, (1, 1), 1, 1, 1)]
        ycc = _rgb_to_ycbcr(px)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if sub == 2:
            # mean-pool 2x2 with edge padding to even dims
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        planes = [y, cb, cr]
        hmax = vmax = sub

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # per component: zigzag coefficient blocks in raster order + block grid dims
    comp_blocks: list[np.ndarray] = []
    comp_dims: list[tuple[int, int]] = []
    for (cid, (hi, vi), qi, _dt, _at), plane in zip(comps, planes):
        bw, bh = mcus_x * hi, mcus_y * vi
        qtab = ql if qi == 0 else qc
        comp_blocks.append(_encode_component_blocks(plane, bw, bh, qtab))
        comp_dims.append((bw, bh))

    dc_tabs = [_huff_codes(*_DC_LUM), _huff_codes(*_DC_CHR)]
    ac_tabs = [_huff_codes(*_AC_LUM), _huff_codes(*_AC_CHR)]

    bw_writer = _BitWriter()
    pred = [0] * len(comps)
    mcu_count = 0
    rst_n = 0
    mcu_rows = () if progressive else range(mcus_y)  # progressive scans below
    for my in mcu_rows:
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw_writer.flush()
                bw_writer.buf += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (cid, (hi, vi), _qi, dt, at) in enumerate(comps):
                cbw, _cbh = comp_dims[ci]
                dctab, actab = dc_tabs[dt], ac_tabs[at]
                for by in range(vi):
                    for bx in range(hi):
                        blk = comp_blocks[ci][(my * vi + by) * cbw + (mx * hi + bx)]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        size, bits = _magnitude(diff)
                        code, ln = dctab[size]
                        bw_writer.put(code, ln)
                        bw_writer.put(bits, size)
                        run = 0
                        last_nz = 0
                        nz = np.nonzero(blk[1:])[0]
                        last_nz = (nz[-1] + 1) if len(nz) else 0
                        for k in range(1, last_nz + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                zc, zl = actab[0xF0]
                                bw_writer.put(zc, zl)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, ln = actab[(run << 4) | size]
                            bw_writer.put(code, ln)
                            bw_writer.put(bits, size)
                            run = 0
                        if last_nz < 63:
                            ec, el = actab[0x00]
                            bw_writer.put(ec, el)
    bw_writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes(ql_z.astype(np.uint8))
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x01" + bytes(qc_z.astype(np.uint8))
    # SOF0 (baseline) / SOF2 (progressive)
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, (hi, vi), qi, _dt, _at in comps:
        sof += bytes([cid, (hi << 4) | vi, qi])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">H", 2 + len(sof)) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _emit_progressive_scans(
            out, comps, comp_blocks, comp_dims,
            (mcus_x, mcus_y), (w, h, hmax, vmax), restart_interval,
        )
    else:
        # DHT
        tables = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
        if not gray:
            tables += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
        for tc_th, (bits, vals) in tables:
            body = bytes([tc_th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
        # SOS
        sos = bytearray([len(comps)])
        for cid, _s, _qi, dt, at in comps:
            sos += bytes([cid, (dt << 4) | at])
        sos += b"\x00\x3f\x00"
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += bw_writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and RSTn awareness (T.81 F.2.2.5)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # pad past EOI; decoder stops via MCU count
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker pending: stop filling, let sync handle it
                else:
                    break  # EOI or other marker: pad
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        if self.nbits <= 24:  # hit a marker: pad with zeros
            self.acc <<= 24 - self.nbits
            self.nbits = 24

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Discard pad bits, consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: appended-bits value -> signed amplitude."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _dc_decode(reader, blk, dctab, pred, cid, ah, al):
    """DC coefficient for one block: first scan (ah==0) decodes a
    point-transformed diff, refinement appends one bit."""
    if ah == 0:
        size = _decode_huff(reader, dctab)
        pred[cid] += _extend(reader.bits(size), size)
        blk[0] = pred[cid] << al
    elif reader.bit():
        blk[0] |= 1 << al


def _ac_decode_first(reader, blk, actab, ss, se, al, eobrun):
    """AC band, first scan (ah==0): run/size coding with EOBn runs
    (T.81 G.1.2.2; baseline is the ss=1, se=63, al=0, eobrun-degenerate
    case of the same procedure).  Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(reader, actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            break  # EOBn: this block ends, eobrun more blocks skip
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        blk[k] = _extend(reader.bits(s), s) << al
        k += 1
    return eobrun


def _ac_decode_refine(reader, blk, actab, ss, se, al, eobrun):
    """AC band, refinement scan (ah>0): one correction bit per already-
    nonzero coefficient, newly-significant coefficients inserted at
    zero-history positions (T.81 G.1.2.3).  Returns remaining EOB run."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(reader, actab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # r == 15: advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid JPEG refinement magnitude")
                val = p1 if reader.bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if reader.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            if blk[k] != 0 and reader.bit() and (blk[k] & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _next_marker(b: bytes, pos: int) -> int:
    """First byte position at or after ``pos`` of a non-RST, non-stuffed
    marker (entropy-coded data may contain 0xFF00 and RSTn)."""
    while pos + 1 < len(b):
        if b[pos] == 0xFF and b[pos + 1] != 0x00 and not (0xD0 <= b[pos + 1] <= 0xD7):
            return pos
        pos += 1
    return len(b)


def _decode_scan(
    b, pos, frame, stabs, params, dc_tabs, ac_tabs, restart_interval, progressive
):
    """Entropy-decode one scan into the components' coefficient arrays;
    returns the byte position of the next marker after the scan data."""
    ss, se, ah, al = params
    comps = [c for c in frame["comps"] if c["id"] in stabs]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    reader = _BitReader(b, pos)
    pred = {c["id"]: 0 for c in comps}
    eobrun = 0
    unit = 0

    def maybe_restart():
        nonlocal pred, eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            reader.sync_restart()
            pred = {c["id"]: 0 for c in comps}
            eobrun = 0

    if len(comps) > 1:  # interleaved scan: MCU order (DC-only if progressive)
        if progressive and ss != 0:
            raise ValueError("interleaved progressive AC scan is invalid")
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                unit += 1
                for c in comps:
                    dt, at = stabs[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = c["coef"][
                                (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            ]
                            if ss == 0:
                                _dc_decode(reader, blk, dc_tabs[dt], pred, c["id"], ah, al)
                            if se > 0:
                                eobrun = _ac_decode_first(
                                    reader, blk, ac_tabs[at], max(ss, 1), se, al, eobrun
                                )
    else:  # non-interleaved: block raster order over the component's own grid
        c = comps[0]
        dt, at = stabs[c["id"]]
        cw = -(-fw * c["h"] // hmax)
        ch = -(-fh * c["v"] // vmax)
        nbx, nby = -(-cw // 8), -(-ch // 8)
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                unit += 1
                blk = c["coef"][by * c["bw"] + bx]
                if ss == 0:
                    _dc_decode(reader, blk, dc_tabs[dt], pred, c["id"], ah, al)
                if se > 0:
                    if ah == 0:
                        eobrun = _ac_decode_first(
                            reader, blk, ac_tabs[at], max(ss, 1), se, al, eobrun
                        )
                    else:
                        eobrun = _ac_decode_refine(
                            reader, blk, ac_tabs[at], max(ss, 1), se, al, eobrun
                        )
    return _next_marker(b, reader.pos)


def decode_jpeg(b: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, 3) uint8 RGB.

    Supports baseline (SOF0), extended sequential (SOF1) and
    PROGRESSIVE (SOF2) Huffman JPEGs: spectral selection, successive
    approximation (DC + AC refinement scans, EOBn runs), 8-bit
    precision, 1-component grayscale or 3-component YCbCr with any
    sampling factors that divide the max factor, DRI/RSTn restart
    intervals.  Arithmetic coding (SOF9+), hierarchical and lossless
    layouts raise NotImplementedError."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    restart_interval = 0
    saw_scan = False
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", b, pos)[0]
        seg = b[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables unsupported")
                tab = np.frombuffer(seg, np.uint8, 64, i + 1).astype(np.int64)
                qtabs[tq] = tab[_UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decode_map(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                raise NotImplementedError("non-dividing JPEG sampling factors unsupported")
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            for c in comps:
                c["bw"] = mcus_x * c["h"]
                c["bh"] = mcus_y * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0xFF{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            stabs = {}
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                stabs[cs] = (tdta >> 4, tdta & 0x0F)
            p_ss, p_se, p_a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            params = (p_ss, p_se, p_a >> 4, p_a & 0x0F)
            pos = _decode_scan(
                b, pos, frame, stabs, params, dc_tabs, ac_tabs,
                restart_interval, progressive,
            )
            saw_scan = True
        # APPn / COM / others: skipped
    if frame is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    planes = []
    for c in comps:
        q = qtabs[c["tq"]]
        coef = c["coef"][:, _UNZIGZAG].reshape(-1, 8, 8) * q[None, :, :]
        samples = _idct_blocks(coef.astype(np.float64)) + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = (
            samples.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(comps) == 1:
        g = np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
