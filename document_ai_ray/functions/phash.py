"""Perceptual image hashing (pHash) — pure numpy, built on the repo's
from-scratch codecs.

The classic DCT perceptual hash (Zauner 2010, "Implementation and
benchmarking of perceptual image hash functions"; same family as the
pHash library / python-imagehash): luma -> small resize -> 2D DCT-II ->
low-frequency block -> bits = coefficient > median.  Perceptually-equal
images (same picture re-encoded at a different JPEG quality, or
losslessly) land within a few bits of Hamming distance; different
pictures are ~32 bits apart on average.

Reference parity note: the reference repo fingerprints documents only
by content text; perceptual hashing is part of the beyond-reference
multimodal dedup suite the brief asks for (image near-dup at 100 TB is
a banding problem over these 64-bit hashes, exactly like SimHash over
text — see stages/dedup.py simhash banding for the pigeonhole math).
"""

from __future__ import annotations

import numpy as np

PHASH_BITS = 64
_HASH_SIZE = 8  # 8x8 low-frequency block -> 64 bits
_IMG_SIZE = 32  # DCT input side (hash_size * 4, the standard factor)

_DCT32 = None  # lazy 32x32 DCT-II basis (module-level, built once)


def _dct_basis(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    return np.cos(np.pi * (2 * x + 1) * k / (2 * n))


def _to_luma(px: np.ndarray) -> np.ndarray:
    """(h, w) or (h, w, c) uint8 -> float64 luma plane (BT.601)."""
    px = np.asarray(px, dtype=np.float64)
    if px.ndim == 2:
        return px
    if px.shape[2] == 1:
        return px[:, :, 0]
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def _resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    """Separable bilinear resample to (size, size) — deterministic and
    smooth enough for hashing (hash comparisons only ever happen
    between hashes from THIS resampler, so the exact kernel is a free
    choice; bilinear averages neighborhoods, which is what makes the
    hash stable under re-encoding noise)."""
    h, w = img.shape
    ys = (np.arange(size) + 0.5) * h / size - 0.5
    xs = (np.arange(size) + 0.5) * w / size - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return (
        a * (1 - fy) * (1 - fx)
        + b * (1 - fy) * fx
        + c * fy * (1 - fx)
        + d * fy * fx
    )


def phash64(px: np.ndarray) -> int:
    """uint8 image array -> 64-bit perceptual hash (int, MSB = bit 0 of
    the row-major 8x8 low-frequency block).  DC is EXCLUDED from the
    median (it is pure mean brightness; including it wastes a bit and
    skews the threshold) but its bit is still emitted against that
    median, matching the pHash-library convention."""
    luma = _resize_bilinear(_to_luma(px), _IMG_SIZE)
    global _DCT32
    if _DCT32 is None:
        _DCT32 = _dct_basis(_IMG_SIZE)
    coeffs = _DCT32 @ luma @ _DCT32.T
    low = coeffs[:_HASH_SIZE, :_HASH_SIZE]
    med = np.median(low.ravel()[1:])  # exclude DC from the threshold
    bits = (low.ravel() > med).astype(np.uint64)
    return int(np.bitwise_or.reduce(bits << np.arange(63, -1, -1, dtype=np.uint64)))


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], np.int64)


def hamming64(a, b) -> np.ndarray:
    """Elementwise popcount(a XOR b) for uint64 arrays (or scalars)."""
    x = np.bitwise_xor(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    cnt = np.zeros(x.shape, np.int64)
    for _ in range(8):
        cnt += _POPCOUNT8[(x & np.uint64(0xFF)).astype(np.int64)]
        x = x >> np.uint64(8)
    return cnt


def phash_bands(h: int, n_bands: int = 4) -> list[int]:
    """Split a 64-bit hash into `n_bands` equal bit-bands (pigeonhole:
    two hashes within Hamming distance n_bands-1 share at least one
    exact band — the SimHash/LSH candidate-generation trick)."""
    width = PHASH_BITS // n_bands
    mask = (1 << width) - 1
    return [(h >> (width * i)) & mask for i in range(n_bands)]
