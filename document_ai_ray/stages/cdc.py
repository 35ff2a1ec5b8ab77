"""Content-defined chunking (Gear/FastCDC-style) for byte-level dedup.

Fixed-offset chunking breaks on a single inserted byte (every later
chunk shifts); CDC cuts where a rolling hash of the trailing 64 bytes
hits a mask, so boundaries re-align right after an edit — the property
every large-scale dedup store (LBFS, restic, borg, data-lake dedup)
builds on.  Here it backs cross-document BYTE-level dedup stats, the
binary-payload complement of the word-shingle dedup suite.

The gear hash h_t = (h_{t-1} << 1) + G[b_t] depends only on the last
64 bytes: h_t = Σ_{i=0..63} G[b_{t-i}] << i (mod 2^64).  That form is
computed VECTORIZED as 64 shifted adds over the G-mapped byte array —
no per-byte Python loop; only the (few) mask-hit candidates are walked
sequentially to enforce min/max chunk sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

CDC_MASK_BITS = 6  # expected gap between mask hits = 64 bytes
CDC_MIN_SIZE = 16
CDC_MAX_SIZE = 256


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


GEAR = _splitmix64(np.arange(256, dtype=np.uint64))


def gear_hashes(data: bytes) -> np.ndarray:
    """Rolling gear hash at every position (uint64, len == len(data))."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = GEAR[b]
    h = np.zeros(len(b), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(min(64, len(b))):
            # term G[b[t-i]] << i contributes to positions t >= i
            h[i:] += g[: len(b) - i] << np.uint64(i)
    return h


def chunk_boundaries(
    data: bytes,
    mask_bits: int = CDC_MASK_BITS,
    min_size: int = CDC_MIN_SIZE,
    max_size: int = CDC_MAX_SIZE,
) -> list[int]:
    """Cut positions (exclusive ends) covering data exactly: a cut
    where hash & mask == 0, at least min_size and at most max_size
    after the previous cut."""
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64((1 << mask_bits) - 1)
    hits = np.flatnonzero((gear_hashes(data) & mask) == 0) + 1  # cut AFTER the hit byte
    cuts: list[int] = []
    start = 0
    hi = 0
    while start < n:
        limit = min(start + max_size, n)
        cut = limit
        while hi < len(hits) and hits[hi] <= start + min_size:
            hi += 1
        if hi < len(hits) and hits[hi] <= limit:
            cut = int(hits[hi])
        cuts.append(cut)
        start = cut
    return cuts


def cdc_chunk_batch(
    t: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """One row per chunk: (id, chunk_no, chunk_hash md5-hex, chunk_len)."""
    ids_out: list[int] = []
    nos: list[int] = []
    hashes: list[str] = []
    lens: list[int] = []
    for doc_id, txt in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
        data = (txt or "").encode("utf-8")
        start = 0
        for no, cut in enumerate(chunk_boundaries(data)):
            chunk = data[start:cut]
            ids_out.append(doc_id)
            nos.append(no)
            hashes.append(hashlib.md5(chunk).hexdigest())
            lens.append(len(chunk))
            start = cut
    return pa.table(
        {
            id_col: pa.array(ids_out, pa.int64()),
            "chunk_no": pa.array(nos, pa.int64()),
            "chunk_hash": pa.array(hashes, pa.string()),
            "chunk_len": pa.array(lens, pa.int64()),
        }
    )
