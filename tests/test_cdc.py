"""Content-defined chunking: reassembly, size bounds, vectorized-gear
differential vs a scalar reference, and the edit-locality property CDC
exists for."""

import hashlib
import random

import numpy as np
import pyarrow as pa

from document_ai_ray.stages.cdc import (
    CDC_MAX_SIZE,
    CDC_MIN_SIZE,
    GEAR,
    cdc_chunk_batch,
    chunk_boundaries,
    gear_hashes,
)


def _scalar_gear(data: bytes) -> np.ndarray:
    """Reference: h_t = (h_{t-1} << 1) + G[b_t] mod 2^64, per position."""
    out = np.zeros(len(data), dtype=np.uint64)
    h = 0
    for i, b in enumerate(data):
        h = ((h << 1) + int(GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def test_gear_vectorized_matches_scalar():
    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(500))
    assert (gear_hashes(data) == _scalar_gear(data)).all()


def test_chunks_cover_exactly_and_respect_bounds():
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(5000))
    cuts = chunk_boundaries(data)
    assert cuts[-1] == len(data)
    prev = 0
    for c in cuts:
        size = c - prev
        assert 0 < size <= CDC_MAX_SIZE
        if c != len(data):  # the tail chunk may be short
            assert size > CDC_MIN_SIZE
        prev = c


def test_edit_locality():
    """Inserting bytes mid-stream re-aligns boundaries: the chunk-hash
    multiset changes only near the edit (fixed-offset chunking would
    change EVERY chunk after it)."""
    rng = random.Random(23)
    data = bytes(rng.randrange(256) for _ in range(8000))
    edited = data[:4000] + b"INSERTED" + data[4000:]

    def hashes(d: bytes) -> list[str]:
        prev, out = 0, []
        for c in chunk_boundaries(d):
            out.append(hashlib.md5(d[prev:c]).hexdigest())
            prev = c
        return out

    h1, h2 = hashes(data), hashes(edited)
    # suffix realignment: identical trailing chunk sequences
    tail = 0
    while tail < min(len(h1), len(h2)) and h1[-1 - tail] == h2[-1 - tail]:
        tail += 1
    head = 0
    while head < min(len(h1), len(h2)) and h1[head] == h2[head]:
        head += 1
    changed = max(len(h1), len(h2)) - head - tail
    assert changed <= 4, (len(h1), len(h2), head, tail)


def test_cdc_chunk_batch_rows_rebuild_documents():
    rng = random.Random(31)
    block = "".join(chr(rng.randrange(0x21, 0x7E)) for _ in range(300))
    texts = ["alpha beta gamma " * 40, block * 10, ""]
    t = pa.table(
        {"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}
    )
    out = cdc_chunk_batch(t).to_pandas()
    for i, txt in enumerate(texts):
        rows = out[out.doc_id == i].sort_values("chunk_no")
        assert rows["chunk_len"].sum() == len(txt.encode())
    assert (out[out.doc_id == 2].shape[0]) == 0
    # a repeated 300-byte block: cuts realign each period (the CDC
    # property), so chunk hashes repeat across the 10 copies
    d1 = out[out.doc_id == 1]
    assert d1["chunk_hash"].nunique() < len(d1)
