"""Skew mitigation for giant rows (SURVEY.md §4, north_rule
"size-bucketed salting for giant HTML/PDF rows").

A 100 MB PDF sitting in a 1024-row batch makes that one task the
straggler for the whole stage.  `split_blocks_by_bytes` re-blocks the
stream so no block exceeds a byte budget: a map_batches GENERATOR —
each yielded table becomes its own Ray Data block, so giant rows are
isolated into single-row blocks the scheduler places independently,
while small rows stay coalesced.  Pure streaming, no shuffle: this is
dynamic block splitting keyed on payload size, which at 10^12 rows is
strictly cheaper than a salted `repartition` (no all-to-all) and
achieves the same load balance for a compute-bound downstream stage.

The size-bucket SALT variant (`add_size_salt`) is also provided for
wide ops that genuinely shuffle (e.g. a url-hash repartition before a
keyed write): salting the key with floor(log2(bytes)) spreads the
giants across partitions instead of letting one hash partition own
them all.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from document_ai_ray.functions.hashing import stable64


def split_batch_by_bytes(
    t: pa.Table, max_bytes: int, payload_col: str = "html", max_rows: int | None = None
) -> Iterator[pa.Table]:
    """Yield slices of ``t`` whose cumulative payload size stays under
    ``max_bytes`` (and row count under ``max_rows``, if given); a single
    row larger than the budget is yielded alone."""
    sizes = pc.binary_length(t.column(payload_col)).to_numpy(zero_copy_only=False)
    sizes = np.where(np.isnan(sizes.astype(np.float64)), 0, sizes).astype(np.int64)
    start = 0
    acc = 0
    for i in range(len(t)):
        if (
            acc + sizes[i] > max_bytes
            or (max_rows is not None and i - start >= max_rows)
        ) and i > start:
            yield t.slice(start, i - start)
            start = i
            acc = 0
        acc += sizes[i]
        if sizes[i] > max_bytes:  # giant row -> its own block
            if i > start:
                yield t.slice(start, i - start)
            yield t.slice(i, 1)
            start = i + 1
            acc = 0
    if start < len(t):
        yield t.slice(start, len(t) - start)


def split_blocks_by_bytes(
    ds,
    max_bytes: int = 8 << 20,
    payload_col: str = "html",
    max_rows: int | None = None,
):
    """Re-block a Dataset so no block's payload exceeds ``max_bytes``
    (nor ``max_rows`` rows).  With a downstream ``batch_size=None``
    map_batches this makes each emitted block exactly one task batch —
    giants stay isolated instead of being re-bundled by row-count
    batching."""

    def gen(t: pa.Table) -> Iterator[pa.Table]:
        yield from split_batch_by_bytes(t, max_bytes, payload_col, max_rows)

    # batch_size=None: operate on whole incoming blocks, emit re-split ones
    return ds.map_batches(gen, batch_format="pyarrow", batch_size=None)


def add_size_salt(
    t: pa.Table, key_col: str = "url", payload_col: str = "html", n_parts: int = 64
) -> pa.Table:
    """Append a `salt` partition key: hash(url) mixed with the payload's
    size bucket (floor(log2 bytes)), modulo n_parts.  Equal urls no
    longer pin their (possibly giant) payloads to one partition class;
    use before a keyed repartition/write where giants would clump."""
    sizes = pc.binary_length(t.column(payload_col)).to_numpy(zero_copy_only=False)
    salts = []
    for u, s in zip(t.column(key_col).to_pylist(), sizes):
        bucket = int(math.log2(s)) if s and s > 0 else 0
        salts.append((stable64(u) ^ (bucket * 0x9E3779B97F4A7C15)) % n_parts)
    return t.append_column("salt", pa.array(salts, pa.int32()))
