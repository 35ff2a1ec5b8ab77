"""Input-size-aware scaling knobs.

Hash-bucketed groupby/join stages (dedup verify joins, connected
components, TF-IDF DF join, grouped top-k) key per-task memory to
O(corpus / n_buckets).  A fixed bucket count sized for the test box
silently grows each task's slice 100x at 100x data; `auto_buckets`
instead targets a ROWS-PER-BUCKET budget so task memory stays flat as
the corpus grows, floored for parallelism and capped so the
sort-shuffle's per-block overhead doesn't dominate tiny inputs
(measured on this box: 128 tiny blocks ~5x slower than a handful of
fat ones — see CLAUDE.md).
"""

from __future__ import annotations

import math

# ~128k rows per bucket: a bucket of exploded (id, hash) rows at this
# size is a few MB — far under worker heap even with the self-merge's
# transient pair frame.
DEFAULT_ROWS_PER_BUCKET = 1 << 17


def auto_buckets(
    n_rows: int,
    rows_per_bucket: int = DEFAULT_ROWS_PER_BUCKET,
    lo: int = 8,
    hi: int = 1 << 16,
) -> int:
    """Bucket count for a hash-bucketed stage processing ~n_rows rows.

    Grows linearly with the input (n_rows / rows_per_bucket) so a 100x
    corpus gets 100x buckets and per-task memory is unchanged; `lo`
    keeps small inputs parallel, `hi` bounds scheduler overhead (at the
    cap, raise rows_per_bucket instead of adding buckets).
    """
    return max(lo, min(hi, math.ceil(max(1, n_rows) / rows_per_bucket)))
