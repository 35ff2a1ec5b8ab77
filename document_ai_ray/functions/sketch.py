"""KMV (k-minimum-values) distinct-count sketch.

The mergeable approximate-distinct primitive for 10^12-row scale where
an exact `COUNT(DISTINCT x)` per group would shuffle every distinct
value: each partial keeps only the k smallest 64-bit hashes of the
values it saw; the union of two sketches is the k smallest of the
concatenation (pure min-merge — composes with the engine's combiner
merge, no all-to-all).  Estimator: (k-1) / v_k where v_k is the k-th
smallest hash mapped to (0,1] (Bar-Yossef et al., RANDOM'02; relative
error ~ 1/sqrt(k-2)).
"""

from __future__ import annotations

import numpy as np

from document_ai_ray.functions.hashing import stable64

_U64_MAX = float(1 << 64)


def kmv_sketch(values, k: int = 256) -> np.ndarray:
    """Build a sketch (sorted uint64 array, len <= k) from an iterable
    of hashable values (str/bytes)."""
    hs = np.fromiter((stable64(v) for v in values), dtype=np.uint64)
    hs = np.unique(hs)  # sorted + deduped
    return hs[:k]


def kmv_merge(sketches: list[np.ndarray], k: int = 256) -> np.ndarray:
    """Union of sketches = k smallest distinct hashes of the union."""
    if not sketches:
        return np.empty(0, dtype=np.uint64)
    allh = np.unique(np.concatenate(sketches))
    return allh[:k]


def kmv_estimate(sketch: np.ndarray, k: int = 256) -> float:
    """Approximate distinct count.  Exact when fewer than k distinct
    values were seen (the sketch holds them all)."""
    n = len(sketch)
    if n < k:
        return float(n)
    v_k = (float(sketch[k - 1]) + 1.0) / _U64_MAX
    return (k - 1) / v_k
