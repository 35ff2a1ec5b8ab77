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


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (weighted-centroid digest, t-digest without
# the scale function).  The approximate companion to the EXACT
# per-group quantiles in pipelines/analytics.py: at 10^12 rows or
# high-cardinality keys, shipping every value to one task is off the
# table; each partial compresses its values into <= K equal-weight
# (mean, weight) centroids, merge = concat + recompress — associative
# up to re-compression, deterministic (stable sort by value).  Mid-
# quantile error ~ O(1/K); accuracy vs exact asserted in tests.
# ---------------------------------------------------------------------------


def qsketch_compress(vals: np.ndarray, wts: np.ndarray, k: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """(values, weights) -> <= k equal-weight centroids, sorted by value."""
    order = np.argsort(vals, kind="stable")
    vals, wts = np.asarray(vals, dtype=np.float64)[order], np.asarray(wts, dtype=np.float64)[order]
    if len(vals) <= k:
        return vals, wts
    total = wts.sum()
    cum = np.cumsum(wts)
    # bucket of each input centroid: which of the k equal-weight slots
    # its cumulative weight midpoint falls into
    mid = cum - wts / 2.0
    seg = np.minimum((mid / total * k).astype(np.int64), k - 1)
    out_v = np.zeros(k)
    out_w = np.zeros(k)
    np.add.at(out_w, seg, wts)
    np.add.at(out_v, seg, vals * wts)
    nz = out_w > 0
    return out_v[nz] / out_w[nz], out_w[nz]


def qsketch_merge(parts: list[tuple[np.ndarray, np.ndarray]], k: int = 256) -> tuple[np.ndarray, np.ndarray]:
    if not parts:
        return np.empty(0), np.empty(0)
    v = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    return qsketch_compress(v, w, k)


def qsketch_quantile(sketch: tuple[np.ndarray, np.ndarray], q: float) -> float:
    """Quantile estimate by linear interpolation between centroid
    midpoints (standard digest estimator)."""
    v, w = sketch
    if len(v) == 0:
        return float("nan")
    if len(v) == 1:
        return float(v[0])
    total = w.sum()
    mids = np.cumsum(w) - w / 2.0
    target = q * total
    if target <= mids[0]:
        return float(v[0])
    if target >= mids[-1]:
        return float(v[-1])
    j = np.searchsorted(mids, target) - 1
    frac = (target - mids[j]) / (mids[j + 1] - mids[j])
    return float(v[j] + frac * (v[j + 1] - v[j]))


def qsketch_to_bytes(sketch: tuple[np.ndarray, np.ndarray]) -> bytes:
    v, w = sketch
    return np.concatenate([v.astype(np.float64), w.astype(np.float64)]).tobytes()


def qsketch_from_bytes(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    a = np.frombuffer(b, dtype=np.float64)
    h = len(a) // 2
    return a[:h].copy(), a[h:].copy()


# ---------------------------------------------------------------------------
# Misra-Gries / space-saving heavy hitters (mergeable)
# ---------------------------------------------------------------------------


def mg_from_counts(counts: dict, m: int) -> dict:
    """Misra-Gries summary of capacity m from exact local counts:
    keep the m largest counters and subtract the (m+1)-th largest from
    each (the classic decrement step, batched).  Estimates are then
    UNDER-counts with error <= N_local/(m+1)."""
    if len(counts) <= m:
        return dict(counts)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    cut = top[m][1]
    return {k: v - cut for k, v in top[:m] if v > cut}


def mg_merge(sketches: list[dict], m: int) -> dict:
    """Merge MG summaries (Agarwal et al., "Mergeable Summaries",
    PODS'12): add counters pointwise, then re-apply the capacity-m
    decrement.  Total under-count error stays <= N_total/(m+1)
    regardless of merge tree shape, so two-level distributed merging
    is safe."""
    total: dict = {}
    for s in sketches:
        for k, v in s.items():
            total[k] = total.get(k, 0) + v
    return mg_from_counts(total, m)


# -- HyperLogLog -------------------------------------------------------------
#
# The industry-standard mergeable distinct sketch (Flajolet et al. 2007,
# with the Heule et al. 2013 small-range linear counting): FIXED-size
# register arrays (2^p bytes) whatever the cardinality — unlike KMV it
# never grows with the stream, and merge is an elementwise max, so it
# composes with the combiner + two-level merge like every other partial
# here.  Error ~ 1.04/sqrt(2^p).

HLL_P = 12  # 4096 registers, ~1.6% standard error


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint64 hashes -> register array (uint8, len 2^p): register j =
    max over its hashes of (leading zeros of the remaining 64-p bits)+1."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return regs
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # top 64-p payload bits, left-aligned
    # rho = leading zeros of w within 64-p bits, +1; w==0 -> 64-p+1
    lz = _nlz64(w)
    rho = np.minimum(lz, 64 - p).astype(np.uint8) + 1
    np.maximum.at(regs, idx, rho)
    return regs


def _nlz64(w: np.ndarray) -> np.ndarray:
    """Number of leading zero bits of each uint64 (vectorized)."""
    w = w.astype(np.uint64, copy=True)
    n = np.zeros(w.shape, np.int64)
    for bits in (32, 16, 8, 4, 2, 1):
        b = np.uint64(bits)
        mask = w < (np.uint64(1) << np.uint64(64 - bits))
        n = np.where(mask, n + bits, n)
        w = np.where(mask, w << b, w)
    return np.where(w == 0, 64, n)


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise max — associative, commutative, idempotent."""
    out = parts[0].copy()
    for r in parts[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimate with linear-counting small-range correction."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return float(est)


# ---------------------------------------------------------------------------
# md5-based 60-bit HLL (SQL-replayable spec).  DuckDB parses '0x' + hex
# only up to BIGINT, so the spec uses the md5 digest's first 15 hex
# chars (60 bits): index = top 12 bits, payload = low 48 bits, rho =
# 49 - bit_length(payload) (49 when the payload is zero).  The estimate
# is an exact-INTEGER substrate — S = sum over registers of
# 2^(49 - rho) (Python int / DuckDB BIGINT, identical on both sides),
# est_milli = ALPHA_NANO * m^2 * 2^49 * 1000 // (10^9 * S) — so the
# oracle hash never touches a cross-engine float sum.  Linear-counting
# branch uses floor(1000 * m * ln(m / zeros)): one glibc log over
# identical rational inputs (the nb_langid micro-nat precedent).
# ---------------------------------------------------------------------------

HLL60_P = 12
HLL60_M = 1 << HLL60_P
HLL60_MAX_RHO = 49  # 48 payload bits + 1
HLL60_ALPHA_NANO = 721110039  # floor(1e9 * 0.7213 / (1 + 1.079 / 4096))


def hll60_hash(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8", "surrogatepass")).hexdigest()[:15], 16)


def hll60_registers(values) -> np.ndarray:
    """Iterable of strings -> uint8 register array (len 4096)."""
    regs = np.zeros(HLL60_M, np.uint8)
    mask = (1 << 48) - 1
    for s in values:
        h = hll60_hash(s)
        idx = h >> 48
        w = h & mask
        rho = HLL60_MAX_RHO - w.bit_length()  # w==0 -> 49
        if rho > regs[idx]:
            regs[idx] = rho
    return regs


def hll60_est_milli(regs: np.ndarray) -> tuple[int, int]:
    """(estimate in millis, zero-register count) — exact integers."""
    import math

    m = HLL60_M
    rhos = regs.astype(np.int64)
    s = int(
        sum(1 << (HLL60_MAX_RHO - int(r)) for r in rhos)
    )  # Python ints: terms up to 2^49, sum up to 2^61
    zeros = int(np.count_nonzero(regs == 0))
    est_milli = (HLL60_ALPHA_NANO * m * m * (1 << HLL60_MAX_RHO) * 1000) // (
        10**9 * s
    )
    if est_milli <= 2500 * m and zeros:
        est_milli = math.floor(1000.0 * m * math.log(m / zeros))
    return est_milli, zeros


def hll60_sql(value_expr: str) -> str:
    """SQL snippet: SELECT est_milli FROM <derived> — takes a relation
    alias ``vals(v)`` of DISTINCT varchar values via ``value_expr`` as
    the FROM-able subquery text.  Returns the full WITH-body suffix the
    oracles compose; see approx_distinct_words_hll."""
    return f"""
hh AS (SELECT CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT) AS h FROM ({value_expr})),
rr AS (SELECT h >> 48 AS idx,
              MAX(CASE WHEN (h & 281474976710655) = 0 THEN 49
                       ELSE 49 - length(bin(h & 281474976710655)) END) AS rho
       FROM hh GROUP BY 1),
ss AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (49 - rho)) AS BIGINT) AS s_present,
              COUNT(*) AS n_present FROM rr),
ag AS (SELECT s_present + (4096 - n_present) * (CAST(1 AS BIGINT) << 49) AS s,
              4096 - n_present AS zeros FROM ss),
ml AS (SELECT CAST(CAST({HLL60_ALPHA_NANO} AS HUGEINT) * 4096 * 4096
              * (CAST(1 AS HUGEINT) << 49) * 1000
              // (CAST(1000000000 AS HUGEINT) * s) AS BIGINT) AS raw, zeros FROM ag),
est AS (SELECT CASE WHEN raw <= 2500 * 4096 AND zeros > 0
                    THEN CAST(FLOOR(1000.0 * 4096 * LN(4096.0 / zeros)) AS BIGINT)
                    ELSE raw END AS est_milli FROM ml)
"""
