"""Stable hashing primitives for dedup / fingerprinting.

Python's builtin ``hash`` is salted per process and therefore unusable
for distributed grouping; everything here is process-stable and
vectorizable.  MinHash uses the standard universal-hash family
``(a*x + b) mod p`` over 64-bit base hashes (Broder '97 resemblance
sketches); SimHash follows Charikar '02.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

_MERSENNE61 = (1 << 61) - 1


def stable64(s: str | bytes) -> int:
    """Stable 64-bit hash (blake2b-8)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return struct.unpack("<Q", hashlib.blake2b(s, digest_size=8).digest())[0]


def stable_hex(s: str | bytes, n: int = 16) -> str:
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return hashlib.blake2b(s, digest_size=n // 2).hexdigest()


def crc_bucket(s: str | bytes, n_buckets: int) -> int:
    """Cheap stable bucketing (used for hash-partitioned joins)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return zlib.crc32(s) % n_buckets


def hash_shingles(shingles: list[str]) -> np.ndarray:
    """Vector of stable 64-bit hashes for a shingle list (deduped)."""
    return np.fromiter(
        {stable64(s) for s in shingles}, dtype=np.uint64, count=-1
    )


class MinHasher:
    """k-permutation MinHash over 64-bit shingle hashes.

    Deterministic: permutation params derived from a fixed seed.  All k
    signatures for one document are computed with a single vectorized
    numpy broadcast — no Python loop over permutations.
    """

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.RandomState(seed)
        # a odd, in [1, p); b in [0, p)
        self.a = rng.randint(1, _MERSENNE61, size=num_perm).astype(np.uint64) | np.uint64(1)
        self.b = rng.randint(0, _MERSENNE61, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-ones for empty docs."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)[None, :]          # (1, n)
        # modular universal hash in python ints is slow; uint64 wraparound
        # multiply-add is a standard, deterministic substitute.
        hv = self.a[:, None] * x + self.b[:, None]             # (k, n) mod 2^64
        return hv.min(axis=1)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash (Charikar '02): weighted bit-vote over token hashes."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1)
    if weights is not None:
        votes = votes * weights[:, None].astype(np.int64)
    acc = votes.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def winnow_fingerprint(token_hashes: np.ndarray, k: int = 4, window: int = 5) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD '03):
    k-gram rolling hashes -> per-window minimum selection.  Returns the
    selected fingerprint hashes in positional order (deduped, stable)."""
    n = token_hashes.size
    if n < k:
        return [int(h) for h in np.unique(token_hashes)] if n else []
    # rolling k-gram hash: combine k consecutive token hashes
    grams = np.zeros(n - k + 1, dtype=np.uint64)
    for i in range(k):
        grams = grams * np.uint64(1000003) + token_hashes[i : n - k + 1 + i]
    if grams.size <= window:
        return [int(grams.min())]
    sel: list[int] = []
    last = -1
    for s in range(grams.size - window + 1):
        w = grams[s : s + window]
        j = s + int(np.argmin(w))
        if j != last:
            sel.append(int(grams[j]))
            last = j
    return sel
