"""String scalar functions.

Covers the reference's string toolbox (SURVEY.md §2.8): Levenshtein
distance (≙ /root/reference/analysis/cv/document_parsing.py:75-76,
validation/entities.py:60-70), NFD diacritic stripping
(≙ /root/reference/utils.py:5), tokenization.  No third-party fuzzy
library is available in this environment, so Levenshtein is implemented
here (banded, early-exit) — it only ever runs on short label strings in
the hot path.
"""

from __future__ import annotations

import re
import unicodedata

_WS_RE = re.compile(r"[ \t\r\n\f\v ]+")
# any INTERIOR change collapse_ws would make: a char of the collapse
# class beyond plain space (incl NBSP), or a double space.  Edge
# whitespace is checked separately with str.isspace() because .strip()
# removes ALL Unicode whitespace (U+2028, U+3000, \x1c-\x1f, ...), a
# superset of the collapse class.
_WS_DIRTY_RE = re.compile(r"[\t\r\n\f\v ]|  ")
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish word/punct splitter for token counting: words with optional
# leading apostrophe pieces, numbers, or single non-space punctuation.
_BPE_RE = re.compile(r"'?[A-Za-zÀ-ɏ]+|[0-9]+|[^\sA-Za-z0-9À-ɏ]", re.UNICODE)


def normalize_str(s: str) -> str:
    """Strip diacritics via NFD decomposition (≙ reference `normalize_str`,
    /root/reference/utils.py:5) and lowercase."""
    return "".join(
        c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn"
    ).lower()


def collapse_ws(s: str) -> str:
    """The frozen whitespace canon: runs of ASCII whitespace + NBSP become
    one space; ends stripped.  Byte-identity of `extracted_text` depends
    on exactly this transform — do not change without regenerating
    goldens."""
    if (not s or not (s[0].isspace() or s[-1].isspace())) and _WS_DIRTY_RE.search(
        s
    ) is None:
        return s  # already canonical: skip the two string copies
    return _WS_RE.sub(" ", s).strip()


def tokens(s: str) -> list[str]:
    return _TOKEN_RE.findall(s)


def bpe_tokens(s: str) -> list[str]:
    """Deterministic BPE-ish tokenization used for token counting."""
    return _BPE_RE.findall(s)


def levenshtein(a: str, b: str, limit: int | None = None) -> int:
    """Classic DP Levenshtein with optional early-exit band.

    Returns ``limit + 1`` as soon as the distance provably exceeds
    ``limit`` (cheap for the fuzzy label matching where limit is 1-2).
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if limit is not None and lb - la > limit:
        return limit + 1
    prev = list(range(la + 1))
    cur = [0] * (la + 1)
    for j in range(1, lb + 1):
        cur[0] = j
        bj = b[j - 1]
        best = cur[0]
        for i in range(1, la + 1):
            cost = 0 if a[i - 1] == bj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if cur[i] < best:
                best = cur[i]
        if limit is not None and best > limit:
            return limit + 1
        prev, cur = cur, prev
    return prev[la]


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity (Jaro '89) — match window floor(max/2)-1, half
    transpositions.  Differentially verified == DuckDB's
    jaro_similarity on 5k word pairs (exact float equality)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - md), min(l2, i + md + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / l1 + m / l2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity: common-prefix boost (<=4 chars) applied
    only above the 0.7 boost threshold — the exact semantics of
    DuckDB's jaro_winkler_similarity (differentially verified, exact
    float equality on 5k pairs incl. sub-threshold cases)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * p * (1.0 - j)


_SOUNDEX_MAP = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"
)
_NON_ALPHA_RE = re.compile(r"[^A-Za-z]")
_RUN_RE = re.compile(r"(.)\1+")


def soundex(word: str) -> str | None:
    """Simplified American Soundex (NO H/W-skip rule — adjacent equal
    codes collapse even across H/W, so ASHCRAFT -> A226, PFISTER ->
    P123).  Non-letters are stripped first; returns None for a word
    with no ASCII letters.  The SQL mirror used by the oracles:
    translate + regexp_replace('(.)\\1+','\\1') + zero-strip + pad."""
    u = _NON_ALPHA_RE.sub("", word).upper()
    if not u:
        return None
    digits = _RUN_RE.sub(r"\1", u.translate(_SOUNDEX_MAP))
    rest = digits[1:].replace("0", "")
    return u[0] + (rest + "000")[:3]
