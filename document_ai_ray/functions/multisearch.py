"""Aho-Corasick multi-pattern search — the scale path for phrase
blocklists (10^4+ patterns scan each document in one pass instead of
one `str.count` pass per pattern).

The automaton is built once (per worker, via the broadcast cache) and
`count_nonoverlapping` reproduces the EXACT semantics of Python's
`str.count` per pattern — non-overlapping, leftmost-greedy within each
pattern independently — so swapping it under `phrase_blocklist_docs`
changes complexity, never results (enforced by the differential test
in tests/test_multisearch.py).
"""

from __future__ import annotations

from collections import deque


class AhoCorasick:
    """Classic trie + failure-link automaton over unicode codepoints.

    States are dense ints; goto is a list of dicts (vocabularies of
    real blocklists are small per node, so dicts beat a dense table).
    `out` carries (pattern_index, pattern_length) for every pattern
    ending at the state (via failure closure).
    """

    __slots__ = ("goto", "fail", "out", "n_patterns")

    def __init__(self, patterns: list[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[tuple[int, int]] = [()]  # type: ignore[list-item]
        self.out = [[]]
        self.n_patterns = len(patterns)
        for idx, p in enumerate(patterns):
            if not p:
                raise ValueError("empty pattern")
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[s][ch] = nxt
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                s = nxt
            self.out[s].append((idx, len(p)))
        # BFS failure links + output closure
        q = deque()
        for s in self.goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in self.goto[s].items():
                q.append(t)
                f = self.fail[s]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[t] = self.goto[f][ch] if ch in self.goto[f] and self.goto[f][ch] != t else 0
                self.out[t] = self.out[t] + self.out[self.fail[t]]

    def iter_matches(self, text: str):
        """Yield (end_index_exclusive, pattern_index, pattern_len) for
        EVERY occurrence of every pattern (overlaps included)."""
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for idx, plen in out[s]:
                    yield i + 1, idx, plen

    def count_nonoverlapping(self, text: str) -> list[int]:
        """Per-pattern counts with `str.count` semantics: within each
        pattern, matches are taken left-to-right and a match starting
        before the previous accepted match's end is skipped.  Patterns
        do not interact (exactly like one str.count call each)."""
        counts = [0] * self.n_patterns
        next_ok = [0] * self.n_patterns  # per-pattern min start index
        for end, idx, plen in self.iter_matches(text):
            start = end - plen
            if start >= next_ok[idx]:
                counts[idx] += 1
                next_ok[idx] = end
        return counts
