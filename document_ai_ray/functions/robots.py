"""robots.txt parsing + URL allow/deny — the crawl-side politeness
gate every web pipeline applies before fetching.

Semantics follow the Google/REP spec (RFC 9309): rules grouped by
User-agent, most-specific (LONGEST pattern) match wins, Allow beats
Disallow on equal length, `*` matches any char run, a trailing `$`
anchors the end, and no matching rule means allowed.  Reference
parity note: the reference repo ingests pre-fetched assets and never
filters by robots; this belongs to the crawl-ingest breadth the brief
asks for (WARC/WAT siblings live in sources/warc.py, links.py).
"""

from __future__ import annotations

import re
from functools import lru_cache

_WS = re.compile(r"[ \t]+")


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse robots.txt into [(pattern, allow)] for `agent` (falls back
    to the `*` group when no specific group matches, per the spec).
    Comments (#) and unknown directives are skipped; group collection
    follows the REP rule that consecutive User-agent lines share the
    record that follows."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current_agents: list[str] = []
    collecting_agents = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                current_agents = []
                collecting_agents = True
            current_agents.append(value.lower())
            groups.setdefault(value.lower(), [])
        elif field in ("allow", "disallow"):
            collecting_agents = False
            if not value and field == "disallow":
                continue  # "Disallow:" empty = allow everything (no rule)
            for a in current_agents:
                groups.setdefault(a, []).append((value, field == "allow"))
    key = agent.lower()
    if key in groups:
        return groups[key]
    return groups.get("*", [])


@lru_cache(maxsize=8192)
def _compiled(pattern: str) -> re.Pattern:
    """Compile a robots pattern ONCE per process (the streaming filter
    evaluates O(rules x paths) — building the regex string per call was
    the hot-path waste the r3 advice flagged)."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pat)
    return re.compile("^" + rx + ("$" if anchored else ""))


def _match_len(pattern: str, path: str) -> int:
    """Longest-match specificity: the pattern's LENGTH if it matches
    the path (REP measures specificity by pattern length), else -1.
    `*` is a wildcard, trailing `$` anchors the end."""
    return len(pattern) if _compiled(pattern).match(path) else -1


def robots_allowed(rules: list[tuple[str, bool]], path: str) -> bool:
    """True if `path` may be fetched under `rules` (longest match wins,
    Allow wins ties, default allow)."""
    best_len, best_allow = -1, True
    for pattern, allow in rules:
        ml = _match_len(pattern, path)
        if ml > best_len or (ml == best_len and allow and not best_allow):
            if ml >= 0:
                best_len, best_allow = ml, allow
    return best_allow
