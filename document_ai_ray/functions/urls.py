"""URL canonicalization for web-corpus deduplication.

A Common-Crawl-scale pipeline sees the same page under many spellings
(case-shifted scheme/host, default ports, fragment anchors, tracking
parameters, trailing slashes).  `canonicalize_url` maps every spelling
of a page to one canonical form so exact URL dedup collapses them.

Rules (applied in order, each is a widely-used crawler convention):

1. scheme and host lowercased
2. a leading ``www.`` host label is dropped
3. the scheme's default port is dropped (``:80`` http, ``:443`` https)
4. the fragment is dropped (never sent to the server)
5. tracking query parameters are dropped (``utm_*``, ``fbclid``,
   ``gclid``, ``msclkid``, ``ref``); the survivors are sorted by key
   (stable, so repeated keys keep their relative order)
6. a trailing slash is stripped from a non-root path

The function is pure and total: any string that `urlsplit` accepts
canonicalizes deterministically, so it is safe inside `map_batches`.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_EXACT = {"fbclid", "gclid", "msclkid", "ref"}


def _is_tracking(key: str) -> bool:
    return key in _TRACKING_EXACT or key.startswith("utm_")


def canonicalize_url(url: str) -> str:
    sp = urlsplit(url)
    scheme = sp.scheme.lower()

    host = sp.hostname.lower() if sp.hostname else ""
    if host.startswith("www."):
        host = host[4:]
    netloc = host
    if sp.port is not None and str(sp.port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{sp.port}"
    if sp.username:
        cred = sp.username + (f":{sp.password}" if sp.password else "")
        netloc = f"{cred}@{netloc}"

    path = sp.path
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"

    params = [
        (k, v)
        for k, v in parse_qsl(sp.query, keep_blank_values=True)
        if not _is_tracking(k)
    ]
    params.sort(key=lambda kv: kv[0])  # stable: repeated keys keep order
    query = urlencode(params)

    return urlunsplit((scheme, netloc, path, query, ""))
