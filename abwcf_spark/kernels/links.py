"""HTML link-extraction kernel (pure pandas/regex — no Spark imports).

Re-expresses ``/root/reference/src/main/scala/abwcf/actors/HtmlParser.scala:28-72``:

- skip the whole document if any ``<meta name=robots content=...>`` token
  equals ``nofollow`` (case-insensitive, comma-split, trimmed — :65-72);
- select ``a[href]``, absolutize against the page URL, first-occurrence
  distinct per document (:36-44 — jsoup stream ``.distinct()`` keeps first),
- keep only URLs whose first four chars equal ``http`` case-insensitively
  (:41), emit at ``depth + 1`` (:45 — the depth increase happens HERE).

Also the redirect-URL resolution of
``/root/reference/src/main/scala/abwcf/util/HttpUtils.scala:16-27``:
relative ``Location`` resolved against the original URL, with the redirect's
fragment replaced by the ORIGINAL url's fragment (quirk preserved).

The X-Robots-Tag header gate (``RobotsHeaderFilter.scala:24-38``) is not
here — it is a pure Catalyst predicate (see operators/parse.py).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd

_HREF_RE = re.compile(
    rb"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.I | re.S,
)
_META_ROBOTS_RE = re.compile(
    rb"""<meta\b(?=[^>]*\bname\s*=\s*['"]?robots['"]?)[^>]*\bcontent\s*=\s*(?:"([^"]*)"|'([^']*)')""",
    re.I | re.S,
)


def meta_robots_nofollow(html: bytes) -> bool:
    """True if any robots meta content token is 'nofollow' (HtmlParser.scala:65-72)."""
    for m in _META_ROBOTS_RE.finditer(html):
        content = (m.group(1) or m.group(2) or b"").decode("utf-8", "replace")
        if any(t.strip().lower() == "nofollow" for t in content.split(",")):
            return True
    return False


def extract_links(html: bytes | None, base_url: str) -> list[str]:
    """Ordered, first-occurrence-distinct absolutized http* links of one doc."""
    if not html:
        return []
    if meta_robots_nofollow(html):
        return []
    seen: set[str] = set()
    out: list[str] = []
    for m in _HREF_RE.finditer(html):
        raw = (m.group(1) or m.group(2) or m.group(3) or b"").decode(
            "utf-8", "replace"
        ).strip()
        if not raw:
            continue
        try:
            absu = urljoin(base_url, raw)
        except ValueError:
            continue
        if absu in seen:
            continue
        seen.add(absu)
        if absu[:4].lower() == "http":
            out.append(absu)
    return out


def extract_links_series(bodies: pd.Series, base_urls: pd.Series) -> pd.Series:
    """Batch form for mapInPandas: Series[bytes] × Series[str] → Series[list[str]]."""
    return pd.Series(
        [extract_links(b, u) for b, u in zip(bodies, base_urls)],
        index=bodies.index,
        dtype=object,
    )


def resolve_redirect(location: str | None, original_url: str) -> str | None:
    """HttpUtils.getRedirectUrl: relative Location resolved against the
    original URL; when relative, the fragment is forced to the ORIGINAL
    URL's fragment (HttpUtils.scala:21-24)."""
    if location is None or location == "":
        return None
    parts = urlsplit(location)
    if parts.scheme:  # absolute → used verbatim
        return location
    orig = urlsplit(original_url)
    resolved = urlsplit(urljoin(original_url, location))
    return urlunsplit(
        (resolved.scheme, resolved.netloc, resolved.path, resolved.query, orig.fragment)
    )
