"""RFC-3986 URL normalization kernel (pure pandas/numpy — no Spark imports).

Reimplements, from public API semantics only, the behavior of the reference
normalizer (``/root/reference/src/main/scala/abwcf/services/UrlNormalizationService.scala:21-79``):

1. ``java.net.URI(url).normalize()`` path normalization (dot-segment removal
   with Java's exact empty-segment collapsing / trailing-slash rules — see
   ``_java_normalize_path``; behavior pinned by golden probes against a real
   JVM in ``tests/test_urlnorm.py``).
2. scheme + host lowercased; IDN hosts → punycode (IDNA2003-style:
   NFKC+casefold nameprep, then RFC 3492 punycode), matching
   ``IDN.toASCII(host, IDN.ALLOW_UNASSIGNED)``.
3. default ports stripped (80/http, 443/443), empty port dropped.
4. empty path → ``/``.
5. userinfo / query / fragment removed per flags (reference defaults:
   remove_userinfo=True, remove_query=False, remove_fragment=True —
   ``reference.conf:101-113``).
6. Unparseable / non-hierarchical / invalid-authority URLs → ``None``
   (the reference swallows the exception and drops the URL,
   ``actors/UrlNormalizer.scala:30-43``).

Percent-encoded octets are preserved verbatim (never decoded/re-encoded).

The batch entrypoint ``normalize_series`` is pandas-vectorized on the hot
path (C-regex extract + str ops); only rows that actually need dot-segment
removal or IDN conversion fall back to per-element Python (rare in real
crawl traffic).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

# RFC 3986 appendix-B style split, anchored; components stay raw (no decode).
_URI_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*$")

# ASCII chars java.net.URI accepts somewhere in a URI (reserved + unreserved
# + '%'); anything ASCII outside this set makes URI() throw.
_BAD_ASCII_RE = re.compile(r"[\x00-\x20\x7f<>\"{}|\\^`]")
_BAD_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")

_DOT_SEG_RE = re.compile(r"(?:^|/)\.{1,2}(?:/|$)")

# Java parseServerAuthority hostname: alphanum labels with inner hyphens.
_HOSTNAME_RE = re.compile(
    r"^[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?)*\.?$"
)
_IPV6_RE = re.compile(r"^\[[0-9A-Fa-f:.]+\]$")

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _java_normalize_path(p: str) -> str:
    """Dot-segment removal exactly as ``java.net.URI.normalize()``.

    Java collapses runs of '/' into single separators, removes '.' segments,
    pops a preceding non-'..' segment for each '..', keeps unpoppable '..'
    segments, and emits a trailing '/' after the last kept segment iff that
    segment did not extend to the end of the original string.
    """
    if not p or ("//" not in p and not _DOT_SEG_RE.search(p)):
        return p
    n = len(p)
    segs: list[tuple[int, int]] = []
    i = 0
    while i < n:
        if p[i] == "/":
            i += 1
            continue
        j = i
        while j < n and p[j] != "/":
            j += 1
        segs.append((i, j))
        i = j
    removed = [False] * len(segs)
    for idx, (a, b) in enumerate(segs):
        seg = p[a:b]
        if seg == ".":
            removed[idx] = True
        elif seg == "..":
            j = idx - 1
            while j >= 0 and removed[j]:
                j -= 1
            if j >= 0:
                pa, pb = segs[j]
                if p[pa:pb] != "..":
                    removed[idx] = True
                    removed[j] = True
    out: list[str] = []
    if p.startswith("/"):
        out.append("/")
    for k, (a, b) in enumerate(segs):
        if removed[k]:
            continue
        out.append(p[a:b])
        if b < n:
            out.append("/")
    # collapse the separator runs the append logic may create between kept
    # segments: each kept segment appends at most one '/', so runs cannot
    # occur — but two consecutive appended '/' would mean an empty segment,
    # which we never keep.  Join directly.
    s = "".join(out)
    # Java join never yields '//' because separators come only after kept
    # segments; defensive assert-free cleanup is unnecessary.
    return s


def _idn_label_to_ascii(label: str) -> str:
    """IDNA2003-flavored label conversion (nameprep ≈ NFKC + casefold),
    mirroring ``IDN.toASCII(..., ALLOW_UNASSIGNED)`` closely enough for the
    reference's golden cases (incl. emoji hosts)."""
    if not label:
        return label
    if label.isascii():
        return label.lower()
    prepped = unicodedata.normalize("NFKC", label.casefold())
    if prepped.isascii():
        return prepped.lower()
    if any(unicodedata.category(c).startswith("Z") or unicodedata.category(c) == "Cc" for c in prepped):
        raise ValueError("prohibited char in IDN label")
    enc = prepped.encode("punycode").decode("ascii")
    out = "xn--" + enc
    if len(out) > 63:
        raise ValueError("IDN label too long")
    return out


def _host_to_ascii(host: str) -> str:
    if host.isascii():
        return host.lower()
    return ".".join(_idn_label_to_ascii(lbl) for lbl in host.split(".")).lower()


def normalize_url(
    url: str | None,
    remove_userinfo: bool = True,
    remove_query: bool = False,
    remove_fragment: bool = True,
) -> str | None:
    """Normalize one URL; ``None`` if the URL is invalid / non-hierarchical."""
    if url is None:
        return None
    url = str(url)
    if _BAD_ASCII_RE.search(url) or _BAD_PCT_RE.search(url):
        return None
    m = _URI_RE.match(url)
    if m is None:
        return None
    scheme, authority, path, query, fragment = m.groups()
    if scheme is None or authority is None or not _SCHEME_RE.match(scheme):
        return None
    scheme = scheme.lower()

    # --- authority → userinfo / host / port (server-based, like
    # URI.parseServerAuthority; reference drops on URISyntaxException) ---
    userinfo = None
    rest = authority
    if "@" in authority:
        if authority.isascii():
            userinfo, rest = authority.split("@", 1)
        else:
            # reference fallback for non-ASCII hosts uses rawAuthority
            # split on '@' keeping the LAST part (UrlNormalizationService.scala:46-53)
            userinfo, _, rest = authority.rpartition("@")
    port = ""
    have_port = False
    if rest.startswith("["):
        close = rest.find("]")
        if close < 0:
            return None
        host = rest[: close + 1]
        tail = rest[close + 1 :]
        if tail.startswith(":"):
            have_port = True
            port = tail[1:]
        elif tail:
            return None
        if not _IPV6_RE.match(host):
            return None
    else:
        head, sep, tail = rest.rpartition(":")
        if sep:
            if ":" in head:
                return None  # unbracketed IPv6 → Java URISyntaxException
            host, have_port, port = head, True, tail
        else:
            host = rest
    if not host:
        return None
    if have_port:
        if port == "":
            port_num = -1
        elif port.isdigit() and port.isascii():
            port_num = int(port)
        else:
            return None
    else:
        port_num = -1
    try:
        host = _host_to_ascii(host)
    except (ValueError, UnicodeError):
        return None
    if not (_HOSTNAME_RE.match(host) or _IPV6_RE.match(host)):
        return None
    if port_num >= 0 and _DEFAULT_PORTS.get(scheme) == str(port_num):
        port_num = -1

    # --- path (Java normalize happens on the original URI first) ---
    path = _java_normalize_path(path)
    if path == "":
        path = "/"

    out = [scheme, "://"]
    if userinfo is not None and not remove_userinfo:
        out += [userinfo, "@"]
    out.append(host)
    if port_num >= 0:
        out += [":", str(port_num)]
    out.append(path)
    if query is not None and not remove_query:
        out += ["?", query]
    if fragment is not None and not remove_fragment:
        out += ["#", fragment]
    return "".join(out)


# --------------------------------------------------------------------------
# Vectorized batch API (used from pandas UDFs)
# --------------------------------------------------------------------------

_FAST_OK_RE = re.compile(  # URLs needing no per-row work at all
    r"^[a-z][a-z0-9+.\-]*://"  # lowercase scheme
    r"[a-z0-9](?:[a-z0-9\-]*[a-z0-9])?(?:\.[a-z0-9](?:[a-z0-9\-]*[a-z0-9])?)*"  # lowercase ascii host
    r"(?::[0-9]+)?"  # explicit non-empty port (checked vs defaults below)
    r"/(?:[^?#@]*)$"  # absolute path, no query/frag/userinfo markers
)


def normalize_series(
    urls: pd.Series,
    remove_userinfo: bool = True,
    remove_query: bool = False,
    remove_fragment: bool = True,
) -> pd.Series:
    """Vectorized normalize: fast path keeps already-normal URLs untouched
    (C-regex screen), slow path handles the rest element-wise."""
    s = urls.astype("string")
    # fast screen: already-normal URLs (the common case in steady-state
    # crawls where links repeat canonical forms) pass through unchanged.
    fast = s.str.match(_FAST_OK_RE, na=False) & ~s.str.contains(
        r"(?:^|/)\.{1,2}(?:/|$)|//.*//|%(?![0-9A-Fa-f]{2})|:(?:80|443)/",
        regex=True,
        na=True,
    )
    out = pd.Series(np.empty(len(s), dtype=object), index=s.index, dtype=object)
    out[fast] = s[fast]
    slow_idx = ~fast
    if slow_idx.any():
        out[slow_idx] = [
            normalize_url(
                u if isinstance(u, str) else None,
                remove_userinfo,
                remove_query,
                remove_fragment,
            )
            for u in s[slow_idx]
        ]
    return out


_SCHEME_AUTH_RE = re.compile(r"^([^:/?#]+://[^/?#]*)")


def scheme_and_authority_series(urls: pd.Series) -> pd.Series:
    """``UrlUtils.getSchemeAndAuthority`` equivalent
    (``/root/reference/src/main/scala/abwcf/util/UrlUtils.scala:12-15``):
    scheme + raw authority of an (already normalized) URL."""
    return urls.astype("string").str.extract(_SCHEME_AUTH_RE, expand=False)
