"""robots.txt parsing + matching kernel (RFC 9309), pure pandas/numpy.

Re-expresses the reference's robots handling from public semantics:

- parse + crawl-delay clamping as in
  ``/root/reference/src/main/scala/abwcf/actors/HostManager.scala:110-167``
  (default delay if unset/negative, then clamp to [min, max]; unavailable →
  ALLOW_ALL, unreachable → ALLOW_NONE, each with its own rules lifetime);
- serialized rule format exactly as the reference's hosts table
  (``SlickHostRepository.scala:43-57``): ``rule_mode`` ∈
  ``ALLOW_ALL | ALLOW_NONE | ALLOW_SOME`` and ``robot_rules`` =
  newline-joined ``allow: <prefix>`` / ``disallow: <prefix>`` lines, kept in
  specificity order (longest prefix first, allow before disallow on ties —
  RFC 9309 §2.2.2 "most octets" rule);
- matching: longest-match-wins with ``*`` wildcards and ``$`` end anchor
  (RFC 9309 §2.2.3), no-match → allowed.

``robots_allowed_series`` is the batch matcher used inside the strict/lenient
filter pandas UDFs: it compiles one matcher per *unique* rules string in the
batch (rows arrive host-joined, so unique hosts ≪ rows) and applies it to
each host's URL subset — per-unique-host compile, per-row C-regex match.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd

MODE_ALLOW_ALL = "ALLOW_ALL"
MODE_ALLOW_NONE = "ALLOW_NONE"
MODE_ALLOW_SOME = "ALLOW_SOME"

# reference.conf:210-219 (ms)
DEFAULT_CRAWL_DELAY_MS = 1000
MIN_CRAWL_DELAY_MS = 0
MAX_CRAWL_DELAY_MS = 20_000

# reference.conf:224-230 (seconds)
VALID_RULES_LIFETIME_S = 24 * 3600
UNAVAILABLE_RULES_LIFETIME_S = 24 * 3600
UNREACHABLE_RULES_LIFETIME_S = 3600

# reference.conf:237-242 (robots.txt fetching)
ROBOTS_MAX_CONTENT_LENGTH = 500 * 1024   # bytes consumed before parsing
ROBOTS_MAX_REDIRECTS = 5                 # follow hops; more → unavailable


def truncate_robots_body(body: str | None) -> str | None:
    """RobotsFetcher.scala:85-90: at most ``max-content-length`` BYTES of
    the robots.txt stream are consumed before parsing — a rule line crossing
    the cut is seen truncated, which can change the compiled rules (the
    truncated prefix is authoritative, exactly like the reference's
    ``.take(maxContentLength)`` on the byte stream)."""
    if body is None:
        return None
    b = body.encode("utf-8")
    if len(b) <= ROBOTS_MAX_CONTENT_LENGTH:
        return body
    return b[:ROBOTS_MAX_CONTENT_LENGTH].decode("utf-8", errors="ignore")


def resolve_robots_redirect(sa: str, robots_by_sa: dict,
                            max_redirects: int = ROBOTS_MAX_REDIRECTS):
    """Effective robots record for host ``sa`` after following robots.txt
    redirects (RobotsFetcher.scala:99-110): up to ``max_redirects`` hops are
    followed; a longer chain (or a loop) is Unavailable (:106-108), and a
    redirect to a host with no robots record is the caller's missing-host
    convention (Unavailable).  The final target's record — including any
    time-varying body columns — becomes the origin host's effective record.
    Returns None when ``sa`` itself has no record."""
    row = robots_by_sa.get(sa)
    hops = 0
    while row is not None and row.get("fetch_outcome") == "redirect":
        if hops >= max_redirects:
            return dict(scheme_and_authority=sa, fetch_outcome="unavailable",
                        robots_body=None)
        tgt = row.get("robots_redirect_to")
        row = robots_by_sa.get(tgt) if isinstance(tgt, str) else None
        hops += 1
    if row is None and hops > 0:
        return dict(scheme_and_authority=sa, fetch_outcome="unavailable",
                    robots_body=None)
    return row


def clamp_crawl_delay(delay_ms: int | None) -> int:
    """HostManager.scala:126-136: default if unset/negative, then clamp."""
    if delay_ms is None or delay_ms < 0:
        delay_ms = DEFAULT_CRAWL_DELAY_MS
    return max(MIN_CRAWL_DELAY_MS, min(MAX_CRAWL_DELAY_MS, delay_ms))


_LINE_RE = re.compile(r"^\s*([A-Za-z\-]+)\s*:\s*(.*?)\s*$")


def parse_robots_txt(
    body: str | None, user_agents: tuple[str, ...] = ()
) -> tuple[str, str, int]:
    """Parse robots.txt text → (rule_mode, serialized_rules, crawl_delay_ms).

    Group semantics per RFC 9309 §2.2.1: consecutive ``user-agent`` lines
    open a group; rules apply to all named agents.  All groups matching any
    of ``user_agents`` (case-insensitive product-token equality) are merged;
    if none match, the ``*`` groups are used (reference.conf:203-207 — the
    wildcard token must not be listed explicitly).
    """
    if body is None:
        return MODE_ALLOW_ALL, "", DEFAULT_CRAWL_DELAY_MS
    agents_lc = {a.lower() for a in user_agents}
    specific: list[tuple[str, bool]] = []
    wildcard: list[tuple[str, bool]] = []
    specific_delay: int | None = None
    wildcard_delay: int | None = None

    cur_agents: set[str] = set()
    in_group_header = True  # collecting consecutive user-agent lines
    for raw in body.splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE_RE.match(line)
        if not m:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == "user-agent":
            if not in_group_header:
                cur_agents = set()
                in_group_header = True
            cur_agents.add(val.lower())
            continue
        in_group_header = False
        is_specific = bool(cur_agents & agents_lc)
        is_wild = "*" in cur_agents
        if key in ("allow", "disallow"):
            if val == "" and key == "disallow":
                continue  # empty disallow = no rule (allow everything)
            if val == "" and key == "allow":
                continue
            rule = (val, key == "allow")
            if is_specific:
                specific.append(rule)
            if is_wild:
                wildcard.append(rule)
        elif key == "crawl-delay":
            try:
                d = int(float(val) * 1000)
            except ValueError:
                continue
            if is_specific and specific_delay is None:
                specific_delay = d
            if is_wild and wildcard_delay is None:
                wildcard_delay = d

    rules = specific if (specific or specific_delay is not None) else wildcard
    delay = specific_delay if (specific or specific_delay is not None) else wildcard_delay
    # specificity order: longest prefix first, allow before disallow on tie
    rules_sorted = sorted(rules, key=lambda r: (-len(r[0]), not r[1]))
    serialized = serialize_rules(rules_sorted)
    return MODE_ALLOW_SOME, serialized, clamp_crawl_delay(delay)


def serialize_rules(rules: list[tuple[str, bool]]) -> str:
    """SlickHostRepository.scala:43-50 line format."""
    return "\n".join(
        f"allow: {p}" if a else f"disallow: {p}" for p, a in rules
    )


def deserialize_rules(s: str | None) -> list[tuple[str, bool]]:
    if not s:
        return []
    out = []
    for line in s.split("\n"):
        if line.startswith("allow: "):
            out.append((line[7:], True))
        elif line.startswith("disallow: "):
            out.append((line[10:], False))
    return out


def host_outcome(
    fetch_outcome: str, body: str | None, user_agents: tuple[str, ...] = ()
) -> tuple[str, str, int, int]:
    """Full HostManager decision → (rule_mode, rules, crawl_delay_ms, lifetime_s).

    ``ok`` → parse (HostManager.scala:119-140); ``unavailable`` → ALLOW_ALL
    24 h (:142-147); ``unreachable`` → ALLOW_NONE 1 h (:155-161; the
    reuse-expired-rules branch :149-154 is handled by the hosts-table engine,
    which keeps the old row and only bumps valid_until).
    """
    if fetch_outcome == "ok":
        # 500 KiB byte truncation BEFORE parsing (RobotsFetcher.scala:85-90)
        mode, rules, delay = parse_robots_txt(
            truncate_robots_body(body), user_agents
        )
        return mode, rules, delay, VALID_RULES_LIFETIME_S
    if fetch_outcome == "unavailable":
        return MODE_ALLOW_ALL, "", DEFAULT_CRAWL_DELAY_MS, UNAVAILABLE_RULES_LIFETIME_S
    return MODE_ALLOW_NONE, "", DEFAULT_CRAWL_DELAY_MS, UNREACHABLE_RULES_LIFETIME_S


# --------------------------------------------------------------------------
# Matching
# --------------------------------------------------------------------------

_PATH_RE = re.compile(r"^[^:/?#]+://[^/?#]*(/[^#]*)?")


def url_path_query(url: str) -> str:
    m = _PATH_RE.match(url)
    p = m.group(1) if m and m.group(1) else "/"
    return p


def _prefix_to_regex(prefix: str) -> str:
    anchored = prefix.endswith("$")
    if anchored:
        prefix = prefix[:-1]
    parts = [re.escape(seg) for seg in prefix.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


@lru_cache(maxsize=4096)
def _compile_matcher(serialized: str):
    """rules string → list[(compiled_regex, allow)] in specificity order."""
    return [
        (re.compile(_prefix_to_regex(p)), a)
        for p, a in deserialize_rules(serialized)
    ]


def robots_allowed(url: str, rule_mode: str | None, rules: str | None) -> bool:
    """RFC 9309 longest-match decision for one URL."""
    if rule_mode is None:
        return True  # caller decides fail-open/fail-close via coalesce
    if rule_mode == MODE_ALLOW_ALL:
        return True
    if rule_mode == MODE_ALLOW_NONE:
        return False
    path = url_path_query(url)
    for rx, allow in _compile_matcher(rules or ""):
        if rx.match(path):
            return allow
    return True


def robots_allowed_series(
    urls: pd.Series, rule_modes: pd.Series, rules: pd.Series
) -> pd.Series:
    """Batch matcher: vectorized per unique (rule_mode, rules) pair.

    Returns a nullable boolean Series: pd.NA where rule_mode is null (host
    unknown — lenient/strict filters apply their fail-open/fail-close
    default via coalesce on the Spark side).
    """
    out = pd.Series(pd.NA, index=urls.index, dtype="boolean")
    modes = rule_modes.astype(object)
    known = modes.notna()
    out[known & (modes == MODE_ALLOW_ALL)] = True
    out[known & (modes == MODE_ALLOW_NONE)] = False
    some = known & (modes == MODE_ALLOW_SOME)
    if some.any():
        paths = urls[some].map(url_path_query)
        for rstr, idx in rules[some].fillna("").groupby(rules[some].fillna("")).groups.items():
            matcher = _compile_matcher(rstr)
            if not matcher:
                out[idx] = True
                continue
            sub = paths.loc[idx]
            res = np.ones(len(sub), dtype=bool)
            undecided = np.ones(len(sub), dtype=bool)
            vals = sub.to_numpy(dtype=object)
            for rx, allow in matcher:
                if not undecided.any():
                    break
                hit = np.fromiter(
                    (rx.match(v) is not None for v in vals), dtype=bool, count=len(vals)
                ) & undecided
                res[hit] = allow
                undecided &= ~hit
            out[idx] = pd.array(res, dtype="boolean")
    return out
