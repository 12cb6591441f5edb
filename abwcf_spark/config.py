"""Crawl configuration shared by the Spark engine and the pure-Python oracle.

Defaults mirror ``/root/reference/src/main/resources/reference.conf``:
max-url-length 2048 (:90), must-match [".*"] (:96), must-not-match [] (:99),
max-crawl-depth Int.MaxValue (:19), remove userinfo/fragment but keep query
(:101-113), robots lifetimes (:224-230), crawl-delay default/clamp (:211-219).

The round protocol (the deterministic instantiation of ABWCF's semantics —
SURVEY.md §7 risk 1) is parameterized by ``round_seconds``: per-host fetch
slots inside a round follow the reference's continuous-time delay gate
(``HostQueue.scala:128-141``) discretized to as-early-as-possible fetch
times, which reproduces the gate exactly when delays share the round
duration as a common multiple (fixtures pin delay=1s, round=1s → budget 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    # UrlFilter (reference.conf:88-98)
    max_url_length: int = 2048
    must_match: tuple[str, ...] = (".*",)
    must_not_match: tuple[str, ...] = ()
    # CrawlDepthLimiter (reference.conf:16-20) — cuts link EXPANSION, not fetching
    max_crawl_depth: int = 2**31 - 1
    # UrlNormalizer (reference.conf:101-113)
    remove_userinfo: bool = True
    remove_query: bool = False
    remove_fragment: bool = True
    # Fetcher (reference.conf:132)
    max_content_length: int = 1_000_000
    # True → derive out_links by parsing the body_html bytes in-loop with
    # the HTML kernel (HtmlParser.scala:28-52: absolutize, first-occurrence
    # distinct, http*-only, meta-robots nofollow kills the whole doc);
    # False → trust the corpus's pre-extracted out_links column (fast path)
    parse_html: bool = False
    # robots (reference.conf:203-230) — user-agent product tokens
    user_agents: tuple[str, ...] = ()
    # round protocol
    round_seconds: float = 1.0
    max_rounds: int = 1000
    # politeness safety cap when crawl_delay=0 (reference allows unbounded rate)
    max_fetches_per_host_per_round: int = 1000
    # optional per-host BYTE budget per round — the round-discretized form
    # of the reference's bytes/s fetcher throttle (Fetcher.scala:144,
    # reference.conf:130-145 token bucket).  None = off.  Semantics: within
    # the row-budget rank order, a fetch proceeds while the strict prefix
    # sum of declared sizes (Content-Length analogue) is under the budget —
    # the first row always proceeds, overshoot ≤ one response (the bucket's
    # going-negative behavior).  Gated-out rows stay Discovered and retry
    # next round.
    max_bytes_per_host_per_round: int | None = None
    # priority: 'xxhash64' (seeded hash — deterministic stand-in for the
    # reference's ThreadLocalRandom default), 'breadth_first' (-depth) or
    # 'depth_first' (+depth) (PrioritizationFunctions.scala:11-24)
    prioritizer: str = "xxhash64"

    def url_allowed_by_filter(self, url: str) -> bool:
        """UrlFilter.scala:36-44 predicate (oracle-side)."""
        import re

        if len(url) > self.max_url_length:
            return False
        if not any(re.fullmatch(p, url) for p in self.must_match):
            return False
        if any(re.fullmatch(p, url) for p in self.must_not_match):
            return False
        return True


# frontier schema (FIXTURES.md §4) — single source of truth
FRONTIER_FIELDS = [
    ("url", "string"),
    ("url_hash", "long"),
    ("host", "string"),
    ("status", "string"),
    ("crawl_depth", "int"),
    ("crawl_priority", "long"),
    ("discovered_round", "int"),
    ("fetched_round", "int"),
    ("fetch_order", "long"),
    ("partition_id", "int"),
]

HOSTS_FIELDS = [
    ("scheme_and_authority", "string"),
    ("rule_mode", "string"),
    ("robot_rules", "string"),
    ("crawl_delay", "long"),        # ms, like the reference hosts table
    ("valid_until", "double"),      # virtual seconds (round-relative time)
]

STATUS_DISCOVERED = "Discovered"
STATUS_PROCESSED = "Processed"
STATUS_DISALLOWED = "Disallowed"
