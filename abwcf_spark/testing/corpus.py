"""Deterministic synthetic crawl corpus generator (FIXTURES.md schemas).

Generates, with a fixed seed, the three input tables the engine and the
pure-Python oracle both consume:

- ``corpus``  — one row per fetchable URL: image payload columns per
  ``BASELINE.json.input_hint`` (image_id, bytes, w, h, fmt, caption, phash)
  plus crawl-graph columns (status_code, content_type, redirect_to,
  x_robots_tag, meta_robots, out_links).
- ``robots``  — per-host robots.txt corpus (fetch_outcome + body).
- ``seeds``   — seed URLs with a deterministic sequence number.

Link graphs are binary-tree-ish per host (url j links to 2j+1, 2j+2) with
deterministic cross-host edges and a sprinkling of dirty URLs that exercise
the normalizer (uppercase, default ports, dot segments, userinfo, fragments,
IDN, mailto, oversized), robots-disallowed paths, redirects, error statuses,
nofollow headers/metas — every semantic in SURVEY.md §2.

All randomness comes from xxhash64 of stable strings — no RNG state, so any
row can be regenerated independently (this is also how the validator
recomputes reference pixels at scale without a second copy of the data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..kernels.hashing import xxhash64_str
from ..kernels.imagecodec import encode_image, gen_pixels, phash64

FMTS = ("png", "jpeg", "webp")


def _h(s: str) -> int:
    """Stable non-negative hash for decision-making."""
    return xxhash64_str(s) & 0x7FFFFFFFFFFFFFFF


@dataclass
class CorpusSpec:
    n_hosts: int = 4
    urls_per_host: int = 32
    seed_hosts: int = 2
    skew_host_frac: float = 0.0     # >0 → host 0 gets this fraction of all URLs
    image_size: tuple[int, int] = (24, 16)
    dirty_link_rate: int = 5        # every Nth page emits a dirty link
    redirect_rate: int = 11         # every Nth page is a 3xx
    error_rate: int = 13            # every Nth page is 4xx/5xx
    nofollow_rate: int = 17         # every Nth page carries nofollow
    cross_host_rate: int = 3        # every Nth page links cross-host
    unavailable_hosts: tuple[int, ...] = ()   # robots 4xx → ALLOW_ALL
    unreachable_hosts: tuple[int, ...] = ()   # robots 5xx → ALLOW_NONE
    crawl_delays: dict[int, float] = field(default_factory=dict)  # host idx → seconds
    # host idx → (switch_at_seconds, new robots body): the robots "server"
    # starts returning the new body at that virtual time — exercises the
    # fetch-time strict re-evaluation after TTL expiry
    # (StrictRobotsFilter.scala:72-133 + HostManager.scala:187-189)
    robots_changes: dict[int, tuple[float, str]] = field(default_factory=dict)
    # host idx → target host idx: robots.txt answers with a redirect to the
    # target host's robots.txt (RobotsFetcher.scala:99-110; ≤5 hops
    # followed, longer/looping/dangling → unavailable).  Chains are built by
    # chaining entries (a→b, b→c, ...); a target of -1 is a dangling host.
    robots_redirects: dict[int, int] = field(default_factory=dict)
    # hosts whose robots body exceeds the 500 KiB fetch cap: a straddling
    # rule is bisected by the cut and a final "Disallow: /private/" lies
    # entirely beyond it — truncation CHANGES the compiled rules
    # (RobotsFetcher.scala:85-90 truncate-then-parse)
    robots_huge_hosts: tuple[int, ...] = ()
    with_images: bool = True        # False skips byte payloads (fast graph-only tests)
    fanout: int = 2                 # link-tree fanout (children of j: fanout*j+1..+fanout)
    # False → pages with no tree children emit NO links at all (real sites
    # have terminal leaf pages); the cross-host/dirty/disallowed link
    # variety then rides interior pages only, so the crawl's final fetch
    # round emits zero candidates instead of a duplicate-only tail round.
    # True (default) keeps the legacy shape: leaves re-link cross-host —
    # the duplicate-tail code path the e2e fixtures exercise.
    leaf_links: bool = True
    # True → every parseable page also carries a body_html column with REAL
    # <a href> markup (same links, some same-host ones as relative hrefs,
    # meta-robots embedded); the engine's parse_html mode extracts links
    # from these bytes in-loop (HtmlParser.scala:28-52)
    html_bodies: bool = False


def host_name(i: int) -> str:
    return f"https://h{i}.example"


def page_url(host_idx: int, j: int) -> str:
    return f"{host_name(host_idx)}/p/{j}"


def _urls_per_host(spec: CorpusSpec) -> list[int]:
    total = spec.n_hosts * spec.urls_per_host
    if spec.skew_host_frac <= 0:
        return [spec.urls_per_host] * spec.n_hosts
    big = int(total * spec.skew_host_frac)
    rest = max(1, (total - big) // max(1, spec.n_hosts - 1))
    return [big] + [rest] * (spec.n_hosts - 1)


def _dirty_link(host_idx: int, j: int) -> str:
    """Dirty-but-normalizable (or droppable) link variants."""
    variants = [
        f"HTTPS://H{host_idx}.EXAMPLE/p/{j + 1}",            # case folding
        f"https://h{host_idx}.example:443/p/{j + 1}",        # default port
        f"https://h{host_idx}.example/p/../p/{j + 1}",       # dot segments
        f"https://user:pw@h{host_idx}.example/p/{j + 1}",    # userinfo
        f"https://h{host_idx}.example/p/{j + 1}#frag",       # fragment
        "mailto:someone@example.com",                        # non-http (dropped)
        "https://😃.example/" + "x" * 3000,                  # oversize (dropped)
        f"https://h{host_idx}.example//p//{j + 1}",          # duplicate slashes
    ]
    return variants[_h(f"dirty|{host_idx}|{j}") % len(variants)]


def _huge_robots_body(delay: float) -> str:
    """A >500 KiB robots.txt whose compiled rules CHANGE under the fetch
    cap's truncate-then-parse (RobotsFetcher.scala:85-90): the byte cut
    bisects a "Disallow: /straddle-me/" line (the surviving "Disallow: /s"
    prefix is a different rule) and the final "Disallow: /private/" lies
    entirely beyond the cut — so the truncated parse ALLOWS /private/
    while a full parse would block it."""
    from ..kernels.robots import ROBOTS_MAX_CONTENT_LENGTH

    head = f"User-agent: *\nCrawl-delay: {delay}\nDisallow: /keep-blocked/\n"
    straddle = "Disallow: /straddle-me/\n"
    cut_into_straddle = len("Disallow: /s")
    pad_len = ROBOTS_MAX_CONTENT_LENGTH - len(head.encode()) - cut_into_straddle
    return (
        head
        + "#" + "x" * (pad_len - 2) + "\n"
        + straddle
        + "Disallow: /private/\n"
    )


def gen_corpus(
    spec: CorpusSpec, only_hosts: "set[int] | None" = None
) -> dict[str, pd.DataFrame]:
    """``only_hosts``: restrict CORPUS row generation to those host indices
    (robots + seeds are always generated in full — they are tiny).  Rows
    are a pure function of (spec, host index), so host-sharded generation
    is byte-identical to a full pass — bench.materialize_corpus uses this
    to fan generation out over a process pool."""
    per_host = _urls_per_host(spec)
    rows = []
    w0, h0 = spec.image_size
    host_iter = (
        range(spec.n_hosts) if only_hosts is None
        else sorted(h for h in only_hosts if h < spec.n_hosts)
    )
    for hi in host_iter:
        n = per_host[hi]
        for j in range(n):
            url = page_url(hi, j)
            image_id = f"img-{hi}-{j}"
            hv = _h(url)
            w = w0 + (hv % 9)
            h = h0 + ((hv >> 8) % 7)
            fmt = FMTS[hv % 3]
            is_redirect = spec.redirect_rate and j % spec.redirect_rate == spec.redirect_rate - 1
            if is_redirect and not spec.leaf_links and not (spec.fanout * j + 1 < n):
                # leafless corpora: the terminal tier must emit NOTHING —
                # a redirect re-emits its target as a same-depth candidate,
                # which would spawn a duplicate-only tail round of pure
                # fixed cost (the exact thing leaf_links=False exists to
                # avoid; redirect semantics stay exercised by the interior
                # tiers, which keep their 3xx pages)
                is_redirect = False
            is_error = spec.error_rate and j % spec.error_rate == spec.error_rate - 1 and not is_redirect
            status = 200
            redirect_to = None
            if is_redirect:
                status = 301 if hv % 2 == 0 else 302
                # relative redirect (exercises resolve semantics), same depth
                redirect_to = f"/p/{(j * 7 + 1) % n}"
            elif is_error:
                status = 404 if hv % 2 == 0 else 503
            # out links: binary tree + cross-host + dirty + disallowed
            links: list[str] = []
            has_children = spec.fanout * j + 1 < n
            if status == 200 and (has_children or spec.leaf_links):
                for child in range(spec.fanout * j + 1, spec.fanout * j + 1 + spec.fanout):
                    if child < n:
                        links.append(page_url(hi, child))
                if spec.cross_host_rate and j % spec.cross_host_rate == 0 and spec.n_hosts > 1:
                    links.append(page_url((hi + 1 + hv % (spec.n_hosts - 1)) % spec.n_hosts,
                                          (j * 3) % per_host[(hi + 1 + hv % (spec.n_hosts - 1)) % spec.n_hosts]))
                if spec.dirty_link_rate and j % spec.dirty_link_rate == 2:
                    links.append(_dirty_link(hi, j))
                if j % 7 == 3:
                    links.append(f"{host_name(hi)}/private/{j}")  # robots-disallowed path
            nofollow = spec.nofollow_rate and j % spec.nofollow_rate == spec.nofollow_rate - 1
            meta_robots = "nofollow" if (nofollow and hv % 2 == 1) else None
            body_html = None
            if spec.html_bodies and status == 200:
                # real anchor markup; every other same-host link rendered as
                # a RELATIVE href (exercises urljoin absolutization), meta
                # robots embedded in the head (HtmlParser.scala:65-72 path)
                anchors = []
                for li, link in enumerate(links):
                    href = link
                    prefix = host_name(hi)
                    if link.startswith(prefix + "/") and li % 2 == 0:
                        href = link[len(prefix):]
                    anchors.append(f'<a href="{href}">l{li}</a>')
                meta = (
                    f'<meta name="robots" content="{meta_robots}">'
                    if meta_robots else ""
                )
                body_html = (
                    f"<html><head><title>{url}</title>{meta}</head>"
                    f"<body>{''.join(anchors)}</body></html>"
                ).encode("utf-8")
            if spec.with_images and status == 200:
                px = gen_pixels(image_id, w, h)
                payload = encode_image(px, fmt)
                ph = phash64(px)
            else:
                payload, ph = None, 0
            rows.append(
                dict(
                    url=url,
                    image_id=image_id,
                    bytes=payload,
                    # body size as metadata: lets the fetch gate (Fetcher.
                    # scala:142 LengthLimitExceeded) run without dragging
                    # the binary column through the emit-path scan
                    content_length=len(payload) if payload is not None else None,
                    w=w,
                    h=h,
                    fmt=fmt,
                    caption=f"caption of {image_id}: deterministic text {hv % 1000}",
                    phash=ph,
                    status_code=status,
                    content_type="text/html" if (status == 200 and j % 2 == 0) or links else
                                 ("image/" + fmt if status == 200 else "text/plain"),
                    redirect_to=redirect_to,
                    x_robots_tag="noindex, nofollow" if (nofollow and hv % 2 == 0) else None,
                    meta_robots=meta_robots,
                    out_links=links,
                    body_html=body_html,
                )
            )
    corpus = pd.DataFrame(rows)
    if len(corpus):
        # keep None+int columns as true object ints (pandas would infer
        # float64, which Spark's LongType rejects at construction)
        corpus["content_length"] = pd.Series(
            [None if pd.isna(v) else int(v) for v in corpus["content_length"]],
            index=corpus.index,
            dtype="object",
        )

    robots_rows = []
    for hi in range(spec.n_hosts):
        sa = host_name(hi)
        change = spec.robots_changes.get(hi)
        body2 = change[1] if change else None
        switch_ms = int(change[0] * 1000) if change else None
        if hi in spec.robots_redirects:
            tgt = spec.robots_redirects[hi]
            robots_rows.append(dict(
                scheme_and_authority=sa, fetch_outcome="redirect",
                robots_body=None, robots_body2=None, switch_ms=None,
                robots_redirect_to=(
                    host_name(tgt) if tgt >= 0 else "https://nowhere.example"
                ),
            ))
        elif hi in spec.unavailable_hosts:
            robots_rows.append(dict(scheme_and_authority=sa, fetch_outcome="unavailable",
                                    robots_body=None, robots_body2=body2,
                                    switch_ms=switch_ms, robots_redirect_to=None))
        elif hi in spec.unreachable_hosts:
            robots_rows.append(dict(scheme_and_authority=sa, fetch_outcome="unreachable",
                                    robots_body=None, robots_body2=body2,
                                    switch_ms=switch_ms, robots_redirect_to=None))
        else:
            delay = spec.crawl_delays.get(hi, 1.0)
            if hi in spec.robots_huge_hosts:
                body = _huge_robots_body(delay)
            else:
                body = (
                    "User-agent: *\n"
                    "Disallow: /private/\n"
                    f"Crawl-delay: {delay}\n"
                )
                if hi % 3 == 1:
                    body += "Allow: /private/open/\nDisallow: /*.bin$\n"
            robots_rows.append(dict(scheme_and_authority=sa, fetch_outcome="ok",
                                    robots_body=body, robots_body2=body2,
                                    switch_ms=switch_ms, robots_redirect_to=None))
    robots = pd.DataFrame(robots_rows)
    if all(v is None for v in robots["robots_redirect_to"]):
        robots = robots.drop(columns=["robots_redirect_to"])
    # None+int mix makes pandas infer float64 for switch_ms — force a true
    # object column of ints (LongType rejects floats at Spark construction)
    robots["switch_ms"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in robots["switch_ms"]],
        index=robots.index,
        dtype="object",
    )

    seeds = pd.DataFrame(
        [
            dict(url=page_url(hi, 0), seq=hi)
            for hi in range(min(spec.seed_hosts, spec.n_hosts))
        ]
    )
    return {"corpus": corpus, "robots": robots, "seeds": seeds}


# canonical fixture specs (FIXTURES.md §Scale points).  The T2 fixtures are
# run with CrawlConfig(round_seconds=4) so per-host budgets are 2/4/8
# depending on crawl delay — more politeness math per round, fewer rounds
# (each Spark round has fixed scheduling overhead in local mode).
T1_MICRO = CorpusSpec(n_hosts=1, urls_per_host=10, seed_hosts=1)
T2_MULTI = CorpusSpec(
    n_hosts=8,
    urls_per_host=24,
    seed_hosts=3,
    redirect_rate=7,
    error_rate=9,
    nofollow_rate=11,
    unavailable_hosts=(5,),
    unreachable_hosts=(6,),
    crawl_delays={2: 2.0, 3: 0.5},
)
# TTL-expiry-mid-crawl: giant virtual rounds (20000 s) make the 24 h robots
# lifetime expire at round 5; host 0's robots flips at virtual t=60000 s to
# additionally disallow the /p/1 prefix, so Discovered-but-not-yet-fetched
# rows must be re-evaluated AT FETCH TIME with the refreshed rules and
# flipped to Disallowed (StrictRobotsFilter.scala:72-133; refresh-on-access
# HostManager.scala:187-189).  max_fetches_per_host_per_round=1 keeps a
# standing queue so rows actually straddle the expiry.
T2_TTLFLIP = CorpusSpec(
    n_hosts=2,
    urls_per_host=12,
    seed_hosts=2,
    redirect_rate=0,
    error_rate=0,
    nofollow_rate=0,
    robots_changes={0: (60_000.0, "User-agent: *\nDisallow: /p/\nCrawl-delay: 1\n")},
)
T2_SKEW = CorpusSpec(
    n_hosts=8,
    urls_per_host=256,
    seed_hosts=4,
    skew_host_frac=0.9,
    # the mega-host crawls unthrottled (delay 0 → budget = cap) so the skew
    # actually reaches the politeness window; small hosts stay delay-gated
    crawl_delays={0: 0.0},
)


def bench_spec(n_hosts: int = 256, urls_per_host: int = 400) -> CorpusSpec:
    return CorpusSpec(
        n_hosts=n_hosts,
        urls_per_host=urls_per_host,
        seed_hosts=n_hosts,
        with_images=False,
        cross_host_rate=3,
        crawl_delays={},
    )
