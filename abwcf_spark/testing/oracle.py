"""Pure-Python deterministic ABWCF-semantics simulator — the correctness
oracle the Spark engine must match exactly (crawl order + URL-seen set).

This is the authoritative *deterministic instantiation* of the reference's
inherently timing-dependent semantics (SURVEY.md §7 risk 1).  Every rule is
line-cited to ``/root/reference/``:

ROUND PROTOCOL (round r, virtual time in integer ms, round = round_seconds)
 1. candidates  = seeds (r=0 only, Crawler.scala:156-159) ∪ links/redirects
                  emitted in round r-1.
 2. normalize   — RFC-3986 + Java URI semantics; invalid dropped
                  (UrlNormalizationService.scala:21-79, UrlNormalizer.scala:30-43).
 3. url filter  — length ≤ max, must-match/must-not-match regexes
                  (UrlFilter.scala:36-44).
 4. in-round dedup — first-discovery-wins per url: min (crawl_depth, seq)
                  (PageManager.scala:107 repeat-Discover no-op; seq is the
                  deterministic discovery sequence defined in step 11).
 5. URL-seen    — drop candidates already in the frontier (exact dedup at
                  PageManager identity, UrlDeduplicator.scala:13).
 6. lenient robots — hosts table AS OF START of round: known+unexpired →
                  test rules; unknown/expired → fail-open pass
                  (LenientRobotsFilter.scala:66-118).
 7. robots refresh — fetch robots.txt for candidate hosts missing/expired
                  (HostManager.scala:110-167): ok→parse+clamp delay,
                  unavailable→ALLOW_ALL 24h, unreachable→ALLOW_NONE 1h or
                  reuse-expired-rules with 1h bump (:142-162).
 8. insert + strict robots — survivors get priority (deterministic
                  xxhash64(url); the reference default is irreproducible
                  ThreadLocalRandom — PrioritizationFunctions.scala:11-12)
                  and enter the frontier as Discovered; the strict filter
                  (rules now always present) marks disallowed rows
                  Disallowed (StrictRobotsFilter.scala:72-133) — URL-seen
                  but never fetched.
 9. politeness selection — per host: budget from the ms-exact delay gate
                  (kernels/politeness.py ≙ HostQueue.scala:128-141), top-
                  budget Discovered rows by (crawl_priority DESC, url ASC)
                  (max-heap HostQueue.scala:69 with deterministic tiebreak).
10. fetch       — join to corpus: 3xx → re-inject resolved Location at SAME
                  depth (Fetcher.scala:121-131, HttpUtils.scala:16-27);
                  4xx/5xx → no parse (Fetcher.scala:110-118); 200 body >
                  max_content_length → LengthLimitExceeded, no parse
                  (Fetcher.scala:142,168-170); 200 text/html|xhtml → parse
                  links if crawl_depth < max_crawl_depth
                  (CrawlDepthLimiter.scala:22-28) and no X-Robots-Tag / meta
                  nofollow (RobotsHeaderFilter.scala:24-38,
                  HtmlParser.scala:65-72); children at depth+1
                  (HtmlParser.scala:45); page → Processed
                  (FetchResultConsumer.scala:34-50).
11. global fetch order = (round, host ASC, rank ASC) flattened to a counter;
                  child seq = parent_fetch_order * 1_000_000 + 1 + link_pos,
                  redirect seq = parent_fetch_order * 1_000_000; seed seq =
                  seed-list position.

Termination: no pending candidates and no Discovered rows remain (or
max_rounds).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from ..config import (
    STATUS_DISALLOWED,
    STATUS_DISCOVERED,
    STATUS_PROCESSED,
    CrawlConfig,
)
from ..kernels.hashing import xxhash64_str
from ..kernels.links import resolve_redirect
from ..kernels.politeness import advance_gate, budget_for_round
from ..kernels.robots import (
    UNREACHABLE_RULES_LIFETIME_S,
    host_outcome,
    resolve_robots_redirect,
    robots_allowed,
)
from ..kernels.urlnorm import normalize_url

PARSEABLE_CONTENT_TYPES = ("text/html", "application/xhtml+xml")  # Fetcher.scala:31


def _sa(url: str) -> str:
    """scheme+authority of a normalized URL (UrlUtils.scala:12-15)."""
    i = url.index("://")
    j = url.find("/", i + 3)
    return url if j < 0 else url[:j]


def _nofollow(tokens: str | None) -> bool:
    if not tokens:
        return False
    return any(t.strip().lower() == "nofollow" for t in tokens.split(","))


def priority_of(url: str, depth: int, prioritizer: str) -> int:
    if prioritizer == "xxhash64":
        return xxhash64_str(url)
    if prioritizer == "breadth_first":
        return -depth  # PrioritizationFunctions.scala:17-18
    if prioritizer == "depth_first":
        return depth  # PrioritizationFunctions.scala:23-24
    raise ValueError(prioritizer)


@dataclass
class OracleResult:
    frontier: dict            # url -> row dict (FRONTIER_FIELDS minus partition_id)
    hosts: dict               # sa -> row dict
    crawl_order: list         # [(fetch_seq, url)]
    rounds: int
    metrics: list             # per-round dicts
    payload_failures: list = field(default_factory=list)

    def frontier_df(self) -> pd.DataFrame:
        rows = [dict(url=u, **v) for u, v in sorted(self.frontier.items())]
        return pd.DataFrame(rows)

    def url_seen(self) -> dict:
        return {u: v["status"] for u, v in self.frontier.items()}


def crawl_oracle(
    corpus: pd.DataFrame,
    robots: pd.DataFrame,
    seeds: pd.DataFrame,
    cfg: CrawlConfig = CrawlConfig(),
    validate_payloads: bool = False,
    prioritizer_fn=None,
) -> OracleResult:
    """``prioritizer_fn``: optional (url, depth) → int — the oracle twin of
    the engine's user prioritizer plug-point (UserCode.scala:34-35)."""
    corpus_by_url = {r["url"]: r for r in corpus.to_dict("records")}
    robots_by_sa = {r["scheme_and_authority"]: r for r in robots.to_dict("records")}
    # robots.txt redirect chains resolve once, ≤5 hops; longer/dangling →
    # unavailable (RobotsFetcher.scala:99-110 ≙ round_ops.resolve_robots_redirects)
    if any(r.get("fetch_outcome") == "redirect" for r in robots_by_sa.values()):
        robots_by_sa = {
            sa: row
            for sa in robots_by_sa
            if (row := resolve_robots_redirect(sa, robots_by_sa)) is not None
        }

    round_ms = int(cfg.round_seconds * 1000)
    frontier: dict[str, dict] = {}
    hosts: dict[str, dict] = {}          # sa -> {rule_mode, robot_rules, crawl_delay, valid_until(ms)}
    gates: dict[str, int] = {}           # sa -> next_free_ms
    crawl_order: list[tuple[int, str]] = []
    metrics: list[dict] = []
    payload_failures: list[str] = []

    # (url_raw, depth, seq)
    candidates: list[tuple[str, int, int]] = [
        (r["url"], 0, int(r["seq"])) for r in seeds.to_dict("records")
    ]
    fetch_seq = 0

    for rnd in range(cfg.max_rounds):
        now_ms = rnd * round_ms
        m = dict(round=rnd, candidates=len(candidates))

        # 2-3: normalize + filter
        stage: list[tuple[str, int, int]] = []
        for raw, depth, seq in candidates:
            norm = normalize_url(
                raw, cfg.remove_userinfo, cfg.remove_query, cfg.remove_fragment
            )
            if norm is None:
                continue
            if not cfg.url_allowed_by_filter(norm):
                continue
            stage.append((norm, depth, seq))
        candidates = []
        m["normalized"] = len(stage)

        # 4: in-round dedup, first-discovery-wins by (depth, seq)
        best: dict[str, tuple[int, int]] = {}
        for url, depth, seq in stage:
            k = (depth, seq)
            if url not in best or k < best[url]:
                best[url] = k

        # 5: URL-seen
        new_urls = {u: ds for u, ds in best.items() if u not in frontier}
        m["new_urls"] = len(new_urls)

        # 6: lenient robots (hosts as of start of round; fail-open)
        lenient_pass: dict[str, tuple[int, int]] = {}
        for url, ds in new_urls.items():
            sa = _sa(url)
            h = hosts.get(sa)
            if h is not None and h["valid_until"] > now_ms:
                if not robots_allowed(url, h["rule_mode"], h["robot_rules"]):
                    continue  # dropped pre-insert: NOT URL-seen
            lenient_pass[url] = ds
        m["lenient_passed"] = len(lenient_pass)

        # 7: robots refresh-on-ACCESS for missing/expired hosts — accessed =
        # has candidates this round OR holds Discovered rows awaiting fetch
        # (HostManager.scala:187-189: any access of expired rules refetches)
        access = {_sa(u) for u in lenient_pass} | {
            r["host"] for r in frontier.values() if r["status"] == STATUS_DISCOVERED
        }
        need = {
            sa for sa in access
            if sa not in hosts or hosts[sa]["valid_until"] <= now_ms
        }
        for sa in sorted(need):
            rb = robots_by_sa.get(sa)
            outcome = rb["fetch_outcome"] if rb else "unavailable"
            old = hosts.get(sa)
            if outcome == "unreachable" and old is not None:
                # reuse expired rules, bump valid_until 1 h (HostManager.scala:149-154)
                old["valid_until"] = now_ms + UNREACHABLE_RULES_LIFETIME_S * 1000
                continue
            body = rb["robots_body"] if rb else None
            if rb is not None:
                # time-varying robots "server" (fetch-time strict fixture)
                b2, sw = rb.get("robots_body2"), rb.get("switch_ms")
                if b2 is not None and not pd.isna(b2) and sw is not None \
                        and not pd.isna(sw) and now_ms >= int(sw):
                    body = b2
            mode, rules, delay, lifetime_s = host_outcome(
                outcome, body, cfg.user_agents
            )
            hosts[sa] = dict(
                rule_mode=mode,
                robot_rules=rules,
                crawl_delay=delay,
                valid_until=now_ms + lifetime_s * 1000,
            )
        m["robots_fetched"] = len(need)

        # 7.5: fetch-time strict re-evaluation (StrictRobotsFilter.scala:
        # 72-133): Discovered rows of hosts refreshed THIS round are re-
        # checked against the CURRENT rules; disallowed → terminal
        # Disallowed, never fetched.  Rules unchanged → decision unchanged,
        # so only refreshed hosts need the pass.
        if rnd > 0:
            for url, row in frontier.items():
                if row["status"] == STATUS_DISCOVERED and row["host"] in need:
                    h = hosts[row["host"]]
                    if not robots_allowed(url, h["rule_mode"], h["robot_rules"]):
                        row["status"] = STATUS_DISALLOWED

        # 8: insert + strict robots
        inserted = disallowed = 0
        for url, (depth, seq) in lenient_pass.items():
            sa = _sa(url)
            h = hosts[sa]  # guaranteed present post-refresh
            allowed = robots_allowed(url, h["rule_mode"], h["robot_rules"])
            frontier[url] = dict(
                url_hash=xxhash64_str(url),
                host=sa,
                status=STATUS_DISCOVERED if allowed else STATUS_DISALLOWED,
                crawl_depth=depth,
                crawl_priority=(
                    prioritizer_fn(url, depth)
                    if prioritizer_fn is not None
                    else priority_of(url, depth, cfg.prioritizer)
                ),
                discovered_round=rnd,
                fetched_round=None,
                fetch_order=None,
            )
            inserted += 1
            disallowed += 0 if allowed else 1
        m["inserted"] = inserted
        m["disallowed"] = disallowed

        # 9: politeness selection over ALL Discovered rows
        by_host: dict[str, list[tuple[int, str]]] = {}
        for url, row in frontier.items():
            if row["status"] == STATUS_DISCOVERED:
                by_host.setdefault(row["host"], []).append(
                    (row["crawl_priority"], url)
                )
        fetch_set: list[tuple[str, str]] = []  # (host, url) in (host, rank) order
        for sa in sorted(by_host):
            delay = hosts[sa]["crawl_delay"] if sa in hosts else 1000
            nf = gates.get(sa, 0)
            budget, _ = budget_for_round(
                nf, rnd, delay, round_ms, cfg.max_fetches_per_host_per_round
            )
            if budget <= 0:
                continue
            ranked = sorted(by_host[sa], key=lambda t: (-t[0], t[1]))[:budget]
            if cfg.max_bytes_per_host_per_round is not None:
                # byte budget mirror (round_ops.byte_budget_select): strict
                # prefix sum of declared sizes < budget keeps the row; the
                # declared size mirrors body_length_col — the corpus's
                # content_length column, NULL/missing counted 0
                kept, cum = [], 0
                for pr, u in ranked:
                    if cum >= cfg.max_bytes_per_host_per_round:
                        break
                    kept.append((pr, u))
                    page = corpus_by_url.get(u)
                    cl = page.get("content_length") if page is not None else None
                    cum += int(cl) if cl is not None else 0
                ranked = kept
            gates[sa] = advance_gate(nf, rnd, delay, len(ranked), round_ms)
            fetch_set.extend((sa, u) for _, u in ranked)
        m["fetched"] = len(fetch_set)

        # 10-11: fetch + parse + status updates
        emitted: list[tuple[str, int, int]] = []
        for sa, url in fetch_set:
            row = frontier[url]
            row["status"] = STATUS_PROCESSED
            row["fetched_round"] = rnd
            row["fetch_order"] = fetch_seq
            crawl_order.append((fetch_seq, url))
            page = corpus_by_url.get(url)
            if page is not None:
                sc = int(page["status_code"])
                if 300 <= sc < 400 and page.get("redirect_to"):
                    red = resolve_redirect(page["redirect_to"], url)
                    if red:
                        emitted.append((red, row["crawl_depth"], fetch_seq * 1_000_000))
                elif sc == 200:
                    body = page.get("bytes")
                    too_big = body is not None and len(body) > cfg.max_content_length
                    if validate_payloads and body is not None and not too_big:
                        if not _validate_payload(page):
                            payload_failures.append(url)
                    if (
                        not too_big
                        and str(page.get("content_type", "")) in PARSEABLE_CONTENT_TYPES
                        and row["crawl_depth"] < cfg.max_crawl_depth
                        and not _nofollow(page.get("x_robots_tag"))
                        and (cfg.parse_html or not _nofollow(page.get("meta_robots")))
                    ):
                        if cfg.parse_html:
                            # live HTML parse path (HtmlParser.scala:28-52);
                            # the kernel handles meta-robots nofollow itself
                            from ..kernels.links import extract_links

                            out = extract_links(page.get("body_html"), url)
                        else:
                            out = page.get("out_links") or []
                        for pos, link in enumerate(out):
                            emitted.append(
                                (
                                    link,
                                    row["crawl_depth"] + 1,
                                    fetch_seq * 1_000_000 + 1 + pos,
                                )
                            )
            fetch_seq += 1
        m["emitted"] = len(emitted)
        # end-of-round entity-count gauges (engine analogues: the hosts
        # commit Observation and the driver's cumulative insert counter)
        m["hosts_rows"] = len(hosts)
        m["frontier_rows"] = len(frontier)
        metrics.append(m)

        candidates = emitted
        if not candidates and not any(
            r["status"] == STATUS_DISCOVERED for r in frontier.values()
        ):
            return OracleResult(
                frontier, hosts, crawl_order, rnd + 1, metrics, payload_failures
            )

    return OracleResult(
        frontier, hosts, crawl_order, cfg.max_rounds, metrics, payload_failures
    )


def _validate_payload(page: dict) -> bool:
    """input_hint invariant: decoded pixels vs reference pixels (PSNR ≥ 40 dB
    for lossy fmt, exact for png) + caption equality + phash equality."""
    from ..kernels.imagecodec import (
        LOSSY_PSNR_THRESHOLD_DB,
        decode_image,
        gen_pixels,
        phash64,
        psnr,
    )

    try:
        px = decode_image(bytes(page["bytes"]))
    except ValueError:
        return False
    ref = gen_pixels(str(page["image_id"]), int(page["w"]), int(page["h"]))
    lossy = page["fmt"] != "png"
    if lossy:
        ok = psnr(px, ref) >= LOSSY_PSNR_THRESHOLD_DB
    else:
        ok = bool((px == ref).all())
    expected_caption = f"caption of {page['image_id']}: deterministic text " + str(
        (xxhash64_str(page["url"]) & 0x7FFFFFFFFFFFFFFF) % 1000
    )
    # perceptual-hash check: exact for lossless, Hamming ≤ 8/64 for lossy
    ham = bin((phash64(px) ^ int(page["phash"])) & ((1 << 64) - 1)).count("1")
    return ok and page["caption"] == expected_caption and (ham == 0 if not lossy else ham <= 8)
