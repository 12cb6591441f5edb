"""robots.txt kernel tests: RFC 9309 longest-match semantics, crawl-delay
clamping (HostManager.scala:126-136), serialization round-trip
(SlickHostRepository.scala:43-57 format), and the batch matcher."""

import pandas as pd

from abwcf_spark.kernels.robots import (
    DEFAULT_CRAWL_DELAY_MS,
    MODE_ALLOW_ALL,
    MODE_ALLOW_NONE,
    MODE_ALLOW_SOME,
    clamp_crawl_delay,
    deserialize_rules,
    host_outcome,
    parse_robots_txt,
    robots_allowed,
    robots_allowed_series,
    url_path_query,
)

BODY = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/open/
Disallow: /tmp
Crawl-delay: 5

User-agent: otherbot
Disallow: /
"""


def test_parse_wildcard_group():
    mode, rules, delay = parse_robots_txt(BODY)
    assert mode == MODE_ALLOW_SOME
    assert delay == 5000
    # specificity order: longest first, allow before disallow on tie
    assert deserialize_rules(rules) == [
        ("/private/open/", True),
        ("/private/", False),
        ("/tmp", False),
    ]


def test_specific_agent_overrides_wildcard():
    mode, rules, delay = parse_robots_txt(BODY, ("OtherBot",))
    assert deserialize_rules(rules) == [("/", False)]
    assert delay == DEFAULT_CRAWL_DELAY_MS  # otherbot group has no delay


def test_longest_match_wins():
    _, rules, _ = parse_robots_txt(BODY)
    assert robots_allowed("https://h/private/open/x", MODE_ALLOW_SOME, rules)
    assert not robots_allowed("https://h/private/x", MODE_ALLOW_SOME, rules)
    assert not robots_allowed("https://h/tmp/y", MODE_ALLOW_SOME, rules)
    assert robots_allowed("https://h/public", MODE_ALLOW_SOME, rules)


def test_allow_wins_tie():
    body = "User-agent: *\nDisallow: /page\nAllow: /page"
    _, rules, _ = parse_robots_txt(body)
    assert robots_allowed("https://h/page", MODE_ALLOW_SOME, rules)


def test_wildcard_and_anchor():
    body = "User-agent: *\nDisallow: /*.gif$\nDisallow: /a*b"
    _, rules, _ = parse_robots_txt(body)
    assert not robots_allowed("https://h/img/x.gif", MODE_ALLOW_SOME, rules)
    assert robots_allowed("https://h/img/x.gif?v=1", MODE_ALLOW_SOME, rules)
    assert not robots_allowed("https://h/aXXb", MODE_ALLOW_SOME, rules)


def test_empty_disallow_is_allow_all():
    body = "User-agent: *\nDisallow:"
    mode, rules, _ = parse_robots_txt(body)
    assert mode == MODE_ALLOW_SOME and rules == ""
    assert robots_allowed("https://h/anything", mode, rules)


def test_modes():
    assert robots_allowed("https://h/x", MODE_ALLOW_ALL, "disallow: /")
    assert not robots_allowed("https://h/x", MODE_ALLOW_NONE, "")


def test_clamp():
    # HostManager.scala:126-136 — default if unset/negative, clamp [0, 20 s]
    assert clamp_crawl_delay(None) == 1000
    assert clamp_crawl_delay(-5) == 1000
    assert clamp_crawl_delay(0) == 0
    assert clamp_crawl_delay(999_999) == 20_000
    _, _, d = parse_robots_txt("User-agent: *\nCrawl-delay: 100")
    assert d == 20_000


def test_host_outcomes():
    # HostManager.scala:142-161
    assert host_outcome("unavailable", None)[0] == MODE_ALLOW_ALL
    assert host_outcome("unreachable", None)[0] == MODE_ALLOW_NONE
    assert host_outcome("ok", BODY)[0] == MODE_ALLOW_SOME


def test_path_query_extraction():
    assert url_path_query("https://h.example") == "/"
    assert url_path_query("https://h.example/a/b?q=1#frag") == "/a/b?q=1"


def test_batch_matcher_matches_scalar():
    _, rules, _ = parse_robots_txt(BODY)
    urls = [
        "https://h/private/open/x",
        "https://h/private/x",
        "https://h/public",
        "https://h/tmp",
        "https://unknown/x",
        "https://allowall/x",
        "https://denyall/x",
    ]
    modes = [MODE_ALLOW_SOME] * 4 + [None, MODE_ALLOW_ALL, MODE_ALLOW_NONE]
    rls = [rules] * 4 + [None, "", ""]
    got = robots_allowed_series(
        pd.Series(urls), pd.Series(modes, dtype=object), pd.Series(rls, dtype=object)
    )
    want = [True, False, True, False, pd.NA, True, False]
    assert [
        (pd.NA if pd.isna(g) else bool(g)) is not False or not w
        for g, w in zip(got.tolist(), want)
    ]
    for g, w in zip(got.tolist(), want):
        if w is pd.NA:
            assert pd.isna(g)
        else:
            assert bool(g) == w
