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


# --------------------------------------------------------------------------
# robots.txt fetch realism: 500 KiB truncate-then-parse + ≤5 redirects
# (RobotsFetcher.scala:73-110; reference.conf:237-242)
# --------------------------------------------------------------------------

def test_truncation_is_byte_level_and_multibyte_safe():
    from abwcf_spark.kernels.robots import (
        ROBOTS_MAX_CONTENT_LENGTH,
        truncate_robots_body,
    )

    assert truncate_robots_body(None) is None
    small = "User-agent: *\nDisallow: /x/\n"
    assert truncate_robots_body(small) == small
    # cut lands inside a multibyte char → char dropped, no exception
    body = "#" + "é" * (ROBOTS_MAX_CONTENT_LENGTH // 2) + "\nDisallow: /x/\n"
    t = truncate_robots_body(body)
    assert len(t.encode("utf-8")) <= ROBOTS_MAX_CONTENT_LENGTH
    assert "Disallow" not in t


def test_truncation_changes_compiled_rules():
    """A rule crossing the cut survives as a DIFFERENT prefix and a rule
    beyond the cut is lost entirely — host_outcome must compile the
    truncated view (the reference parses only the first 500 KiB)."""
    from abwcf_spark.kernels.robots import host_outcome, robots_allowed
    from abwcf_spark.testing.corpus import _huge_robots_body

    body = _huge_robots_body(1.0)
    mode, rules, delay, _ = host_outcome("ok", body, ())
    assert mode == "ALLOW_SOME"
    # beyond-the-cut rule lost → /private/ ALLOWED under truncation
    assert robots_allowed("https://h.example/private/1", mode, rules)
    # pre-cut rule intact
    assert not robots_allowed("https://h.example/keep-blocked/1", mode, rules)
    # straddling rule survives as its truncated prefix "/s"
    assert not robots_allowed("https://h.example/something", mode, rules)
    # sanity: the UNtruncated body would have blocked /private/
    from abwcf_spark.kernels.robots import parse_robots_txt

    m2, r2, _ = parse_robots_txt(body, ())
    assert not robots_allowed("https://h.example/private/1", m2, r2)


def _redirect_corpus():
    return {
        "https://a.example": dict(fetch_outcome="redirect",
                                  robots_redirect_to="https://b.example"),
        "https://b.example": dict(fetch_outcome="redirect",
                                  robots_redirect_to="https://c.example"),
        "https://c.example": dict(fetch_outcome="ok",
                                  robots_body="User-agent: *\nDisallow: /x/\n"),
        "https://loop1.example": dict(fetch_outcome="redirect",
                                      robots_redirect_to="https://loop2.example"),
        "https://loop2.example": dict(fetch_outcome="redirect",
                                      robots_redirect_to="https://loop1.example"),
        "https://dangle.example": dict(fetch_outcome="redirect",
                                       robots_redirect_to="https://missing.example"),
    }


def test_redirect_chain_resolves_to_target():
    from abwcf_spark.kernels.robots import resolve_robots_redirect

    rbs = _redirect_corpus()
    row = resolve_robots_redirect("https://a.example", rbs)
    assert row["fetch_outcome"] == "ok" and "Disallow: /x/" in row["robots_body"]


def test_redirect_loop_and_dangle_are_unavailable():
    from abwcf_spark.kernels.robots import resolve_robots_redirect

    rbs = _redirect_corpus()
    assert resolve_robots_redirect("https://loop1.example", rbs)["fetch_outcome"] == "unavailable"
    assert resolve_robots_redirect("https://dangle.example", rbs)["fetch_outcome"] == "unavailable"


def test_redirect_hop_limit_is_five():
    from abwcf_spark.kernels.robots import resolve_robots_redirect

    def chain(n):
        rbs = {
            f"https://h{i}.example": dict(
                fetch_outcome="redirect",
                robots_redirect_to=f"https://h{i + 1}.example",
            )
            for i in range(n)
        }
        rbs[f"https://h{n}.example"] = dict(fetch_outcome="ok", robots_body="")
        return resolve_robots_redirect("https://h0.example", rbs)

    assert chain(5)["fetch_outcome"] == "ok"          # 5 follows allowed
    assert chain(6)["fetch_outcome"] == "unavailable"  # 6th → unavailable


def test_spark_redirect_resolution_matches_python(spark):
    """round_ops.resolve_robots_redirects (5 broadcast self-joins) must
    agree row-for-row with the pure-python kernel resolver."""
    import pandas as pd

    from abwcf_spark.kernels.robots import resolve_robots_redirect
    from abwcf_spark.operators.round_ops import resolve_robots_redirects

    rbs = _redirect_corpus()
    pdf = pd.DataFrame(
        [
            dict(
                scheme_and_authority=sa,
                fetch_outcome=r["fetch_outcome"],
                robots_body=r.get("robots_body"),
                robots_redirect_to=r.get("robots_redirect_to"),
            )
            for sa, r in rbs.items()
        ]
    )
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pd.notnull(pdf), None).to_dict("records"),
        "scheme_and_authority string, fetch_outcome string, robots_body string,"
        " robots_redirect_to string",
    )
    got = {
        r.scheme_and_authority: (r.fetch_outcome, r.robots_body)
        for r in resolve_robots_redirects(sdf).collect()
    }
    for sa in rbs:
        exp = resolve_robots_redirect(sa, rbs)
        assert got[sa][0] == exp["fetch_outcome"], sa
        assert got[sa][1] == exp.get("robots_body"), sa
