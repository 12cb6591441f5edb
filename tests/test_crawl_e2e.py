"""End-to-end: the Spark round-loop engine must reproduce the pure-Python
ABWCF-semantics oracle EXACTLY — crawl order, URL-seen set, every frontier
column — on every fixture (north_rule; SURVEY.md §5.2).

The oracle encodes the reference's semantics line-cited to
/root/reference (see testing/oracle.py); these tests are therefore the
"matches the reference's crawl ordering and URL-seen set" gate."""

import pytest

from abwcf_spark.config import CrawlConfig
from abwcf_spark.engine.crawler import SparkCrawler
from abwcf_spark.testing.compare import assert_crawl_equal
from abwcf_spark.testing.corpus import T1_MICRO, T2_MULTI, T2_SKEW, CorpusSpec, gen_corpus
from abwcf_spark.testing.oracle import crawl_oracle
from abwcf_spark.testing.spark_fixtures import corpus_to_spark


def run_both(spark, spec, cfg=CrawlConfig(), **crawler_kw):
    tables = gen_corpus(spec)
    oracle = crawl_oracle(tables["corpus"], tables["robots"], tables["seeds"], cfg)
    sdfs = corpus_to_spark(spark, tables)
    # per-stage metrics counts add ~5 Spark jobs/round; only the dedicated
    # metrics test needs them — result equality doesn't
    crawler_kw.setdefault("collect_metrics", False)
    crawler = SparkCrawler(
        spark, sdfs["corpus"], sdfs["robots"], cfg, **crawler_kw
    )
    result = crawler.run(seeds=sdfs["seeds"])
    return result, oracle


@pytest.mark.parametrize("use_bloom", [False, True])
def test_t1_micro(spark, use_bloom):
    res, oracle = run_both(spark, T1_MICRO, use_bloom=use_bloom)
    assert_crawl_equal(res, oracle)
    assert res.fetch_seq > 0


def test_t1_metrics_match_oracle(spark):
    res, oracle = run_both(spark, T1_MICRO, collect_metrics=True)
    for s_m, o_m in zip(res.metrics, oracle.metrics):
        for k in ("candidates", "normalized", "new_urls", "lenient_passed",
                  "robots_fetched", "inserted", "disallowed", "fetched", "emitted"):
            assert s_m[k] == o_m[k], f"round {o_m['round']} metric {k}: {s_m[k]} != {o_m[k]}"


def test_t2_multi(spark):
    """Multi-host: robots divergence (unavailable→ALLOW_ALL, unreachable→
    ALLOW_NONE), per-host crawl delays 0.5/1/2 s → per-round budgets 8/4/2
    at round_seconds=4, redirects, errors, nofollow, dirty links."""
    res, oracle = run_both(spark, T2_MULTI, CrawlConfig(round_seconds=4.0))
    assert_crawl_equal(res, oracle)
    statuses = {s for s in res.frontier_pdf()["status"]}
    assert "Disallowed" in statuses  # strict robots actually fired


def test_t2_skew_salted(spark):
    """90%-one-host skew with the salted politeness pre-rank enabled —
    salting must not change any result (top-B per host ⊆ ∪ per-salt top-B)."""
    res, oracle = run_both(
        spark, T2_SKEW, CrawlConfig(round_seconds=4.0), use_bloom=True, n_salts=4
    )
    assert_crawl_equal(res, oracle)


def test_depth_limit_cuts_expansion_not_fetch(spark):
    cfg = CrawlConfig(max_crawl_depth=2)
    res, oracle = run_both(spark, T1_MICRO, cfg)
    assert_crawl_equal(res, oracle)
    pdf = res.frontier_pdf()
    # depth-2 pages are fetched (Processed) but emit no children (no depth-3)
    assert (pdf["crawl_depth"] <= 2).all()
    d2 = pdf[pdf["crawl_depth"] == 2]
    assert len(d2) > 0 and (d2["status"] == "Processed").any()


def test_url_filter_must_not_match(spark):
    cfg = CrawlConfig(must_not_match=(r".*/p/[0-9]*[13579]",))  # drop odd page ids
    res, oracle = run_both(spark, T1_MICRO, cfg)
    assert_crawl_equal(res, oracle)
    assert not res.frontier_pdf()["url"].str.match(r".*/p/\d*[13579]$").any()


def test_payload_validation_all_pass(spark):
    spec = CorpusSpec(n_hosts=2, urls_per_host=12, seed_hosts=2)
    tables = gen_corpus(spec)
    oracle = crawl_oracle(
        tables["corpus"], tables["robots"], tables["seeds"], validate_payloads=True
    )
    assert oracle.payload_failures == []
    sdfs = corpus_to_spark(spark, tables)
    crawler = SparkCrawler(
        spark, sdfs["corpus"], sdfs["robots"], validate_payloads=True
    )
    res = crawler.run(seeds=sdfs["seeds"])
    assert_crawl_equal(res, oracle)
    assert res.payload_failures == 0


def test_payload_validation_detects_corruption(spark):
    """Swap the payloads of two pages: both still decode, but pixels/caption
    no longer match their rows' metadata → both rows must fail validation.
    (Corrupting trailing CRC bytes is NOT detectable: like real decoders,
    ours doesn't verify chunk CRCs.)"""
    spec = CorpusSpec(n_hosts=1, urls_per_host=6, seed_hosts=1)
    tables = gen_corpus(spec)
    corpus = tables["corpus"].copy()
    idxs = corpus[corpus["bytes"].notna()].index[:2]
    a, b = idxs[0], idxs[1]
    corpus.at[a, "bytes"], corpus.at[b, "bytes"] = (
        corpus.at[b, "bytes"],
        corpus.at[a, "bytes"],
    )
    tables["corpus"] = corpus
    sdfs = corpus_to_spark(spark, tables)
    crawler = SparkCrawler(
        spark, sdfs["corpus"], sdfs["robots"], validate_payloads=True
    )
    crawler.run(seeds=sdfs["seeds"])
    assert crawler.payload_failures >= 1
