"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric: frontier URLs fetched+deduped per second by the crawl
round loop on the synthetic bench corpus (FIXTURES.md `bench` scale point),
measured at two parallelism levels — local[N] and local[4N] — on the SAME
input, per the north rule's two-cluster-size scaling criterion (no real
cluster in this sandbox, so executor scaling is evidenced by core scaling).

Also reports per-query wall times of the headline operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir for the operator queries (sf0.1)
  SPARK_GRAFT_CPUS     the 4N core count (default 32; N = cpus // 4)
  ABWCF_BENCH_HOSTS    bench corpus hosts        (default 512)
  ABWCF_BENCH_URLS     bench corpus urls/host    (default 200)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from abwcf_spark.config import CrawlConfig
from abwcf_spark.engine.crawler import SparkCrawler
from abwcf_spark.session import get_spark
from abwcf_spark.testing.corpus import CorpusSpec, gen_corpus

HEADLINE_QUERIES = [
    "o3_regex_filter",
    "o5_anti_join_dedup",
    "o5_first_discovery_wins",
    "o7_broadcast_dim_join",
    "o8_politeness_window_rank",
    "o14_token_explode",
    "o19_topk_restore_scan",
    "dedup_exact_documents",
    "minhash_lsh_candidates",
    "embedding_cosine_topk",
]

BENCH_CFG = CrawlConfig(
    # all-hosts crawl-delay 0 → per-host budget = cap; throughput is bounded
    # by pipeline work, not by the politeness clock (which at delay>0 would
    # measure the synthetic clock, not the engine)
    round_seconds=1.0,
    max_fetches_per_host_per_round=100_000,
    max_rounds=64,
)


def bench_spec() -> CorpusSpec:
    n_hosts = int(os.environ.get("ABWCF_BENCH_HOSTS", "512"))
    urls = int(os.environ.get("ABWCF_BENCH_URLS", "200"))
    return CorpusSpec(
        n_hosts=n_hosts,
        urls_per_host=urls,
        seed_hosts=n_hosts,
        with_images=False,
        crawl_delays={i: 0.0 for i in range(n_hosts)},
    )


def materialize_corpus(work_dir: str) -> dict[str, str]:
    """Generate the deterministic bench corpus once, write parquet with
    pyarrow (fast, no Spark needed), return table paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = gen_corpus(bench_spec())
    paths = {}
    for name, pdf in tables.items():
        path = os.path.join(work_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
        paths[name] = path
    return paths


def run_crawl(cpus: int, paths: dict[str, str]) -> dict:
    spark = get_spark(app_name=f"abwcf-bench-{cpus}", cpus=cpus)
    try:
        corpus = spark.read.parquet(paths["corpus"])
        robots = spark.read.parquet(paths["robots"])
        seeds = spark.read.parquet(paths["seeds"])
        crawler = SparkCrawler(
            spark, corpus, robots, BENCH_CFG,
            collect_metrics=False, use_bloom=True,
            bloom_capacity=1 << 22, n_salts=0,
        )
        t0 = time.time()
        res = crawler.run(seeds=seeds)
        wall = time.time() - t0
        return dict(
            cpus=cpus,
            wall_sec=round(wall, 2),
            rounds=res.rounds,
            fetched=res.fetch_seq,
            urls_per_sec=round(res.fetch_seq / wall, 1),
        )
    finally:
        spark.stop()


def run_queries(sf_dir: str, cpus: int) -> dict[str, float]:
    from abwcf_spark.queries import QUERIES

    spark = get_spark(app_name="abwcf-bench-queries", cpus=cpus)
    times = {}
    try:
        for name in HEADLINE_QUERIES:
            fn = QUERIES[name]
            fn(spark, sf_dir).count()  # warm (scan cache, codegen)
            t0 = time.time()
            fn(spark, sf_dir).count()
            times[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus_hi = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus_lo = max(cpus_hi // 4, 1)

    work_dir = tempfile.mkdtemp(prefix="abwcf-bench-")
    try:
        paths = materialize_corpus(work_dir)
        lo = run_crawl(cpus_lo, paths)
        hi = run_crawl(cpus_hi, paths)
        qtimes = run_queries(sf_dir, cpus_hi)
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)

    # scaling efficiency from N to 4N cores on the same input
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"] if lo["urls_per_sec"] else 0.0
    eff = ratio / (cpus_hi / cpus_lo)
    out = {
        "metric": "frontier_urls_fetched_per_sec",
        "value": hi["urls_per_sec"],
        "unit": "urls/sec",
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "queries": qtimes,
        "crawl": {"lo": lo, "hi": hi},
        "scaling": {
            "cores_lo": cpus_lo,
            "cores_hi": cpus_hi,
            "speedup": round(ratio, 3),
            "efficiency": round(eff, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
