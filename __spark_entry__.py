"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship composite query on /root/testdata/sf0.001.
- ``queries()`` — one entry per implemented operator from SURVEY.md §2
  (crawl pipeline shapes) plus the training-data pipeline operators;
  see abwcf_spark/queries.py for the registry with reference citations.
- ``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible entry.
  Entries without oracle SQL (full crawl round loop, xxhash64-based
  MinHash, float-reduction cosine top-k) get the driver's rows-only check;
  their exactness is enforced in tests/ against the pure-Python ABWCF
  oracle (tests/test_crawl_e2e.py) and numpy (tests/test_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier-style selection composite over sf0.001 — broadcast
    dim joins (O7) + per-key window rank politeness (O8) + deterministic
    top-k restore scan (O19) in one plan."""
    sf_dir = "/root/testdata/sf0.001"
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")

    from pyspark.sql import Window

    eu = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name").isin("EUROPE", "ASIA"))
        .select("c_custkey", "c_name", "n_name")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = (
        orders.withColumn("rank_in_host", F.row_number().over(w))
        .where(F.col("rank_in_host") <= 2)
    )
    return (
        ranked.join(eu, ranked.o_custkey == eu.c_custkey)
        .select("c_custkey", "c_name", "n_name", "o_orderkey",
                "o_totalprice", "rank_in_host")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from abwcf_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from abwcf_spark.queries import ORACLE

    return dict(ORACLE)
