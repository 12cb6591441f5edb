"""Exact-match comparison between the Spark engine and the pure-Python
oracle (north_rule: exact crawl ordering + final URL-seen membership)."""

from __future__ import annotations

import pandas as pd

ORACLE_COLS = [
    "url",
    "url_hash",
    "host",
    "status",
    "crawl_depth",
    "crawl_priority",
    "discovered_round",
    "fetched_round",
    "fetch_order",
]


def assert_crawl_equal(spark_result, oracle_result) -> None:
    # 1. exact crawl order (fetch_seq, url)
    s_order = spark_result.crawl_order()
    o_order = oracle_result.crawl_order
    assert len(s_order) == len(o_order), (
        f"crawl length {len(s_order)} != oracle {len(o_order)}"
    )
    for i, (s, o) in enumerate(zip(s_order, o_order)):
        assert s == tuple(o), f"crawl_order[{i}]: spark={s} oracle={o}"

    # 2. final frontier (URL-seen membership + every persisted column)
    s_f = spark_result.frontier_pdf()[ORACLE_COLS].reset_index(drop=True)
    o_f = oracle_result.frontier_df()
    if len(o_f) == 0:
        assert len(s_f) == 0
        return
    o_f = o_f[ORACLE_COLS].sort_values("url").reset_index(drop=True)
    for c in ("fetched_round", "fetch_order"):
        s_f[c] = s_f[c].astype("float64")
        o_f[c] = o_f[c].astype("float64")
    pd.testing.assert_frame_equal(s_f, o_f, check_dtype=False)

    # 3. round count
    assert spark_result.rounds == oracle_result.rounds, (
        f"rounds {spark_result.rounds} != oracle {oracle_result.rounds}"
    )
