"""Convert the pandas fixture tables (testing/corpus.py) into Spark
DataFrames with explicit schemas (binary payloads, array<string> links)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CORPUS_SCHEMA = (
    "url string, image_id string, bytes binary, content_length long, "
    "w int, h int, fmt string, "
    "caption string, phash long, status_code int, content_type string, "
    "redirect_to string, x_robots_tag string, meta_robots string, "
    "out_links array<string>, body_html binary"
)
ROBOTS_SCHEMA = (
    "scheme_and_authority string, fetch_outcome string, robots_body string, "
    "robots_body2 string, switch_ms long"
)
SEEDS_SCHEMA = "url string, seq int"


def _clean(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.astype(object).where(pd.notnull(pdf), None)


def corpus_to_spark(spark: SparkSession, tables: dict) -> dict[str, DataFrame]:
    robots_schema = ROBOTS_SCHEMA
    if "robots_redirect_to" in tables["robots"].columns:
        robots_schema += ", robots_redirect_to string"
    return {
        "corpus": spark.createDataFrame(
            _clean(tables["corpus"]).to_dict("records"), CORPUS_SCHEMA
        ),
        "robots": spark.createDataFrame(
            _clean(tables["robots"]).to_dict("records"), robots_schema
        ),
        "seeds": spark.createDataFrame(
            _clean(tables["seeds"]).to_dict("records"), SEEDS_SCHEMA
        ),
    }
