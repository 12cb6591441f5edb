"""Training-set export sink — the step after `training_pipeline_sample`:
materialize the sampled corpus as a sharded parquet layout a training job
can consume directly.

Layout contract (the part downstream loaders depend on):
- hive-partitioned by the stratum columns (default: ``lang``), so a mix
  recipe ("p_en of English, ...") maps to partition pruning on read;
- every data file carries at most ``max_records_per_file`` rows
  (trainer shards are read whole — unbounded files break streaming
  loaders at 100 TB), enforced via Spark's ``maxRecordsPerFile`` write
  option rather than a manual split loop;
- rows are range-repartitioned and sorted by (partition cols, shard key)
  so one logical key range maps to one shard — re-exports of the same
  input produce the same row→partition mapping;
- a ``_manifest.json`` (underscore-prefixed: ignored by Spark/Hive
  scanners) records per-partition row and file counts read back from the
  parquet FOOTERS, not from the input DataFrame — the manifest certifies
  what landed on disk.

100-TB shape: one range shuffle (the same one a sorted write needs
anyway); the footer walk is driver-local metadata I/O proportional to
file count, the same class as a commit-protocol listing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    shard_key: str = "doc_id",
    max_records_per_file: int = 100_000,
) -> dict:
    """Write ``df`` as a partitioned, size-bounded parquet training set.

    Returns the manifest dict (also persisted as ``<path>/_manifest.json``):
    ``{"partitions": {"<lang=en>": {"rows": N, "files": K}, ...},
    "total_rows": N, "max_records_per_file": M}``.
    """
    cols = list(partition_cols)
    out = df.repartitionByRange(*cols, shard_key).sortWithinPartitions(
        *cols, shard_key
    )
    (
        out.write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*cols)
        .mode("overwrite")
        .parquet(path)
    )
    manifest = {
        "partitions": _scan_partitions(path),
        "max_records_per_file": max_records_per_file,
        "partition_cols": cols,
        "shard_key": shard_key,
    }
    manifest["total_rows"] = sum(
        p["rows"] for p in manifest["partitions"].values()
    )
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def _scan_partitions(path: str) -> dict[str, dict[str, int]]:
    """Per-partition {rows, files} from parquet footers on disk."""
    import pyarrow.parquet as pq

    parts: dict[str, dict[str, int]] = {}
    for root, _, files in os.walk(path):
        pf = [f for f in files if f.endswith(".parquet")]
        if not pf:
            continue
        rel = os.path.relpath(root, path)
        key = "." if rel == "." else rel
        slot = parts.setdefault(key, {"rows": 0, "files": 0})
        for f in pf:
            slot["rows"] += pq.ParquetFile(
                os.path.join(root, f)
            ).metadata.num_rows
            slot["files"] += 1
    return parts
