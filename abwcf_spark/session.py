"""SparkSession construction with scale-oriented defaults.

Single place where the engine's Spark knobs live so bench/tests/driver all
agree: AQE on (runtime shuffle coalescing + skew-join splitting — the
scale story for the per-host politeness repartition, SURVEY.md §2 O8),
Arrow enabled for the pandas-UDF kernels, and a shuffle-partition count
sized to the local core count (on a real cluster this would be
~2-3× total executor cores, or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _export_pkg_pythonpath() -> None:
    """Make ``import abwcf_spark`` work in Python WORKERS regardless of the
    driver's cwd.  Local-mode workers inherit PYTHONPATH from the JVM's env
    (captured at JVM launch), not the driver's ``sys.path`` — a driver started
    outside the repo root pickles UDFs by module reference that workers then
    can't import.  On a real cluster the same job ships the package via
    ``spark-submit --py-files`` (scripts/make_pyfiles.sh); this is the
    local-mode equivalent.  Must run BEFORE the first ``getOrCreate()``.
    """
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )


def get_spark(
    app_name: str = "abwcf-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _export_pkg_pythonpath()
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # large binary payload columns (images): 4096-row columnar batches
        # of ~14KB binaries exceed the vectorized reader's contiguous
        # reservation → cap rows per batch (negligible for narrow columns)
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # worker-side bootstrap (abwcf_spark/worker_daemon.py): stock
        # workers re-parse the pyspark.zip central directory on EVERY task
        # (importlib.invalidate_caches in setup_spark_files — profiled at
        # ~130 ms of pure CPU per task) and full-gc the whole import graph
        # between reused tasks; the wrapper no-ops the zip cache
        # invalidation (no runtime py-files exist here) and gc.freeze()s
        # long-lived state.  Measured: 288-task empty pandas-UDF stage
        # 5.1 s → 1.8 s at 8 cores — a fixed tax on every python stage.
        .config("spark.python.daemon.module", "abwcf_spark.worker_daemon")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
