"""Coverage for the round-6 python-worker bootstrap
(abwcf_spark/worker_daemon.py, installed via spark.python.daemon.module
in session.get_spark).

The daemon wrapper must be invisible semantically: UDF results flow
through unchanged and worker exceptions still propagate.  Runs in a
SUBPROCESS because the suite's shared session (tests/conftest.py) uses
its own builder, and a second SparkContext in one python process breaks
PySpark's accumulator server.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE = r"""
import sys
sys.path.insert(0, {root!r})
from abwcf_spark.session import get_spark
from pyspark.sql import functions as F
import pandas as pd

spark = get_spark(app_name="daemon-probe", cpus=2)
assert (
    spark.conf.get("spark.python.daemon.module") == "abwcf_spark.worker_daemon"
)

@F.pandas_udf("long")
def double(a: pd.Series) -> pd.Series:
    return a * 2

got = sorted(
    r[0] for r in spark.range(0, 50, 1, 8).select(double(F.col("id"))).collect()
)
assert got == [i * 2 for i in range(50)], got[:5]

@F.pandas_udf("long")
def boom(a: pd.Series) -> pd.Series:
    raise RuntimeError("daemon-probe-expected-error")

try:
    spark.range(0, 10).select(boom(F.col("id"))).collect()
    raise SystemExit("worker exception did not propagate")
except Exception as e:
    assert "daemon-probe-expected-error" in str(e), str(e)[:200]

print("DAEMON-PROBE-OK")
spark.stop()
"""


def test_worker_daemon_results_and_errors():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _PROBE.format(root=root)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DAEMON-PROBE-OK" in out.stdout
