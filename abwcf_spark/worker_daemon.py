"""Python-worker bootstrap daemon (``spark.python.daemon.module``).

Wraps the stock pyspark daemon with two worker-side fixes for the
per-task overhead of SHORT Python tasks, both measured in round 6 (see
OPTIMIZATION_r06.md "Python task overhead"):

- **zipimporter.invalidate_caches → no-op.**  ``worker_util.
  setup_spark_files`` calls ``importlib.invalidate_caches()`` once per
  TASK; when pyspark ships as a zip on the worker path (the stock
  PythonWorkerFactory prepends ``$SPARK_HOME/python/lib/pyspark.zip``),
  every call re-parses the zip central directory in pure Python
  (profiled: ``zipimport._read_directory`` ≈ 12 ms × ~16 cached
  importers ≈ 130 ms of CPU per task — the dominant cost of every
  almost-empty Python task, and a fixed tax on every pandas-UDF stage
  task).  The cache exists to pick up runtime-added ``addPyFile``
  archives; this engine never adds python files at runtime (cluster
  deployments ship the package once via ``--py-files``,
  scripts/make_pyfiles.sh), so the invalidation can never observe a
  change.  The patch is scoped to the worker processes (this module runs
  only as the worker daemon).

- **gc.freeze() after the FIRST task.**  The stock daemon runs a full
  ``gc.collect()`` between reused-worker tasks; freezing the long-lived
  objects (imports, cached state) once keeps those collections
  proportional to newer allocations.  Freezing only once matters:
  freezing after every task would also freeze that task's surviving
  cyclic garbage, exempting it from the daemon's collect forever — a
  slow per-task leak.  One first-task freeze leaks at most one task's
  cycles, and everything acyclic is reclaimed by refcounting anyway.

Both changes alter NO observable semantics — task results, accumulators
and error handling all flow through the stock ``pyspark.worker.main``.
"""

from __future__ import annotations

import gc
import zipimport

# Must be patched BEFORE pyspark imports resolve additional zip entries:
# existing zipimporter caches stay valid forever (no runtime py-files).
zipimport.zipimporter.invalidate_caches = (  # type: ignore[method-assign]
    lambda self: None
)

import pyspark.daemon as _daemon  # noqa: E402
import pyspark.worker as _worker  # noqa: E402

_orig_main = _worker.main
_frozen = False


def _main(infile, outfile):
    global _frozen
    try:
        return _orig_main(infile, outfile)
    finally:
        if not _frozen:
            # exempt the import graph and first-task survivors from the
            # daemon's between-tasks full gc.collect() — ONCE (see module
            # docstring for why not per task)
            gc.freeze()
            _frozen = True


_daemon.worker_main = _main

if __name__ == "__main__":
    _daemon.manager()
