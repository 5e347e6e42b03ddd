"""Python-worker daemon module with a guarded import-cache refresh.

Launched in place of ``pyspark.daemon`` via the public conf
``spark.python.daemon.module`` (session.py sets it, plus the
``spark.executorEnv.PYTHONPATH`` entry that makes this module
importable in the worker processes).

Why: ``pyspark.worker_util.setup_spark_files`` calls
``importlib.invalidate_caches()`` on EVERY task so that files shipped
mid-session with ``SparkContext.addPyFile`` become importable. With
Spark's runtime on ``sys.path`` as zip archives (pyspark.zip,
py4j-*.zip — the stock spark-submit/worker PYTHONPATH), CPython's
``zipimport.invalidate_caches`` eagerly re-reads every archive's
central directory: measured ~0.15-0.3 s of pure CPU per Python task
in this sandbox (cProfile: 80k buffered reads across 16 zipimporters
inside ``zipimport._read_directory``), a fixed tax on every
pandas-UDF / mapInArrow / applyInPandas* task at ANY data size — at
sf0.1 it dominates sub-second python stages, and on a cluster it
burns (tasks x 0.2 s) of CPU per stage for nothing.

Fix: re-implement ``setup_spark_files`` with the SAME wire protocol
(read files-dir, register SparkFiles, add include paths) but only run
``importlib.invalidate_caches()`` when the (files-dir, includes)
tuple CHANGES — i.e. exactly when ``addPyFile``/``addArchive`` shipped
something new (those always extend the include list the JVM sends).
First task per forked worker still invalidates once (the module-level
sentinel starts empty in every fork); a worker that sees the same
include set on the next task skips the rescan. Semantics are
otherwise identical — same reads, same ``sys.path`` updates, same
``SparkFiles`` registration.

Scope: only sessions built by ``session.get_spark`` opt in (a static
conf read at worker-factory creation). Externally-created sessions
(the round driver's verify session) keep stock behavior —
``apply_runtime_confs`` deliberately does NOT set this, because the
daemon module must be importable before the first Python task and a
foreign session's PYTHONPATH cannot be guaranteed from here.
"""

from __future__ import annotations

import importlib
import os

import pyspark.worker as _worker
import pyspark.worker_util as _wu
from pyspark.util import is_remote_only

# reuse worker_util's own serializer instances (module-private names
# vary across minor releases; the attributes are stable)
read_int = _wu.read_int
utf8_deserializer = _wu.utf8_deserializer

_seen: tuple | None = None


def _setup_spark_files(infile) -> None:
    """Protocol-identical twin of worker_util.setup_spark_files with
    the invalidate_caches call guarded by the include-set sentinel."""
    global _seen
    spark_files_dir = utf8_deserializer.loads(infile)

    if not is_remote_only():
        from pyspark.core.files import SparkFiles

        SparkFiles._root_directory = spark_files_dir
        SparkFiles._is_running_on_worker = True

    _wu.add_path(spark_files_dir)
    includes = []
    num_python_includes = read_int(infile)
    for _ in range(num_python_includes):
        filename = utf8_deserializer.loads(infile)
        includes.append(filename)
        _wu.add_path(os.path.join(spark_files_dir, filename))

    key = (spark_files_dir, tuple(includes))
    if key != _seen:
        importlib.invalidate_caches()
        _seen = key


# rebind BOTH the defining module and pyspark.worker's from-import
_ORIG_SETUP_SPARK_FILES = _wu.setup_spark_files
_wu.setup_spark_files = _setup_spark_files
_worker.setup_spark_files = _setup_spark_files

# the daemon proper, with the patch applied before any worker forks
from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
