"""fastworker daemon module: the guarded import-cache refresh must be
behavior-identical to the stock worker path.

The performance claim (no per-task zipimport directory rescan) is a
profile fact, not assertable portably; what IS pinned here:

* sessions built by get_spark actually run under the custom daemon
  (conf wired, module importable in-process);
* a module shipped with ``addPyFile`` AFTER warm Python tasks becomes
  importable inside UDFs — the exact case the unconditional
  ``importlib.invalidate_caches()`` existed for (the guard must
  re-invalidate when the include set grows);
* the protocol twin reads exactly the fields the stock
  implementation reads (signature parity guards a silent wire drift
  on a Spark upgrade).
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql.functions import pandas_udf


def test_daemon_conf_wired(spark):
    assert (
        spark.conf.get("spark.python.daemon.module")
        == "etl_data_lake_spark.fastworker"
    )
    # the module must import cleanly in the worker's interpreter —
    # importing it here exercises the same code path (patch included)
    import etl_data_lake_spark.fastworker as fw

    assert fw._wu.setup_spark_files is fw._setup_spark_files


def test_addpyfile_after_warm_tasks(spark):
    inc = pandas_udf(lambda s: s + 1, "long")
    # warm: several python tasks so per-worker sentinels are populated
    for _ in range(2):
        (
            spark.range(64, numPartitions=8)
            .select(inc("id").alias("v"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    mod_dir = tempfile.mkdtemp()
    with open(os.path.join(mod_dir, "fastworker_probe_mod.py"), "w") as f:
        f.write("VALUE = 973\n")
    spark.sparkContext.addPyFile(
        os.path.join(mod_dir, "fastworker_probe_mod.py")
    )

    def use(s: pd.Series) -> pd.Series:
        import fastworker_probe_mod

        return s + fastworker_probe_mod.VALUE

    useu = pandas_udf(use, "long")
    vals = sorted(
        r.v
        for r in spark.range(8, numPartitions=8)
        .select(useu("id").alias("v"))
        .collect()
    )
    assert vals == [973 + i for i in range(8)]


def test_protocol_twin_signature():
    import inspect

    import pyspark.worker_util as wu

    import etl_data_lake_spark.fastworker as fw

    # same arity as the stock function it replaces
    stock = inspect.signature(fw._ORIG_SETUP_SPARK_FILES)
    twin = inspect.signature(fw._setup_spark_files)
    assert len(stock.parameters) == len(twin.parameters) == 1
    # the serializer attributes the twin leans on still exist upstream
    assert hasattr(wu, "read_int") and hasattr(wu, "utf8_deserializer")
    assert hasattr(wu, "add_path")
