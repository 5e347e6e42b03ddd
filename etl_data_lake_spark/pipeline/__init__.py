"""Star-schema ETL pipeline — the reference's full capability surface.

The reference (``/root/reference/etl.py``) is a single-script batch ETL:
raw JSON (songs + user-activity logs) → five dimensional parquet tables
(songs, artists, users, time, songplays). This package rebuilds it as
composable, scale-hardened pieces:

* :mod:`schemas`   — explicit StructTypes for both JSON sources
  (replaces schema inference, etl.py:64,124 — SURVEY §1.2).
* :mod:`tables`    — pure ``DataFrame → DataFrame`` builders for the
  five tables (etl.py:67-76, 79-90, 130-141, 156-169, 175-204).
* :mod:`etl`       — orchestration + partitioned parquet sinks with
  overwrite semantics (fixes reference quirk Q9).
* :mod:`golden`    — the four analytic SQL queries with golden outputs
  (README.md:111-262), dialect-translated to Spark SQL.
* :mod:`dag`       — declarative DAG runner generalizing the
  reference's hand-sequenced ``main()``: dependency-ordered tables,
  expectation gates, atomic TxnTable publication.
"""

from etl_data_lake_spark.pipeline.dag import Pipeline, RunResult  # noqa: F401
from etl_data_lake_spark.pipeline.etl import run_pipeline  # noqa: F401
from etl_data_lake_spark.pipeline.tables import (  # noqa: F401
    build_artists,
    build_songplays,
    build_songs,
    build_time,
    build_users,
)
