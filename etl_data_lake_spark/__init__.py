"""etl_data_lake_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the capability surface of
``stephanderton/ETL-Data-Lake`` (reference: ``/root/reference/etl.py``,
``/root/reference/README.md``): star-schema batch ETL over JSON event
logs + song metadata, partitioned Parquet sinks, and an analytic query
workload — extended with the operators a large-scale training-data
pipeline needs (dedup, similarity search, text analysis, multimodal
columns, streaming ingestion).

Design principles (100 TB-scale first):

* Declarative DataFrame/SQL plans everywhere; Catalyst + AQE pick the
  physical strategy. No RDDs, no driver-side loops over data.
* Explicit schemas on every source (no inference jobs at scale).
* Broadcast hints on dimension joins; partial aggregation, partition
  pruning and predicate pushdown preserved by construction.
* Python row UDFs are banned from hot paths; Pandas UDFs / mapInPandas
  only where built-ins genuinely can't express the semantics
  (multimodal decode).
"""

__version__ = "0.1.0"
