from etl_data_lake_spark.sources.avro_source import register_avro_source
from etl_data_lake_spark.sources.catalog import TABLES, load_table, load_tables
from etl_data_lake_spark.sources.merge import MergeResult, merge_into
from etl_data_lake_spark.sources.lake_datasource import register_lake_source
from etl_data_lake_spark.sources.readers import read_avro, write_avro
from etl_data_lake_spark.sources.txn import (
    ConcurrentWriteError,
    ConstraintViolationError,
    TxnTable,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "TxnTable",
    "ConcurrentWriteError",
    "ConstraintViolationError",
    "merge_into",
    "MergeResult",
    "register_lake_source",
    "register_avro_source",
    "read_avro",
    "write_avro",
]
