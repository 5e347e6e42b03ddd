from etl_data_lake_spark.sources.catalog import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
