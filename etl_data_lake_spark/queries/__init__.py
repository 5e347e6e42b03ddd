from etl_data_lake_spark.queries.registry import REGISTRY, oracle_sql, queries, register

__all__ = ["REGISTRY", "register", "queries", "oracle_sql"]
