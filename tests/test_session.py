"""Session-config surface: runtime confs, shuffle sizing, S3A parity."""

from __future__ import annotations


def test_runtime_confs_applied(spark):
    from etl_data_lake_spark.session import apply_runtime_confs

    apply_runtime_confs(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # the test fixture chose 8 explicitly — sizing must NOT clobber it
    assert spark.conf.get("spark.sql.shuffle.partitions") == "8"


def test_shuffle_sizing_only_replaces_stock_default(spark):
    from etl_data_lake_spark.session import apply_runtime_confs

    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") != "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_s3a_surface_shape():
    """The reference's only session config is the S3A connector
    (etl.py:18-22, 33-37). Parity: connector + committer + credential
    provider chain — and never raw keys copied into confs."""
    from etl_data_lake_spark.session import S3A_CONFS

    assert "spark.hadoop.fs.s3a.aws.credentials.provider" in S3A_CONFS
    joined = " ".join(S3A_CONFS.values())
    assert "AKIA" not in joined and "secret" not in joined.lower()
    assert S3A_CONFS["spark.hadoop.fs.s3a.committer.name"] == "magic"
