"""Physical-plan inspection: make 'is this the plan I'd want at
100 TB?' a programmatic question instead of an eyeball of .explain."""

from etl_data_lake_spark.plans.inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_no_exchange,
    explain_report,
    plan_string,
)
