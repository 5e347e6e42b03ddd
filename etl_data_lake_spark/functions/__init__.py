from etl_data_lake_spark.functions.redact import (
    PII_PATTERNS,
    pii_stats,
    redact_pii,
    redact_text,
)
from etl_data_lake_spark.functions.repetition import (
    repetition_filter,
    repetition_signals,
)

__all__ = [
    "PII_PATTERNS",
    "redact_text",
    "redact_pii",
    "pii_stats",
    "repetition_signals",
    "repetition_filter",
]
