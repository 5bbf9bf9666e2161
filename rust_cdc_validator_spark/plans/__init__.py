from rust_cdc_validator_spark.plans.inspect import (  # noqa: F401
    ensure_parallelism,
    explain_str,
    pushed_filters,
    scan_columns,
    uses_broadcast_join,
)
