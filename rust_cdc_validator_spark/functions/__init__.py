from rust_cdc_validator_spark.functions import hashing, text, vectors  # noqa: F401
