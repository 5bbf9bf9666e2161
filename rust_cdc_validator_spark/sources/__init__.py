from rust_cdc_validator_spark.sources.manifest import (  # noqa: F401
    FileMode,
    build_manifest,
    discover_files,
)
from rust_cdc_validator_spark.sources.catalog import (  # noqa: F401
    Catalog,
    StaticCatalog,
    create_table_ddl,
    pg_type_to_spark,
)
