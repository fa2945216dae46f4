from dungbeetle_spark.sources.catalog import (  # noqa: F401
    TABLES,
    ParquetSource,
    SourcePool,
    load_tables,
    register_views,
)
