from spark_cherry_shuffle_service_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_tables,
    register_views,
    table,
)
