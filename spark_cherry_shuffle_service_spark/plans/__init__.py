from spark_cherry_shuffle_service_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    all_specs,
    get,
    query,
)
