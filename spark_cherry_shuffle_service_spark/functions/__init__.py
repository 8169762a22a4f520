from spark_cherry_shuffle_service_spark.functions.aggregates import dsum, money  # noqa: F401
