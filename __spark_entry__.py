"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship q51-shaped cumulative-compare query at sf0.001.
queries()       — every implemented operator from SURVEY.md §2 + the
                  north-star extensions (dedup / similarity / text /
                  multimodal / events), via the central registry.
oracle_sql()    — DuckDB twins, generated alongside each Spark builder in
                  spark_cherry_shuffle_service_spark/operators/*.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_cherry_shuffle_service_spark.plans.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spec = all_specs()["cumulative_compare"]
    return spec.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
