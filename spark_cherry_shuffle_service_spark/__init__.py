"""cherry-spark: a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
nikoshet/spark-cherry-shuffle-service (a Spark 3.0.1 fork adding a remote
task-aware shuffle service + TPC-DS / synthetic-shuffle workloads — see
/root/reference/README.md and SURVEY.md).

Design stance (SURVEY.md §7): the reference's relational surface is the full
Spark SQL operator inventory exercised by TPC-DS; its shuffle-service
innovations (remote shuffle, look-ahead caching, skew interest) map onto
configuration of stock Spark — AQE skew handling, partition coalescing,
broadcast thresholds — not custom execution code. Everything here is
DataFrame/Catalyst-first; Python UDFs only where built-ins cannot express the
semantics (and then Arrow-batched).
"""

from spark_cherry_shuffle_service_spark.session import get_spark  # noqa: F401
from spark_cherry_shuffle_service_spark.sources.catalog import (  # noqa: F401
    TABLES,
    load_tables,
    register_views,
    table,
)

__version__ = "0.1.0"
