"""Operator modules — importing this package populates the query registry."""

import spark_cherry_shuffle_service_spark.operators.relational  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.windows_setops  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.subqueries_scalar  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.workloads  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.textanalysis  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.dedup  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.similarity  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.events_ops  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.multimodal  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.sql_api  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.olap_extras  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.graph  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.tpch_suite  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.datapipe  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.decimal_native  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.dataquality  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.layout  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.pipeline_ml  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.warehouse_extras  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.monitoring  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.sketches  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.bpe  # noqa: F401
import spark_cherry_shuffle_service_spark.operators.tpcds  # noqa: F401
