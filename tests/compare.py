"""Thin re-export: the differential harness lives in the package so the
CLI `compare` subcommand can expose it (plans/differential.py)."""

from __future__ import annotations

from spark_cherry_shuffle_service_spark.plans.differential import (  # noqa: F401
    assert_matches_oracle,
    duck_rows,
    spark_rows,
)
