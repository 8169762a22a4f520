"""The main correctness gate: every registered query with an oracle must
hash-match DuckDB on sf0.01 (the driver's t2 scale factor)."""

from __future__ import annotations

import pytest

from spark_cherry_shuffle_service_spark.plans.registry import all_specs
from tests.compare import assert_matches_oracle
from tests.conftest import SF_CORRECT

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_duckdb_oracle(spark, duck_correct, name):
    spec = SPECS[name]
    df = spec.builder(spark, SF_CORRECT)
    assert_matches_oracle(df, duck_correct, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    df = spec.builder(spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os = e.queries(), e.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) >= 30
