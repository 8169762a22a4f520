"""Query registry: one QuerySpec per operator from SURVEY.md §2.

Every spec carries a Spark DataFrame builder AND (where SQL-expressible) an
equivalent ANSI-SQL oracle string for DuckDB differential testing — the
reference's correctness strategy is golden-output SQL testing
(SURVEY.md §5; SQLQueryTestSuite.scala:129), which we adapt to a live
DuckDB oracle over the same parquet fixtures.

Cross-engine determinism convention (critical for value-hash comparison):
per-row double arithmetic is IEEE-deterministic across engines, but
*aggregation order* is not. Every floating-point SUM therefore routes
through `ROUND(expr, 6) → DECIMAL(18,6) → SUM → DOUBLE` on BOTH engines
(helpers in functions/aggregates.py + plans/oracle.py), which is exact and
order-independent. Queries ending in LIMIT always order by a unique
tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None (rows-only check)
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    #: Machine-readable 100 TB pairing (VERDICT r6 item 6): for a query
    #: that is DELIBERATELY exact with per-group state that grows with
    #: the data (tag "exact-unbounded" — e.g. exact `percentile` buffering
    #: a value→count map over an unbounded domain), `scale_twin` names the
    #: registered query that demonstrates the bounded production path
    #: (histogram percentile, t-digest sketch, bucketed incremental
    #: index). tests/test_plans.py::test_exact_unbounded_queries_name_a_scale_twin
    #: enforces tag ⇒ twin-exists, so the pairing is discoverable from
    #: all_specs() rather than prose.
    scale_twin: str | None = None
    #: Independent PYTHON oracle `(duckdb_con, sf_dir) -> (col_names, rows)`
    #: for queries whose SQL oracle is correct but resource-infeasible at
    #: generated scale (e.g. the connected-components min-label CTE chain
    #: exhausts DuckDB temp disk at ~sf1 while the query itself is fine).
    #: The compare harness uses it ONLY as a fallback when the SQL oracle
    #: raises a non-assertion error, and labels the result
    #: "match (py-oracle)" so artifacts stay transparent about which
    #: oracle adjudicated. tests/test_graph.py proves py-oracle ≡ SQL
    #: oracle at fixture scale, so the fallback is itself differentially
    #: anchored to the primary.
    oracle_py: Callable | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
    scale_twin: str | None = None,
    oracle_py: Callable | None = None,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
            scale_twin=scale_twin,
            oracle_py=oracle_py,
        )
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    # Importing operator modules populates the registry.
    import spark_cherry_shuffle_service_spark.operators  # noqa: F401

    return dict(REGISTRY)


def get(name: str) -> QuerySpec:
    return all_specs()[name]
