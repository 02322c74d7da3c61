"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on /root/testdata/sf0.001
queries()     -> one callable per declared operator (SURVEY.md §2)
oracle_sql()  -> DuckDB-equivalent ANSI SQL per query (None-sql queries
                 are omitted → driver records the rows-only check)

The registry lives in klio_spark/queries/ (behavior, vector_ops,
training, curation, sketches, dataqual, extra, textops, scalars2,
envelope_ops, advanced, relational — import order = driver iteration
order; never-driver-verified modules run first).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from klio_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _released(fn: Callable) -> Callable:
    """Release the PREVIOUS query's scoped caches before building the
    next plan. A handful of queries persist() interior frames (q160's
    oriented edges, q201's frequent pairs, ...) that a lazily-returned
    plan cannot unpersist itself; by the time the driver calls the next
    query the prior result is materialized, so its caches are dead
    weight — dropping them here keeps a 186-query session's storage
    bounded by ONE query's working set."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from klio_spark.queries import release_scoped_caches

        release_scoped_caches()
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _released(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in all_queries().items() if spec.sql is not None
    }
