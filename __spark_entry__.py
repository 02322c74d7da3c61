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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql for name, spec in all_queries().items() if spec.sql is not None
    }
