"""Declared query registry — the SURVEY §2 operator inventory as runnable
(spark_fn, oracle_sql) pairs.

Each QuerySpec is one operator/capability claim: `fn(spark, sf_dir)` runs
the Spark-first implementation; `sql` is the ANSI equivalent DuckDB runs on
the same parquet (None → non-SQL-expressible, rows-only check).

Cross-engine numeric determinism rules (applied on BOTH sides):
  * per-row arithmetic stays in DOUBLE — IEEE ops on identical operands are
    bit-identical across engines;
  * every SUM of doubles is integerized per row first — FLOOR(x * 10^s) as
    BIGINT — then summed exactly and divided back. Plain double sums are
    order-dependent, and double→DECIMAL casts disagree between engines
    near scale-digit ties (Spark: exact BigDecimal expansion + HALF_UP;
    DuckDB: scale-multiply-then-round), but FLOOR of an identical double
    is identical everywhere;
  * AVG = (CAST(int_sum AS DOUBLE)/10^s)/count — IEEE divisions;
  * only genuinely iterative math (percentile interpolation, stddev sqrt,
    cosine) is rounded, at 6 digits.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *tables: str) -> list[DataFrame]:
    from pyspark.sql import functions as F

    out = []
    for t in tables:
        if t == "events":
            # events.parquet carries TIMESTAMP(NANOS) columns, which Spark
            # refuses to read (PARQUET_TYPE_ILLEGAL) unless this legacy flag
            # is on. session.py sets it at build time, but the correctness
            # driver constructs its own vanilla session — a runtime
            # spark.conf.set works on an existing session, so set it here,
            # immediately before the read resolves the schema.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            # events.parquet carries TIMESTAMP(NANOS) which Spark reads as
            # nanos-long under spark.sql.legacy.parquet.nanosAsLong (set in
            # session.py); truncate to micros (integer div — a double div
            # would lose precision above 2^53 ns).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out.append(df)
    return out


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect populates the registry, and import ORDER is the
    # dict order the driver iterates. Round 1's driver correctness run
    # truncated after 50 entries (time budget), and vector_ops — imported
    # last — never got verified. So modules whose queries have never been
    # driver-checked go FIRST; the r1-verified relational/advanced bulk
    # goes last, where a repeat truncation costs the least information.
    from klio_spark.queries import (  # noqa: F401
        behavior,
        vector_ops,
        training,
        curation,
        sketches,
        dataqual,
        extra,
        textops,
        scalars2,
        envelope_ops,
        advanced,
        relational,
    )

    return dict(_REGISTRY)
