"""Persisted sketch tables — compute once, roll up forever.

The sketch queries (queries/sketches.py q98/q99) show the per-query
form; this module makes the REUSE story a real code path, parallel to
the persisted IVF index (similarity.py): aggregate the fact table once
at its finest useful grain into a parquet table of fixed-size sketch
binaries, then answer any coarser distinct-count or quantile question
from that table alone.

Cost model at 100 TB: the fact scan happens once per refresh, not once
per question.  A sketch table at (day, source) grain for a year of data
is ~365×n_sources rows of 4 KB binaries — megabytes — and every rollup
(per-source totals, per-day totals, grand total, any subset of days)
is an aggregation over THAT, with map-side partial merge of sketches.

Mergeability guarantees (tested):
  * HLL union over per-group sketches estimates IDENTICALLY to
    sketching the full column directly (DataSketches HLL union is
    deterministic given the same input sets);
  * KLL merge keeps the rank guarantee — the merged sketch's quantile
    value has true normalized rank within the published ±epsilon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    path: str,
    lg_k: int = 12,
) -> None:
    """Aggregate ``df`` to one HLL sketch per ``group_cols`` group and
    persist as parquet.  One shuffle over the fact table — the last one
    any rollup from this table will ever need."""
    (
        df.groupBy(*group_cols)
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("hll_sketch"))
        .write.mode("overwrite")
        .parquet(path)
    )


def distinct_rollup(
    spark: SparkSession, path: str, *group_cols: str
) -> DataFrame:
    """Distinct-count estimates at any grain coarser than the table's.

    No fact-table access: unions the persisted sketches.  Empty
    ``group_cols`` → one grand-total row."""
    t = spark.read.parquet(path)
    agg = F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(
        "distinct_est"
    )
    if group_cols:
        return t.groupBy(*group_cols).agg(agg)
    return t.agg(agg)


def write_quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    path: str,
    k: int = 200,
) -> None:
    """Per-group KLL(double) sketches of ``value_col``, persisted."""
    (
        df.groupBy(*group_cols)
        .agg(
            F.kll_sketch_agg_double(value_col, F.lit(k)).alias("kll_sketch")
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def quantile_rollup(
    spark: SparkSession, path: str, quantile: float, *group_cols: str
) -> DataFrame:
    """Quantile estimates at any coarser grain by merging the persisted
    KLL sketches; rank accuracy follows the sketch's epsilon, not the
    rollup depth."""
    t = spark.read.parquet(path)
    agg = F.kll_sketch_get_quantile_double(
        F.kll_merge_agg_double("kll_sketch"), F.lit(quantile)
    ).alias("quantile_est")
    if group_cols:
        return t.groupBy(*group_cols).agg(agg)
    return t.agg(agg)
