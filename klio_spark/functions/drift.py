"""Distribution-drift kernels shared by the batch query surface and the
streaming monitors.

The PSI arithmetic lives here ONCE so that q139 (the hash-checked batch
query) and ``klio_spark.streaming.streaming_psi_drift`` (the live
monitor) are provably the same computation: the streaming path's
finalize calls the very function the DuckDB differential oracle verifies
every round.

Integerization contract (klio_spark.queries module doc): shares become
parts-per-million via integer floor-division (bounded by 1e6 at ANY
corpus size — the raw-count cross products a naive PSI multiplies would
overflow int64 at ~1e12 events), and the log-ratio is floor-integerized
from an IEEE double both engines compute identically. Types whose share
floors to 0 ppm in either side are excluded (standard practice for the
unbounded PSI term; also keeps ln() total on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_from_counts(c: DataFrame, key_col: str = "event_type") -> DataFrame:
    """PSI contribution per category from a counts frame.

    ``c`` carries one row per category: (key_col, ca, cb) — the category's
    count in the reference (a) and comparison (b) populations. Returns
    (key_col, ca, cb, pa_ppm, qb_ppm, psi_contrib), all exact int64; the
    total PSI (in 1e-12 units) is SUM(psi_contrib) — callers keep the
    per-category rows because drift triage needs to know WHICH category
    moved. Two scalar totals broadcast; nothing else shuffles beyond the
    |categories|-row frame itself.
    """
    n = c.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    s = (
        c.crossJoin(F.broadcast(n))
        .withColumn("pa", F.expr("(1000000 * ca) div na"))
        .withColumn("qb", F.expr("(1000000 * cb) div nb"))
        # cut on the INTEGERIZED shares, not raw counts: a sub-ppm share
        # floors to 0 and ln(0) diverges between engines (see module doc)
        .filter((F.col("pa") > 0) & (F.col("qb") > 0))
    )
    iln = F.floor(
        F.lit(1000000.0)
        * F.log(F.col("pa").cast("double") / F.col("qb").cast("double"))
    ).cast("bigint")
    return s.select(
        key_col,
        "ca",
        "cb",
        F.col("pa").cast("bigint").alias("pa_ppm"),
        F.col("qb").cast("bigint").alias("qb_ppm"),
        ((F.col("pa") - F.col("qb")) * iln).cast("bigint").alias("psi_contrib"),
    )
