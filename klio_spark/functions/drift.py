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

from pyspark.sql import DataFrame, Window
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


def ks_from_counts(c: DataFrame, key_col: str = "cents") -> DataFrame:
    """Exact Kolmogorov-Smirnov statistic from per-value counts.

    ``c`` carries one row per ordered value: (key_col, ca, cb) — counts
    in the reference (a) and comparison (b) populations. Returns ONE row
    (na, nb, ks_scaled, ks_at_<key>): ks_scaled = max |cuma·nb − cumb·na|
    — the KS numerator at scale na·nb, computed without any float CDF —
    and the first key value where the gap peaks (the drift LOCATION).
    The cumulative window is unpartitioned but runs over the value
    DOMAIN (c is already aggregated), not the corpus; scalar totals
    broadcast. Shared by q162's batch query and
    ``streaming.streaming_ks_drift``, so the batch oracle hash-verifies
    the streaming monitor's arithmetic (the psi_from_counts pattern).
    """
    n = c.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    w = Window.orderBy(key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k = (
        c.withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_gap",
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")),
        )
    )
    mx = k.agg(F.max("_gap").alias("_mx"))
    return (
        k.crossJoin(F.broadcast(mx))
        .filter(F.col("_gap") == F.col("_mx"))
        .groupBy("na", "nb")
        .agg(
            F.max("_mx").cast("bigint").alias("ks_scaled"),
            F.min(key_col).cast("bigint").alias(f"ks_at_{key_col}"),
        )
    )
