"""Data-quality constraints and snapshot reconciliation — the audit ops a
production pipeline runs before and after every load.

Both are single-pass aggregations (Deequ-style): every constraint is an
ordinary Catalyst expression folded into ONE scan of the table, so a
100-constraint suite over 100 TB costs one read, not 100. Referential
checks are anti-join counts; snapshot diffs are one full-outer join on
the key comparing row hashes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.queries import load, register, scoped_persist


@register(
    "q103_quality_constraints",
    """
    WITH s AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(*) - COUNT(o_custkey) AS null_custkey,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_orderkey,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
               SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status
        FROM orders
    ), r AS (
        SELECT COUNT(*) AS orphan_lineitems
        FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    )
    SELECT check_name, CAST(violations AS BIGINT) AS violations,
           violations = 0 AS passed
    FROM (
        SELECT 'custkey_not_null' AS check_name, null_custkey AS violations FROM s
        UNION ALL SELECT 'orderkey_unique', dup_orderkey FROM s
        UNION ALL SELECT 'totalprice_positive', nonpos_price FROM s
        UNION ALL SELECT 'status_in_domain', bad_status FROM s
        UNION ALL SELECT 'lineitem_fk_orders', orphan_lineitems FROM r
    )
    """,
    doc="Deequ-style constraint suite: completeness (not-null), uniqueness, "
    "range, domain, and referential integrity as ONE aggregation pass over "
    "orders plus one anti-join count for the FK check — constraints are "
    "expressions folded into a single scan, so suites scale with table "
    "bytes, not with the number of checks. Output: one row per constraint "
    "with its violation count and pass flag.",
)
def q103_quality_constraints(spark: SparkSession, sf_dir: str):
    o, li = load(spark, sf_dir, "orders", "lineitem")
    s = o.agg(
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_custkey"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "dup_orderkey"
        ),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("nonpos_price"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
        ).alias("bad_status"),
    )
    r = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    row = s.crossJoin(r)
    checks = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.col(col).alias("violations"),
            )
            for name, col in (
                ("custkey_not_null", "null_custkey"),
                ("orderkey_unique", "dup_orderkey"),
                ("totalprice_positive", "nonpos_price"),
                ("status_in_domain", "bad_status"),
                ("lineitem_fk_orders", "orphan_lineitems"),
            )
        ]
    )
    return row.select(F.explode(checks).alias("_c")).select(
        "_c.check_name",
        "_c.violations",
        (F.col("_c.violations") == 0).alias("passed"),
    )


@register(
    "q105_fuzzy_name_match",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
    doc="entity-resolution fuzzy match: candidate name pairs within edit "
    "distance 3, blocked on the first token so the join is equi (never a "
    "cross join) and levenshtein — JVM codegen — runs only inside blocks. "
    "The dedup-then-join order is the scale lever: matching runs on the "
    "DISTINCT name dimension (64 rows here; ~always orders of magnitude "
    "under the fact count), and results re-attach to facts by equi-join. "
    "Both engines implement classic unweighted Levenshtein, so the "
    "distances hash-match exactly.",
)
def q105_fuzzy_name_match(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    names = p.select("p_name").distinct().withColumn(
        "_blk", F.substring_index("p_name", " ", 1)
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn(
            "dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        )
        .filter(F.col("dist") <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("dist").cast("int").alias("dist"),
        )
    )


@register(
    "q104_snapshot_diff",
    """
    WITH old AS (SELECT * FROM orders WHERE o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
         new AS (SELECT * FROM orders WHERE o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
                                        AND o_orderkey % 97 <> 0)
    SELECT change, CAST(n AS BIGINT) AS n FROM (
        SELECT 'added' AS change, COUNT(*) AS n
        FROM new WHERE o_orderkey NOT IN (SELECT o_orderkey FROM old)
        UNION ALL
        SELECT 'removed', COUNT(*)
        FROM old WHERE o_orderkey NOT IN (SELECT o_orderkey FROM new)
        UNION ALL
        SELECT 'unchanged', COUNT(*)
        FROM old o JOIN new n USING (o_orderkey)
    )
    """,
    doc="snapshot reconciliation: one full-outer join on the key classifies "
    "every row as added/removed/unchanged between two table versions (the "
    "daily-load sanity diff). Both snapshots come from one cached scan; "
    "at scale the join keys co-partition, and comparing xxhash64 row "
    "digests instead of all columns keeps the shuffle narrow. The mod-97 "
    "cut simulates deletions so all three classes are non-empty.",
)
def q104_snapshot_diff(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    new = o.filter(
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderkey") % 97 != 0)
    )
    j = old.select(F.col("o_orderkey").alias("k"), F.lit(True).alias("_o")).join(
        new.select(F.col("o_orderkey").alias("k"), F.lit(True).alias("_n")),
        "k",
        "full",
    )
    return (
        j.select(
            F.when(F.col("_o").isNull(), "added")
            .when(F.col("_n").isNull(), "removed")
            .otherwise("unchanged")
            .alias("change")
        )
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_PROF_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


@register(
    "q115_table_profile",
    """
    WITH a AS (
      SELECT COUNT(*) AS n_rows,
             """
    + ",\n             ".join(
        f"COUNT(*) - COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c}"
        for c in _PROF_COLS
    )
    + """
      FROM customer
    )
    """
    + "\n    UNION ALL\n    ".join(
        f"SELECT '{c}' AS col_name, CAST(nn_{c} AS BIGINT) AS n_nulls,"
        f" CAST(nd_{c} AS BIGINT) AS n_distinct, n_rows FROM a"
        for c in _PROF_COLS
    ),
    doc="one-scan table profiler (the describe/summarize surface every "
    "warehouse tool ships): per column, null count + EXACT distinct "
    "count + table rows, emitted long-form via stack(). The multi-column "
    "COUNT DISTINCT compiles to one Expand (rows × columns) feeding one "
    "partial-aggregated shuffle — still a single scan of the table. At "
    "100 TB swap exact distinct for the HLL sketch variant (q98): same "
    "shape, fixed-size state, ±2%.",
)
def q115_table_profile(spark: SparkSession, sf_dir: str):
    (c,) = load(spark, sf_dir, "customer")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in _PROF_COLS:
        aggs.append(
            F.sum(F.col(col).isNull().cast("long")).alias(f"nn_{col}")
        )
        aggs.append(F.count_distinct(F.col(col)).alias(f"nd_{col}"))
    one = c.agg(*aggs)
    stack = ", ".join(
        f"'{col}', nn_{col}, nd_{col}" for col in _PROF_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROF_COLS)}, {stack}) AS (col_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    )


@register(
    "q143_skew_profile",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
    s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(MAX(cnt) AS BIGINT) AS max_cnt
          FROM c),
    r AS (SELECT user_id, cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rn
          FROM c)
    SELECT r.user_id, CAST(r.cnt AS BIGINT) AS cnt,
           CAST(r.cnt * 10000 // s.total AS BIGINT) AS share_bp,
           s.n_keys,
           (s.max_cnt * s.n_keys > 4 * s.total) AS skew_flagged
    FROM r CROSS JOIN s WHERE r.rn <= 5
    """,
    doc="shuffle-key skew diagnostics — the planning input for the "
    "salted-join path (q35) and AQE skew thresholds: per-key cardinality "
    "profile of the events join key, reporting the 5 hottest keys with "
    "their share in integer basis points, the distinct-key count, and a "
    "skew verdict (hottest key > 4x the mean key). At scale this is one "
    "hash agg on the key (the same shuffle the real join would pay, "
    "minus the payload) + a 1-row stats broadcast; the top-5 rides "
    "TakeOrderedAndProject over key-count pairs, so nothing "
    "corpus-sized reaches the driver. Run it BEFORE a big join: "
    "skew_flagged=true is the signal to salt or raise AQE's skewed-"
    "partition factor.",
)
def q143_skew_profile(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    s = c.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    # asc_nulls_last matches DuckDB's ASC default (NULLS LAST); Spark's
    # bare asc is NULLS FIRST, which would flip the rank-5 boundary when
    # a NULL user_id group ties there.
    top = c.orderBy(F.desc("cnt"), F.asc_nulls_last("user_id")).limit(5)
    return top.crossJoin(F.broadcast(s)).select(
        "user_id",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.expr("(cnt * 10000) div total").cast("bigint").alias("share_bp"),
        "n_keys",
        (F.col("max_cnt") * F.col("n_keys") > 4 * F.col("total")).alias(
            "skew_flagged"
        ),
    )


@register(
    "q150_length_outliers",
    """
    WITH s AS (
      SELECT source, COUNT(*) AS n, SUM(n_chars) AS sm,
             SUM(n_chars * n_chars) AS sq
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM documents d JOIN s USING (source)
    WHERE CAST(CAST(d.n_chars AS HUGEINT) * s.n - s.sm AS DOUBLE)
          * CAST(CAST(d.n_chars AS HUGEINT) * s.n - s.sm AS DOUBLE)
          > 4.0 * (CAST(s.n AS DOUBLE) * CAST(s.sq AS DOUBLE)
                   - CAST(s.sm AS DOUBLE) * CAST(s.sm AS DOUBLE))
    """,
    doc="per-source document-length outliers (|x - mean| > 2 sigma) — "
    "the scrape-anomaly screen (truncated fetches, concatenated pages, "
    "boilerplate explosions) run per source because length is "
    "source-relative. No float mean/stddev subtraction: the z>2 test is "
    "cross-multiplied to (n*x - sum)^2 > 4*(n*sumsq - sum^2), with the "
    "integer parts computed EXACTLY (bigint on Spark, hugeint in the "
    "oracle) and each factor cast to double individually before the "
    "final IEEE multiply-compare, so both engines round the same tree "
    "the same way (the q122 trick). One scan aggregates the ≤|sources| "
    "stat rows; the rejoin broadcasts them — a map-side filter at any "
    "scale.",
)
def q150_length_outliers(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    # decimal(38,0) is Spark's counterpart of the HUGEINT DuckDB's SUM
    # promotes to: the square and both sums stay exact (no int64 wrap,
    # no ANSI abort) for any corpus whose totals fit 38 digits, and
    # decimal aggregation is order-independent so the hash stays stable
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("sm"),
        F.sum(
            F.col("n_chars").cast("decimal(19,0)")
            * F.col("n_chars").cast("decimal(19,0)")
        ).alias("sq"),
    )
    # the product must go exact BEFORE the subtract: raw bigint
    # n_chars*n wraps (Spark) or aborts (DuckDB) once max(n_chars)*rows
    # crosses 2^63 — decimal(38,0) matches the oracle's HUGEINT
    z = F.expr("CAST(CAST(n_chars AS DECIMAL(38,0)) * n - sm AS DOUBLE)")
    rhs = 4.0 * (
        F.col("n").cast("double") * F.col("sq").cast("double")
        - F.col("sm").cast("double") * F.col("sm").cast("double")
    )
    return (
        d.join(F.broadcast(s), "source")
        .filter(z * z > rhs)
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"))
    )


@register(
    "q155_winsorize",
    """
    WITH v AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    b AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.05), 6) AS lo,
             ROUND(quantile_cont(value, 0.95), 6) AS hi
      FROM v GROUP BY event_type
    )
    SELECT v.event_type, b.lo, b.hi,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN v.value < b.lo OR v.value > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(SUM(CAST(FLOOR(LEAST(GREATEST(v.value, b.lo), b.hi) * 100.0)
                         AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)
             AS winsor_mean
    FROM v JOIN b USING (event_type)
    GROUP BY v.event_type, b.lo, b.hi
    """,
    doc="per-type winsorization (clip at p05/p95) with the clipped mean — "
    "the outlier-robust normalization step before any scale-sensitive "
    "model feature. Two passes by nature: an exact percentile agg (tiny "
    "result, broadcast back) then one clip-and-aggregate scan; at 100 TB "
    "the first pass swaps to the KLL sketch (q99) without changing the "
    "join shape. The thresholds are rounded at 6 digits on BOTH engines "
    "(the q07 interpolation rule) so the clip boundary is the identical "
    "double everywhere; clipped sums are integerized per row before "
    "summation.",
)
def q155_winsorize(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    v = e.filter(F.col("value").isNotNull()).select("event_type", "value")
    b = v.groupBy("event_type").agg(
        F.round(
            F.percentile("value", F.array(F.lit(0.05), F.lit(0.95)))[0], 6
        ).alias("lo"),
        F.round(
            F.percentile("value", F.array(F.lit(0.05), F.lit(0.95)))[1], 6
        ).alias("hi"),
    )
    clip = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        v.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                (
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi"))
                ).cast("long")
            ).cast("bigint").alias("n_clipped"),
            (
                F.sum(F.floor(clip * 100.0).cast("bigint")).cast("double")
                / 100.0
                / F.count(F.lit(1))
            ).alias("winsor_mean"),
        )
        .select(
            "event_type", "lo", "hi", "n", "n_clipped", "winsor_mean"
        )
    )


@register(
    "q162_ks_drift",
    """
    WITH e AS (
      SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    b AS (SELECT MIN(us) AS t0, MAX(us) AS t1 FROM e),
    t AS (
      SELECT cents,
             CASE WHEN e.us - b.t0 < (b.t1 - b.t0) // 2
                  THEN 0 ELSE 1 END AS half
      FROM e CROSS JOIN b
    ),
    c AS (
      SELECT cents,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM t GROUP BY cents
    ),
    n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM c),
    k AS (
      SELECT cents,
             SUM(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cuma,
             SUM(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cumb
      FROM c
    )
    SELECT n.na, n.nb,
           CAST(MAX(ABS(k.cuma * n.nb - k.cumb * n.na)) AS BIGINT)
             AS ks_scaled,
           CAST(MIN(CASE WHEN ABS(k.cuma * n.nb - k.cumb * n.na) =
                         (SELECT MAX(ABS(k2.cuma * n.nb - k2.cumb * n.na))
                          FROM k k2)
                    THEN k.cents END) AS BIGINT) AS ks_at_cents
    FROM k CROSS JOIN n GROUP BY n.na, n.nb
    """,
    doc="Kolmogorov-Smirnov drift statistic over the value distribution "
    "across the stream's temporal midpoint — the distribution-shape "
    "companion of q139's categorical PSI (PSI sees mix shifts; KS sees "
    "a price distribution silently doubling). KS = max |CDF_a - CDF_b| "
    "is computed EXACTLY in integers: values floor to cents (already "
    "exact for 2-decimal money), per-cent counts cross-multiply — "
    "|cuma*nb - cumb*na|, the KS numerator at scale na*nb — so no "
    "float CDF ever forms, and ks_at_cents reports the first value at "
    "which the max gap occurs (the drift LOCATION, which triage needs). "
    "Scale shape: the fact table collapses to one row per distinct cent "
    "value (bounded by the value DOMAIN, not the corpus), so the "
    "unpartitioned cumulative window — normally a red flag — runs over "
    "a domain-bounded frame after a map-side-combinable agg; the scalar "
    "totals broadcast.",
)
def q162_ks_drift(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    e = ev.filter(F.col("ts").isNotNull() & F.col("value").isNotNull()).select(
        F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
        F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)").alias(
            "_us"
        ),
    )
    b = e.agg(F.min("_us").alias("t0"), F.max("_us").alias("t1"))
    t = e.crossJoin(F.broadcast(b)).select(
        "cents",
        (
            F.col("_us") - F.col("t0")
            < F.expr("(t1 - t0) div 2")
        ).alias("_first"),
    )
    c = t.groupBy("cents").agg(
        F.sum(F.col("_first").cast("int")).cast("bigint").alias("ca"),
        F.sum((~F.col("_first")).cast("int")).cast("bigint").alias("cb"),
    )
    # the KS finalize is the SHARED kernel (functions/drift.py): the
    # streaming monitor (streaming_ks_drift) finalizes its live counts
    # through this exact function, so this query's DuckDB oracle
    # verifies the streaming math too (the q139/psi pattern)
    from klio_spark.functions.drift import ks_from_counts

    return ks_from_counts(c, "cents")


@register(
    "q163_cusum_changepoint",
    """
    WITH e AS (
      SELECT (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
             // 86400000000 - 719162 AS d
      FROM events WHERE ts IS NOT NULL
    ),
    c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY d),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(n) AS BIGINT) AS total FROM c),
    s AS (
      SELECT c.d,
             SUM(c.n * t.nd - t.total) OVER (
               ORDER BY c.d ROWS UNBOUNDED PRECEDING) AS cusum
      FROM c CROSS JOIN t
    ),
    mx AS (SELECT MAX(ABS(cusum)) AS m FROM s)
    SELECT t.nd AS n_days, t.total AS total_events,
           CAST(MIN(s.d) AS BIGINT) AS change_day,
           CAST(mx.m AS BIGINT) AS cusum_scaled
    FROM s CROSS JOIN mx CROSS JOIN t
    WHERE ABS(s.cusum) = mx.m
    GROUP BY t.nd, t.total, mx.m
    """,
    doc="CUSUM change-point localization over daily event volume — the "
    "WHEN of the drift trio (q139 PSI: which categories shifted; q162 "
    "KS: how much the value distribution moved; this: the day the "
    "level changed). The cumulative deviation from the overall mean is "
    "computed EXACTLY by cross-multiplication — S_i = Σ(n_d·D − total) "
    "= D·(cumsum − i·mean) in integers, no float mean ever forms — and "
    "the change point is the day |S| peaks (Page's CUSUM with the "
    "retrospective single-changepoint estimator). Day ids floor via "
    "the year-1 shift (pre-1970-safe). Scale shape: the fact table "
    "collapses to one row per DAY before the cumulative window, so "
    "the unpartitioned cumsum runs over the bounded day domain; "
    "scalar totals broadcast (the q162 discipline).",
)
def q163_cusum_changepoint(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    e = ev.filter(F.col("ts").isNotNull()).select(
        F.expr(
            "(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            " + 62135596800000000) div 86400000000 - 719162"
        ).alias("d")
    )
    c = e.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("n").cast("bigint").alias("total"),
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        c.crossJoin(F.broadcast(t))
        .withColumn("cusum", F.sum(F.col("n") * F.col("nd") - F.col("total")).over(w))
    )
    mx = s.agg(F.max(F.abs(F.col("cusum"))).alias("m"))
    return (
        s.crossJoin(F.broadcast(mx))
        .filter(F.abs(F.col("cusum")) == F.col("m"))
        .groupBy("nd", "total", "m")
        .agg(F.min("d").cast("bigint").alias("change_day"))
        .select(
            F.col("nd").alias("n_days"),
            F.col("total").alias("total_events"),
            "change_day",
            F.col("m").cast("bigint").alias("cusum_scaled"),
        )
    )


@register(
    "q180_mad_outliers",
    """
    WITH v AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x
      FROM documents WHERE n_chars IS NOT NULL
    ),
    r1 AS (
      SELECT source, doc_id, x,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM v
    ),
    med AS (
      SELECT source, x AS med FROM r1 WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT v.source, v.doc_id, v.x, ABS(v.x - m.med) AS adev, m.med
      FROM v JOIN med m USING (source)
    ),
    r2 AS (
      SELECT source, adev, med,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY adev, doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM dev
    ),
    mad AS (
      SELECT source, med, adev AS mad FROM r2 WHERE rn = (n + 1) // 2
    )
    SELECT d.source, CAST(m.med AS BIGINT) AS med,
           CAST(m.mad AS BIGINT) AS mad,
           CAST(COUNT(*) FILTER (
             WHERE ABS(d.x - m.med) * 10000 > 3 * 14826 * m.mad
           ) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM dev d JOIN mad m USING (source)
    GROUP BY d.source, m.med, m.mad
    """,
    doc="robust outlier screen via median absolute deviation — the "
    "screen that survives the contamination that wrecks q150's "
    "mean/stddev z-test (one 10 GB document shifts a mean; it cannot "
    "shift a median). Medians are EXACT lower-middle order statistics "
    "(row_number = (n+1)//2 with doc_id tie-break) rather than "
    "interpolated percentiles, because Spark and DuckDB interpolate "
    "even-count medians differently — the order-statistic definition "
    "is engine-portable and integer-exact, and the 1.4826 consistency "
    "constant enters as the integer cross-multiplication "
    "|x-med|*10000 > 3*14826*mad, so no float ever forms. Cost shape: "
    "two (source)-window passes (rank to find each median) + one "
    "broadcast-back join each — at 100 TB medians-by-key would move "
    "to the persisted KLL tables (sketch_table.py) with this exact "
    "query as the referee.",
)
def q180_mad_outliers(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    # NULL n_chars would silently shift the median-rank row cross-engine
    # (Spark sorts NULLS FIRST asc, DuckDB NULLS LAST) — filter explicitly
    v = d.filter(F.col("n_chars").isNotNull()).select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("x")
    )
    w1 = Window.partitionBy("source").orderBy("x", "doc_id")
    wn = Window.partitionBy("source")
    r1 = v.select(
        "source", "x",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = r1.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "source", F.col("x").alias("med")
    )
    dev = v.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    w2 = Window.partitionBy("source").orderBy("adev", "doc_id")
    r2 = dev.select(
        "source", "adev", "med",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = r2.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "source", F.col("adev").alias("mad")
    )
    out = dev.join(F.broadcast(mad), "source")
    return out.groupBy("source", "med", "mad").agg(
        F.sum(
            (
                F.abs(F.col("x") - F.col("med")) * 10000
                > 3 * 14826 * F.col("mad")
            ).cast("bigint")
        ).alias("n_outliers"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    ).select(
        "source",
        F.col("med").cast("bigint").alias("med"),
        F.col("mad").cast("bigint").alias("mad"),
        "n_outliers",
        "n_docs",
    )


@register(
    "q200_k_anonymity",
    """
    WITH g AS (
      SELECT lang, source, COALESCE(n_chars // 100, -1) AS size_bucket,
             COUNT(*) AS k
      FROM documents
      GROUP BY 1, 2, 3
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_5,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 10000
                // SUM(k) AS BIGINT) AS risk_bp
    FROM g GROUP BY lang
    """,
    doc="k-anonymity audit over quasi-identifiers (lang, source, "
    "100-char size bucket) — the privacy / release-governance check a "
    "training-data pipeline runs before publishing corpus statistics: "
    "a row whose QI combination is shared by fewer than k others is "
    "re-identifiable from 'anonymous' metadata (Sweeney 2002). Per "
    "language: group count, the smallest group (the weakest k), how "
    "many groups and rows sit below k=5, and the at-risk share in "
    "integer basis points. NULL n_chars is its own bucket (-1): NULL "
    "metadata is itself an identifying shape. BOTH engines coalesce "
    "AFTER the division (NULL div 100 stays NULL, then -1) — "
    "coalescing before would route the sentinel through integer "
    "division, where Spark truncates and DuckDB also truncates but "
    "any negative-sentinel arithmetic is a parity trap the "
    "differential corpus catches; non-null n_chars >= 0 is the only "
    "thing ever divided. "
    "Shape: two map-side-combinable aggs, zero joins, zero shuffles "
    "beyond the (lang, source, bucket) and lang exchanges.",
)
def q200_k_anonymity(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    # NOTE on the NULL bucket: Spark `div` truncates toward zero while
    # DuckDB `//` floors, so feeding -1 INTO the division would bucket
    # differently (-1 div 100 = 0 vs -1 // 100 = -1). Both sides
    # therefore bucket NULL AFTER the division: non-null n_chars are
    # >= 0 where truncate == floor, and NULL maps straight to -1.
    g = d.groupBy(
        "lang",
        "source",
        F.coalesce(
            F.expr("n_chars div 100"), F.lit(-1)
        ).alias("size_bucket"),
    ).agg(F.count(F.lit(1)).alias("k"))
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_5"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.expr(
            "CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) * 10000"
            " div SUM(k) AS BIGINT)"
        ).alias("risk_bp"),
    )


@register(
    "q208_l_diversity",
    """
    WITH g AS (
      SELECT c_nationkey,
             CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
             COUNT(*) AS k,
             COUNT(DISTINCT c_mktsegment) AS l
      FROM customer
      GROUP BY 1, 2
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_3,
           CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) * 10000
                // SUM(k) AS BIGINT) AS risk_bp
    FROM g GROUP BY c_nationkey
    """,
    doc="l-diversity audit — the companion check to q200's k-anonymity "
    "(Machanavajjhala 2007): a quasi-identifier group can be large (high "
    "k) yet still leak if every member shares the same SENSITIVE value, "
    "so the release gate also requires >= l distinct sensitive values "
    "per group. Quasi-identifiers here are (nation, 1000-unit account "
    "balance bucket); the sensitive attribute is market segment. Per "
    "nation: group count, the weakest l, how many groups and rows sit "
    "below l=3, and the at-risk row share in integer basis points. "
    "FLOOR of an identical double is identical on both engines (the "
    "registry determinism rule), so negative balances bucket the same "
    "way everywhere. Shape: two map-side-combinable aggs (the inner one "
    "carries a distinct on a 5-value column — partial aggs stay tiny), "
    "zero joins; at 100 TB this is one scan of customer.",
)
def q208_l_diversity(spark: SparkSession, sf_dir: str):
    (c,) = load(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.count_distinct("c_mktsegment").alias("l"),
    )
    return g.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_3"),
        F.sum(F.when(F.col("l") < 3, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.expr(
            "CAST(SUM(CASE WHEN l < 3 THEN k ELSE 0 END) * 10000"
            " div SUM(k) AS BIGINT)"
        ).alias("risk_bp"),
    )


# Shared deterministic (confidence, label) construction for the model-
# evaluation audits (q222 ECE / q223 AUC / q224 kappa): confidence that a
# document is "long-form" = clipped length in ppm (LEAST(n_chars,2000)*500,
# exact integer); the ground-truth label is drawn CALIBRATED-BY-
# CONSTRUCTION from that confidence via a Knuth multiplicative hash of
# doc_id — label = 1 iff hash_u32 * 1e6 < conf_ppm * 2^32, all int64
# (bounds: conf_ppm*2^32 <= 4.3e15 and hash*1e6 <= 4.3e15; doc_id is
# reduced mod 2^31 BEFORE the Knuth multiply — the q112/q231/q240
# convention — so the product fits int64 for ANY surrogate id: the
# unreduced form raised ARITHMETIC_OVERFLOW at the 10x-amplified sf1
# rehearsal, whose id stride pushes doc_id past 3.4e9, exactly as
# ADVICE r7 predicted). Identical integer expressions evaluate
# identically on both engines, so the synthetic eval set is
# bit-identical everywhere.
_CONF_LABEL_SQL = """
      SELECT LEAST(COALESCE(n_chars, 0), 2000) * 500 AS conf_ppm,
             CASE WHEN (((COALESCE(doc_id, 0) % 2147483648) * 2654435761)
                        % 4294967296)
                       * 1000000
                       < LEAST(COALESCE(n_chars, 0), 2000) * 500 * 4294967296
                  THEN 1 ELSE 0 END AS label
      FROM documents
"""


def _conf_label(d):
    """Spark twin of _CONF_LABEL_SQL (same integer expressions)."""
    conf = (
        F.least(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(2000)) * 500
    ).cast("bigint")
    h = F.expr(
        "(((COALESCE(doc_id, 0) % 2147483648) * 2654435761) % 4294967296)"
    )
    return d.select(
        conf.alias("conf_ppm"),
        F.when(h * 1000000 < conf * 4294967296, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("label"),
    )


@register(
    "q222_calibration_ece",
    f"""
    WITH scored AS ({_CONF_LABEL_SQL}),
    bins AS (
      SELECT LEAST(conf_ppm // 100000, 9) AS bin_id,
             COUNT(*) AS n,
             SUM(conf_ppm) AS sum_conf,
             SUM(label) AS n_pos
      FROM scored GROUP BY 1
    ),
    gaps AS (
      SELECT bin_id, n, n_pos,
             sum_conf // n AS conf_ppm,
             n_pos * 1000000 // n AS acc_ppm,
             ABS(sum_conf // n - n_pos * 1000000 // n) AS gap_ppm
      FROM bins
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id, CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(conf_ppm AS BIGINT) AS conf_ppm,
           CAST(acc_ppm AS BIGINT) AS acc_ppm,
           CAST(gap_ppm AS BIGINT) AS gap_ppm,
           CAST(SUM(n * gap_ppm) OVER () // SUM(n) OVER () AS BIGINT)
             AS ece_ppm
    FROM gaps
    """,
    doc="Calibration reliability diagram + Expected Calibration Error "
    "(Guo et al. ICML 2017 — the standard audit before a quality-"
    "classifier's scores gate a data pipeline): 10 equal-width "
    "confidence bins, per bin the mean confidence vs realized accuracy "
    "(both integer ppm) and |gap|, plus the n-weighted ECE replicated "
    "on every row. The eval set is the shared calibrated-by-"
    "construction (conf, label) table (see _CONF_LABEL_SQL), so "
    "measured ECE is pure binning + sampling noise — and exactly equal "
    "cross-engine because every step is int64. Shape: one scan, one "
    "10-row map-side agg; the OVER () window runs on <= 10 rows "
    "(bin-count-bounded, never data-bounded) — the whole audit is a "
    "single pass at any corpus size.",
)
def q222_calibration_ece(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    bins = (
        _conf_label(d)
        .groupBy(
            F.least(F.expr("conf_ppm div 100000"), F.lit(9)).alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("conf_ppm").alias("sum_conf"),
            F.sum("label").alias("n_pos"),
        )
    )
    gaps = bins.select(
        F.col("bin_id").cast("bigint"),
        F.col("n").cast("bigint"),
        F.col("n_pos").cast("bigint"),
        F.expr("sum_conf div n").cast("bigint").alias("conf_ppm"),
        F.expr("n_pos * 1000000 div n").cast("bigint").alias("acc_ppm"),
        F.expr("abs(sum_conf div n - n_pos * 1000000 div n)")
        .cast("bigint")
        .alias("gap_ppm"),
    )
    # the unpartitioned window runs over <= 10 bin rows (bin-count-
    # bounded by construction), never over the corpus
    w = Window.partitionBy()
    return (
        gaps.withColumn(
            "_num", F.sum(F.col("n") * F.col("gap_ppm")).over(w)
        )
        .withColumn("_den", F.sum("n").over(w))
        .withColumn("ece_ppm", F.expr("CAST(_num div _den AS BIGINT)"))
        .drop("_num", "_den")
    )


@register(
    "q223_ranking_auc",
    f"""
    WITH scored AS ({_CONF_LABEL_SQL}),
    hist AS (
      SELECT conf_ppm,
             COUNT(*) AS n,
             SUM(label) AS pos,
             COUNT(*) - SUM(label) AS neg
      FROM scored GROUP BY 1
    ),
    cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY conf_ppm
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS neg_below
      FROM hist
    ),
    agg AS (
      SELECT SUM(pos) AS n_pos, SUM(neg) AS n_neg,
             SUM(pos * (2 * neg_below + neg)) AS u2
      FROM cum
    )
    SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
           CAST(u2 AS BIGINT) AS u2,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN ROUND(CAST(u2 AS DOUBLE)
                           / (2.0 * CAST(n_pos AS DOUBLE)
                              * CAST(n_neg AS DOUBLE)), 6)
           END AS auc_r6
    FROM agg
    """,
    doc="ROC AUC of a score against binary labels via the Mann-Whitney "
    "rank-sum identity with EXACT tie handling — the threshold-free "
    "quality-classifier metric every filtering pipeline reports. "
    "Instead of the textbook global RANK() (a full-corpus single-"
    "partition sort), the score domain is bounded by construction "
    "(conf_ppm has <= 2001 distinct values), so AUC folds into a "
    "histogram: U2 = 2*U = SUM over score values of pos_v * "
    "(2*cum_neg_below + neg_v) — one map-side groupBy(conf_ppm), one "
    "window over the <= 2001-row histogram, one scalar agg; the oracle "
    "computes the same U2 from the identical histogram (ties contribute "
    "neg_v/2 each, exactly, via the x2 integerization). u2 is exact "
    "int64 for corpora up to ~4.2e9 scored rows (U2 <= 2*P*N <= n^2/2 "
    "< 2^63); the final AUC is ONE IEEE division of identical int-"
    "derived doubles, rounded at 6 (the registry rule for genuinely "
    "non-integer results). Degenerate single-class corpora emit NULL.",
)
def q223_ranking_auc(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    hist = (
        _conf_label(d)
        .groupBy("conf_ppm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("pos"),
        )
        .withColumn("neg", F.col("n") - F.col("pos"))
    )
    # ordered window over the value histogram: <= 2001 rows by
    # construction (conf_ppm = LEAST(n_chars,2000)*500), never the corpus
    w = Window.orderBy("conf_ppm").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    agg = cum.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("n") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos")
            * (2 * F.col("neg_below") + (F.col("n") - F.col("pos")))
        )
        .cast("bigint")
        .alias("u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("u2").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n_pos").cast("double")
                    * F.col("n_neg").cast("double")
                ),
                6,
            ),
        ).alias("auc_r6"),
    )


@register(
    "q224_cohen_kappa",
    """
    WITH rated AS (
      SELECT CASE WHEN COALESCE(n_chars, 0) >= 600 THEN 1 ELSE 0 END AS a,
             CASE WHEN (((COALESCE(doc_id, 0) % 2147483648) * 1099087573)
                        % 4294967296)
                       % 2000
                       < LEAST(COALESCE(n_chars, 0), 2000)
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cells AS (
      SELECT COUNT(*) AS n,
             SUM(a * b) AS n11,
             SUM(a * (1 - b)) AS n10,
             SUM((1 - a) * b) AS n01,
             SUM((1 - a) * (1 - b)) AS n00
      FROM rated
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           ROUND(po, 6) AS po_r6, ROUND(pe, 6) AS pe_r6,
           CASE WHEN pe <> 1.0
                THEN ROUND((po - pe) / (1.0 - pe), 6) END AS kappa_r6
    FROM (
      SELECT n, n11, n10, n01, n00,
             (CAST(n11 AS DOUBLE) + CAST(n00 AS DOUBLE)) / CAST(n AS DOUBLE)
               AS po,
             (CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))
             + (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)) AS pe
      FROM cells
    )
    """,
    doc="Cohen's kappa inter-annotator agreement (Cohen 1960) — the "
    "chance-corrected agreement statistic every labeling/rating pipeline "
    "reports before trusting labels: rater A = a hard length gate "
    "(n_chars >= 600), rater B = a noisy length rater (label 1 with "
    "probability ~ n_chars/2000 via a deterministic Knuth-hash draw on "
    "doc_id — a different multiplier than q222's so the raters disagree "
    "realistically). The 2x2 confusion table folds into ONE map-side "
    "scan agg (four integer sums); po/pe/kappa are IEEE ops on "
    "identical int-derived doubles — each marginal is divided by n "
    "BEFORE multiplying, so nothing exceeds int64 at any corpus size — "
    "rounded at 6 per the registry rule. Perfect-chance-agreement "
    "corpora (pe = 1) emit NULL kappa on both engines.",
)
def q224_cohen_kappa(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    rated = d.select(
        F.when(F.coalesce(F.col("n_chars"), F.lit(0)) >= 600, 1)
        .otherwise(0)
        .alias("a"),
        F.when(
            # mod 2^31 before the Knuth multiply (q112/q231 convention):
            # product fits int64 for any surrogate doc_id
            F.expr(
                "(((COALESCE(doc_id, 0) % 2147483648) * 1099087573)"
                " % 4294967296) % 2000"
            )
            < F.least(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(2000)),
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    cells = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11").cast("double") + F.col("n00").cast("double")) / nd
    pe = (
        ((F.col("n11") + F.col("n10")).cast("double") / nd)
        * ((F.col("n11") + F.col("n01")).cast("double") / nd)
        + ((F.col("n01") + F.col("n00")).cast("double") / nd)
        * ((F.col("n10") + F.col("n00")).cast("double") / nd)
    )
    return cells.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po_r6"),
        F.round(pe, 6).alias("pe_r6"),
        F.when(pe != 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6)).alias(
            "kappa_r6"
        ),
    )


# Benford expected first-digit masses, round(log10(1+1/d)*1e6) for
# d=1..9 — one shared integer literal table on both engines (they sum
# to exactly 1,000,000), so the audit never evaluates libm log10.
_BENFORD_PPM = [
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757,
]


@register(
    "q228_benford_audit",
    f"""
    WITH cents AS (
      SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0
    ),
    -- c >= 1: amounts in (0, 0.01) floor to 0 cents, whose "first
    -- digit" is 0 — out of Benford's domain (and element_at index 0
    -- raises in Spark while list[0] silently NULLs in DuckDB)
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS d
      FROM cents WHERE c >= 1
    ),
    hist AS (
      SELECT d, COUNT(*) AS n_obs FROM digits GROUP BY d
    ),
    rated AS (
      SELECT d, n_obs,
             n_obs * 1000000 // SUM(n_obs) OVER () AS obs_ppm,
             {list(_BENFORD_PPM)}[d] AS benford_ppm
      FROM hist
    )
    SELECT CAST(d AS BIGINT) AS d, CAST(n_obs AS BIGINT) AS n_obs,
           CAST(obs_ppm AS BIGINT) AS obs_ppm,
           CAST(benford_ppm AS BIGINT) AS benford_ppm,
           CAST(obs_ppm - benford_ppm AS BIGINT) AS dev_ppm,
           CAST(SUM(ABS(obs_ppm - benford_ppm)) OVER () // 2 AS BIGINT)
             AS tvd_ppm
    FROM rated
    """,
    doc="Benford first-digit audit on transaction amounts (Nigrini's "
    "fraud/fabrication screen — synthetic or tampered monetary data "
    "fails the log-digit law long before any row-level rule fires): "
    "observed vs expected first-significant-digit distribution in ppm, "
    "per-digit deviation, and the total-variation distance replicated "
    "on every row. The leading digit comes from EXACT integer cents — "
    "FLOOR(price*100) AS BIGINT, then the bigint's decimal string — "
    "because double-to-string rendering diverges between engines "
    "(Spark goes scientific past 1e7) while bigint rendering and FLOOR "
    "of an identical double are bit-identical everywhere; the Benford "
    "masses are a shared integer literal table (sums to exactly 1e6), "
    "so libm log10 never enters. Shape: one scan into a <=9-row "
    "map-side digit histogram; both OVER () windows run on that "
    "digit-bounded table, never the fact rows.",
)
def q228_benford_audit(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    # cents >= 1 guard: an amount in (0, 0.01) floors to 0 cents, whose
    # leading digit is 0 — outside Benford's 1..9 domain, and
    # element_at(arr, 0) raises ELEMENT_AT_BY_INDEX_ZERO in Spark while
    # DuckDB's list[0] silently yields NULL (ADVICE r7).
    cents = li.filter(
        F.col("l_extendedprice").isNotNull() & (F.col("l_extendedprice") > 0)
    ).select(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    digits = cents.filter(F.col("c") >= 1).select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("d")
    )
    hist = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n_obs"))
    # the unpartitioned windows run over <= 9 digit rows by construction
    w = Window.partitionBy()
    benford_arr = F.array(*[F.lit(v) for v in _BENFORD_PPM])
    rated = (
        hist.withColumn("_tot", F.sum("n_obs").over(w))
        .withColumn(
            "obs_ppm", F.expr("CAST(n_obs * 1000000 div _tot AS BIGINT)")
        )
        .withColumn("benford_ppm", F.element_at(benford_arr, F.col("d")))
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("benford_ppm"))
    )
    return rated.select(
        F.col("d").cast("bigint"),
        F.col("n_obs").cast("bigint"),
        F.col("obs_ppm").cast("bigint"),
        F.col("benford_ppm").cast("bigint"),
        F.col("dev_ppm").cast("bigint"),
        (F.sum(F.abs(F.col("dev_ppm"))).over(w) / 2)
        .cast("bigint")
        .alias("tvd_ppm"),
    )


@register(
    "q229_pr_threshold_sweep",
    f"""
    WITH scored AS ({_CONF_LABEL_SQL}),
    bins AS (
      SELECT LEAST(conf_ppm // 100000, 9) AS bin_id,
             COUNT(*) AS n,
             SUM(label) AS pos
      FROM scored GROUP BY 1
    ),
    -- left-join the full threshold spine so empty bins still yield a
    -- curve row (their cumulative-from-top sums are unaffected)
    spine AS (
      SELECT t.bin_id, COALESCE(b.n, 0) AS n, COALESCE(b.pos, 0) AS pos
      FROM (SELECT unnest(range(0, 10)) AS bin_id) t
      LEFT JOIN bins b USING (bin_id)
    ),
    cum AS (
      SELECT bin_id,
             SUM(n) OVER (ORDER BY bin_id DESC) AS pred_pos,
             SUM(pos) OVER (ORDER BY bin_id DESC) AS tp,
             SUM(pos) OVER () AS p_total
      FROM spine
    )
    SELECT CAST(bin_id * 100000 AS BIGINT) AS thresh_ppm,
           CAST(pred_pos AS BIGINT) AS pred_pos,
           CAST(tp AS BIGINT) AS tp,
           CASE WHEN pred_pos > 0
                THEN CAST(tp * 1000000 // pred_pos AS BIGINT)
           END AS precision_ppm,
           CASE WHEN p_total > 0
                THEN CAST(tp * 1000000 // p_total AS BIGINT)
           END AS recall_ppm,
           CASE WHEN pred_pos + p_total > 0
                THEN CAST(2 * tp * 1000000 // (pred_pos + p_total)
                          AS BIGINT)
           END AS f1_ppm
    FROM cum
    """,
    doc="Precision/recall/F1 threshold sweep — the operating-point table "
    "behind every 'where do we set the quality-score cutoff' decision "
    "(the discrete PR curve; q223's AUC summarizes it, this exposes the "
    "points): for each of the 10 bin-edge thresholds, predicted "
    "positives, true positives, precision, recall, and F1 in integer "
    "ppm. F1 uses the direct identity 2*TP/(pred_pos + actual_pos) — "
    "one exact integer division, never composed from already-floored "
    "precision/recall. Computed from the SAME 10-row bin histogram as "
    "q222 (one scan, map-side agg); the descending cumulative windows "
    "run over the 10-row threshold spine, which is LEFT-joined so empty "
    "bins still emit their operating point. Degenerate corpora "
    "(no predictions above t / no positives at all) emit NULL "
    "metrics on both engines.",
)
def q229_pr_threshold_sweep(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    bins = (
        _conf_label(d)
        .groupBy(
            F.least(F.expr("conf_ppm div 100000"), F.lit(9)).alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("pos"),
        )
    )
    spine = spark.range(0, 10).select(
        F.col("id").cast("bigint").alias("bin_id")
    )
    full = (
        F.broadcast(spine)
        .join(bins, "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("pos"), F.lit(0)).alias("pos"),
        )
    )
    # the windows run over the 10-row threshold spine, never the corpus
    w_desc = Window.orderBy(F.desc("bin_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = full.select(
        "bin_id",
        F.sum("n").over(w_desc).cast("bigint").alias("pred_pos"),
        F.sum("pos").over(w_desc).cast("bigint").alias("tp"),
        F.sum("pos").over(w_all).cast("bigint").alias("p_total"),
    )
    return cum.select(
        (F.col("bin_id") * 100000).cast("bigint").alias("thresh_ppm"),
        "pred_pos",
        "tp",
        F.when(
            F.col("pred_pos") > 0,
            F.expr("CAST(tp * 1000000 div pred_pos AS BIGINT)"),
        ).alias("precision_ppm"),
        F.when(
            F.col("p_total") > 0,
            F.expr("CAST(tp * 1000000 div p_total AS BIGINT)"),
        ).alias("recall_ppm"),
        F.when(
            F.col("pred_pos") + F.col("p_total") > 0,
            F.expr(
                "CAST(2 * tp * 1000000 div (pred_pos + p_total) AS BIGINT)"
            ),
        ).alias("f1_ppm"),
    )


@register(
    "q232_quantile_normalize",
    f"""
    WITH scored AS (
      SELECT source, LEAST(COALESCE(n_chars, 0), 2000) * 500 AS conf_ppm
      FROM documents
    ),
    h AS (
      SELECT source, conf_ppm, COUNT(*) AS cnt FROM scored GROUP BY 1, 2
    ),
    hs AS (
      SELECT source, conf_ppm, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY conf_ppm
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cum_below,
             SUM(cnt) OVER (PARTITION BY source) AS n_s
      FROM h
    ),
    g AS (
      SELECT conf_ppm AS v_g,
             SUM(COUNT(*)) OVER (ORDER BY conf_ppm) AS gcum,
             SUM(COUNT(*)) OVER () AS n_tot
      FROM scored GROUP BY conf_ppm
    ),
    mapped AS (
      SELECT hs.source, hs.conf_ppm, hs.cnt, hs.cum_below, hs.n_s,
             MIN(g.v_g) AS norm_conf_ppm
      FROM hs JOIN g
        ON CAST(g.gcum AS HUGEINT) * (2 * hs.n_s)
           >= CAST(g.n_tot AS HUGEINT) * (2 * hs.cum_below + hs.cnt)
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT source, CAST(conf_ppm AS BIGINT) AS conf_ppm,
           CAST(cnt AS BIGINT) AS n_docs,
           CAST(CAST(2 * cum_below + cnt AS HUGEINT) * 1000000
                // (2 * n_s) AS BIGINT) AS src_rank_ppm,
           CAST(norm_conf_ppm AS BIGINT) AS norm_conf_ppm
    FROM mapped
    """,
    doc="Quantile normalization of per-source scores onto the global "
    "score distribution — the cross-domain score-fusion step a mixed "
    "corpus needs before one threshold can gate every source (a web "
    "source's '0.7' and a book source's '0.7' are different claims; "
    "after mapping, equal normalized scores mean equal global rank): "
    "each (source, score) cell takes its within-source MID-RANK "
    "(2*cum_below+cnt)/(2*n_s) and maps to the smallest global score "
    "whose empirical CDF reaches it — the textbook empirical-inverse-"
    "CDF transform, done EXACTLY by cross-multiplied integer "
    "comparisons (gcum*2*n_s >= n_tot*(2*cum_below+cnt), HUGEINT/"
    "decimal(38,0) products — no fraction is ever materialized, so "
    "there is nothing to round). Shape: both histograms are score-"
    "domain-bounded (<= 2001 rows per side by the conf construction); "
    "the mapping is a non-equi join against the BROADCAST global "
    "histogram — a BroadcastNestedLoopJoin over two dimension-sized "
    "tables (build side bounded by construction), never touching the "
    "corpus, which is scanned once for each histogram.",
)
def q232_quantile_normalize(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        (
            F.least(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(2000))
            * 500
        )
        .cast("bigint")
        .alias("conf_ppm"),
    )
    h = scored.groupBy("source", "conf_ppm").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # per-source windows over <= 2001-row score histograms
    w_below = (
        Window.partitionBy("source")
        .orderBy("conf_ppm")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hs = h.withColumn(
        "cum_below", F.coalesce(F.sum("cnt").over(w_below), F.lit(0))
    ).withColumn("n_s", F.sum("cnt").over(Window.partitionBy("source")))
    g = (
        scored.groupBy("conf_ppm")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            F.col("conf_ppm").alias("v_g"),
            F.sum("_n")
            .over(
                Window.orderBy("conf_ppm").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            .alias("gcum"),
            F.sum("_n").over(Window.partitionBy()).alias("n_tot"),
        )
    )
    mapped = (
        hs.join(
            F.broadcast(g),
            F.col("gcum").cast("decimal(38,0)") * (2 * F.col("n_s"))
            >= F.col("n_tot").cast("decimal(38,0)")
            * (2 * F.col("cum_below") + F.col("cnt")),
        )
        .groupBy("source", "conf_ppm", "cnt", "cum_below", "n_s")
        .agg(F.min("v_g").alias("norm_conf_ppm"))
    )
    return mapped.select(
        "source",
        F.col("conf_ppm").cast("bigint"),
        F.col("cnt").cast("bigint").alias("n_docs"),
        F.expr(
            "CAST(CAST(2 * cum_below + cnt AS DECIMAL(38,0)) * 1000000"
            " div (2 * n_s) AS BIGINT)"
        ).alias("src_rank_ppm"),
        F.col("norm_conf_ppm").cast("bigint"),
    )


@register(
    "q233_neyman_allocation",
    """
    WITH m AS (
      SELECT c_mktsegment,
             COUNT(*) AS n_h,
             SUM(CAST(FLOOR(c_acctbal * 100) AS HUGEINT)) AS s1,
             SUM(CAST(FLOOR(c_acctbal * 100) AS HUGEINT)
                 * CAST(FLOOR(c_acctbal * 100) AS HUGEINT)) AS s2
      FROM customer WHERE c_acctbal IS NOT NULL
      GROUP BY c_mktsegment
    ),
    w AS (
      SELECT c_mktsegment, n_h,
             CAST(FLOOR(SQRT(CAST(CAST(n_h AS HUGEINT) * s2 - s1 * s1
                                  AS DOUBLE))) AS BIGINT) AS nsd_floor
      FROM m
    ),
    t AS (SELECT SUM(nsd_floor) AS tot, SUM(n_h) AS n_tot FROM w),
    q AS (
      SELECT c_mktsegment, n_h, nsd_floor,
             CAST(n_h AS HUGEINT) * 1000000 // n_tot AS prop_ppm,
             CAST(nsd_floor AS HUGEINT) * 1000000 // tot AS neyman_ppm,
             CAST(100000 * CAST(nsd_floor AS HUGEINT) // tot AS BIGINT)
               AS base_quota,
             CAST((100000 * CAST(nsd_floor AS HUGEINT)) % tot AS BIGINT)
               AS rem
      FROM w, t WHERE tot > 0
    )
    SELECT c_mktsegment, CAST(n_h AS BIGINT) AS n_h,
           CAST(nsd_floor AS BIGINT) AS nsd_floor,
           CAST(prop_ppm AS BIGINT) AS prop_ppm,
           CAST(neyman_ppm AS BIGINT) AS neyman_ppm,
           CAST(base_quota
                + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC,
                                               c_mktsegment)
                            <= 100000 - SUM(base_quota) OVER ()
                       THEN 1 ELSE 0 END AS BIGINT) AS alloc_n
    FROM q
    """,
    doc="Neyman optimal stratified-sample allocation (Neyman 1934 — the "
    "design step of every eval/audit sample: strata with more internal "
    "variance get more of the budget than proportional allocation "
    "gives): per market segment, allocation weight n_h*sigma_h computed "
    "EXACTLY as sqrt(n_h*sum(x^2) - sum(x)^2) over integer cents — the "
    "moment expression IS n_h*sigma_h scaled by n_h, with HUGEINT/"
    "decimal(38,0) moment sums (q190 rule) and IEEE-754 sqrt, which is "
    "CORRECTLY ROUNDED by the standard (unlike log/exp) and therefore "
    "bit-identical cross-engine; FLOOR re-integerizes. The 100k-sample "
    "budget splits by q195's Hamilton largest-remainder apportionment, "
    "so allocations are integers summing exactly to the budget. Shape: "
    "one map-side moment agg to #segments rows; every window is "
    "segment-bounded. Proportional ppm shown alongside for the "
    "design-effect comparison.",
)
def q233_neyman_allocation(spark: SparkSession, sf_dir: str):
    (c,) = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100).cast("decimal(38,0)")
    m = (
        c.filter(F.col("c_acctbal").isNotNull())
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.sum(cents).alias("s1"),
            F.sum(cents * cents).alias("s2"),
        )
    )
    w = m.select(
        "c_mktsegment",
        "n_h",
        F.floor(
            F.sqrt(
                (
                    F.col("n_h").cast("decimal(38,0)") * F.col("s2")
                    - F.col("s1") * F.col("s1")
                ).cast("double")
            )
        )
        .cast("bigint")
        .alias("nsd_floor"),
    )
    wall = Window.partitionBy()
    q = (
        w.withColumn("tot", F.sum("nsd_floor").over(wall))
        .withColumn("n_tot", F.sum("n_h").over(wall))
        .filter(F.col("tot") > 0)
        .select(
            "c_mktsegment",
            "n_h",
            "nsd_floor",
            F.expr(
                "CAST(CAST(n_h AS DECIMAL(38,0)) * 1000000"
                " div n_tot AS BIGINT)"
            ).alias("prop_ppm"),
            F.expr(
                "CAST(CAST(nsd_floor AS DECIMAL(38,0)) * 1000000"
                " div tot AS BIGINT)"
            ).alias("neyman_ppm"),
            F.expr(
                "CAST(100000 * CAST(nsd_floor AS DECIMAL(38,0))"
                " div tot AS BIGINT)"
            ).alias("base_quota"),
            F.expr(
                "CAST((100000 * CAST(nsd_floor AS DECIMAL(38,0))) % tot"
                " AS BIGINT)"
            ).alias("rem"),
        )
    )
    wr = Window.orderBy(F.desc("rem"), F.asc("c_mktsegment"))
    r = q.select(
        "*",
        F.row_number().over(wr).alias("rk"),
        (F.lit(100000) - F.sum("base_quota").over(wall))
        .cast("bigint")
        .alias("leftover"),
    )
    return r.select(
        "c_mktsegment",
        F.col("n_h").cast("bigint").alias("n_h"),
        "nsd_floor",
        "prop_ppm",
        "neyman_ppm",
        (
            F.col("base_quota")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_n"),
    )


@register(
    "q239_spearman_rank_corr",
    """
    WITH per AS (
      SELECT LEAST(COALESCE(n_chars, 0), 2000) * 500 AS a,
             LEAST(LEN(regexp_extract_all(text, '\\S+')), 512) AS b
      FROM documents WHERE text IS NOT NULL
    ),
    ra AS (
      SELECT a, 2 * COALESCE(SUM(COUNT(*)) OVER (ORDER BY a
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + COUNT(*) + 1 AS ra2
      FROM per GROUP BY a
    ),
    rb AS (
      SELECT b, 2 * COALESCE(SUM(COUNT(*)) OVER (ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + COUNT(*) + 1 AS rb2
      FROM per GROUP BY b
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(ra2 AS HUGEINT) * ra2) AS saa,
             SUM(CAST(rb2 AS HUGEINT) * rb2) AS sbb,
             SUM(CAST(ra2 AS HUGEINT) * rb2) AS sab
      FROM per JOIN ra USING (a) JOIN rb USING (b)
    ),
    -- centered moments: doubled midranks sum to EXACTLY n*(n+1)
    -- regardless of ties, so the mean rank is the integer n+1 and
    -- sum((r-mean)^2) = saa - n*(n+1)^2 — Theta(n^3), vs the Theta(n^4)
    -- cross-products n*saa - sa*sa of the uncentered form (which
    -- overflowed HUGEINT/decimal(38,0) near n ~ 2e9)
    c AS (
      SELECT n,
             saa - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS vxx,
             sbb - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS vyy,
             sab - CAST(n AS HUGEINT) * (n + 1) * (n + 1) AS vxy
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CASE WHEN vxx > 0 AND vyy > 0
                THEN ROUND(CAST(vxy AS DOUBLE)
                           / (SQRT(CAST(vxx AS DOUBLE))
                              * SQRT(CAST(vyy AS DOUBLE))), 6)
           END AS spearman_r6
    FROM c
    """,
    doc="Spearman rank correlation between document length and token "
    "count — the monotone-association check (robust to outliers and "
    "nonlinearity, which is why EDA reaches for it over Pearson/q49) "
    "computed WITHOUT a global rank sort: both variables are bounded by "
    "construction (clipped length ppm <= 2001 values; clipped token "
    "count <= 513 values, the q219 bound), so tie-correct MIDRANKS come "
    "from value histograms — r2(v) = 2*cum_below + cnt + 1, exact "
    "integers — and re-attach to rows via two BROADCAST joins on the "
    "value key. Rank moments accumulate in HUGEINT/decimal(38,0) "
    "(accumulated products reach ~4n^3), and the variance/covariance "
    "terms are CENTERED — doubled midranks sum to exactly n(n+1) "
    "regardless of ties, so the mean rank is the integer n+1 and "
    "var = saa - n(n+1)^2 stays Theta(n^3); the uncentered n*saa - "
    "sa^2 form is Theta(n^4) and overflows decimal(38,0) near n~2e9, "
    "the centered form holds to n ~ 2.9e11 rows (past the ~1e11-doc "
    "100 TB design point). The final rho is IEEE arithmetic on "
    "identical int-derived doubles (two correctly-rounded sqrts, one "
    "division — the q233 rule), rounded at 6. Zero-variance marginals "
    "emit NULL on both engines. Shape: one corpus scan, two "
    "histogram-bounded windows, two broadcast equi joins, one map-side "
    "moment agg to one row.",
)
def q239_spearman_rank_corr(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    from klio_spark.functions import text as tx

    per = d.filter(F.col("text").isNotNull()).select(
        (
            F.least(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(2000))
            * 500
        )
        .cast("bigint")
        .alias("a"),
        F.least(tx.token_count(F.col("text")), F.lit(512))
        .cast("bigint")
        .alias("b"),
    )

    def rank_map(col):
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return (
            per.groupBy(col)
            .agg(F.count(F.lit(1)).alias("_c"))
            .select(
                col,
                (
                    2 * F.coalesce(F.sum("_c").over(w), F.lit(0))
                    + F.col("_c")
                    + 1
                )
                .cast("bigint")
                .alias(f"r_{col}"),
            )
        )

    joined = per.join(F.broadcast(rank_map("a")), "a").join(
        F.broadcast(rank_map("b")), "b"
    )
    ra2 = F.col("r_a").cast("decimal(38,0)")
    rb2 = F.col("r_b").cast("decimal(38,0)")
    m = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(ra2 * F.col("r_a")).alias("saa"),
        F.sum(rb2 * F.col("r_b")).alias("sbb"),
        F.sum(ra2 * F.col("r_b")).alias("sab"),
    )
    # centered moments (see the oracle comment): mean doubled midrank is
    # exactly n+1, so var = saa - n(n+1)^2 stays Theta(n^3) — the
    # uncentered n*saa - sa*sa form is Theta(n^4) and overflows
    # decimal(38,0) near n ~ 2e9 (ADVICE r7).
    mu2 = "CAST(n AS DECIMAL(38,0)) * (n + 1) * (n + 1)"
    vx = F.expr(f"saa - {mu2}")
    vy = F.expr(f"sbb - {mu2}")
    vxy = F.expr(f"sab - {mu2}")
    return m.select(
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.round(
                vxy.cast("double")
                / (
                    F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
                ),
                6,
            ),
        ).alias("spearman_r6"),
    )


@register(
    "q256_mann_whitney",
    """
    WITH p AS (
      SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
    ),
    g AS (
      SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1,
             CAST(SUM(1 - g1) AS BIGINT) AS c2
      FROM p GROUP BY cents
    ),
    r AS (
      SELECT c1, c2, c1 + c2 AS t,
             CAST(COALESCE(SUM(c1 + c2) OVER (
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS cb
      FROM g
    ),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             CAST(SUM(c1 * (2 * cb + t + 1)) AS BIGINT) AS r1_x2,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_t
      FROM r
    )
    SELECT n1, n2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           tie_t,
           CASE WHEN n1 > 0 AND n2 > 0 AND
                     (CAST(n1 + n2 + 1 AS DOUBLE)
                      - CAST(tie_t AS DOUBLE)
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) > 0
             THEN ROUND(
               (CAST(r1_x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                - CAST(n1 AS DOUBLE) * n2 / 2.0)
               / SQRT(CAST(n1 AS DOUBLE) * n2 / 12.0
                      * (CAST(n1 + n2 + 1 AS DOUBLE)
                         - CAST(tie_t AS DOUBLE)
                           / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))), 6)
           END AS z_r6
    FROM s
    """,
    doc="Mann-Whitney U rank-sum test (purchase vs view amounts) — the "
    "nonparametric complement to q247's parametric z: no normality "
    "assumption, robust to the heavy-tailed value distributions real "
    "revenue has. Integer-exact construction: ranks are NEVER "
    "materialized per row — values aggregate to distinct-cents counts "
    "(c1, c2) first, and the tied-average rank of a value group is "
    "recovered in DOUBLED units (avg_rank*2 = 2*cum_before + t + 1, an "
    "exact bigint), so R1 and U1 are exact integers and the tie "
    "correction sum(t^3 - t) rides the same aggregation. The only "
    "window runs over DISTINCT cents (bounded by the price domain, not "
    "the row count) — no global per-row sort at any scale. z is IEEE "
    "arithmetic on the exact integers with one sqrt, rounded 6 (the "
    "q247 convention). Bound (ADVICE r9 correction): tie_t = "
    "SUM(t^3 - t) across ALL cents groups must fit int64, so the "
    "envelope is SUM(t^3) < 9.2e18; since SUM(t^3) <= max_t^2 * "
    "SUM(t) = max_t^2 * N, the sufficient check is N * max_t^2 < "
    "9.2e18 (at N = 2.1e9 rows: largest tie group < ~66k). A per-"
    "group-only bound is NOT sufficient — 1000 groups of 2e6 ties "
    "gives SUM(t^3) ~ 8e21 > 2^63 (Spark wraps, DuckDB raises). "
    "u1_x2 ~ 2N^2 needs N < 2.1e9. SURVEY §2.9 statistics family "
    "(q247/q231/q239).",
)
def q256_mann_whitney(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    p = e.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "view")
    ).select(
        F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
        (F.col("event_type") == "purchase").cast("bigint").alias("g1"),
    )
    g = p.groupBy("cents").agg(
        F.sum("g1").cast("bigint").alias("c1"),
        F.sum(F.lit(1) - F.col("g1")).cast("bigint").alias("c2"),
    )
    wcb = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("t"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wcb), F.lit(0))
        .cast("bigint")
        .alias("cb"),
    )
    s = r.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(
            F.col("c1") * (2 * F.col("cb") + F.col("t") + 1)
        )
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_t"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1_x2 = (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)).cast("bigint")
    tcorr = (F.col("n1") + F.col("n2") + 1).cast("double") - F.col(
        "tie_t"
    ).cast("double") / (nd * (F.col("n1") + F.col("n2") - 1))
    z = (
        u1_x2.cast("double") / F.lit(2.0) - n1d * F.col("n2") / F.lit(2.0)
    ) / F.sqrt(n1d * F.col("n2") / F.lit(12.0) * tcorr)
    return s.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        "tie_t",
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0) & (tcorr > 0), F.round(z, 6)
        ).alias("z_r6"),
    )


@register(
    "q261_fleiss_kappa",
    """
    WITH rat AS (
      SELECT doc_id,
             ((doc_id % 2147483648) * 2654435761 + 1 * 40503)
               % 2147483648 % 3 AS r0,
             ((doc_id % 2147483648) * 2654435761 + 2 * 40503)
               % 2147483648 % 3 AS r1,
             ((doc_id % 2147483648) * 2654435761 + 3 * 40503)
               % 2147483648 % 3 AS r2
      FROM documents
    ),
    per AS (
      SELECT doc_id,
             CASE WHEN r0 = r1 THEN 1 ELSE 0 END
             + CASE WHEN r0 = r2 THEN 1 ELSE 0 END
             + CASE WHEN r1 = r2 THEN 1 ELSE 0 END AS agree,
             CASE WHEN r0 = 0 THEN 1 ELSE 0 END
             + CASE WHEN r1 = 0 THEN 1 ELSE 0 END
             + CASE WHEN r2 = 0 THEN 1 ELSE 0 END AS k0,
             CASE WHEN r0 = 1 THEN 1 ELSE 0 END
             + CASE WHEN r1 = 1 THEN 1 ELSE 0 END
             + CASE WHEN r2 = 1 THEN 1 ELSE 0 END AS k1,
             CASE WHEN r0 = 2 THEN 1 ELSE 0 END
             + CASE WHEN r1 = 2 THEN 1 ELSE 0 END
             + CASE WHEN r2 = 2 THEN 1 ELSE 0 END AS k2
      FROM rat
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(agree) AS BIGINT) AS agree_pairs,
             CAST(SUM(k0) AS BIGINT) AS c0,
             CAST(SUM(k1) AS BIGINT) AS c1,
             CAST(SUM(k2) AS BIGINT) AS c2
      FROM per
    )
    SELECT n_docs, agree_pairs, c0, c1, c2,
           CASE WHEN n_docs > 0 AND
                  (CAST(c0 AS DOUBLE) * c0 + CAST(c1 AS DOUBLE) * c1
                   + CAST(c2 AS DOUBLE) * c2)
                  / ((3.0 * n_docs) * (3.0 * n_docs)) < 1.0
             THEN ROUND(
               (CAST(agree_pairs AS DOUBLE) / (3.0 * n_docs)
                - (CAST(c0 AS DOUBLE) * c0 + CAST(c1 AS DOUBLE) * c1
                   + CAST(c2 AS DOUBLE) * c2)
                  / ((3.0 * n_docs) * (3.0 * n_docs)))
               / (1.0
                  - (CAST(c0 AS DOUBLE) * c0 + CAST(c1 AS DOUBLE) * c1
                     + CAST(c2 AS DOUBLE) * c2)
                    / ((3.0 * n_docs) * (3.0 * n_docs))), 6)
           END AS kappa_r6
    FROM s
    """,
    doc="Fleiss' kappa multi-rater agreement (3 raters, 3 categories) — "
    "the n-rater generalization of q224's two-rater Cohen's kappa, the "
    "standard readout when labeling crowds annotate training data. "
    "Raters are deterministic Knuth-hash labelers (the q224/q112 "
    "convention, doc_id pre-reduced mod 2^31 before the multiply so "
    "the product never overflows — the r8 rehearsal lesson). "
    "Integer-exact core: with n raters, sum_j n_ij^2 = n + 2*"
    "(agreeing pairs), so observed agreement needs only pair-equality "
    "counts — P_o = agree_pairs/(3N) — and expected agreement needs "
    "only per-category column sums — P_e = sum c_j^2/(3N)^2. One scan, "
    "one 1-row aggregate, kappa = (Po-Pe)/(1-Pe) in IEEE arithmetic on "
    "exact integers, rounded 6. Degenerate all-one-category corpora "
    "(Pe = 1) emit NULL on both engines.",
)
def q261_fleiss_kappa(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")

    def rater(i: int):
        return (
            (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
            + F.lit(i) * F.lit(40503)
        ) % F.lit(2147483648) % 3

    rat = d.select(
        "doc_id",
        rater(1).alias("r0"),
        rater(2).alias("r1"),
        rater(3).alias("r2"),
    )

    def eq(a, b):
        return (F.col(a) == F.col(b)).cast("int")

    def cat(j: int):
        return sum(
            (F.col(c) == j).cast("int") for c in ("r0", "r1", "r2")
        )

    per = rat.select(
        (eq("r0", "r1") + eq("r0", "r2") + eq("r1", "r2")).alias("agree"),
        cat(0).alias("k0"),
        cat(1).alias("k1"),
        cat(2).alias("k2"),
    )
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("agree").cast("bigint").alias("agree_pairs"),
        F.sum("k0").cast("bigint").alias("c0"),
        F.sum("k1").cast("bigint").alias("c1"),
        F.sum("k2").cast("bigint").alias("c2"),
    )
    nd = F.lit(3.0) * F.col("n_docs")
    pe = (
        F.col("c0").cast("double") * F.col("c0")
        + F.col("c1").cast("double") * F.col("c1")
        + F.col("c2").cast("double") * F.col("c2")
    ) / (nd * nd)
    po = F.col("agree_pairs").cast("double") / nd
    return s.select(
        "n_docs",
        "agree_pairs",
        "c0",
        "c1",
        "c2",
        F.when(
            (F.col("n_docs") > 0) & (pe < 1.0),
            F.round((po - pe) / (F.lit(1.0) - pe), 6),
        ).alias("kappa_r6"),
    )


@register(
    "q263_page_hinkley",
    """
    WITH p AS (
      SELECT event_type, event_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS t_s,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    a AS (
      SELECT event_type, event_id, t_s, cents,
             CAST(SUM(cents) OVER w AS BIGINT) AS s,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS i
      FROM p WINDOW w AS (PARTITION BY event_type ORDER BY t_s, event_id)
    ),
    b AS (
      SELECT event_type, event_id, t_s,
             cents * 1000
             - CAST(FLOOR(1000.0 * CAST(s AS DOUBLE) / i) AS BIGINT)
             - 50000 AS dev
      FROM a
    ),
    c AS (
      SELECT event_type, event_id, t_s,
             CAST(SUM(dev) OVER w AS BIGINT) AS m
      FROM b WINDOW w AS (PARTITION BY event_type ORDER BY t_s, event_id)
    ),
    d AS (
      SELECT event_type, t_s,
             m - CAST(MIN(m) OVER w AS BIGINT) AS ph
      FROM c WINDOW w AS (PARTITION BY event_type ORDER BY t_s, event_id)
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(ph) AS BIGINT) AS max_ph_milli,
           CAST(MIN(CASE WHEN ph > 1000000 THEN t_s END) AS BIGINT)
             AS first_alarm_t_s
    FROM d GROUP BY event_type
    """,
    doc="Page-Hinkley changepoint detection per event type — the "
    "sequential mean-shift test that completes the drift family "
    "(PSI q139 = distribution vs reference, KS q162 = two-window "
    "shape, CUSUM q163 = known-target mean shift; PH tracks the "
    "RUNNING mean, so no target needs configuring). Classic PH is a "
    "per-step recurrence on the running mean — distributed here as "
    "three stacked prefix windows over ONE (event_type) exchange and "
    "sort: prefix sum + row count give the running mean, the per-row "
    "deviation dev_i = x_i - mean_i - delta integerizes at 1e-3 cent "
    "(FLOOR of an IEEE division of exact ints — identical on both "
    "engines, the integerize-the-transcendental rule), a second "
    "prefix sum accumulates m_t, and PH_t = m_t - min(m_<=t) is a "
    "prefix min. Alarm when PH > lambda (1000 cents). delta=50c "
    "tolerates drift; ties ordered (t_s, event_id) — total. The "
    "event_type partition is sequential by nature (PH is a sequential "
    "statistic); the hot-series escape is IMPLEMENTED — "
    "page_hinkley(segment_s=...) runs the segmented_carry lever "
    "(behavior.py:333) with a DOUBLE carry fold (count/sum carries "
    "reconstruct the global running mean; dev-sum/relative-min "
    "carries reconstruct m and its prefix min), hash-identical at "
    "three chunk widths and x2.4 at 100x on the 5-series corpus.",
)
def q263_page_hinkley(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # monolithic (segment_s=None) — the registered/oracle-paired shape;
    # segment_s is the skew lever for a hot single series (the 100x
    # rehearsal reads x18 on 5 series — one O(n log n) task each)
    return page_hinkley(e)


def page_hinkley(
    e,
    segment_s: int | None = None,
    delta_milli: int = 50000,
    lambda_milli: int = 1000000,
):
    """Page-Hinkley kernel (q263's registration docstring has the
    semantics). ``segment_s`` is the entity-window skew lever
    (behavior.segmented_carry has the general argument). PH is a
    prefix statistic of a prefix statistic, so the segmentation runs
    TWO carry folds over the per-(key, chunk) summary table:

      fold 1 — (count, sum-of-cents) carries, which let each row
      reconstruct its GLOBAL index i and prefix sum S_i (and therefore
      the exact running-mean integerization floor(1000*S/i) — same
      doubles, same floor, hash-identical to the monolithic window);

      fold 2 — over the per-chunk (dev_sum, min of the chunk-relative
      dev prefix): m_before(k) = prefix sum of dev_sum, and the global
      running min entering chunk k = prefix-min of (m_before + the
      chunk's relative min). Per row: m = carry_m + local_prefix_dev,
      running_min = least(carry_min, carry_m + local_prefix_min), both
      exact bigints.

    Both folds run over the tiny summary table (rows per key =
    #chunks); both joins are NULL-SAFE on the key so NULL-key rows
    keep the monolithic window's own-partition semantics (the ewma
    ADVICE-r8 lesson)."""
    p = e.filter(F.col("ts").isNotNull() & F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.expr(
            "(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            " + 62135596800000000) div 1000000 - 62135596800"
        ).alias("t_s"),
        F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
    )
    z = F.lit(0).cast("bigint")
    if segment_s is None:
        w = Window.partitionBy("event_type").orderBy("t_s", "event_id")
        wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rows = p.select(
            "event_type",
            "event_id",
            "t_s",
            "cents",
            F.sum("cents").over(wr).cast("bigint").alias("gs"),
            F.row_number().over(w).cast("bigint").alias("gi"),
        )
        dev = (
            F.col("cents") * 1000
            - F.floor(
                F.lit(1000.0) * F.col("gs").cast("double") / F.col("gi")
            ).cast("bigint")
            - delta_milli
        )
        b = rows.select("event_type", "event_id", "t_s", dev.alias("dev"))
        m = F.sum("dev").over(wr).cast("bigint")
        c = b.select("event_type", "event_id", "t_s", m.alias("m"))
        ph = (F.col("m") - F.min("m").over(wr).cast("bigint")).alias("ph")
        d = c.select("event_type", "t_s", ph)
    else:
        from klio_spark.queries.behavior import segmented_carry

        chunked, carry1 = segmented_carry(
            p,
            ["event_type"],
            "t_s",
            segment_s,
            lambda c: c.groupBy("event_type", "seg").agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("cents").cast("bigint").alias("sx"),
            ),
            {
                "c_n": lambda sw: F.coalesce(F.sum("cnt").over(sw), z),
                "c_s": lambda sw: F.coalesce(F.sum("sx").over(sw), z),
            },
        )

        def nsjoin(left, right, cols):
            cond = F.col("seg") == F.col("_rseg")
            cond = F.col("event_type").eqNullSafe(F.col("_rkey")) & cond
            r = right.select(
                F.col("event_type").alias("_rkey"),
                F.col("seg").alias("_rseg"),
                *cols,
            )
            return left.join(r, cond).drop("_rkey", "_rseg")

        rows = nsjoin(chunked, carry1, ["c_n", "c_s"])
        cw = Window.partitionBy("event_type", "seg").orderBy(
            "t_s", "event_id"
        )
        cwf = cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        gi = F.col("c_n") + F.row_number().over(cw)
        gs = F.col("c_s") + F.sum("cents").over(cwf).cast("bigint")
        dev = (
            F.col("cents") * 1000
            - F.floor(F.lit(1000.0) * gs.cast("double") / gi).cast("bigint")
            - delta_milli
        )
        b = rows.select(
            "event_type", "event_id", "t_s", "seg", dev.alias("dev")
        )
        b = b.select(
            "event_type",
            "event_id",
            "t_s",
            "seg",
            "dev",
            F.sum("dev").over(cwf).cast("bigint").alias("ldev"),
        )
        b = b.withColumn("lmin", F.min("ldev").over(cwf).cast("bigint"))
        summ2 = b.groupBy("event_type", "seg").agg(
            F.sum("dev").cast("bigint").alias("dev_sum"),
            F.min("ldev").cast("bigint").alias("min_rel"),
        )
        sw2 = (
            Window.partitionBy("event_type")
            .orderBy("seg")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        a2 = summ2.withColumn(
            "c_m", F.coalesce(F.sum("dev_sum").over(sw2), z)
        ).withColumn("chunk_min", F.col("c_m") + F.col("min_rel"))
        carry2 = a2.withColumn(
            "c_minm", F.min("chunk_min").over(sw2).cast("bigint")
        )
        rows2 = nsjoin(b, carry2, ["c_m", "c_minm"])
        m = F.col("c_m") + F.col("ldev")
        # this chunk's running min (c_m + lmin) always <= m, so the
        # first chunk (NULL c_minm) coalesces to m harmlessly
        run_min = F.least(
            F.coalesce(F.col("c_minm"), m), F.col("c_m") + F.col("lmin")
        )
        d = rows2.select("event_type", "t_s", (m - run_min).alias("ph"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("ph").cast("bigint").alias("max_ph_milli"),
        F.min(F.when(F.col("ph") > lambda_milli, F.col("t_s")))
        .cast("bigint")
        .alias("first_alarm_t_s"),
    )


@register(
    "q257_bh_fdr",
    """
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT source, n, x,
             CAST(SUM(n) OVER () AS BIGINT) AS nn,
             CAST(SUM(x) OVER () AS BIGINT) AS xx
      FROM per
    ),
    zed AS (
      SELECT source, n, x,
             CASE WHEN n > 0 AND nn - n > 0 AND xx > 0 AND xx < nn THEN
               ABS((CAST(x AS DOUBLE) / n
                    - CAST(xx - x AS DOUBLE) / (nn - n))
                   / SQRT((CAST(xx AS DOUBLE) / nn)
                          * (1.0 - CAST(xx AS DOUBLE) / nn)
                          * (1.0 / n + 1.0 / (nn - n))))
             END AS az
      FROM tot
    ),
    pv AS (
      SELECT source, n, x,
             CASE WHEN az IS NOT NULL THEN ROUND(
               (1.0 / (1.0 + 0.3275911 * (az / 1.4142135623730951)))
               * (0.254829592
                  + (1.0 / (1.0 + 0.3275911 * (az / 1.4142135623730951)))
                  * (-0.284496736
                     + (1.0 / (1.0 + 0.3275911 * (az / 1.4142135623730951)))
                     * (1.421413741
                        + (1.0 / (1.0 + 0.3275911 * (az / 1.4142135623730951)))
                        * (-1.453152027
                           + (1.0 / (1.0 + 0.3275911
                                     * (az / 1.4142135623730951)))
                           * 1.061405429))))
               * EXP(-(az / 1.4142135623730951)
                     * (az / 1.4142135623730951)), 6)
             END AS p_r6
      FROM zed
    ),
    ranked AS (
      SELECT source, n, x, p_r6,
             CAST(ROW_NUMBER() OVER (ORDER BY p_r6 ASC NULLS LAST, source)
                  AS BIGINT) AS k,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pv
    ),
    kstar AS (
      SELECT source, n, x, p_r6, k,
             MAX(CASE WHEN p_r6 * m <= 0.05 * k THEN k END) OVER ()
               AS k_star
      FROM ranked
    )
    SELECT source, n AS n_docs, x AS n_long, p_r6, k,
           COALESCE(k <= k_star, FALSE) AS rejected
    FROM kstar
    """,
    doc="Benjamini-Hochberg FDR control across per-source proportion "
    "tests — the multiple-testing completion of q247 (one test) and "
    "q117 (point readout): screening 20+ sources for anomalous "
    "long-doc rates at a naive 0.05 each would false-alarm "
    "constantly; BH bounds the FALSE DISCOVERY RATE. Per source: "
    "leave-one-out two-proportion z (exact integer counts, IEEE "
    "arithmetic, one sqrt), then the two-sided normal p via the "
    "Abramowitz-Stegun 7.1.26 erfc polynomial — spelled as the "
    "IDENTICAL Horner form on both engines (exp is bit-identical on "
    "identical inputs across these platforms; the q142 precedent) and "
    "ROUNDED AT 6 BEFORE the BH comparison so both engines step "
    "through the procedure on identical numbers. BH itself: rank p "
    "ascending (tie-broken by source — unique), k* = max k with "
    "p_(k) <= 0.05 k/m, reject all k <= k*. Shape: one groupBy to "
    "#sources rows, then scalar windows over that tiny frame — the "
    "statistical machinery costs nothing at any scale. Degenerate "
    "sources (empty rest, pooled rate 0 or 1) carry NULL p and are "
    "never rejected on either engine.",
)
def q257_bh_fdr(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("n_chars") > 1000).cast("int"))
        .cast("bigint")
        .alias("x"),
    )
    wall = Window.partitionBy()
    tot = per.select(
        "source",
        "n",
        "x",
        F.sum("n").over(wall).cast("bigint").alias("nn"),
        F.sum("x").over(wall).cast("bigint").alias("xx"),
    )
    nd = F.col("n").cast("double")
    nr = (F.col("nn") - F.col("n")).cast("double")
    pp = F.col("xx").cast("double") / F.col("nn")
    z = (
        F.col("x").cast("double") / F.col("n")
        - (F.col("xx") - F.col("x")).cast("double") / (F.col("nn") - F.col("n"))
    ) / F.sqrt(
        (F.col("xx").cast("double") / F.col("nn"))
        * (F.lit(1.0) - F.col("xx").cast("double") / F.col("nn"))
        * (F.lit(1.0) / F.col("n") + F.lit(1.0) / (F.col("nn") - F.col("n")))
    )
    zed = tot.select(
        "source",
        "n",
        "x",
        F.when(
            (F.col("n") > 0)
            & (F.col("nn") - F.col("n") > 0)
            & (F.col("xx") > 0)
            & (F.col("xx") < F.col("nn")),
            F.abs(z),
        ).alias("az"),
    )
    xs = F.col("az") / F.lit(1.4142135623730951)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * xs)
    poly = t * (
        F.lit(0.254829592)
        + t
        * (
            F.lit(-0.284496736)
            + t
            * (
                F.lit(1.421413741)
                + t * (F.lit(-1.453152027) + t * F.lit(1.061405429))
            )
        )
    )
    pv = zed.select(
        "source",
        "n",
        "x",
        F.when(
            F.col("az").isNotNull(),
            F.round(poly * F.exp(-xs * xs), 6),
        ).alias("p_r6"),
    )
    wk = Window.orderBy(F.asc_nulls_last("p_r6"), F.asc("source"))
    ranked = pv.select(
        "source",
        "n",
        "x",
        "p_r6",
        F.row_number().over(wk).cast("bigint").alias("k"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("m"),
    )
    kstar = ranked.select(
        "source",
        "n",
        "x",
        "p_r6",
        "k",
        F.max(
            F.when(
                F.col("p_r6") * F.col("m") <= F.lit(0.05) * F.col("k"),
                F.col("k"),
            )
        )
        .over(wall)
        .alias("k_star"),
    )
    return kstar.select(
        "source",
        F.col("n").alias("n_docs"),
        F.col("x").alias("n_long"),
        "p_r6",
        "k",
        F.coalesce(F.col("k") <= F.col("k_star"), F.lit(False)).alias(
            "rejected"
        ),
    )


# q269's expected-count and cell-contribution expressions in ONE shared
# textual form (the q257/q266 discipline): identical IEEE operand order
# on both engines, integerized per CELL before the (exact) sum.
_Q269_E = "CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(tt AS DOUBLE)"
_Q269_CONTRIB = (
    f"(CAST(o AS DOUBLE) - {_Q269_E}) * (CAST(o AS DOUBLE) - {_Q269_E})"
    f" / ({_Q269_E})"
)


@register(
    "q269_chi_square_drift",
    f"""
    WITH t AS (
      SELECT event_type,
             ((((epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
                // 1000000 - 62135596800) + 63504000000) // 86400 + 4) % 7
               AS dow
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ),
    cells AS (
      SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
      FROM t GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS r,
             SUM(o) OVER (PARTITION BY dow) AS c,
             SUM(o) OVER () AS tt
      FROM cells
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow, o,
           CAST(FLOOR(1000000.0 * ({_Q269_E})) AS BIGINT) AS e_micro,
           CAST(FLOOR(1000000000.0 * ({_Q269_CONTRIB})) AS BIGINT)
             AS contrib_q9
    FROM m
    """,
    doc="chi-square independence audit of event_type x day-of-week — "
    "the categorical drift test PSI/KS (q139/q162) cannot express: "
    "those compare ONE numeric distribution against a baseline; this "
    "asks whether the WEEKLY SHAPE differs BY TYPE (type-specific "
    "weekday cycles = scheduling bugs, bot traffic, or genuine "
    "behavioral segmentation). Per cell: observed count, expected "
    "E = R*C/T under independence (micro-units), and the chi-square "
    "contribution (O-E)^2/E floored at 1e-9 — chi2 = SUM(contrib_q9)/"
    "1e9 with dof (rows-1)(cols-1), but the CELL table is the "
    "deliverable (which cells drive the statistic is the actionable "
    "part; the 1-row statistic hides it). Every contribution is an "
    "IEEE expression over exact integer (O, R, C, T) in shared "
    "textual form, floor-integerized per cell, so the judge-facing "
    "sum is exact in any partition order. dow via q243's pure-integer "
    "(days+4) mod 7 on week-aligned-shifted seconds (engine calendar "
    "functions disagree on conventions). Shape: one scan, map-side "
    "agg bounded at #types x 7 cells, three cell-bounded windows — "
    "the statistic costs one exchange of a <100-row frame.",
)
def q269_chi_square_drift(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        F.expr(
            "(((((CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            " + 62135596800000000) div 1000000 - 62135596800)"
            " + 63504000000) div 86400 + 4) % 7)"
        ).alias("dow"),
    )
    cells = t.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    # windows over the <= #types x 7 cell frame, never the events
    m = (
        cells.withColumn(
            "r", F.sum("o").over(Window.partitionBy("event_type"))
        )
        .withColumn("c", F.sum("o").over(Window.partitionBy("dow")))
        .withColumn("tt", F.sum("o").over(Window.partitionBy()))
    )
    return m.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "o",
        F.expr(f"CAST(FLOOR(1000000.0 * ({_Q269_E})) AS BIGINT)").alias(
            "e_micro"
        ),
        F.expr(
            f"CAST(FLOOR(1000000000.0 * ({_Q269_CONTRIB})) AS BIGINT)"
        ).alias("contrib_q9"),
    )


# q270's per-token JSD terms in ONE shared textual form (q257/q266
# discipline). p = source prob, q = corpus prob; both KL integrands
# integerize per DISTINCT token at 1e-12 — the SUM is bounded by ln 2,
# so the bigint accumulation can never overflow regardless of lexicon
# size (floor error only subtracts ~1 unit per distinct token).
_Q270_P = "CAST(cs AS DOUBLE) / CAST(ns AS DOUBLE)"
_Q270_Q = "CAST(cg AS DOUBLE) / CAST(ng AS DOUBLE)"
_Q270_PTERM = (
    f"({_Q270_P}) * ln(2.0 * ({_Q270_P}) / (({_Q270_P}) + ({_Q270_Q})))"
)
_Q270_QTERM = (
    f"({_Q270_Q}) * ln(2.0 * ({_Q270_Q}) / (({_Q270_P}) + ({_Q270_Q})))"
)
_Q270_REM = "(1.0 - CAST(cgp AS DOUBLE) / CAST(ng AS DOUBLE)) * ln(2.0)"


@register(
    "q270_js_divergence",
    rf"""
    WITH tok AS (
      SELECT source, unnest(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
      FROM documents
    ),
    st AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cs
           FROM tok GROUP BY 1, 2),
    gt AS (SELECT t, CAST(SUM(cs) AS BIGINT) AS cg FROM st GROUP BY t),
    ns AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns FROM st GROUP BY 1),
    ng AS (SELECT CAST(SUM(cs) AS BIGINT) AS ng FROM st),
    terms AS (
      SELECT st.source,
             CAST(FLOOR(1000000000000.0 * ({_Q270_PTERM})) AS BIGINT) AS pt,
             CAST(FLOOR(1000000000000.0 * ({_Q270_QTERM})) AS BIGINT) AS qt,
             cg
      FROM st JOIN gt USING (t) JOIN ns USING (source) CROSS JOIN ng
    ),
    agg AS (
      SELECT source, COUNT(*) AS n_tokens,
             CAST(SUM(pt) AS BIGINT) AS pside_q12,
             CAST(SUM(qt) AS BIGINT) AS qside_q12,
             CAST(SUM(cg) AS BIGINT) AS cgp
      FROM terms GROUP BY source
    )
    SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
           pside_q12, qside_q12,
           CAST(FLOOR(1000000000000.0 * ({_Q270_REM})) AS BIGINT)
             AS rem_q12,
           ROUND(CAST(pside_q12 + qside_q12
                      + CAST(FLOOR(1000000000000.0 * ({_Q270_REM}))
                             AS BIGINT) AS DOUBLE)
                 / 2000000000000.0, 6) AS jsd_r6
    FROM agg CROSS JOIN ng
    """,
    doc="Jensen-Shannon divergence of each source's unigram token "
    "distribution vs the corpus — the bounded, symmetric mixture-drift "
    "gauge (KL blows up on missing tokens; JSD <= ln 2 always) behind "
    "source-reweighting decisions (q92/q207's mixtures) and "
    "contamination triage: JSD(P_s || P_corpus) = 0.5*KL(P||M) + "
    "0.5*KL(Q||M), M = (P+Q)/2. Present tokens contribute both "
    "integrands per row of the (source, token) table; tokens ABSENT "
    "from the source contribute exactly q*ln 2, folded as ONE "
    "closed-form remainder (1 - present_mass)*ln 2 — no anti-join, no "
    "lexicon-sized null-handling. Each term is IEEE in shared textual "
    "form over exact counts, floor-integerized at 1e-12 per DISTINCT "
    "token; the bigint sums are bounded by 1e12*ln2 + lexicon floor "
    "error, overflow-free at ANY corpus size (the bound is "
    "information-theoretic, not data-dependent). Shape: one explode, "
    "two lexicon-keyed hash aggs (map-side partials), one "
    "lexicon-scale join, a #sources-row agg; the tiny ns/ng frames "
    "broadcast.",
)
def q270_js_divergence(spark: SparkSession, sf_dir: str):
    from klio_spark.functions import text as tx

    (d,) = load(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("t"),
    )
    # three consumers (gt/ns/terms) read the (source, token) table —
    # persist it once or each re-runs the corpus token explode
    st = scoped_persist(
        tok.groupBy("source", "t").agg(
            F.count(F.lit(1)).cast("bigint").alias("cs")
        )
    )
    gt = st.groupBy("t").agg(F.sum("cs").cast("bigint").alias("cg"))
    ns = st.groupBy("source").agg(F.sum("cs").cast("bigint").alias("ns"))
    # N_g = total tokens; summing cs skips a second gt derivation
    ng = st.agg(F.sum("cs").cast("bigint").alias("ng"))
    terms = (
        st.join(gt, "t")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            F.expr(
                f"CAST(FLOOR(1000000000000.0 * ({_Q270_PTERM})) AS BIGINT)"
            ).alias("pt"),
            F.expr(
                f"CAST(FLOOR(1000000000000.0 * ({_Q270_QTERM})) AS BIGINT)"
            ).alias("qt"),
            "cg",
        )
    )
    agg = terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("pt").cast("bigint").alias("pside_q12"),
        F.sum("qt").cast("bigint").alias("qside_q12"),
        F.sum("cg").cast("bigint").alias("cgp"),
    )
    rem = F.expr(f"CAST(FLOOR(1000000000000.0 * ({_Q270_REM})) AS BIGINT)")
    return agg.crossJoin(F.broadcast(ng)).select(
        "source",
        "n_tokens",
        "pside_q12",
        "qside_q12",
        rem.alias("rem_q12"),
        F.expr(
            f"ROUND(CAST(pside_q12 + qside_q12 +"
            f" CAST(FLOOR(1000000000000.0 * ({_Q270_REM})) AS BIGINT)"
            f" AS DOUBLE) / 2000000000000.0, 6)"
        ).alias("jsd_r6"),
    )
