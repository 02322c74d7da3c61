"""Relational operator surface (SURVEY §2.5 Beam primitives + §2.8 the
Spark-SQL dividend): joins (equi/semi/anti/broadcast), aggregations,
windows, sorts/limits, set ops, dedup, grouping sets, scalar functions.

Plan notes are in each docstring — broadcast choices, shuffle keys, and
why the plan survives 100×: dimension tables are broadcast (no shuffle of
the fact table except for its own aggregations), aggregations get
map-side partial combine, windows partition on high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from klio_spark.queries import load, register

def _dsum(col, scale: int = 4):
    """Order-insensitive cross-engine sum of a double expression: floor to
    10^-scale units per row (deterministic given identical doubles), sum
    as exact integers, divide back (see package doc)."""
    m = float(10 ** scale)
    return F.sum(F.floor(col * m)).cast("double") / m


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_price,
           CAST(SUM(CAST(FLOOR(l_discount * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan+filter+hash agg, map-side partial combine; "
    "ships only (flag,status) groups through the shuffle.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            _dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="multi-way equi-join: customer/nation/region are broadcast (dims), "
    "lineitem⋈orders is the only real shuffle, keyed on orderkey; the "
    "region filter prunes before the join via broadcast pushdown.",
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str):
    l, o, c, n, r = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
              n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o.select("o_orderkey", "o_custkey"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q03_group_stats",
    """
    SELECT p_brand,
           COUNT(*) AS n_parts,
           MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price,
           CAST(SUM(CAST(FLOOR(p_retailprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_price,
           ROUND(SQRT((COUNT(*) * CAST(SUM(CAST(FLOOR(p_retailprice * p_retailprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0
                 - POW(CAST(SUM(CAST(FLOOR(p_retailprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0, 2))
                / (COUNT(*) * (COUNT(*) - 1))), 6) AS stddev_price
    FROM part
    GROUP BY p_brand
    """,
    doc="min/max/avg/stddev per group; stddev via exact decimal sums + one "
    "closed-form double expression so both engines agree bit-for-bit "
    "(native stddev is a streaming variance — order-dependent).",
)
def q03_group_stats(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    n = F.count(F.lit(1))
    s1 = _dsum(F.col("p_retailprice"))
    s2 = _dsum(F.col("p_retailprice") * F.col("p_retailprice"))
    return p.groupBy("p_brand").agg(
        n.alias("n_parts"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        (s1 / n).alias("avg_price"),
        F.round(F.sqrt((n * s2 - F.pow(s1, 2)) / (n * (n - 1))), 6).alias(
            "stddev_price"
        ),
    )


@register(
    "q04_conditional_agg",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           CAST(SUM(CAST(FLOOR(CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END
                * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS big_order_value
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="CASE-WHEN pivot aggregation — one scan, no extra shuffle vs N filters.",
)
def q04_conditional_agg(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "n_finished"
        ),
        _dsum(
            F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(
                F.lit(0.0)
            )
        ).alias("big_order_value"),
    )


@register(
    "q05_rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="grouping-sets/rollup — Spark Expand feeds one hash agg; "
    "subtotal rows materialize without extra scans.",
)
def q05_rollup(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("l_quantity")).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "total_qty",
        )
    )


@register(
    "q06_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="multi-column COUNT DISTINCT → Spark expand + two-phase distinct agg.",
)
def q06_count_distinct(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q07_median_percentile",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact percentiles (sort-based); rounded at 6 digits because the "
    "two engines interpolate with differently-ordered expressions.",
)
def q07_median_percentile(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    # one percentile buffer serving both quantiles (half the agg memory
    # and sort work of two separate percentile() aggregates)
    p = l.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9))).alias("_p")
    )
    return p.select(
        "l_returnflag",
        F.round(F.col("_p")[0], 6).alias("median_price"),
        F.round(F.col("_p")[1], 6).alias("p90_price"),
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

@register(
    "q10_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
    doc="left-semi join (EXISTS): ships only custkeys, dedups on the build side.",
)
def q10_semi_join(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 100000),
        c.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name")


@register(
    "q11_anti_join",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="left-anti join (NOT EXISTS) — the existence-check operator's core "
    "plan shape (SURVEY §2.3).",
)
def q11_anti_join(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 300000), c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@register(
    "q12_outer_join_coalesce",
    """
    SELECT c.c_custkey,
           COALESCE(t.n_orders, 0) AS n_orders,
           CAST(COALESCE(t.total_s4, 0) AS DOUBLE) / 10000.0 AS total_spent
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
                      SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS total_s4
               FROM orders GROUP BY o_custkey) t
    ON c.c_custkey = t.o_custkey
    """,
    doc="aggregate-then-outer-join: pre-agg shrinks the probe side so the "
    "left join broadcasts at any dim/fact ratio.",
)
def q12_outer_join_coalesce(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    t = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 10000.0)).alias("total_s4"),
    )
    return c.join(t, c.c_custkey == t.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        (F.coalesce(F.col("total_s4"), F.lit(0)).cast("double") / 10000.0).alias(
            "total_spent"
        ),
    )


@register(
    "q13_cogroup_counts",
    """
    SELECT k.c_nationkey AS nationkey,
           COUNT(DISTINCT k.c_custkey) AS n_customers,
           COUNT(DISTINCT s.s_suppkey) AS n_suppliers
    FROM customer k
    LEFT JOIN supplier s ON k.c_nationkey = s.s_nationkey
    GROUP BY k.c_nationkey
    """,
    doc="CoGroupByKey parity (SURVEY §2.5): two streams grouped on one key; "
    "as join+agg instead of a true cogroup so Catalyst can reorder.",
)
def q13_cogroup_counts(spark: SparkSession, sf_dir: str):
    c, s = load(spark, sf_dir, "customer", "supplier")
    return (
        c.join(F.broadcast(s), c.c_nationkey == s.s_nationkey, "left")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct("s_suppkey").alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# windows / sort / limit
# --------------------------------------------------------------------------

@register(
    "q20_window_topn_per_group",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rnk
    FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
    doc="top-N per key via ROW_NUMBER — Spark rewrites rank<=k filters into "
    "a per-partition top-k sort (WindowGroupLimit), no full sort.",
)
def q20_window_topn_per_group(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rnk"
        )
    )


@register(
    "q21_window_running_sum",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 10000.0 AS running_total
    FROM orders
    """,
    doc="running total per key; decimal accumulator keeps it exact under "
    "either engine's window evaluation order.",
)
def q21_window_running_sum(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(F.floor(F.col("o_totalprice") * 10000.0)).over(w).cast("double")
         / 10000.0).alias("running_total"),
    )


@register(
    "q22_window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER w AS prev_orderkey,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead navigation — one window sort serves both functions.",
)
def q22_window_lag_lead(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "q23_top_items_global",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 25
    """,
    doc="global top-k: ORDER BY+LIMIT compiles to TakeOrderedAndProject — "
    "per-partition heaps, only k rows reach the driver stage.",
)
def q23_top_items_global(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return (
        l.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(25)
    )


# --------------------------------------------------------------------------
# set ops / dedup
# --------------------------------------------------------------------------

@register(
    "q30_union_distinct_intersect_except",
    """
    WITH big_spenders AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 250000),
         auto_seg     AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT DISTINCT k FROM (SELECT k FROM big_spenders UNION ALL SELECT k FROM auto_seg))
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM big_spenders INTERSECT SELECT k FROM auto_seg)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM big_spenders EXCEPT SELECT k FROM auto_seg)
    """,
    doc="union/intersect/except in one result; all three become hash "
    "aggregates/joins on the key column only.",
)
def q30_union_distinct_intersect_except(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    big = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("k")
    )
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("k")
    )
    rows = [
        big.unionByName(auto).distinct().agg(
            F.lit("union").alias("op"), F.count(F.lit(1)).alias("n")
        ),
        big.intersect(auto).agg(
            F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")
        ),
        big.subtract(auto).agg(  # subtract == EXCEPT (set semantics)
            F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "q31_drop_duplicates",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    WHERE l_quantity > 45
    """,
    doc="dropDuplicates == DISTINCT: hash-agg on the projected columns only "
    "(column pruning keeps the shuffle narrow).",
)
def q31_drop_duplicates(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_quantity") > 45)
        .select("l_returnflag", "l_linestatus", "l_shipdate")
        .dropDuplicates()
    )


# --------------------------------------------------------------------------
# scalar function surface
# --------------------------------------------------------------------------

@register(
    "q40_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           REPLACE(p_name, ' ', '_') AS name_snake,
           LEN(regexp_extract_all(p_name, '[a-z]+')) AS n_words
    FROM part
    WHERE p_size BETWEEN 10 AND 40
    """,
    doc="string scalar surface: upper/length/substr/concat/replace/regexp — "
    "all codegen'd, filter pushed to the parquet scan.",
)
def q40_string_funcs(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    return p.filter(F.col("p_size").between(10, 40)).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.size(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)).alias("n_words"),
    )


@register(
    "q41_date_funcs",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    doc="date extraction + range filter; the timestamp predicate reaches "
    "the parquet scan as a pushed filter (min/max row-group pruning).",
)
def q41_date_funcs(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "q42_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey % 10 = 0
    """,
    doc="math scalar surface; ln/sqrt rounded (libm vs JVM last-ulp).",
)
def q42_math_funcs(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 10 == 0)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
    )


# --------------------------------------------------------------------------
# events (time-series shapes)
# --------------------------------------------------------------------------

@register(
    "q50_events_hourly",
    """
    SELECT event_type,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling-window batch shape (streaming twin uses window()+watermark "
    "in klio_spark.streaming).",
)
def q50_events_hourly(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _dsum(F.col("value")).alias("total_value"),
    )


@register(
    "q51_sessionization",
    """
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events WHERE ts IS NOT NULL),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
    doc="gaps-and-islands sessionization (30-min inactivity): one window "
    "sort per user + one agg. The streaming twin is session_window(). "
    "NULL-timestamp events excluded on both engines (no session "
    "position; NULL sort defaults disagree cross-engine).",
)
def q51_sessionization(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    e.filter(F.col("ts").isNotNull()).createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, SUM(is_new) AS n_sessions, COUNT(*) AS n_events
        FROM flagged GROUP BY user_id
        """
    )


@register(
    "q52_events_json_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    GROUP BY event_type
    """,
    doc="semi-structured JSON prop extraction + predicate — get_json_object "
    "stays JVM-side; the filter prunes before aggregation.",
)
def q52_events_json_props(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )
