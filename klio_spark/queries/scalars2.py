"""Second tranche of scalar/aggregate surface: extended string functions,
array aggregation, calendar functions, and a custom grouped UDAF via
applyInPandas (the pandas-native aggregation slot)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from klio_spark.queries import load, register


@register(
    "q44_string_funcs2",
    """
    SELECT p_partkey,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           strpos(p_name, 'a') AS first_a,
           left(p_name, 4) AS name_head,
           right(p_type, 3) AS type_tail,
           reverse(p_brand) AS brand_rev,
           repeat('*', p_size % 5) AS stars,
           translate(p_brand, '#', '-') AS brand_dash
    FROM part WHERE p_partkey % 3 = 0
    """,
    doc="extended string surface: pad/locate/slice/reverse/repeat/translate.",
)
def q44_string_funcs2(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 3 == 0).select(
        "p_partkey",
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_name", "a").alias("first_a"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.substring(F.col("p_type"), -3, 3).alias("type_tail"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 5).cast("int")).alias("stars"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
    )


@register(
    "q45_array_agg",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           len(list(DISTINCT l_linestatus)) AS n_statuses,
           list_contains(list(DISTINCT l_linestatus), 'O') AS has_open
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="array aggregation: collect-distinct-sorted + array predicates. The "
    "array is serialized to a CSV string for the comparison — a raw "
    "ARRAY<STRING> output crashes pandas-based canonicalizers "
    "(unhashable list in sort_values).",
)
def q45_array_agg(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    statuses = F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus")))
    return l.groupBy("l_returnflag").agg(
        statuses.alias("statuses"),
        F.size(F.collect_set("l_linestatus")).alias("n_statuses"),
        F.array_contains(F.collect_set("l_linestatus"), "O").alias("has_open"),
    )


@register(
    "q46_calendar_funcs",
    """
    SELECT CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) AS INT) AS iso_weekday,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
    doc="calendar surface: quarter + ISO weekday (Spark weekday is "
    "0=Monday, DuckDB isodow is 1=Monday — normalized to ISO).",
)
def q46_calendar_funcs(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.quarter("o_orderdate").alias("qtr"),
        (F.weekday("o_orderdate") + 1).alias("iso_weekday"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q09_arg_min_max",
    """
    SELECT o_custkey,
           arg_max(o_orderkey,
                   CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                     * 10000000000 + o_orderkey) AS biggest_order,
           arg_min(o_orderkey,
                   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                     * 10000000000 + o_orderkey) AS first_order,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
    doc="arg-max/arg-min aggregation (Spark max_by/min_by): the 'row of "
    "the extreme' without a window sort. BOTH args order by a composite "
    "(value, orderkey) bigint — day-granular dates tie, amplified "
    "corpora duplicate prices within a customer, and a tied arg is "
    "engine-arbitrary (the 3x-amplified sweep caught exactly that on "
    "the price arg_max). Price integerizes to exact cents first "
    "(2-decimal corpus); bounds: cents*1e10 fits int64 only up to "
    "cents ~9.2e8, i.e. ~$9.2M (the orderkey addend tightens it "
    "slightly), and the composite assumes orderkey < 1e10 (the "
    "documented surrogate convention). TPC-H prices top out ~$600K, "
    "well inside the bound.",
)
def q09_arg_min_max(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    first_key = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("long")
        * F.lit(10000000000).cast("long")
        + F.col("o_orderkey")
    )
    biggest_key = (
        F.floor(F.col("o_totalprice") * 100).cast("long")
        * F.lit(10000000000).cast("long")
        + F.col("o_orderkey")
    )
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", biggest_key).alias("biggest_order"),
        F.min_by("o_orderkey", first_key).alias("first_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "q47_regexp_filter",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE regexp_matches(p_name, '^[a-m].*(ed|ing)')
      AND NOT regexp_matches(p_type, 'BRASS')
    """,
    doc="regexp predicates: RLIKE filters evaluated in the scan stage.",
)
def q47_regexp_filter(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").rlike("^[a-m].*(ed|ing)")
        & ~F.col("p_type").rlike("BRASS")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "q08_grouped_pandas_udaf",
    """
    SELECT l_returnflag,
           ROUND(EXP(AVG(LN(l_extendedprice))), 6) AS geomean_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="custom grouped aggregate via applyInPandas (geometric mean): the "
    "pandas-UDAF slot for aggregates Catalyst lacks; numpy inside Arrow "
    "batches, one shuffle on the group key.",
)
def q08_grouped_pandas_udaf(spark: SparkSession, sf_dir: str):
    import numpy as np
    import pandas as pd

    (l,) = load(spark, sf_dir, "lineitem")

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"].to_numpy()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "geomean_price": [round(float(np.exp(np.mean(np.log(x)))), 6)],
                "n": [len(x)],
            }
        )

    return (
        l.select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(geomean, "l_returnflag string, geomean_price double, n long")
    )
