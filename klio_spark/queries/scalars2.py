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
           list_sort(list(DISTINCT l_linestatus)) AS statuses,
           len(list(DISTINCT l_linestatus)) AS n_statuses,
           list_contains(list(DISTINCT l_linestatus), 'O') AS has_open
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="array aggregation: collect-distinct-sorted (deterministic order "
    "for the value hash) + array predicates.",
)
def q45_array_agg(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    statuses = F.array_sort(F.collect_set("l_linestatus"))
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
