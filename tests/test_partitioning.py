import pytest
from pyspark.sql import functions as F

from klio_spark import plans
from klio_spark.plans.partitioning import salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # skew: 90% of left rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(0, "hot"), (10, "a"), (20, "b")], "k long, name string"
    )
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, "k", salts=8).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(0, 10000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([(7, "x")], "k long, name string")
    out = salted_join(left, right, "k", salts=16)
    assert out.count() == 10000
    # the shuffle key includes the salt -> hashpartitioning(k, _salt)
    s = plans.plan_str(out)
    assert "_salt" in s


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a_val")
    )
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b_val")
    )
    try:
        write_bucketed(a, "bk_a", "k", buckets=8)
        write_bucketed(b, "bk_b", "k", buckets=8)
        joined = (
            spark.table("bk_a")
            .hint("merge")  # force SMJ: broadcast would hide the bucketing story
            .join(spark.table("bk_b"), "k")
        )
        assert joined.count() == 500
        assert plans.num_shuffles(joined) == 0, plans.plan_str(joined)[:3000]
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
