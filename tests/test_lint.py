"""Plan-linter rules fire on constructed anti-patterns, stay silent on
clean plans — and EVERY declared query lints clean at warn level (no
cartesian products, no RDD round-trips, no row-at-a-time Python UDFs
anywhere in the registry)."""

import pytest
from pyspark.sql import functions as F

from klio_spark.plans.lint import assert_lints_clean, lint
from klio_spark.queries import all_queries


def _rules(df):
    return {f.rule for f in lint(df)}


def test_cartesian_product_flagged(spark):
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "id2")
    # SHUFFLE_REPLICATE_NL forces CartesianProduct (defeats the
    # auto-broadcast that would otherwise hide it at this size)
    df = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert "cartesian_product" in _rules(df)
    with pytest.raises(AssertionError, match="cartesian_product"):
        assert_lints_clean(df)


def test_rdd_roundtrip_flagged(spark):
    base = spark.range(50).withColumn("v", F.col("id") * 2)
    df = spark.createDataFrame(base.rdd, base.schema)
    assert "rdd_roundtrip" in _rules(df)


def test_python_row_udf_flagged_but_pandas_udf_clean(spark):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf, udf

    base = spark.range(50)
    rowwise = base.withColumn("v", udf(lambda x: x + 1, "long")("id"))
    assert "python_row_udf" in _rules(rowwise)

    inc = pandas_udf(lambda s: s + 1, "long")
    inc.__wrapped__.__annotations__ = {"s": pd.Series, "return": pd.Series}
    vectorized = base.withColumn("v", inc(F.col("id")))
    assert "python_row_udf" not in _rules(vectorized)


def test_global_sort_info_but_topk_clean(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert "global_sort" in _rules(li.orderBy("l_extendedprice"))
    # limit rewrites to TakeOrderedAndProject — no global sort node
    assert "global_sort" not in _rules(li.orderBy("l_extendedprice").limit(5))
    # info level never fails the warn-level gate
    assert_lints_clean(li.orderBy("l_extendedprice"))


def test_every_declared_query_lints_clean(spark, sf_dir):
    """The registry-wide guarantee: no error/warn finding in any of the
    ~97 declared query plans. This is what 'UDFs only where Catalyst
    can't express it, and then Arrow-batched' means, made enforceable."""
    # q85's connected-components loop and q127's pointer doubling
    # localCheckpoint each round (deliberate lineage truncation); that
    # prints as the same ExistingRDD node the rdd_roundtrip rule hunts
    allowed = {
        # localCheckpoint lineage truncation inside the label-propagation /
        # pointer-doubling fixpoints prints as an RDD scan — the truncation
        # is the point (unbounded lineage would stack-overflow the planner)
        "q85_dedup_clusters": ("rdd_roundtrip",),
        "q127_hierarchy_depth": ("rdd_roundtrip",),
        "q133_dedup_survivors": ("rdd_roundtrip",),
        "q134_semantic_dedup": ("rdd_roundtrip",),
        "q185_cluster_safe_split": ("rdd_roundtrip",),
        # k-core peels reference each round's edges ~5x (direct + both
        # semi joins' surv->deg lineage): per-round localCheckpoint is
        # what keeps the logical tree linear instead of 5^rounds
        "q215_k_core": ("rdd_roundtrip",),
    }
    failures = []
    for name, spec in all_queries().items():
        try:
            assert_lints_clean(spec.fn(spark, sf_dir), allow=allowed.get(name, ()))
        except AssertionError as e:
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(failures)
