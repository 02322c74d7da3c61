"""Count-min sketch table: bound guarantees, additivity, portability."""

import duckdb
import pytest
from pyspark.sql import functions as F

from klio_spark.functions.countmin import (
    build_countmin,
    cm_bucket_sql,
    cm_estimate,
    merge_countmin,
)

DEPTH, WIDTH = 4, 256


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_never_undercounts_and_bounded(spark, events):
    """CM estimates are >= true counts (always) and the estimate for a
    present key is <= true + N (trivially); spot the eps*N bound shape
    by checking total overflow mass is plausible for the width."""
    cm = build_countmin(events, "user_id", DEPTH, WIDTH).cache()
    probes = events.select("user_id").distinct()
    est = cm_estimate(cm, probes, "user_id", DEPTH, WIDTH)
    true = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("tc"))
    j = est.join(true, "user_id").collect()
    assert j, "no probes"
    n_total = events.count()
    for r in j:
        assert r["cm_est"] >= r["tc"], f"undercount for {r['user_id']}"
        # e/width * N bound with delta slack; generous factor 4
        assert r["cm_est"] - r["tc"] <= max(4 * 2.72 * n_total / WIDTH, 8)


def test_absent_key_small_estimate(spark, events):
    cm = build_countmin(events, "user_id", DEPTH, WIDTH)
    probes = spark.createDataFrame([(10**15 + 7,)], "user_id bigint")
    est = cm_estimate(cm, probes, "user_id", DEPTH, WIDTH).collect()[0]
    n_total = events.count()
    assert est["cm_est"] <= max(4 * 2.72 * n_total / WIDTH, 8)


def test_additivity_merge_equals_full_build(spark, events):
    """Counter tables built on disjoint halves, merged, must equal the
    single-pass build cell-for-cell — the incremental-refresh property."""
    a = build_countmin(events.filter(F.col("event_id") % 2 == 0), "user_id", DEPTH, WIDTH)
    b = build_countmin(events.filter(F.col("event_id") % 2 == 1), "user_id", DEPTH, WIDTH)
    merged = merge_countmin(a, b)
    full = build_countmin(events, "user_id", DEPTH, WIDTH)
    diff = merged.join(
        full.withColumnRenamed("cm_count", "fc"), ["cm_row", "cm_bucket"], "full"
    ).filter(
        F.coalesce("cm_count", F.lit(0)) != F.coalesce("fc", F.lit(0))
    )
    assert diff.count() == 0


def test_bucket_hash_matches_duckdb(spark):
    """The Spark bucket expression and cm_bucket_sql produce identical
    buckets for identical keys — the portability the q165 oracle rests on."""
    keys = [0, 1, 42, 999999999, -17, 123456789012345]
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    from klio_spark.functions.countmin import _bucket

    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", _bucket(F.col("k"), 2, WIDTH).alias("b")
        ).collect()
    }
    for k in keys:
        want = duckdb.sql(
            f"SELECT {cm_bucket_sql(str(k), 2, WIDTH)} AS b"
        ).fetchone()[0]
        assert got[k] == want, k
