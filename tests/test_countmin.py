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


def test_cm_filter_heavy_exact_and_selective(spark):
    """cm_filter_heavy == plain groupBy+HAVING on a skewed corpus
    (answer transparency: CM never undercounts, HAVING cleans false
    positives), and the pre-filter actually DROPS the long tail before
    the exact aggregation (selectivity — the point of the pattern)."""
    from klio_spark.functions.countmin import build_countmin, cm_filter_heavy, _bucket

    rows = (
        [(1,)] * 500 + [(2,)] * 200 + [(3,)] * 100
        + [(100 + i,) for i in range(400)]  # 400 singleton keys
    )
    df = spark.createDataFrame(rows, "user_id bigint")
    got = {
        (r.user_id, r.cnt)
        for r in cm_filter_heavy(
            df, "user_id", threshold=100, depth=3, width=32
        ).collect()
    }
    assert got == {(1, 500), (2, 200), (3, 100)}

    # selectivity: count candidate rows surviving the broadcast filter
    counters = build_countmin(df, "user_id", depth=3, width=32)
    key = F.col("user_id")
    out = df
    for r in range(3):
        cr = (
            counters.filter(F.col("cm_row") == r)
            .select(F.col("cm_bucket").alias(f"_b{r}"),
                    F.col("cm_count").alias(f"_c{r}"))
        )
        out = out.withColumn(f"_b{r}", _bucket(key, r, 32)).join(
            F.broadcast(cr), f"_b{r}", "left"
        )
    est = F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0)) for r in range(3)])
    n_cand = out.filter(est >= 100).count()
    # the three heavy keys' 800 rows must pass; the 400-singleton tail
    # mostly drops (collisions admit a bounded leak)
    assert 800 <= n_cand < 1100, n_cand
