"""Sketch queries (q98/q99): accuracy booleans, rollup consistency, and
the plan properties the 100 TB cost model depends on."""

from pyspark.sql import functions as F

from klio_spark import plans
from klio_spark.queries import all_queries


def _rows(spark, sf_dir, name):
    return all_queries()[name].fn(spark, sf_dir).collect()


def test_q98_hll_within_envelope_and_rollup_consistent(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q98_hll_distinct_rollup")
    by_grp = {r.grp: r for r in rows}
    assert all(r.hll_within_5pct for r in rows), rows
    # the ALL row is a sketch-merge rollup: distinct(all) <= sum of group
    # distincts, >= max group distinct
    groups = [r.exact_distinct for r in rows if r.grp != "ALL"]
    assert max(groups) <= by_grp["ALL"].exact_distinct <= sum(groups)


def test_q98_sketch_agg_is_partial(spark, sf_dir):
    df = all_queries()["q98_hll_distinct_rollup"].fn(spark, sf_dir)
    s = plans.plan_str(df)
    # DataSketches aggs run as ObjectHashAggregate with a map-side partial
    # pass — the exchange carries 4 KB sketches, not customer keys
    assert "ObjectHashAggregate" in s, s[:2000]


def test_q99_kll_rank_guarantee_holds(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q99_kll_quantile_ranks")
    assert rows and all(
        r.kll_p50_rank_ok and r.kll_p95_rank_ok for r in rows
    ), rows


def test_q99_rank_pass_broadcasts_the_quantile_dim(spark, sf_dir):
    df = all_queries()["q99_kll_quantile_ranks"].fn(spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 1, plans.plan_str(df)[:2000]


def test_hll_union_matches_direct_sketch(spark, sf_dir):
    """Merging per-group sketches must estimate like sketching the whole
    column directly — the property that makes sketch tables reusable."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    merged = (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        o.agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct
