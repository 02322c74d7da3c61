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


# --------------------------------------------------------------------------
# bloom semi-join (q100)
# --------------------------------------------------------------------------


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """Every true member survives the prefilter (the bloom guarantee)."""
    from klio_spark.functions.bloom import bloom_bitmap, bloom_prefilter

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_brand") == "Brand#23"
    )
    keys = p.select(F.col("p_partkey").alias("_bloom_bk")).distinct()
    bm = bloom_bitmap(keys, "_bloom_bk")
    pre = set(
        r.l_orderkey
        for r in bloom_prefilter(li, "l_partkey", bm)
        .select("l_orderkey")
        .collect()
    )
    exact = set(
        r.l_orderkey
        for r in li.join(keys, li.l_partkey == keys._bloom_bk, "left_semi")
        .select("l_orderkey")
        .collect()
    )
    assert exact <= pre


def test_bloom_semi_join_is_exact(spark, sf_dir):
    """bloom_semi_join == plain semi-join, false positives and all."""
    from klio_spark.functions.bloom import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_size") <= 10
    )
    got = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in bloom_semi_join(li, "l_partkey", p, "p_partkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    want = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.join(
            p.select("p_partkey"), li.l_partkey == p.p_partkey, "left_semi"
        )
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want and got


def test_bloom_semi_join_coerces_mismatched_key_types(spark, sf_dir):
    """xxhash64 is type-sensitive where the equi-join would coerce: a
    string probe key against a bigint build key must still return every
    true match (the probe key is cast to the build type pre-hash)."""
    from klio_spark.functions.bloom import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "l_partkey", F.col("l_partkey").cast("string")
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_size") <= 10)
    got = bloom_semi_join(li, "l_partkey", p, "p_partkey").count()
    want = li.join(
        p.select("p_partkey"), li.l_partkey == p.p_partkey, "left_semi"
    ).count()
    assert got == want and got > 0


def test_bloom_prefilter_plan_is_all_broadcast(spark, sf_dir):
    """The probe side must reach the filter without shuffling: k broadcast
    hash joins against the bitmap, zero sort-merge joins."""
    from klio_spark.functions.bloom import bloom_bitmap, bloom_prefilter

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select(F.col("p_partkey").alias("_bloom_bk"))
        .distinct()
    )
    pre = bloom_prefilter(li, "l_partkey", bloom_bitmap(keys, "_bloom_bk"), k=5)
    assert plans.broadcast_join_count(pre) >= 5
    assert plans.sort_merge_join_count(pre) == 0


def test_bloom_bitmap_is_bounded(spark, sf_dir):
    """Bitmap rows never exceed m_bits/64 regardless of key count."""
    from klio_spark.functions.bloom import bloom_bitmap

    keys = spark.range(10000).select(F.col("id").alias("k"))
    bm = bloom_bitmap(keys, "k", m_bits=1 << 12, k=5)
    assert bm.count() <= (1 << 12) // 64


def test_q101_theta_envelope_and_set_identities(spark):
    """Theta estimates within envelope at every sf the harness touches,
    and the exact counts obey |A∪B| = |A∩B| + |A\\B| + |B\\A|."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = {r.setop: r for r in _rows(spark, sf, "q101_theta_set_ops")}
        assert all(r.theta_within_envelope for r in rows.values()), (sf, rows)
        i, u, d = (
            rows["intersection"].exact_count,
            rows["union"].exact_count,
            rows["difference"].exact_count,
        )
        # difference is A\B; B\A = union - intersection - difference >= 0
        assert u - i - d >= 0 and u >= max(i, d), (sf, rows)


# --------------------------------------------------------------------------
# persisted sketch tables
# --------------------------------------------------------------------------


def test_distinct_rollup_from_table_matches_direct(spark, sf_dir, tmp_path):
    """Rollups from the persisted sketch table must estimate identically
    to sketching the fact table directly — at every coarser grain."""
    from klio_spark.functions import sketch_table as skt

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "sk")
    skt.write_distinct_sketches(
        o, ["o_orderpriority", "o_orderstatus"], "o_custkey", path
    )
    # grain 1: priority
    got = {
        r.o_orderpriority: r.distinct_est
        for r in skt.distinct_rollup(spark, path, "o_orderpriority").collect()
    }
    want = {
        r.o_orderpriority: r.est
        for r in o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(12))).alias("est"))
        .collect()
    }
    assert got == want
    # grain 0: grand total
    total = skt.distinct_rollup(spark, path).collect()[0].distinct_est
    direct = (
        o.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(12))).alias("est")
        ).collect()[0].est
    )
    assert total == direct


def test_quantile_rollup_keeps_rank_guarantee(spark, sf_dir, tmp_path):
    """The merged KLL sketch's p50 must have true normalized rank within
    the sketch's epsilon (±0.03 at k=200) on the full fact column."""
    from klio_spark.functions import sketch_table as skt

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    path = str(tmp_path / "kll")
    skt.write_quantile_sketches(li, ["l_returnflag"], "l_extendedprice", path)
    v50 = skt.quantile_rollup(spark, path, 0.5).collect()[0].quantile_est
    rank = (
        li.agg(
            F.avg((F.col("l_extendedprice") <= v50).cast("double")).alias("r")
        ).collect()[0].r
    )
    assert 0.47 <= rank <= 0.53, (v50, rank)


def test_sketch_table_rollup_never_scans_fact(spark, sf_dir, tmp_path):
    """The rollup plan reads only the sketch parquet — the fact table
    must not appear in any scan."""
    from klio_spark import plans
    from klio_spark.functions import sketch_table as skt

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "sk2")
    skt.write_distinct_sketches(o, ["o_orderpriority"], "o_custkey", path)
    df = skt.distinct_rollup(spark, path)
    assert "orders.parquet" not in plans.plan_str(df)


def _mg_corpus(spark, n_keys=5000, hot=200):
    """Synthetic key stream: n_keys distinct keys, one hot key with
    `hot` extra occurrences — enough cardinality to exercise sharding."""
    base = spark.range(n_keys).select(
        F.col("id").alias("user_id"), F.col("id").alias("event_id")
    )
    hot_rows = spark.range(hot).select(
        F.lit(7).alias("user_id"), (F.col("id") + 1_000_000).alias("event_id")
    )
    return base.unionByName(hot_rows)


def test_mg_auto_shards_scales_with_cardinality(spark):
    """n_shards='auto' sizes shards from approx_count_distinct: a tiny
    keys_per_shard budget on a 5k-key corpus must fan out to multiple
    shards, complete, and keep the sandwich est <= true <= est + d."""
    from klio_spark.queries.sketches import (
        mg_chunk_counts,
        mg_sharded_summary,
    )

    df = _mg_corpus(spark)
    cc = mg_chunk_counts(
        df,
        key_col="user_id",
        chunk_key_col="event_id",
        n_shards="auto",
        keys_per_shard=1000,
    ).persist()
    n_shards = cc.select("shard").distinct().count()
    assert n_shards >= 4, n_shards  # ~5k keys / 1k budget
    summary = mg_sharded_summary(cc, capacity=8)
    truth = cc.groupBy("shard", "key").agg(F.sum("cnt").alias("t"))
    joined = summary.join(truth, ["shard", "key"]).collect()
    assert joined
    assert all(r.est <= r.t <= r.est + r.err_bound for r in joined), joined
    # the hot key dominates every other key by > any shard's d — it
    # MUST survive in its shard's summary (present-if-count > d)
    assert any(r.key == 7 for r in joined), joined
    cc.unpersist()


def test_mg_fold_guard_fails_loudly_not_oom(spark):
    """Tiny shard count x high key cardinality is the documented failure
    mode: the guard must raise a clear error NAMING the n_shards lever,
    not grind toward an executor OOM."""
    import pytest

    from klio_spark.queries.sketches import (
        mg_chunk_counts,
        mg_sharded_summary,
    )

    df = _mg_corpus(spark)
    cc = mg_chunk_counts(
        df, key_col="user_id", chunk_key_col="event_id", n_shards=1
    )
    summary = mg_sharded_summary(cc, capacity=8, max_fold_rows=100)
    with pytest.raises(Exception, match="raise n_shards"):
        summary.collect()
