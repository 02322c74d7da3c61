"""Sketch-based approximate statistics — the 100 TB answer to "how many
distinct" and "what's the p95".

At corpus scale, exact COUNT(DISTINCT) shuffles every distinct key and
exact percentiles sort every value; both are re-run from scratch for every
grouping the pipeline asks about.  Mergeable sketches (Apache DataSketches,
built into Spark as `hll_sketch_agg` / `kll_sketch_agg_*` /
`theta_sketch_agg`) change the cost model:

  * the aggregate is a FIXED-SIZE binary (HLL lgK=12 → 4 KB) with map-side
    partial merge, so the shuffle carries one sketch per partition×group,
    never the keys themselves;
  * sketches re-aggregate: `hll_union_agg` rolls per-group sketches up to
    any coarser grouping WITHOUT rescanning the fact table — compute once
    at the finest grain, answer every rollup from the sketch table.

Correctness-harness pattern: an approximate result can't hash-match an
exact oracle, so each query outputs the EXACT answer (the slow twin both
engines agree on) plus a boolean asserting the sketch landed within its
published error envelope.  DuckDB's oracle emits literal TRUE — the hash
matches if and only if the sketch estimate is actually inside the
envelope on this data.  The booleans are deterministic (DataSketches
hashing is seeded), so this is a stable, driver-checkable claim about
sketch accuracy, not a flaky tolerance test.

The exact twin exists only to referee: a production 100 TB run computes
the sketch column alone.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from klio_spark.queries import load, register, scoped_persist


@register(
    "q98_hll_distinct_rollup",
    """
    SELECT o_orderpriority AS grp,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS hll_within_5pct
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT 'ALL',
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           TRUE
    FROM orders
    """,
    doc="per-priority distinct-customer cardinality via HLL sketch "
    "(hll_sketch_agg, DataSketches HLL lgK=12), with the ALL row produced "
    "by MERGING the per-group sketches (hll_union_agg) — the rollup never "
    "rescans orders. Output carries the exact count plus a boolean that "
    "the estimate is within ±5% (≈3σ of the 1.6% standard error at "
    "lgK=12); the oracle emits TRUE, so the hash match IS the accuracy "
    "claim.",
)
def q98_hll_distinct_rollup(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")

    def ok(est, exact):
        return (F.abs(est.cast("double") - exact) <= 0.05 * exact).alias(
            "hll_within_5pct"
        )

    per = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.hll_sketch_agg("o_custkey").alias("_sk"),
    )
    per_out = per.select(
        F.col("o_orderpriority").alias("grp"),
        "exact_distinct",
        ok(F.hll_sketch_estimate("_sk"), F.col("exact_distinct")),
    )
    # rollup from sketches: one tiny agg over 5 rows of 4 KB binaries;
    # the exact twin re-scans orders only because the referee needs it
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    all_out = (
        o.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
        .crossJoin(union_est)
        .select(
            F.lit("ALL").alias("grp"),
            "exact_distinct",
            ok(F.col("_est"), F.col("exact_distinct")),
        )
    )
    return per_out.unionByName(all_out)


@register(
    "q101_theta_set_ops",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value > 200),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'error' AND value > 200)
    SELECT 'difference' AS setop,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS BIGINT) AS exact_count,
           TRUE AS theta_within_envelope
    UNION ALL
    SELECT 'intersection',
           CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT),
           TRUE
    UNION ALL
    SELECT 'union',
           CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS BIGINT),
           TRUE
    """,
    doc="distinct-set algebra via theta sketches (theta_sketch_agg + "
    "theta_intersection/theta_union/theta_difference): audience-overlap "
    "questions (users who purchased big AND errored big) without the "
    "self-join an exact engine needs. Each cohort aggregates to one "
    "fixed-size sketch (map-side partial merge — the shuffle carries "
    "sketches, not user ids) and the set ops combine the two scalars. "
    "The exact twin (full-outer join of the distinct cohorts) rides "
    "along as referee; the boolean asserts the estimate is within "
    "max(1, 5%) of exact, which theta's exact mode (<4096 entries) and "
    "its published 3σ error both satisfy deterministically.",
)
def q101_theta_set_ops(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    a = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 200)
    ).select("user_id")
    b = e.filter(
        (F.col("event_type") == "error") & (F.col("value") > 200)
    ).select("user_id")
    sk = (
        a.agg(F.theta_sketch_agg("user_id").alias("_ska"))
        .crossJoin(b.agg(F.theta_sketch_agg("user_id").alias("_skb")))
        .select(
            F.theta_sketch_estimate(
                F.theta_intersection("_ska", "_skb")
            ).alias("_est_i"),
            F.theta_sketch_estimate(F.theta_union("_ska", "_skb")).alias(
                "_est_u"
            ),
            F.theta_sketch_estimate(
                F.theta_difference("_ska", "_skb")
            ).alias("_est_d"),
        )
    )
    m = a.distinct().select("user_id", F.lit(True).alias("_a")).join(
        b.distinct().select("user_id", F.lit(True).alias("_b")),
        "user_id",
        "full",
    )
    exact = m.agg(
        F.sum((F.coalesce("_a", F.lit(False)) & F.coalesce("_b", F.lit(False))).cast("long")).alias("_x_i"),
        F.count(F.lit(1)).alias("_x_u"),
        F.sum((F.coalesce("_a", F.lit(False)) & ~F.coalesce("_b", F.lit(False))).cast("long")).alias("_x_d"),
    )

    def ok(est, x):
        return F.abs(est - x.cast("double")) <= F.greatest(
            F.lit(1.0), 0.05 * x.cast("double")
        )

    row = exact.crossJoin(sk)
    triples = F.array(
        F.struct(
            F.lit("intersection").alias("setop"),
            F.col("_x_i").alias("exact_count"),
            ok(F.col("_est_i"), F.col("_x_i")).alias("theta_within_envelope"),
        ),
        F.struct(
            F.lit("union").alias("setop"),
            F.col("_x_u").alias("exact_count"),
            ok(F.col("_est_u"), F.col("_x_u")).alias("theta_within_envelope"),
        ),
        F.struct(
            F.lit("difference").alias("setop"),
            F.col("_x_d").alias("exact_count"),
            ok(F.col("_est_d"), F.col("_x_d")).alias("theta_within_envelope"),
        ),
    )
    return row.select(F.explode(triples).alias("_t")).select(
        "_t.setop", "_t.exact_count", "_t.theta_within_envelope"
    )


@register(
    "q100_bloom_semi_join",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
    GROUP BY l_returnflag
    """,
    doc="semi-join reduction via an explicit Bloom bitmap "
    "(functions/bloom.py): the bitmap over Brand#23 partkeys is a fixed "
    "128 KiB (word,bits) table built with one shuffle over part only; the "
    "lineitem side is prefiltered by k map-side broadcast joins — zero "
    "shuffles of the fact table — and an exact semi-join over the "
    "survivors removes bloom false positives, so the result equals the "
    "plain semi-join the oracle runs. At 100 TB the bitmap is the "
    "persistable blocklist form of Spark's runtime bloom filter: build "
    "once, apply map-side in every pipeline.",
)
def q100_bloom_semi_join(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.bloom import bloom_semi_join

    li, p = load(spark, sf_dir, "lineitem", "part")
    matched = bloom_semi_join(
        li,
        "l_partkey",
        p.filter(F.col("p_brand") == "Brand#23"),
        "p_partkey",
    )
    m = 10000.0
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        (
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * m)
            ).cast("double")
            / m
        ).alias("revenue"),
    )


@register(
    "q99_kll_quantile_ranks",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
           TRUE AS kll_p50_rank_ok,
           TRUE AS kll_p95_rank_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="streaming-friendly quantiles via KLL sketch "
    "(kll_sketch_agg_double, default k=200 → ~1.65% normalized rank "
    "error). KLL guarantees RANK accuracy, not value accuracy: the value "
    "it returns for rank q has TRUE rank within q±ε. The boolean asserts "
    "exactly that — pull the sketch's p50/p95 values "
    "(kll_sketch_get_quantile_double), re-scan to compute each value's "
    "true normalized rank, require it within ±0.03. Exact percentiles "
    "(q07's sort-based twin, rounded at 6) ride along as the referee "
    "output. The second scan belongs to the referee, not the sketch: a "
    "production run reads the quantile straight off the sketch.",
)
def q99_kll_quantile_ranks(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    base = li.select("l_returnflag", F.col("l_extendedprice").alias("_x"))
    sk = base.groupBy("l_returnflag").agg(
        F.percentile("_x", F.array(F.lit(0.5), F.lit(0.95))).alias("_p"),
        F.kll_sketch_agg_double("_x").alias("_sk"),
    )
    dim = sk.select(
        "l_returnflag",
        F.round(F.col("_p")[0], 6).alias("median_price"),
        F.round(F.col("_p")[1], 6).alias("p95_price"),
        F.kll_sketch_get_quantile_double("_sk", F.lit(0.5)).alias("_v50"),
        F.kll_sketch_get_quantile_double("_sk", F.lit(0.95)).alias("_v95"),
    )
    # 3 rows of scalars — broadcast; the rank pass stays shuffle-light
    ranked = (
        base.join(F.broadcast(dim), "l_returnflag")
        .groupBy("l_returnflag", "median_price", "p95_price")
        .agg(
            F.avg((F.col("_x") <= F.col("_v50")).cast("double")).alias("_r50"),
            F.avg((F.col("_x") <= F.col("_v95")).cast("double")).alias("_r95"),
        )
    )
    return ranked.select(
        "l_returnflag",
        "median_price",
        "p95_price",
        ((F.col("_r50") >= 0.47) & (F.col("_r50") <= 0.53)).alias(
            "kll_p50_rank_ok"
        ),
        ((F.col("_r95") >= 0.92) & (F.col("_r95") <= 0.98)).alias(
            "kll_p95_rank_ok"
        ),
    )


@register(
    "q146_rolling_distinct_hll",
    """
    WITH ev AS (
      -- year-1 shift (719162 days): floor bucketing pre-1970 too —
      -- DuckDB integer // truncates toward zero exactly like Spark div
      SELECT CAST((epoch_us(ts) + 62135596800000000) // 86400000000
                  - 719162 AS BIGINT) AS d, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ev),
    x AS (
      SELECT days.d AS day, ev.user_id
      FROM days JOIN ev ON ev.d BETWEEN days.d - 6 AND days.d
    )
    SELECT day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_rolling_distinct,
           TRUE AS hll_within_5pct
    FROM x GROUP BY day
    """,
    doc="rolling 7-day distinct users from MERGED daily HLL sketches — "
    "the overlapping-window case where mergeability pays 7× over exact: "
    "the fact table is aggregated ONCE into one 4 KB sketch per day, and "
    "every window answer is a union of 7 sketches (each event fans out "
    "to the ≤7 window ends it serves — an integer-day explode, no range "
    "join, no re-scan per window; exact COUNT(DISTINCT) must instead "
    "carry every (window, user) pair through the shuffle). The exact "
    "answer rides along as referee with the q98 envelope-boolean "
    "pattern: the oracle emits TRUE, so the hash match IS the ±5% "
    "accuracy claim (deterministic — DataSketches hashing is seeded). "
    "Day ids are epoch-day BIGINTs; windows exist only for days present "
    "in the data (the distinct-day spine).",
)
def q146_rolling_distinct_hll(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # floor division matching the oracle's `//` even pre-1970: the year-1
    # epoch shift (62135596800000000 µs = 719162 whole days) keeps the
    # numerator non-negative, so truncating `div` equals floor — exact
    # bigint throughout (the _SECS convention in queries/behavior.py)
    ev = e.select(
        F.expr(
            "(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            " + 62135596800000000) div 86400000000 - 719162"
        ).alias("d"),
        "user_id",
    )
    days = ev.select("d").distinct()
    # sketch arm: one fact-table agg to daily sketches, then each daily
    # sketch fans out to the ≤7 windows it serves and merges per window
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("_sk"))
    sk = (
        daily.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("day"),
            "_sk",
        )
        .join(days.withColumnRenamed("d", "day"), "day", "left_semi")
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est"))
    )
    # exact referee: same window membership, distinct user per window
    exact = (
        ev.select(
            F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("day"),
            "user_id",
        )
        .join(days.withColumnRenamed("d", "day"), "day", "left_semi")
        .groupBy("day")
        .agg(
            F.countDistinct("user_id")
            .cast("bigint")
            .alias("exact_rolling_distinct")
        )
    )
    return exact.join(sk, "day").select(
        "day",
        "exact_rolling_distinct",
        (
            F.abs(F.col("_est").cast("double") - F.col("exact_rolling_distinct"))
            <= 0.05 * F.col("exact_rolling_distinct")
        ).alias("hll_within_5pct"),
    )


from klio_spark.functions.countmin import (  # noqa: E402
    build_countmin,
    cm_bucket_sql,
    cm_estimate,
    merge_countmin,
)

_CM_D, _CM_W = 4, 64  # depth x width — width far below key cardinality,
# so collisions genuinely occur and the MIN-over-rows estimate is exercised


def _cm_counters_sql(key_expr, source_sql, depth, width):
    """UNION ALL of per-row grouped counts — the oracle's counter table."""
    return " UNION ALL ".join(
        f"SELECT {r} AS cm_row, {cm_bucket_sql(key_expr, r, width)} AS cm_bucket, "
        f"COUNT(*) AS cm_count FROM ({source_sql}) GROUP BY 2"
        for r in range(depth)
    )


def _cm_probe_rb_sql(key_expr, probes_sql, depth, width):
    return " UNION ALL ".join(
        f"SELECT {key_expr} AS k, {r} AS cm_row, "
        f"{cm_bucket_sql(key_expr, r, width)} AS cm_bucket FROM ({probes_sql})"
        for r in range(depth)
    )


@register(
    "q165_countmin_freq",
    f"""
    WITH facts AS (
      SELECT user_id FROM events WHERE user_id IS NOT NULL
    ),
    counters AS (
      {_cm_counters_sql('user_id', 'SELECT user_id FROM facts', _CM_D, _CM_W)}
    ),
    probes AS (
      SELECT DISTINCT user_id FROM facts WHERE user_id < 20
    ),
    probe_rb AS (
      {_cm_probe_rb_sql('user_id', 'SELECT user_id FROM probes', _CM_D, _CM_W)}
    ),
    est AS (
      SELECT p.k AS user_id, MIN(COALESCE(c.cm_count, 0)) AS cm_est
      FROM probe_rb p LEFT JOIN counters c USING (cm_row, cm_bucket)
      GROUP BY 1
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS n FROM facts WHERE user_id < 20 GROUP BY 1
    )
    SELECT e.user_id, CAST(e.cm_est AS BIGINT) AS cm_est,
           CAST(x.n AS BIGINT) AS exact_n,
           e.cm_est >= x.n AS never_undercounts
    FROM est e JOIN exact x USING (user_id)
    """,
    doc="count-min sketch point-frequency estimates "
    "(functions/countmin.py): the fact table collapses to a "
    f"{_CM_D}x{_CM_W} counter grid in ONE map-side-combinable pass "
    "(the shuffle moves counter partials, never fact rows), probes "
    "broadcast-join the tiny grid, and est = MIN over depth rows — "
    "the classic (eps, delta) overestimate. Width is deliberately far "
    "below the key cardinality so real collisions occur; the oracle "
    "replays the identical md5 bucket math cell-for-cell, and the "
    "`never_undercounts` column is the CM lower-bound guarantee "
    "checked per key on both engines. Reference parity: the scale "
    "form of klio's per-name exact metrics counters "
    "(core/src/klio_core/metrics) for unbounded key domains.",
)
def q165_countmin_freq(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    facts = ev.filter(F.col("user_id").isNotNull()).select("user_id")
    counters = build_countmin(facts, "user_id", depth=_CM_D, width=_CM_W)
    probes = facts.filter(F.col("user_id") < 20).distinct()
    est = cm_estimate(counters, probes, "user_id", depth=_CM_D, width=_CM_W)
    exact = (
        facts.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return est.join(exact, "user_id").select(
        "user_id",
        F.col("cm_est").cast("bigint").alias("cm_est"),
        F.col("n").cast("bigint").alias("exact_n"),
        (F.col("cm_est") >= F.col("n")).alias("never_undercounts"),
    )


_CMM_D, _CMM_W = 3, 32


@register(
    "q166_countmin_merge",
    f"""
    WITH facts AS (
      SELECT event_type FROM events
      WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    ),
    counters AS (
      {_cm_counters_sql('event_type', 'SELECT event_type FROM facts',
                        _CMM_D, _CMM_W)}
    )
    SELECT CAST(cm_row AS INT) AS cm_row,
           CAST(cm_bucket AS BIGINT) AS cm_bucket,
           CAST(cm_count AS BIGINT) AS cm_count
    FROM counters
    """,
    doc="count-min additivity — the property that makes the sketch a "
    "TABLE you maintain instead of a query you re-run: the Spark side "
    "builds one sketch per event_id-parity half of the corpus and "
    "cell-wise SUMS them (merge_countmin); the oracle builds straight "
    "over the whole corpus. The hash match proves merge(build(A), "
    "build(B)) == build(A ∪ B) counter-for-counter, which is exactly "
    "the daily-rollup / streaming-foreachBatch refresh story: partial "
    "sketches merge without fact rescans, the same lifecycle as the "
    "q98/q147 HLL tables.",
)
def q166_countmin_merge(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    facts = ev.filter(
        F.col("event_type").isNotNull() & F.col("event_id").isNotNull()
    ).select("event_type", "event_id")
    halves = [
        build_countmin(
            facts.filter(F.pmod(F.col("event_id"), F.lit(2)) == i).select(
                "event_type"
            ),
            "event_type",
            depth=_CMM_D,
            width=_CMM_W,
        )
        for i in (0, 1)
    ]
    return merge_countmin(*halves).select(
        F.col("cm_row").cast("int").alias("cm_row"),
        F.col("cm_bucket").cast("bigint").alias("cm_bucket"),
        F.col("cm_count").cast("bigint").alias("cm_count"),
    )


@register(
    "q175_cm_filtered_heavy_keys",
    """
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id HAVING COUNT(*) >= 80
    """,
    doc="EXACT heavy-key counts through a count-min pre-filter "
    "(functions/countmin.py cm_filter_heavy) — the two-pass pattern "
    "that replaces a full groupBy over an unbounded key domain: pass 1 "
    "collapses the facts to a 4x128 counter grid (map-side partials), "
    "pass 2 drops every fact row whose key's CM estimate is below the "
    "threshold BEFORE any per-key shuffle (the estimate is 4 broadcast "
    "joins against the grid — map-side, zero fact exchange), and only "
    "the candidate slice reaches the exact groupBy. CM never "
    "undercounts, so no true-heavy key can be filtered out; the final "
    "HAVING removes collision false positives — which is why the "
    "oracle is the PLAIN exact query: the sketch machinery is provably "
    "answer-transparent, and the hash check proves it on real "
    "collisions (width 128 << 1,500 keys at sf0.1). At 100 TB the "
    "exchange carries the heavy slice, not 1e12 rows by a "
    "1e11-cardinality key.",
)
def q175_cm_filtered_heavy_keys(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.countmin import cm_filter_heavy

    (ev,) = load(spark, sf_dir, "events")
    return cm_filter_heavy(
        ev.select("user_id"), "user_id", threshold=80, depth=4, width=128
    )


def _mg_pivot_cte(k: int, cap: int) -> str:
    """One unrolled Misra-Gries compression step in SQL: pivot = the
    (cap+1)-th largest count of summary m{k} per shard (0 when ≤ cap
    keys — a multiset order statistic, tie-order-independent), survivors
    = keys strictly above the pivot, decremented by it."""
    return f"""
    p{k} AS (
      SELECT shard, COALESCE(MAX(CASE WHEN rn = {cap + 1} THEN c END), 0)
               AS pv
      FROM (SELECT shard, c,
                   ROW_NUMBER() OVER (PARTITION BY shard ORDER BY c DESC)
                     AS rn
            FROM m{k})
      GROUP BY shard
    ),
    s{k} AS (
      SELECT m.shard, m.key, m.c - p.pv AS c
      FROM m{k} m JOIN p{k} p USING (shard)
      WHERE m.c > p.pv
    )"""


_MG_SHARDS, _MG_CHUNKS, _MG_CAP = 4, 3, 8

# Default per-shard distinct-key budget for n_shards='auto', and the
# hard ceiling one fold task will accept before failing with a clear
# message. A shard's pandas frame holds ~distinct_keys_in_shard *
# n_chunks rows of 4 int64s (~32 B + pandas overhead), so 2M keys/shard
# * 3 chunks ≈ 6M rows ≈ a few hundred MB — comfortable on a normal
# executor; the ceiling trips well before an OOM would.
_MG_AUTO_KEYS_PER_SHARD = 2_000_000
_MG_MAX_FOLD_ROWS = 20_000_000


def mg_chunk_counts(
    df,
    *,
    key_col: str,
    chunk_key_col: str,
    n_shards: int | str = "auto",
    n_chunks: int = _MG_CHUNKS,
    keys_per_shard: int = _MG_AUTO_KEYS_PER_SHARD,
):
    """(shard, chunk, key, cnt) — the single map-side-combined pass over
    the raw events that everything Misra-Gries consumes. Keys hash to
    ``n_shards`` disjoint shards (portable md5, so the DuckDB oracle can
    replay it); rows split into ``n_chunks`` arrival chunks by the
    chunk key, giving the fold a deterministic merge order.

    ``n_shards`` is THE 100 TB lever (summary state = shards * capacity
    regardless of key cardinality) and accepts 'auto': one cheap
    approx_count_distinct pass sizes it to ``keys_per_shard`` distinct
    keys per shard, so the per-shard fold input stays bounded no matter
    the corpus. NOTE: the summary's per-key estimates depend on the
    shard composition (different n_shards => different, equally valid
    summaries — the sandwich est <= true <= est + d holds for all),
    so 'auto' is for serving, not for hash-pinned oracle twins.
    """
    from klio_spark.functions.dedup import md5_token_hash

    if n_shards == "auto":
        approx = (
            df.filter(F.col(key_col).isNotNull())
            .agg(F.approx_count_distinct(key_col).alias("n"))
            .first()["n"]
        )
        n_shards = max(1, -(-int(approx) // keys_per_shard))
    base = df.filter(F.col(key_col).isNotNull()).select(
        (md5_token_hash(F.col(key_col).cast("string")) % n_shards)
        .alias("shard"),
        (md5_token_hash(F.col(chunk_key_col).cast("string")) % n_chunks)
        .alias("chunk"),
        F.col(key_col).alias("key"),
    )
    return base.groupBy("shard", "chunk", "key").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def mg_sharded_summary(
    chunk_counts,
    *,
    capacity: int,
    n_chunks: int = _MG_CHUNKS,
    max_fold_rows: int = _MG_MAX_FOLD_ROWS,
):
    """Fold each shard's per-chunk exact counts into a Misra-Gries
    summary of <= ``capacity`` keys: (shard, key, est, err_bound).

    One applyInPandas group per shard holds that shard's distinct-key
    chunk-count frame — bounded by the sharding, not by this function.
    ``max_fold_rows`` is the guard on that bound: a shard whose frame
    exceeds it fails LOUDLY with the lever spelled out (raise n_shards
    / use n_shards='auto' in mg_chunk_counts) instead of grinding into
    an executor OOM. Set it to 0/None to disable."""
    import pandas as pd

    from klio_spark.streaming import mg_fold

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if max_fold_rows and len(pdf) > max_fold_rows:
            raise ValueError(
                f"misra-gries shard {int(pdf['shard'].iloc[0])} holds "
                f"{len(pdf)} chunk-count rows (> max_fold_rows="
                f"{max_fold_rows}): too many distinct keys per shard — "
                "raise n_shards (or pass n_shards='auto') in "
                "mg_chunk_counts so each shard's key set fits one task"
            )
        merged, d = {}, 0
        for ch in range(n_chunks):
            sub = pdf[pdf["chunk"] == ch]
            merged, d = mg_fold(
                merged, dict(zip(sub["key"], sub["cnt"])), capacity, d
            )
        ks = sorted(merged)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])] * len(ks),
                "key": [int(k) for k in ks],
                "est": [int(merged[k]) for k in ks],
                "err_bound": [int(d)] * len(ks),
            }
        )

    return chunk_counts.groupBy("shard").applyInPandas(
        fold, "shard bigint, key bigint, est bigint, err_bound bigint"
    )

_MG_ORACLE = (
    f"""
    WITH base AS (
      SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % {_MG_SHARDS} AS shard,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % {_MG_CHUNKS} AS chunk,
             user_id AS key
      FROM events WHERE user_id IS NOT NULL
    ),
    c0 AS (SELECT shard, key, COUNT(*) AS c FROM base WHERE chunk = 0
           GROUP BY shard, key),
    c1 AS (SELECT shard, key, COUNT(*) AS c FROM base WHERE chunk = 1
           GROUP BY shard, key),
    c2 AS (SELECT shard, key, COUNT(*) AS c FROM base WHERE chunk = 2
           GROUP BY shard, key),
    m1 AS (SELECT * FROM c0),"""
    + _mg_pivot_cte(1, _MG_CAP)
    + """,
    m2 AS (SELECT shard, key, SUM(c) AS c
           FROM (SELECT * FROM s1 UNION ALL SELECT * FROM c1)
           GROUP BY shard, key),"""
    + _mg_pivot_cte(2, _MG_CAP)
    + """,
    m3 AS (SELECT shard, key, SUM(c) AS c
           FROM (SELECT * FROM s2 UNION ALL SELECT * FROM c2)
           GROUP BY shard, key),"""
    + _mg_pivot_cte(3, _MG_CAP)
    + """,
    shards AS (SELECT DISTINCT shard FROM base),
    err AS (
      SELECT sh.shard,
             COALESCE(p1.pv, 0) + COALESCE(p2.pv, 0) + COALESCE(p3.pv, 0)
               AS d
      FROM shards sh
      LEFT JOIN p1 ON sh.shard = p1.shard
      LEFT JOIN p2 ON sh.shard = p2.shard
      LEFT JOIN p3 ON sh.shard = p3.shard
    ),
    truth AS (SELECT shard, key, COUNT(*) AS true_cnt FROM base
              GROUP BY shard, key)
    SELECT s.shard, s.key, CAST(s.c AS BIGINT) AS est,
           CAST(e.d AS BIGINT) AS err_bound,
           CAST(t.true_cnt AS BIGINT) AS true_cnt,
           s.c <= t.true_cnt AS sandwich_lo,
           t.true_cnt <= s.c + e.d AS sandwich_hi
    FROM s3 s
    JOIN err e USING (shard)
    JOIN truth t USING (shard, key)
    """
)


@register(
    "q181_misra_gries_heavy_hitters",
    _MG_ORACLE,
    doc="Batch Misra-Gries heavy hitters — the driver-oracle-checked "
    "registry twin of the streaming sharded summary "
    "(streaming/__init__.py stateful_heavy_hitters), running the SAME "
    "mg_fold kernel (Agarwal et al. 2013 merge step). Keys shard by a "
    "portable md5 hash (disjoint key sets — union is the global "
    "answer); rows chunk 3 ways by event_id hash and each shard folds "
    "its per-chunk EXACT counts in chunk order: merge-add, then if "
    "more than `capacity` keys survive subtract the (capacity+1)-th "
    "largest counter from all and drop non-positives. The oracle "
    "UNROLLS the fold into CTEs (the q152-PageRank technique): pivots "
    "are multiset order statistics, so every arithmetic step is "
    "integer and tie-order-independent — both engines walk bit-"
    "identical summaries. Emits per surviving key the estimate, the "
    "cumulative subtracted mass d, the exact count, and the classic "
    "sandwich est <= true <= est + d as booleans the hash check "
    "proves. Scale shape: chunk counts are one map-side-combined "
    "groupBy (never raw events into Python); the fold state is "
    "<= capacity entries/shard REGARDLESS of key cardinality — at "
    "100 TB raise n_shards, keep capacity, and the summary stays "
    "shards x capacity rows while an exact top-k would shuffle every "
    "distinct key. The lever is code, not prose: "
    "mg_chunk_counts(n_shards='auto') sizes shards from one "
    "approx_count_distinct pass, and mg_sharded_summary's "
    "max_fold_rows guard fails loudly (naming the lever) if a shard's "
    "fold frame outgrows one task (tests/test_sketches.py locks both).",
)
def q181_misra_gries_heavy_hitters(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    chunk_counts = mg_chunk_counts(
        e,
        key_col="user_id",
        chunk_key_col="event_id",
        n_shards=_MG_SHARDS,
        n_chunks=_MG_CHUNKS,
    )
    # one pass over raw events total: the exact referee counts are the
    # SUM of the per-chunk counts — a second-level agg over the tiny
    # count table, not a rescan (and not a second md5 pass)
    chunk_counts = scoped_persist(chunk_counts)
    summary = mg_sharded_summary(
        chunk_counts, capacity=_MG_CAP, n_chunks=_MG_CHUNKS
    )
    truth = chunk_counts.groupBy("shard", "key").agg(
        F.sum("cnt").alias("true_cnt")
    )
    return summary.join(truth, ["shard", "key"]).select(
        "shard",
        "key",
        "est",
        "err_bound",
        F.col("true_cnt").cast("bigint").alias("true_cnt"),
        (F.col("est") <= F.col("true_cnt")).alias("sandwich_lo"),
        (F.col("true_cnt") <= F.col("est") + F.col("err_bound")).alias(
            "sandwich_hi"
        ),
    )
