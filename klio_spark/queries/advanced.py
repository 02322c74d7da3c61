"""Advanced relational shapes: non-equi self-join, as-of join, analytic
windows (ntile/percent_rank), pivot, correlated-subquery rewrite, batch
twin of the streaming tumbling window.

The as-of join is the canonical "operator Spark lacks" (SURVEY §2 note):
implemented as union+tag+forward-fill window — ONE shuffle on the key,
no range-explosion — and oracle-checked against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.queries import load, register, scoped_persist


@register(
    "q14_nonequi_self_join",
    """
    SELECT a.l_orderkey AS orderkey,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(FLOOR(ABS(a.l_extendedprice - b.l_extendedprice) * 10000.0)
               AS BIGINT)) AS DOUBLE) / 10000.0 AS price_spread
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY a.l_orderkey
    """,
    doc="non-equi self-join (pairs within an order): the equi part of the "
    "predicate drives the shuffle; the < condition filters inside each "
    "co-partition — no cross-join blowup.",
)
def q14_nonequi_self_join(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    a = l.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("ln_a"),
        F.col("l_extendedprice").alias("p_a"),
    )
    b = l.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("ln_b"),
        F.col("l_extendedprice").alias("p_b"),
    )
    return (
        a.join(b, ["orderkey"])
        .filter(F.col("ln_a") < F.col("ln_b"))
        .groupBy("orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(
                    F.floor(F.abs(F.col("p_a") - F.col("p_b")) * 10000.0)
                ).cast("double")
                / 10000.0
            ).alias("price_spread"),
        )
    )


@register(
    "q15_asof_join",
    """
    WITH errors AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'error'),
         clicks AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click')
    SELECT e.event_id, e.user_id, c.ts AS last_click_ts
    FROM errors e
    ASOF LEFT JOIN clicks c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    doc="as-of join (most recent click at/before each error): union+tag+"
    "forward-fill window — one shuffle on user_id, cost O(n log n) per "
    "key, vs DuckDB's native ASOF JOIN as the oracle.",
)
def q15_asof_join(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(1).alias("_is_err")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("_is_err"),
    )
    # clicks sort before errors at equal ts (tag order) => e.ts >= c.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_is_err")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = errors.unionByName(clicks).withColumn(
        "last_click_ts",
        F.last(F.when(F.col("_is_err") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return filled.filter(F.col("_is_err") == 1).select(
        "event_id", "user_id", "last_click_ts"
    )


@register(
    "q24_ntile_percent_rank",
    """
    SELECT o_orderkey,
           o_orderpriority,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="analytic windows: ntile + percent_rank share one window sort.",
)
def q24_ntile_percent_rank(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "q43_null_scalars",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment,
           GREATEST(c_acctbal, 0.0) AS pos_bal,
           LEAST(c_acctbal, 1000.0) AS capped_bal,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS status
    FROM customer
    """,
    doc="null-handling scalar surface: coalesce/nullif/greatest/least/case.",
)
def q43_null_scalars(spark: SparkSession, sf_dir: str):
    (c,) = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("pos_bal"),
        F.least("c_acctbal", F.lit(1000.0)).alias("capped_bal"),
        F.when(F.col("c_acctbal") < 0, "overdrawn").otherwise("ok").alias("status"),
    )


@register(
    "q53_tumbling_window_batch",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    doc="batch twin of streaming.tumbling_counts: window('1 hour') on a "
    "static frame equals epoch-aligned date_trunc buckets. NULL "
    "timestamps are excluded on both engines — Spark's window() drops "
    "them silently while SQL GROUP BY would keep a NULL bucket.",
)
def q53_tumbling_window_batch(spark: SparkSession, sf_dir: str):
    from klio_spark.streaming import tumbling_counts

    (e,) = load(spark, sf_dir, "events")
    # watermark is a no-op on batch frames; drop it by calling window() here
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


@register(
    "q56_time_rollup_multigrain",
    """
    WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    SELECT COALESCE(CAST(date_trunc('day', ts) AS TIMESTAMP), TIMESTAMP '1970-01-01') AS day,
           COALESCE(CAST(date_trunc('hour', ts) AS TIMESTAMP), TIMESTAMP '1970-01-01') AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
    FROM e
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)),
                            ())
    """,
    doc="hypertable-style continuous-aggregate rollup: hourly + daily + "
    "grand total in ONE scan via grouping sets (Expand feeds one hash "
    "agg) — the batch shape of a multi-granularity rollup cascade.",
)
def q56_time_rollup_multigrain(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    hour = F.date_trunc("hour", "ts")
    epoch = F.lit("1970-01-01").cast("timestamp")
    return (
        e.select(day.alias("_day"), hour.alias("_hour"), "value")
        .groupingSets(
            [["_day", "_hour"], ["_day"], []],
            F.col("_day"),
            F.col("_hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 10000.0)).cast("double") / 10000.0).alias(
                "total_value"
            ),
        )
        .select(
            F.coalesce("_day", epoch).alias("day"),
            F.coalesce("_hour", epoch).alias("hour"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q54_pivot",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
    FROM events
    GROUP BY user_id
    """,
    doc="pivot on a bounded category set — compiles to one conditional "
    "aggregation pass (never pivot on unbounded cardinality).",
)
def q54_pivot(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        F.coalesce("click", F.lit(0)).alias("click"),
        F.coalesce("view", F.lit(0)).alias("view"),
        F.coalesce("purchase", F.lit(0)).alias("purchase"),
    )


@register(
    "q102_unpivot",
    """
    SELECT p_brand, metric,
           CAST(SUM(CAST(FLOOR(val * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total,
           COUNT(*) AS n
    FROM (
        SELECT p_brand, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_brand, 'p_retailprice', p_retailprice FROM part
    )
    GROUP BY p_brand, metric
    """,
    doc="unpivot/melt (the inverse of q54's pivot): wide measure columns "
    "become (metric, value) rows via DataFrame.unpivot — one Expand node, "
    "no join and no shuffle until the downstream aggregation, which gets "
    "map-side partial combine on (brand, metric). The fan-out factor is "
    "the number of measure columns, fixed at plan time.",
)
def q102_unpivot(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    m = 10000.0
    long = p.select(
        "p_brand",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_brand"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("p_brand", "metric").agg(
        (F.sum(F.floor(F.col("val") * m)).cast("double") / m).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q55_above_group_avg",
    """
    SELECT p_partkey, p_brand, p_retailprice
    FROM (SELECT p_partkey, p_brand, p_retailprice,
                 AVG(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
          FROM part)
    WHERE p_retailprice > brand_avg
    """,
    doc="correlated-subquery shape (price above brand average) rewritten "
    "as a window — one pass instead of subquery-per-row.",
)
def q55_above_group_avg(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    return (
        p.withColumn("brand_avg", F.avg("p_retailprice").over(w))
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


@register(
    "q130_interval_join_batch",
    """
    WITH l AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS lts
               FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS rts
               FROM events WHERE event_type = 'click')
    SELECT l.user_id AS user_id, COUNT(*) AS n_pairs,
           -- year-1 shift: DuckDB's integer // truncates toward zero
           -- (like Spark div); both sides FLOOR by shifting non-negative
           CAST(SUM((epoch_us(l.lts) + 62135596800000000) // 1000000
                    - (epoch_us(r.rts) + 62135596800000000) // 1000000)
                AS BIGINT) AS sum_lag_secs
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND r.rts <= l.lts AND r.rts > l.lts - INTERVAL 10 MINUTE
    GROUP BY 1
    """,
    doc="batch twin of streaming.interval_join (the stream-stream "
    "time-bounded join whose state both watermarks bound): each purchase "
    "joins the user's clicks from the preceding 10 minutes — the SAME "
    "interval_join function runs here on static frames (watermarks are "
    "no-ops in batch), so the join condition the streaming path executes "
    "is what gets hash-verified. Lag seconds integerize via unix_micros "
    "div 1e6 on both engines. Covered end-to-end in streaming form by "
    "tests/test_streaming.py's stream-stream interval join test.",
)
def q130_interval_join_batch(spark: SparkSession, sf_dir: str):
    from klio_spark.streaming import interval_join

    (e,) = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    j = interval_join(
        purchases,
        clicks,
        "user_id",
        "ts",
        "ts",
        lower="interval 0 seconds",
        upper="interval 10 minutes",
    )
    return (
        j.select(
            F.col("l.user_id").alias("user_id"),
            # CAST AS TIMESTAMP first: a vanilla session reads the parquet
            # column as TIMESTAMP_NTZ, which unix_micros rejects.
            # Each side floors SEPARATELY (the oracle's `//`), so the
            # year-1 shift makes truncating `div` equal floor even for
            # pre-1970 timestamps (the _SECS convention in behavior.py);
            # the constant offsets cancel in the difference.
            F.expr(
                "(unix_micros(CAST(l.ts AS TIMESTAMP)) + 62135596800000000)"
                " div 1000000"
                " - (unix_micros(CAST(r.ts AS TIMESTAMP)) + 62135596800000000)"
                " div 1000000"
            ).alias("_lag"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("_lag").cast("bigint").alias("sum_lag_secs"),
        )
    )


@register(
    "q131_trigger_upstream_batch",
    """
    SELECT CAST(doc_id AS VARCHAR) AS element,
           'limited' AS recipients_mode,
           'up-job@up-proj,me-job@me-proj' AS recipients,
           'me-job@me-proj' AS trigger_children_of,
           FALSE AS is_force, FALSE AS is_ping
    FROM documents
    """,
    doc="batch twin of streaming.trigger_upstream's metadata rewrite "
    "(KlioTriggerUpstream, reference helpers.py:703-734): every "
    "missing-input element gets recipients = [upstream, self] in limited "
    "mode with trigger_children_of = self and force/ping cleared, so the "
    "upstream reprocesses bottom-up and execution resumes at this job. "
    "The SAME rewrite_for_upstream column transform the foreachBatch "
    "publisher applies runs here on a batch frame; recipients flatten to "
    "job@project strings for the cross-engine hash.",
)
def q131_trigger_upstream_batch(spark: SparkSession, sf_dir: str):
    from klio_spark.streaming import rewrite_for_upstream

    (d,) = load(spark, sf_dir, "documents")
    base = d.select(F.col("doc_id").cast("string").alias("element"))
    rw = rewrite_for_upstream(base, ("up-job", "up-proj"), ("me-job", "me-proj"))
    fmt = lambda c: F.concat_ws("@", c["job_name"], c["project"])  # noqa: E731
    return rw.select(
        "element",
        "recipients_mode",
        F.concat_ws(
            ",", F.transform(F.col("recipients"), fmt)
        ).alias("recipients"),
        fmt(F.col("trigger_children_of")).alias("trigger_children_of"),
        F.col("force").alias("is_force"),
        F.col("ping").alias("is_ping"),
    )


_PR_ITERS = 3


def _pr_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration as SQL CTEs (r{i} from r{i-1})."""
    return f"""
    it{i} AS (
      SELECT e.b AS node, SUM(r{i - 1}.score // deg.deg) AS s
      FROM e JOIN r{i - 1} ON e.a = r{i - 1}.node
             JOIN deg ON e.a = deg.node
      GROUP BY e.b
    ),
    r{i} AS (
      SELECT deg.node,
             (150000000 // nn.n) + (85 * COALESCE(it{i}.s, 0)) // 100
               AS score
      FROM deg LEFT JOIN it{i} USING (node) CROSS JOIN nn
    )"""


@register(
    "q152_pagerank",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT a AS node, COUNT(*) AS deg FROM e GROUP BY a),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT node, 1000000000 // nn.n AS score
           FROM deg CROSS JOIN nn),
    """
    + ",".join(_pr_iter_sql(i) for i in range(1, _PR_ITERS + 1))
    + f"""
    SELECT node AS partkey, CAST(score AS BIGINT) AS score_ppb
    FROM (SELECT node, score,
                 ROW_NUMBER() OVER (ORDER BY score DESC, node) AS rnk
          FROM r{_PR_ITERS})
    WHERE rnk <= 20
    """,
    doc="PageRank over the part co-purchase MULTIgraph (3 fixed "
    "iterations, damping 0.85; parallel edges weight the walk by "
    "co-purchase frequency), top-20 by final rank — the "
    "graph-centrality shape behind product affinity and link-quality "
    "scoring. Every arithmetic step is INTEGER (scores in "
    "parts-per-billion, integer-div contribution splits, 85/100 "
    "damping), so both engines walk bit-identical score sequences and "
    "the oracle is the same computation with the loop UNROLLED into "
    "CTEs. The edge list expands basket posting lists (one orderkey "
    "exchange + codegen double-explode — no two-sided self-join "
    "shuffle, fan-out bounded by basket size); per iteration the score "
    "table broadcasts into the edge join and the agg is map-side "
    "combined on the destination key — the classic distributed "
    "PageRank shape. The broadcast is a LEVER, not a hard-coded hint: "
    "pagerank_topk(broadcast_scores=True|False|'auto') falls back to a "
    "shuffle hash join on the node key for graphs whose node set "
    "outgrows broadcast, hash-identical by test. The edge exchange is computed once and shared "
    "across iterations via ReusedExchange (no persist — nothing lingers "
    "in the session cache), scores are 16-byte rows, the final top-20 "
    "is TakeOrderedAndProject, not a global sort. Dangling nodes cannot exist (every node has an edge "
    "by construction).",
)
def q152_pagerank(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return pagerank_topk(l, broadcast_scores=True)


def pagerank_topk(
    l,
    *,
    iters: int = _PR_ITERS,
    topn: int = 20,
    broadcast_scores: bool | str = "auto",
):
    """Integer PageRank over the part co-purchase multigraph; see the
    q152 registration docstring for the full semantics.

    ``broadcast_scores`` picks the per-iteration score-join strategy:

    * ``True`` — hint ``F.broadcast`` on the score table. Right when
      nodes are a dimension (here: parts), orders of magnitude below
      the edge count: the big edge set never reshuffles.
    * ``False`` — force a shuffle hash join on the node key (the
      web-scale shape: a node set that outgrows executor broadcast
      memory would OOM the driver under the hint). Bit-identical
      results — only the physical strategy moves, which
      tests/test_plans.py proves by hash-comparing both paths.
    * ``'auto'`` — no hint; Catalyst/AQE chooses from its runtime size
      estimate of the aggregated score table (AQE converts to
      broadcast when it fits ``spark.sql.autoBroadcastJoinThreshold``).
      The safe default when the node/edge ratio is unknown.
    """
    # collect_set = per-basket distinct in the SAME exchange the basket
    # grouping needs — one shuffle where distinct()-then-groupBy paid two
    # NOTE: eagerly persisting e and deg (the DAG evaluates the edge
    # build once per consumer, ~2·iters+1 times) was A/B'd warm on a
    # quiet host and LOST consistently (3 interleaved rounds, ~+0.9 s):
    # the duplicate edge-build subtrees overlap on otherwise-idle cores
    # while the eager cache fill serializes in front of every iteration
    # — the q107/q141 pattern. Unpersisted is the measured winner.
    e = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("a"), "ps")
        .select("a", F.explode("ps").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )

    def _score_side(df):
        if broadcast_scores is True:
            return F.broadcast(df)
        if broadcast_scores is False:
            return df.hint("shuffle_hash")
        return df

    # deg rides inside r to avoid a second join per iteration
    deg = e.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    r = deg.crossJoin(F.broadcast(nn)).select(
        "node", F.expr("1000000000 div n").alias("score"), "deg"
    )
    for _ in range(iters):
        contrib = (
            e.join(_score_side(r.withColumnRenamed("node", "a")), "a")
            .select(
                F.col("b").alias("node"), F.expr("score div deg").alias("c")
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            deg.join(contrib, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                F.expr(
                    "(150000000 div n) + (85 * COALESCE(s, 0)) div 100"
                ).alias("score"),
                "deg",
            )
        )
    return (
        r.orderBy(F.desc("score"), F.asc("node"))
        .limit(topn)
        .select(
            F.col("node").alias("partkey"),
            F.col("score").cast("bigint").alias("score_ppb"),
        )
    )


@register(
    "q160_triangle_count",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ),
    o AS (
      -- orient every edge from lower (degree, id) to higher: each
      -- triangle is counted exactly once, and a node's out-degree is
      -- bounded by its DEGENERACY-ordered rank, not its raw degree
      SELECT CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END AS t
      FROM e JOIN deg da ON da.node = e.u JOIN deg db ON db.node = e.v
    ),
    w AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM o e1 JOIN o e2 ON e1.t = e2.s
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_wedges,
           CAST((SELECT COUNT(*) FROM w JOIN o e3
                 ON w.a = e3.s AND w.c = e3.t) AS BIGINT) AS n_triangles
    """,
    doc="distributed triangle counting over the part co-purchase graph "
    "(the graph-density / community-structure probe behind cluster "
    "coefficient and spam-farm detection): edges orient from the "
    "(degree, id)-SMALLER endpoint to the larger; each triangle is "
    "counted exactly once as |N+(a) ∩ N+(b)| summed over oriented "
    "edges (a,b) — the adjacency-intersection form of the standard "
    "oriented-triangle algorithm. The orientation bounds "
    "out-neighborhoods by ~sqrt(m) under degree ordering, so the "
    "intersection work is O(m^1.5) CPU worst-case instead of "
    "sum(deg^2) — a hub with a million basket partners intersects "
    "only through its few HIGHER-degree peers, never its own fan-out "
    "squared — and, unlike the wedge-join form, no wedge row is ever "
    "materialized or shuffled: the only exchanges carry the m edges "
    "and the O(m)-total-bytes neighbor lists. n_wedges (the "
    "head-to-tail join count) reduces to sum(indeg*outdeg) over two "
    "degree aggs of the same cached edge list. All joins are equi "
    "joins on node keys (hash exchanges, AQE-balanceable); counts "
    "ride one scalar row. n_edges/n_wedges ride along so a mismatch "
    "localizes to edge build, orientation, or closure.",
)
def q160_triangle_count(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    # basket posting lists + codegen double-explode build the distinct
    # undirected edge set in ONE orderkey exchange + one (u,v) distinct
    # exchange — the q152 edge-build shape. The earlier
    # distinct-then-self-join paid the (orderkey, partkey) distinct
    # exchange AND a two-sided orderkey join before the pair distinct.
    # e persists: THREE consumers (both endpoints of the degree count +
    # the orientation join) — as a lazy tree each would re-run the
    # basket pair build
    e = scoped_persist(
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    # both endpoints in ONE pass over the cache (explode, not a
    # two-branch unionAll that scans e twice)
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        e.join(da, "u")
        .join(db, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    # persist the oriented edge list: 2 longs/row, consumed FIVE times
    # (edge count, in/out degree aggs, adjacency build, triangle probe)
    # — without it Spark's tree-shaped plans re-run the basket pair
    # build and degree join once per consumer (measured: a 107-shuffle
    # plan). Scoped: the harness release_scoped_caches()s after
    # materializing. Eager: the scalar consumers ride broadcast
    # branches that execute as concurrent jobs — a lazy cache would be
    # empty for all of them at once and each would recompute the
    # pipeline (measured ~5x the edge-build core-time).
    o = scoped_persist(o, eager=True)
    ne = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # n_wedges without materializing a single wedge: the head-to-tail
    # join count is sum over nodes of indeg * outdeg (every edge INTO b
    # pairs with every edge OUT of b) — two degree aggs over the cached
    # edges and a node-keyed join of two tiny degree tables replace the
    # O(m^1.5)-row wedge exchange the old plan shuffled by (a, c).
    outd = o.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("_od")
    )
    ind = o.groupBy(F.col("t").alias("node")).agg(
        F.count(F.lit(1)).alias("_id")
    )
    nw = ind.join(outd, "node").agg(
        F.sum(F.col("_id") * F.col("_od")).cast("bigint").alias("n_wedges")
    )
    # n_triangles by adjacency intersection: for each oriented edge
    # (a, b), |N+(a) ∩ N+(b)| counts exactly the closed wedges
    # (a→b, b→c, a→c) — the per-triangle count is identical to the old
    # wedge-join-then-probe plan, but the only shuffled rows are the m
    # edges and the out-neighbor lists (total bytes O(m)), never the
    # wedges themselves. o's rows are distinct so the lists hold
    # distinct neighbors and array_intersect cannot overcount.
    adj = o.groupBy("s").agg(F.collect_list("t").alias("_nb"))
    aa = adj.select(F.col("s").alias("a"), F.col("_nb").alias("_na"))
    ab = adj.select(F.col("s").alias("b"), F.col("_nb").alias("_nbb"))
    empty = F.array().cast("array<bigint>")
    tri = (
        o.select(F.col("s").alias("a"), F.col("t").alias("b"))
        .join(aa, "a")
        .join(ab, "b", "left")
        .select(
            F.size(
                F.array_intersect("_na", F.coalesce(F.col("_nbb"), empty))
            ).alias("_c")
        )
    )
    nt = tri.agg(F.sum("_c").cast("bigint").alias("n_triangles"))
    return (
        ne.crossJoin(F.broadcast(nw))
        .crossJoin(F.broadcast(nt))
        .select("n_edges", "n_wedges", "n_triangles")
    )


_BFS_HOPS = 3


def _bfs_frontier_sql(i: int) -> str:
    """Hop i as a CTE: neighbors of frontier i-1 not yet reached (the
    reached set is the union of all earlier frontiers — unrolled, since
    the Spark side's loop is unrolled into the plan the same way)."""
    reached = " UNION ALL ".join(
        f"SELECT node FROM f{j}" for j in range(i)
    )
    return f"""
    f{i} AS (
      SELECT DISTINCT e.b AS node
      FROM e JOIN f{i - 1} ON e.a = f{i - 1}.node
      WHERE NOT EXISTS (SELECT 1 FROM ({reached}) r
                        WHERE r.node = e.b)
    )"""


@register(
    "q169_bfs_khop",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    e AS (SELECT a, b FROM p GROUP BY a, b HAVING COUNT(*) >= 2),
    f0 AS (SELECT DISTINCT a AS node FROM e WHERE a % 100 = 0),
    """
    + ",".join(_bfs_frontier_sql(i) for i in range(1, _BFS_HOPS + 1))
    + f"""
    SELECT node AS partkey, CAST(hops AS INTEGER) AS hops FROM (
      {" UNION ALL ".join(f"SELECT node, {i} AS hops FROM f{i}" for i in range(_BFS_HOPS + 1))}
    )
    """,
    doc="multi-source k-hop BFS (3 hops) over the REPEAT-co-purchase "
    "graph (edge = parts bought together in >= 2 distinct orders — the "
    "weight threshold that turns a basket multigraph into a sparse "
    "affinity graph): every node's minimum hop distance from the seed "
    "set, the neighborhood-expansion shape behind contamination radius, "
    "influence propagation, and graph feature generation. Distributed "
    "shape: the edge list (2 longs/row) builds once — the weight "
    "threshold rides the same exchange that the pair groupBy needs — "
    "and persists because each hop consumes it; each hop is ONE equi "
    "join (frontier ⋈ edges on the source key, frontier broadcasts "
    "while it is small, AQE switches to shuffle join when it is not) "
    "plus a left-anti join against the reached set (monotone, grows by "
    "the frontier each hop). Frontiers shrink geometrically on sparse "
    "graphs, so the per-hop cost is frontier-degree-bounded, never "
    "O(V^2); hop count is fixed (unrolled), matching the oracle's "
    "unrolled CTE chain. Integer node ids and hop labels — hash-exact.",
)
def q169_bfs_khop(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return khop_bfs(l)


def khop_bfs(
    l,
    *,
    min_weight: int = 2,
    hops: int = _BFS_HOPS,
    seed_mod: int = 100,
):
    """Multi-source k-hop BFS over the repeat-co-purchase graph; see the
    q169 registration docstring for semantics and plan shape.

    ``min_weight`` is the corpus-depth dial the 10×/100× rehearsals
    flagged: at a fixed catalog, more orders push every pair over a
    fixed threshold and the graph saturates (BASELINE.md round-5
    rehearsal: output pinned at 20,000 rows from 10× onward). A deeper
    corpus should raise it in proportion to orders-per-part so edge
    density — and with it the frontier-degree bound on per-hop cost —
    stays constant. The registered q169 pins min_weight=2 to match its
    unrolled oracle CTE chain."""
    # basket posting lists + double-explode (the q152/q160 edge-build
    # shape): the pair stream expands in codegen off ONE orderkey
    # exchange and feeds the (a, b) weight agg directly — no
    # distinct-then-self-join shuffle
    e = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("a"), "ps")
        .select("a", F.explode("ps").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= min_weight)
        .select("a", "b")
        # consumed once per hop — same persist rationale as q160's
        # oriented edges (and the same scoped-release caveat)
    )
    e = scoped_persist(e)
    frontier = scoped_persist(
        e.select(F.col("a").alias("node"))
        .filter(F.col("node") % seed_mod == 0)
        .distinct()
    )
    dist = frontier.withColumn("hops", F.lit(0))
    for i in range(1, hops + 1):
        # each frontier persists: it feeds the NEXT hop's expansion AND
        # the final union, and hop i's anti-join target (dist) embeds
        # every earlier frontier — without the persists the tree-shaped
        # plan re-executes frontier j once per later appearance
        # (measured: a 94-stage plan for 3 hops; ~20 with them)
        frontier = scoped_persist(
            frontier.join(e, frontier["node"] == e["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti"),
            eager=True,
        )
        dist = dist.unionByName(frontier.withColumn("hops", F.lit(i)))
    return dist.select(
        F.col("node").alias("partkey"), F.col("hops").cast("int").alias("hops")
    )


@register(
    "q214_common_neighbors",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ew AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    adj AS (
      SELECT u AS center, v AS nb, w FROM ew
      UNION ALL SELECT v AS center, u AS nb, w FROM ew
    ),
    small AS (
      SELECT center, nb FROM (
        SELECT center, nb,
               ROW_NUMBER() OVER (PARTITION BY center
                                  ORDER BY w DESC, nb) AS rk
        FROM adj
      ) WHERE rk <= 32
    ),
    cand AS (
      SELECT a.nb AS u, b.nb AS v, COUNT(*) AS cn
      FROM small a JOIN small b
        ON a.center = b.center AND a.nb < b.nb
      GROUP BY 1, 2
    )
    SELECT c.u, c.v, CAST(c.cn AS BIGINT) AS cn
    FROM cand c
    WHERE NOT EXISTS (SELECT 1 FROM ew e WHERE e.u = c.u AND e.v = c.v)
    ORDER BY cn DESC, c.u, c.v
    LIMIT 20
    """,
    doc="link prediction by common-neighbor count over the part "
    "co-purchase graph (Liben-Nowell/Kleinberg 2003 — 'which parts "
    "SHOULD co-occur but don't yet'): each center contributes "
    "neighbor pairs only through its TOP-32 STRONGEST neighbors "
    "(co-purchase weight desc, id asc — the neighborhood truncation "
    "every production item-item recommender applies), candidate pairs "
    "are counted by shared centers, existing edges leave via an anti "
    "join, and the top-20 non-adjacent pairs report their score. The "
    "truncation is the scale decision: naive common-neighbor counting "
    "is sum(deg^2) over centers — a basket-hub with 1e5 partners "
    "contributes 1e10 near-zero-signal pairs (everything co-occurs "
    "with a hub; Adamic-Adar down-weights hubs toward nothing for the "
    "same reason) — while top-k adjacency bounds pair generation at "
    "C(32,2) per center = O(512·n) ABSOLUTELY, at any corpus size, "
    "without going empty on dense graphs the way an absolute degree "
    "cap does (the first draft's bug: at sf0.01 the minimum part "
    "degree is 42, so a d<=32 center filter selected nothing). "
    "Semantics are exact for the declared rule — the oracle applies "
    "the identical truncation; (w desc, nb) and (cn desc, u, v) pin "
    "every boundary. Shape: basket posting lists double-explode into "
    "weighted pairs off one orderkey exchange, ONE center-keyed "
    "exchange shared by the rank window and the grouped "
    "C(32,2)-bounded pair expansion (collect_list + double explode — "
    "no self-join), broadcast-able anti join, TakeOrderedAndProject — "
    "no global sort.",
)
def q214_common_neighbors(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    # basket posting lists + double-explode (the q152/q160 edge-build
    # shape): weighted pairs aggregate straight off one orderkey
    # exchange — no distinct-then-self-join shuffle
    ew = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # weighted edges feed three consumers (both adjacency directions +
    # the anti join); persist so the basket pair build runs once (q160).
    # Eager: the anti-join side broadcasts as its own concurrent job and
    # would otherwise race the adjacency branches on an empty cache.
    ew = scoped_persist(ew, eager=True)
    adj = ew.select(
        F.col("u").alias("center"), F.col("v").alias("nb"), "w"
    ).unionAll(ew.select(F.col("v").alias("center"), F.col("u").alias("nb"), "w"))
    # AQE coalesces the center exchange by BYTES (~21 MB at sf0.1 →
    # ~16 partitions on 32 cores), which looks like half-idle cores on
    # the CPU-dense expansion stage. Tried pinning it at
    # defaultParallelism with an explicit same-key repartition: wall was
    # a WASH (4 interleaved rounds) while the stage's cumulative CPU
    # nearly DOUBLED (warm 26 s → 42 s core) — fewer, larger partitions
    # run the window sort + pair partial-agg cheaper per row, so the
    # byte-coalesced width is the right one. Left on AQE.
    rk = Window.partitionBy("center").orderBy(F.desc("w"), F.asc("nb"))
    small = (
        adj.select("center", "nb", F.row_number().over(rk).alias("rk"))
        .filter(F.col("rk") <= 32)
        .select("center", "nb")
    )
    # bounded pair expansion WITHOUT a self-join: collect each center's
    # ≤32 kept neighbors (the groupBy rides the window's center
    # exchange — no new shuffle) and double-explode its C(32,2)-bounded
    # pairs in codegen; only the (u, v) count agg shuffles. The old
    # sort-merge self-join on center re-sorted and joined the full
    # small table against itself for the identical pair set.
    cand = (
        small.groupBy("center")
        .agg(F.collect_list("nb").alias("xs"))
        .select(F.explode("xs").alias("u"), "xs")
        .select("u", F.explode("xs").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    open_pairs = cand.join(ew.select("u", "v"), ["u", "v"], "left_anti")
    return open_pairs.orderBy(F.desc("cn"), F.asc("u"), F.asc("v")).limit(20)


@register(
    "q215_k_core",
    """
    WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e1 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    d1 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1
      ) GROUP BY node
    ),
    kk AS MATERIALIZED (SELECT SUM(d) // COUNT(*) + 1 AS k FROM d1),
    s1 AS MATERIALIZED (SELECT node FROM d1 CROSS JOIN kk WHERE d >= k),
    e2 AS MATERIALIZED (
      SELECT e1.u, e1.v FROM e1
      JOIN s1 a ON a.node = e1.u JOIN s1 b ON b.node = e1.v
    ),
    d2 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2
      ) GROUP BY node
    ),
    s2 AS MATERIALIZED (SELECT node FROM d2 CROSS JOIN kk WHERE d >= k),
    e3 AS MATERIALIZED (
      SELECT e2.u, e2.v FROM e2
      JOIN s2 a ON a.node = e2.u JOIN s2 b ON b.node = e2.v
    ),
    d3 AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3
      ) GROUP BY node
    ),
    s3 AS MATERIALIZED (SELECT node FROM d3 CROSS JOIN kk WHERE d >= k),
    e4 AS MATERIALIZED (
      SELECT e3.u, e3.v FROM e3
      JOIN s3 a ON a.node = e3.u JOIN s3 b ON b.node = e3.v
    )
    SELECT * FROM (
      SELECT 1 AS round,
             CAST((SELECT COUNT(*) FROM d1) - (SELECT COUNT(*) FROM s1)
                  AS BIGINT) AS n_removed,
             CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_nodes,
             CAST((SELECT COUNT(*) FROM e2) AS BIGINT) AS n_edges
      UNION ALL
      SELECT 2,
             CAST((SELECT COUNT(*) FROM d2) - (SELECT COUNT(*) FROM s2)
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM s2) AS BIGINT),
             CAST((SELECT COUNT(*) FROM e3) AS BIGINT)
      UNION ALL
      SELECT 3,
             CAST((SELECT COUNT(*) FROM d3) - (SELECT COUNT(*) FROM s3)
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM s3) AS BIGINT),
             CAST((SELECT COUNT(*) FROM e4) AS BIGINT)
    )
    """,
    doc="k-core peeling over the part co-purchase graph (Seidman 1983; "
    "the dense-substructure extractor behind spam-farm isolation, "
    "community seeding, and graph sparsification): 3 rounds of "
    "remove-nodes-below-k + induce-subgraph, reporting removed / "
    "surviving node and edge counts per round. k is RELATIVE — "
    "floor(mean initial degree) + 1 as an in-plan 1-row broadcast "
    "scalar (the q201 relative-threshold rule: an absolute k is "
    "either no-op or clear-cut on graphs whose density scales with "
    "the corpus; this one always peels the below-average half and "
    "converges fast). Fixed 3 rounds, like q152's PageRank and "
    "q169's BFS: each round is one degree agg + two node semi joins "
    "— all equi exchanges on node keys, no per-node iteration state; "
    "the peel sequence is exactly reproducible by the oracle's "
    "unrolled CTEs. Per-round frames localCheckpoint (each round "
    "references the prior round's edges ~5×, so without lineage "
    "truncation the logical tree grows 5^rounds — the iterative-"
    "algorithm pattern functions/graph.py established; rdd_roundtrip "
    "allow-listed in the lint sweep for exactly this reason).",
)
def q215_k_core(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    # basket posting lists + double-explode (the q152/q160 edge-build
    # shape): one orderkey exchange + one pair-distinct exchange, no
    # two-sided self-join shuffle
    e = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )

    def degrees(edges):
        # one pass over the edge frame (explode both endpoints), not a
        # two-branch unionAll that scans it twice
        return (
            edges.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    e = scoped_persist(e)
    d1 = scoped_persist(degrees(e))
    kk = d1.agg(F.expr("SUM(d) div COUNT(*) + 1").alias("k"))
    rows = []
    edges, deg = e, d1
    for rnd in (1, 2, 3):
        surv = (
            deg.crossJoin(F.broadcast(kk))
            .filter(F.col("d") >= F.col("k"))
            .select("node")
        )
        # localCheckpoint (not persist): each round references the prior
        # round's edges FIVE times (direct + twice through each semi
        # join's surv→deg lineage), so the logical tree grows ~5^rounds
        # — plan-string generation alone OOMed the driver before any
        # task ran. Truncating lineage per round keeps the tree linear;
        # functions/graph.py sets the same pattern for its fixpoint.
        surv = surv.localCheckpoint(eager=True)
        nxt = edges.join(
            surv.select(F.col("node").alias("u")), "u", "semi"
        ).join(surv.select(F.col("node").alias("v")), "v", "semi")
        nxt = nxt.localCheckpoint(eager=True)
        n_all = deg.agg(F.count(F.lit(1)).alias("c"))
        n_surv = surv.agg(F.count(F.lit(1)).alias("c"))
        n_edge = nxt.agg(F.count(F.lit(1)).alias("c"))
        rows.append(
            n_all.crossJoin(
                n_surv.select(F.col("c").alias("cs"))
            )
            .crossJoin(n_edge.select(F.col("c").alias("ce")))
            .select(
                F.lit(rnd).cast("int").alias("round"),
                (F.col("c") - F.col("cs")).cast("bigint").alias("n_removed"),
                F.col("cs").cast("bigint").alias("n_nodes"),
                F.col("ce").cast("bigint").alias("n_edges"),
            )
        )
        edges = nxt
        deg = degrees(edges).localCheckpoint(eager=True)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "q260_asof_nearest_tolerance",
    """
    WITH p AS (
      SELECT event_id, user_id, event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS t
      FROM events
      WHERE ts IS NOT NULL AND event_type IN ('click', 'error')
    ),
    u AS (
      SELECT event_id, user_id, t,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS tag
      FROM p
    ),
    f AS (
      SELECT event_id, user_id, t, tag,
             MAX(CASE WHEN tag = 0 THEN t END) OVER wb AS prev_t,
             MIN(CASE WHEN tag = 0 THEN t END) OVER wf AS next_t
      FROM u
      WINDOW wb AS (PARTITION BY user_id ORDER BY t, tag, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY t, tag, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    pick AS (
      SELECT event_id, user_id, t,
             CASE
               WHEN prev_t IS NOT NULL
                    AND (next_t IS NULL OR t - prev_t <= next_t - t)
                 THEN prev_t
               ELSE next_t
             END AS cand
      FROM f WHERE tag = 1
    )
    SELECT event_id, user_id, t AS t_err_s,
           CASE WHEN ABS(cand - t) <= 300 THEN cand END AS t_click_s,
           CASE WHEN ABS(cand - t) <= 300 THEN ABS(cand - t) END AS delta_s
    FROM pick
    """,
    doc="nearest-in-time join with tolerance — the BIDIRECTIONAL "
    "completion of q15's backward as-of join (sensor fusion and "
    "click-to-error triage want the CLOSEST companion event within a "
    "window, not the latest preceding one). One union + one (user_id) "
    "exchange + TWO frames over the SAME sort (Spark fuses same-"
    "window-spec functions; no second shuffle): a backward "
    "running-max of click times and a forward running-min give each "
    "error its flanking clicks; the nearer one wins, equidistant ties "
    "go to the EARLIER click (backward candidate preferred on <=), "
    "and candidates beyond 300 s are nulled — all integer seconds. "
    "Ordering (t, tag, event_id) is total (event_id unique); a click "
    "at the error's exact timestamp sorts before it (tag order) and "
    "matches at delta 0 through the backward frame. "
    "Citation: reference lib/src/klio/transforms (no relational "
    "surface); SURVEY §2.8 joins family (q14/q15/q130/q176).",
)
def q260_asof_nearest_tolerance(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    p = e.filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isin("click", "error")
    ).select(
        "event_id",
        "user_id",
        (F.col("event_type") == "error").cast("int").alias("tag"),
        F.expr(
            "(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            " + 62135596800000000) div 1000000 - 62135596800"
        ).alias("t"),
    )
    base = Window.partitionBy("user_id").orderBy("t", "tag", "event_id")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    click_t = F.when(F.col("tag") == 0, F.col("t"))
    f = p.select(
        "event_id",
        "user_id",
        "t",
        "tag",
        F.max(click_t).over(wb).alias("prev_t"),
        F.min(click_t).over(wf).alias("next_t"),
    )
    pick = f.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "t",
        F.when(
            F.col("prev_t").isNotNull()
            & (
                F.col("next_t").isNull()
                | (F.col("t") - F.col("prev_t") <= F.col("next_t") - F.col("t"))
            ),
            F.col("prev_t"),
        )
        .otherwise(F.col("next_t"))
        .alias("cand"),
    )
    within = F.abs(F.col("cand") - F.col("t")) <= 300
    return pick.select(
        "event_id",
        "user_id",
        F.col("t").alias("t_err_s"),
        F.when(within, F.col("cand")).alias("t_click_s"),
        F.when(within, F.abs(F.col("cand") - F.col("t"))).alias("delta_s"),
    )
