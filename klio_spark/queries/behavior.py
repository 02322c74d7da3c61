"""Event-behavior analytics + change-data operators: ordered funnel,
retention cohorts, gaps-and-islands run collapse, CDC merge/upsert,
deterministic negative sampling.

The event-log half is the product-analytics surface a pipeline engine is
asked for the day it can read an events table (funnel conversion,
cohort retention, streak/run collapse); the CDC half is the ingestion
surface (apply an upsert/delete changelog to a base table — the pure
DataFrame formulation of Delta's MERGE INTO); negative sampling is the
contrastive-training-pairs step of an embedding pipeline.

Cross-engine determinism (module doc in klio_spark.queries): every
measure is integer — timestamps become epoch-micros BIGINTs div'd to
whole seconds, money becomes cents via FLOOR(x*100) (IEEE-identical on
identical doubles), counts stay counts. No float leaves any query.

Scale notes, common to the funnel/retention/runs trio: every stage keys
on user_id, so a 1000-executor run shuffles the events table once per
distinct shuffle key — Spark reuses the (user_id) exchange across the
funnel's stage joins, and the window queries sort within the same
partitioning. Nothing collects; dimension-sized sides stay joins (a
user dimension is NOT broadcastable at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.queries import load, register, scoped_persist

# NTZ-safe epoch seconds: the vanilla session reads events.ts as
# TIMESTAMP_NTZ (see load()), which unix_micros rejects — cast first.
# q108 consumes only DIFFERENCES of these, so a session-timezone offset
# introduced by the NTZ→LTZ cast cancels out.
#
# FLOOR division, not Spark's truncate-toward-zero `div`: the DuckDB
# oracles write `//` (floor), and the two disagree on negative epochs
# (pre-1970 timestamps). Shifting by the year-1 epoch offset
# (62135596800000000 µs, an exact multiple of 1000000) makes the
# numerator non-negative for every timestamp Spark can represent, so
# `div` == floor — all arithmetic stays exact bigint (max shifted value
# ≈ 3.2e17 ≪ 2^63).
_SECS = (
    "((CAST(unix_micros(CAST({c} AS TIMESTAMP)) AS BIGINT)"
    " + 62135596800000000) div 1000000 - 62135596800)"
)


@register(
    "q108_event_funnel",
    """
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(ts) AS t, MIN(ts) AS t0
      FROM ev WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t, MIN(p.t0) AS t0
      FROM ev e JOIN s1 p ON e.user_id = p.user_id AND e.ts > p.t
      WHERE e.event_type = 'view' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t, MIN(p.t0) AS t0
      FROM ev e JOIN s2 p ON e.user_id = p.user_id AND e.ts > p.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, MIN(e.ts) AS t, MIN(p.t0) AS t0
      FROM ev e JOIN s3 p ON e.user_id = p.user_id AND e.ts > p.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT '1_signup' AS step, COUNT(*) AS n_users,
           CAST(0 AS BIGINT) AS sum_lag_secs FROM s1
    UNION ALL
    SELECT '2_view', COUNT(*),
           CAST(COALESCE(SUM((epoch_us(t) + 62135596800000000) // 1000000
                             - (epoch_us(t0) + 62135596800000000) // 1000000), 0) AS BIGINT) FROM s2
    UNION ALL
    SELECT '3_click', COUNT(*),
           CAST(COALESCE(SUM((epoch_us(t) + 62135596800000000) // 1000000
                             - (epoch_us(t0) + 62135596800000000) // 1000000), 0) AS BIGINT) FROM s3
    UNION ALL
    SELECT '4_purchase', COUNT(*),
           CAST(COALESCE(SUM((epoch_us(t) + 62135596800000000) // 1000000
                             - (epoch_us(t0) + 62135596800000000) // 1000000), 0) AS BIGINT) FROM s4
    """,
    doc="Ordered conversion funnel signup→view→click→purchase: stage k "
    "reaches users whose earliest qualifying event strictly FOLLOWS their "
    "stage-k-1 time (min-after-min, the textbook ordered-funnel "
    "semantics — an out-of-order click does not count). Each stage is one "
    "groupBy(user_id) agg joined to the previous stage on user_id, so "
    "all four stages shuffle on the SAME key and the exchange is reused; "
    "per-stage output is (n_users, summed signup→stage lag in whole "
    "seconds) — integer epoch math, no floats.",
)
def q108_event_funnel(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")

    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .withColumn("t0", F.col("t"))
    )

    def next_stage(prev, etype):
        ev = e.filter(F.col("event_type") == etype).alias("e")
        p = prev.alias("p")
        return (
            ev.join(
                p,
                (F.col("e.user_id") == F.col("p.user_id"))
                & (F.col("e.ts") > F.col("p.t")),
            )
            .groupBy(F.col("e.user_id").alias("user_id"))
            .agg(F.min("e.ts").alias("t"), F.min("p.t0").alias("t0"))
        )

    s2 = next_stage(s1, "view")
    s3 = next_stage(s2, "click")
    s4 = next_stage(s3, "purchase")

    lag = F.coalesce(
        F.sum(
            F.expr(_SECS.format(c="t")) - F.expr(_SECS.format(c="t0"))
        ),
        F.lit(0),
    ).cast("bigint")

    def level(df, step, with_lag=True):
        return df.agg(
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
            (lag if with_lag else F.lit(0).cast("bigint")).alias("sum_lag_secs"),
        )

    return (
        level(s1, "1_signup", with_lag=False)
        .unionAll(level(s2, "2_view"))
        .unionAll(level(s3, "3_click"))
        .unionAll(level(s4, "4_purchase"))
    )


@register(
    "q109_retention_cohorts",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST((datediff('day', DATE '2024-01-01', f.d0) + 70000) // 7
                - 10000 AS BIGINT)
             AS cohort_week,
           CAST(datediff('day', f.d0, a.d) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: cohort = first-seen week (anchored to "
    "an absolute epoch so cohort ids are stable across runs), cell = "
    "distinct users from that cohort active in week-offset k. Two aggs "
    "and a join, all keyed by user_id → one logical shuffle key; the "
    "(cohort, offset) matrix is weeks², tiny at any corpus size. The "
    "first-seen table is exactly the streaming dedup state the "
    "readStream variant would keep under a watermark.",
)
def q109_retention_cohorts(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    a = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    j = a.join(f, "user_id")
    return (
        j.select(
            "user_id",
            # BOTH engines truncate integer division toward zero (Spark
            # `div`, and DuckDB's integer `//` too — measured: -45//7 =
            # -6, not -7). Shifting by a multiple of 7 (70000 = 7*10000)
            # makes the operand positive for any date after ~1832, so
            # truncation IS floor and pre-anchor events bucket
            # identically on both engines. The ORACLE applies the same
            # shift — the randomized differential suite caught the
            # unshifted oracle off by one week on pre-2024 data.
            F.expr("(datediff(d0, DATE'2024-01-01') + 70000) div 7 - 10000")
            .cast("bigint")
            .alias("cohort_week"),
            F.expr("datediff(d, d0) div 7").cast("bigint").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q110_activity_runs",
    """
    WITH o AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rnt
      FROM events WHERE ts IS NOT NULL
    ),
    runs AS (
      SELECT user_id, event_type, rn - rnt AS grp, COUNT(*) AS run_len
      FROM o GROUP BY user_id, event_type, rn - rnt
    )
    SELECT user_id, COUNT(*) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(SUM(run_len) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id
    """,
    doc="Gaps-and-islands: collapse each user's time-ordered event "
    "stream into maximal same-type runs via the row_number-difference "
    "trick (rn over user minus rn over user+type is constant within a "
    "run), then per-user run stats. Order is total — (ts, event_id) "
    "tiebreak — so both engines see identical runs. Both windows "
    "partition by user_id: one sort serves them, and the run agg stays "
    "in the same partitioning. The batch twin of session_windows(). "
    "NULL-timestamp events are excluded on both engines: an event with "
    "unknown time has no position in a time-ordered run, and the "
    "engines' NULL sort defaults disagree (Spark NULLS FIRST, SQL "
    "NULLS LAST) so leaving them in is a silent cross-engine hazard.",
)
def q110_activity_runs(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    e = e.filter(F.col("ts").isNotNull())
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_ut = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_u) - F.row_number().over(w_ut)).alias("grp"),
    )
    runs = o.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("run_len").cast("bigint").alias("longest_run"),
        F.sum("run_len").cast("bigint").alias("n_events"),
    )


@register(
    "q111_cdc_merge",
    """
    WITH ch AS (
      SELECT c_custkey AS k,
             CASE WHEN c_custkey % 17 = 0 THEN 'D' ELSE 'U' END AS op,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT)
               + (c_custkey % 100) * 100 AS new_cents
      FROM customer WHERE c_custkey % 17 = 0 OR c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'I',
             (c_custkey % 500) * 100 + 42
      FROM customer WHERE c_custkey % 23 = 0
    ),
    base AS (
      SELECT c_custkey AS k, c_mktsegment AS seg,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    merged AS (
      SELECT COALESCE(b.k, c.k) AS k,
             COALESCE(b.seg, 'NEW') AS seg,
             CASE WHEN c.op IN ('U', 'I') THEN c.new_cents
                  ELSE b.cents END AS cents
      FROM base b FULL OUTER JOIN ch c ON b.k = c.k
      WHERE c.op IS NULL OR c.op != 'D'
    )
    SELECT seg, COUNT(*) AS n_rows, CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged GROUP BY seg
    """,
    doc="CDC changelog apply — MERGE INTO re-expressed as one "
    "full-outer join: update rows take the change's value, delete ops "
    "drop the base row, insert ops materialize with no base match "
    "(delete wins when a key is both %10 and %17 — op precedence is the "
    "CASE order, identical on both engines). The changelog is "
    "synthesized deterministically from customer so the oracle sees the "
    "same stream. At scale both sides shuffle once on the merge key — "
    "or zero times if base and changelog are bucketed by key, the "
    "layout a nightly-merge pipeline would maintain. Money is cents "
    "(FLOOR(x*100) BIGINT): exact sums, no float drift.",
)
def q111_cdc_merge(spark: SparkSession, sf_dir: str):
    (c,) = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100).cast("bigint")
    upserts = (
        c.filter((F.col("c_custkey") % 17 == 0) | (F.col("c_custkey") % 10 == 0))
        .select(
            F.col("c_custkey").alias("k"),
            F.when(F.col("c_custkey") % 17 == 0, "D").otherwise("U").alias("op"),
            (cents + (F.col("c_custkey") % 100) * 100).alias("new_cents"),
        )
    )
    inserts = c.filter(F.col("c_custkey") % 23 == 0).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit("I").alias("op"),
        ((F.col("c_custkey") % 500) * 100 + 42).cast("bigint").alias("new_cents"),
    )
    ch = upserts.unionAll(inserts)
    base = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        cents.alias("cents"),
    )
    merged = (
        base.alias("b")
        .join(ch.alias("c"), F.col("b.k") == F.col("c.k"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("b.seg"), F.lit("NEW")).alias("seg"),
            F.when(
                F.col("c.op").isin("U", "I"), F.col("c.new_cents")
            ).otherwise(F.col("b.cents")).alias("cents"),
        )
    )
    return merged.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


def segmented_carry(t, keys, s_col, segment_s, chunk_summary, carry_exprs):
    """Chunk + carry-fold scaffold — the shared shape of every segmented
    entity-window lever (q199 last-touch, q179 EWMA, q198 interval
    coverage; VERDICT r7 item 3 asked for exactly this extraction).

    An entity-ORDERED window (PARTITION BY user ORDER BY time) makes a
    degenerate hot entity one giant sort task — a 20%-hot user of a
    100 TB stream is a single 20 TB task, and no join hint fixes
    ordered-window semantics. When the per-entity fold is ASSOCIATIVE
    with bounded carry state (each adopting op's streaming twin proves
    its fold: 2-3 scalars or a K-bounded tail), the window segments:

      1. events split into per-(entity, s div segment_s) time chunks;
      2. the intra-chunk pass windows over (entity, seg) — task width
         bounded by the chunk's event count, never the entity's;
      3. cross-chunk state rides a carry fold over the tiny
         per-(entity, chunk) summary table (rows per entity = #chunks),
         evaluated with frame (unbounded preceding, -1) so each chunk
         sees state STRICTLY BEFORE it;
      4. the caller joins the carry back on (keys, seg) and combines
         intra-chunk results with the carry-in.

    Chunking divides the SAME integer-seconds column the window orders
    by, so every carry-in is strictly older than every in-chunk event
    and the (s, tiebreak) order is preserved exactly — the segmented
    output is hash-identical to the monolithic window (each adopter is
    tested for equality on the fixed corpus, synthetic boundary cases,
    and the 20%-hot skew twin).

    ``chunk_summary``: fn(chunked events) -> per-(keys, seg) summary,
    one row per NON-EMPTY chunk (empty chunks need no row — the fold's
    window frame skips them). ``carry_exprs``: {alias: fn(seg_window)
    -> Column} over that summary. Returns (chunked events with a
    ``seg`` column, summary with the carry columns appended)."""
    t = t.withColumn("seg", F.expr(f"{s_col} div {int(segment_s)}"))
    seg_tbl = chunk_summary(t)
    sw = (
        Window.partitionBy(*keys)
        .orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = seg_tbl.select(
        *seg_tbl.columns,
        *[fn(sw).alias(a) for a, fn in carry_exprs.items()],
    )
    return t, carry


def keep_latest(e, segment_s: int | None = None):
    """Keep-latest-per-key kernel (q113's registration docstring has the
    semantics). ``segment_s`` is the entity-window skew lever
    (segmented_carry has the general argument); keep-latest is the
    DEGENERATE fold — one struct of state, a pure argmax — so it needs
    no carry join at all: a per-(key, chunk) WindowGroupLimit pass
    picks each chunk's winner under the SAME (ts DESC, event_id DESC)
    order, and the monolithic pass then runs over the tiny per-chunk
    winner table (rows per key = #chunks) — a two-level max, exactly
    how a combiner folds argmax. Identical ordering at both levels
    (NULL ts sorts last at both; NULL-ts rows chunk to seg NULL) makes
    the winner provably the monolithic one. Note the monolithic plan
    is ALREADY skew-resistant per map task (WindowGroupLimit forwards
    one row per key per partition before the exchange); the lever
    additionally bounds the reduce-side fan-in when one key dominates
    whole partitions."""
    if segment_s is not None:
        cw = Window.partitionBy("user_id", "event_type", "seg").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        e = (
            e.withColumn(
                "seg",
                F.expr(
                    _SECS.format(c="ts") + f" div {int(segment_s)}"
                ),
            )
            .withColumn("_crn", F.row_number().over(cw))
            .filter(F.col("_crn") == 1)
            .drop("_crn", "seg")
        )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.floor(F.col("value") * 100)
            .cast("bigint")
            .alias("latest_value_cents"),
        )
    )


@register(
    "q113_keep_latest",
    """
    WITH r AS (
      SELECT user_id, event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                         event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS latest_event_id,
           CAST(FLOOR(value * 100) AS BIGINT) AS latest_value_cents
    FROM r WHERE rn = 1
    """,
    doc="Keep-latest-per-key compaction — the changelog→snapshot step of "
    "every CDC/upsert pipeline (and the batch twin of streaming "
    "dropDuplicates-on-key): rank desc by (ts, event_id) and keep rn=1. "
    "Spark rewrites the rn=1 filter into WindowGroupLimit, so each "
    "partition forwards only its per-key max before the exchange — the "
    "shuffle carries one row per (user, type), not the event log. "
    "Locked by a plan test.",
)
def q113_keep_latest(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # monolithic (segment_s=None) — the registered/oracle-paired shape;
    # segment_s is the documented skew lever for degenerate keys
    return keep_latest(e)


@register(
    "q114_interval_overlap_join",
    """
    WITH t AS (
      SELECT l_orderkey * 16 + l_linenumber AS id, l_partkey,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s
      FROM lineitem
    ),
    p AS (
      SELECT LEAST(a.s + 7, b.s + 7) - GREATEST(a.s, b.s) + 1 AS overlap_days
      FROM t a JOIN t b
        ON a.l_partkey = b.l_partkey AND a.id < b.id
       AND a.s <= b.s + 7 AND b.s <= a.s + 7
    )
    SELECT CAST(overlap_days AS BIGINT) AS overlap_days, COUNT(*) AS n_pairs
    FROM p GROUP BY 1
    """,
    doc="Interval-overlap range join via temporal banding — the scalable "
    "form of a range join Spark would otherwise nest-loop per key: each "
    "7-day ship window explodes into the week buckets it covers (≤3 "
    "small-int rows), the join runs EQUI on (part, week), and the true "
    "overlap predicate filters inside co-partitions; the OWNING-BUCKET "
    "rule (emit a pair only from the bucket holding GREATEST(a.s, b.s), "
    "which the band predicate guarantees both rows cover) makes each "
    "row pair appear exactly once — row MULTIPLICITY preserved, unlike "
    "a distinct() bucket-dedup, which silently collapsed duplicate "
    "(l_orderkey, l_linenumber) rows this corpus contains (caught by "
    "the 3x-amplified strict sweep), and no distinct exchange either. "
    "Candidate count is bounded by week-colocated rows per part, not "
    "per-key n². The ORACLE runs the naive non-equi join — identical "
    "result is the proof the banding loses nothing. Output: pair "
    "counts per overlap length (days).",
)
def q114_interval_overlap_join(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    t = li.select(
        (F.col("l_orderkey") * 16 + F.col("l_linenumber")).alias("id"),
        "l_partkey",
        F.datediff(
            F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date")
        ).alias("s"),
    )
    b = t.withColumn(
        "wk", F.explode(F.sequence(F.expr("s div 7"), F.expr("(s + 7) div 7")))
    )
    # owning-bucket rule instead of DISTINCT: a pair can meet in up to
    # two shared week buckets, so emit it only from the bucket holding
    # GREATEST(a.s, b.s) — always inside both rows' bucket ranges when
    # the band predicate holds, so each ROW pair is emitted exactly
    # once. DISTINCT on (id_a, id_b, overlap) was wrong on corpora
    # where (l_orderkey, l_linenumber) is NOT unique (this testdata has
    # such rows — the 3x-amplified sweep caught Spark collapsing
    # genuine row multiplicity the naive oracle counts), and the rule
    # is also cheaper: no distinct exchange at all.
    # NOTE: a posting-list double-explode variant (collect_list on the
    # bucket key, pairs expanded in-stage — the q160/q152 edge-build
    # shape) was A/B'd warm and LOST x1.4 both rounds: the bucket join
    # is an equi join whose strategy Catalyst/AQE already picks by
    # scale, and trading it for an ObjectHashAggregate costs more than
    # the exchange it saves. The row-level join stays.
    a_, b_ = b.alias("a"), b.alias("b")
    pairs = (
        a_.join(b_, ["l_partkey", "wk"])
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.s") <= F.col("b.s") + 7)
            & (F.col("b.s") <= F.col("a.s") + 7)
            & (
                F.col("wk")
                == F.expr("GREATEST(a.s, b.s) div 7")
            )
        )
        .select(
            (
                F.least(F.col("a.s") + 7, F.col("b.s") + 7)
                - F.greatest(F.col("a.s"), F.col("b.s"))
                + 1
            ).alias("overlap_days"),
        )
    )
    return pairs.groupBy(F.col("overlap_days").cast("bigint").alias("overlap_days")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@register(
    "q112_negative_sampling",
    """
    WITH n AS (SELECT COUNT(*) AS n FROM documents),
    cand AS (
      SELECT d.doc_id, d.source AS src_a,
             ((d.doc_id % 2147483648) * 2654435761 + 1 + t.i * 40503) % n.n
               AS neg_id
      FROM documents d CROSS JOIN n, UNNEST([0, 1, 2, 3]) AS t(i)
    )
    SELECT c.src_a, d2.source AS src_b, COUNT(*) AS n_pairs
    FROM cand c JOIN documents d2 ON c.neg_id = d2.doc_id
    WHERE c.neg_id != c.doc_id
    GROUP BY 1, 2
    """,
    doc="Deterministic negative sampling for contrastive training "
    "pairs: k=4 pseudo-random partners per anchor via a Knuth "
    "multiplicative hash over the dense doc_id space — seeded, "
    "replayable, shufflable (the property that matters for training "
    "reproducibility; rand() is none of those). The corpus count joins "
    "in as a broadcast scalar, candidates join back to documents on "
    "neg_id to fetch partner features. Per-anchor fan-out is k small "
    "integer rows; the text/features never multiply. Accidental "
    "self-pairs are filtered; a hard-negative variant adds a "
    "same-source predicate at the join.",
)
def q112_negative_sampling(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("n"))
    cand = (
        d.select("doc_id", F.col("source").alias("src_a"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "src_a",
            F.explode(F.array([F.lit(i) for i in range(4)])).alias("i"),
            "n",
        )
        .select(
            "doc_id",
            "src_a",
            # reduce mod 2^31 BEFORE the Knuth multiply: 2^31 * 2654435761
            # stays under int64 max, so the product can't overflow — Spark
            # would wrap silently (non-ANSI) while DuckDB raises, breaking
            # the same-stream property for doc_id ≳ 3.5e9
            (
                ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
                 + 1 + F.col("i") * 40503) % F.col("n")
            ).alias("neg_id"),
        )
    )
    d2 = d.select(F.col("doc_id").alias("neg_id"), F.col("source").alias("src_b"))
    return (
        cand.filter(F.col("neg_id") != F.col("doc_id"))
        .join(d2, "neg_id")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q116_latency_histogram",
    """
    WITH t AS (
      SELECT datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
               AS lag,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT CAST(CASE WHEN lag < 0 THEN 0
                     WHEN lag >= 120 THEN 13
                     ELSE lag // 10 + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n_lines,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM t GROUP BY 1
    """,
    doc="order→ship latency histogram: the day lag bins into 12 fixed "
    "10-day buckets by pure integer arithmetic (underflow→0, "
    "overflow→13 — width_bucket semantics, spelled portably since DuckDB "
    "lacks the function). The fact-fact join shuffles both sides on "
    "orderkey once; the histogram is a ≤14-row integer agg with map-side "
    "combine. Money in cents.",
)
def q116_latency_histogram(spark: SparkSession, sf_dir: str):
    l, o = load(spark, sf_dir, "lineitem", "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    bucket = (
        F.when(lag < 0, 0)
        .when(lag >= 120, 13)
        .otherwise(F.floor(lag / 10) + 1)
    )
    return (
        j.select(
            bucket.cast("bigint").alias("bucket"),
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("_c"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("_c").cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "q117_ab_experiment",
    """
    WITH per AS (
      SELECT c.c_custkey, c.c_custkey % 2 AS arm,
             COUNT(o.o_orderkey) AS n_orders,
             CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)), 0)
                  AS BIGINT) AS spend_cents
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN n_orders > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_converted,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(spend_cents) AS BIGINT) AS spend_cents
    FROM per GROUP BY arm
    """,
    doc="A/B experiment readout: per-arm users, converters (≥1 order), "
    "order count, spend. Arms here split on custkey parity so the oracle "
    "agrees; production assigns by seeded hash-bucket exactly like q86's "
    "dataset splits (same reshuffle-stable property). The per-user stage "
    "and the customer⋈orders join share the custkey shuffle key; the arm "
    "rollup is 2 rows of integers.",
)
def q117_ab_experiment(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", (F.col("c_custkey") % 2).alias("arm"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0),
            ).cast("bigint").alias("spend_cents"),
        )
    )
    return per.groupBy(F.col("arm").cast("bigint").alias("arm")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("n_orders") > 0).cast("int")).cast("bigint").alias(
            "n_converted"
        ),
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.sum("spend_cents").cast("bigint").alias("spend_cents"),
    )


@register(
    "q119_growth_accounting",
    """
    WITH uw AS (
      SELECT DISTINCT user_id,
             (datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) + 70000)
               // 7 - 10000 AS wk
      FROM events WHERE ts IS NOT NULL
    ),
    mx AS (SELECT MAX(wk) AS max_wk FROM uw),
    lagged AS (
      SELECT user_id, wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
      FROM uw
    ),
    status AS (
      SELECT wk,
             CASE WHEN prev_wk IS NULL THEN 'new'
                  WHEN wk - prev_wk = 1 THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM lagged
    ),
    churn AS (
      SELECT l.wk + 1 AS wk, COUNT(*) AS n
      FROM lagged l CROSS JOIN mx
      WHERE (l.next_wk IS NULL OR l.next_wk > l.wk + 1) AND l.wk + 1 <= mx.max_wk
      GROUP BY l.wk + 1
    )
    SELECT CAST(s.wk AS BIGINT) AS wk,
           CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(COALESCE(MIN(c.n), 0) AS BIGINT) AS n_churned
    FROM status s LEFT JOIN churn c ON s.wk = c.wk
    GROUP BY s.wk
    """,
    doc="growth accounting (the standard new/retained/resurrected/churned "
    "weekly ledger): per-user week activity deduped, lag classifies each "
    "active week, lead finds the week AFTER which the user went quiet "
    "(churn attributed to wk+1, capped at the observation horizon so the "
    "final week isn't spuriously churned). Every stage keys on user_id "
    "then rolls up to a weeks-sized frame; one window sort serves lag "
    "and lead.",
)
def q119_growth_accounting(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    uw = (
        # NULL ts → NULL week, whose lag/lead classification diverges
        # across engines — excluded on both sides
        e.filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            # floor-div via positive shift (see q109): matches DuckDB `//`
            # even for events before the 2024-01-01 anchor
            F.expr(
                "(datediff(to_date(ts), DATE'2024-01-01') + 70000) div 7"
                " - 10000"
            ).alias("wk"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("wk")
    lagged = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    status = lagged.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), "new")
        .when(F.col("wk") - F.col("prev_wk") == 1, "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    mx = uw.agg(F.max("wk").alias("max_wk"))
    churn = (
        lagged.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("next_wk").isNull() | (F.col("next_wk") > F.col("wk") + 1))
            & (F.col("wk") + 1 <= F.col("max_wk"))
        )
        .groupBy((F.col("wk") + 1).alias("wk"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        status.groupBy(F.col("wk").cast("bigint").alias("wk"))
        .agg(
            F.sum((F.col("status") == "new").cast("int"))
            .cast("bigint")
            .alias("n_new"),
            F.sum((F.col("status") == "retained").cast("int"))
            .cast("bigint")
            .alias("n_retained"),
            F.sum((F.col("status") == "resurrected").cast("int"))
            .cast("bigint")
            .alias("n_resurrected"),
        )
        .join(churn.withColumn("wk", F.col("wk").cast("bigint")), "wk", "left")
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_churned"),
        )
    )


@register(
    "q120_sliding_window_counts",
    """
    WITH d AS (
      SELECT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
      FROM events
    ),
    f AS (
      SELECT user_id, day, unnest(range(day - 6, day + 1)) AS w
      FROM d
    )
    SELECT CAST(w AS BIGINT) AS window_start_day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM f GROUP BY 1
    """,
    doc="7-day SLIDING window (stride 1 day) — the sliding twin of q53's "
    "tumbling batch window: each event fans out to EXACTLY the 7 window "
    "starts covering it (small-int rows, the same explode discipline as "
    "chunking/banding), then one agg per window start with a distinct "
    "count. Window starts are unclamped: an earlier GREATEST(day-6, 0) "
    "floor silently assumed post-anchor data — for a pre-2024 event "
    "Spark's sequence(0, day) RUNS BACKWARD (descending sequences are "
    "legal) while SQL range() is empty, a cross-engine landmine the "
    "randomized differential suite caught. Streaming twin: "
    "streaming.sliding_counts (window(ts, '7 days', '1 day') keeps ONE "
    "state row per window instead of the fan-out).",
)
def q120_sliding_window_counts(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    d = e.select(
        "user_id",
        F.expr("datediff(to_date(ts), DATE'2024-01-01')").alias("day"),
    )
    f = d.select(
        "user_id",
        F.explode(F.sequence(F.col("day") - 6, F.col("day"))).alias("w"),
    )
    return f.groupBy(F.col("w").cast("bigint").alias("window_start_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q122_anomalous_hours",
    """
    WITH h AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sm,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM h GROUP BY event_type
    )
    SELECT h.event_type,
           CAST(SUM(CASE WHEN (h.c * s.n - s.sm) * (h.c * s.n - s.sm)
                              > 4 * (s.n * s.ss - s.sm * s.sm)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
           CAST(MIN(s.n) AS BIGINT) AS n_hours,
           CAST(MIN(s.sm) AS BIGINT) AS total_events
    FROM h JOIN s USING (event_type)
    GROUP BY h.event_type
    """,
    doc="hourly-volume anomaly detection with EXACT integer algebra: an "
    "hour is anomalous when its squared deviation exceeds 4x the "
    "variance (|z| > 2), tested as (c*n - s)^2 > 4*(n*ss - s^2) — the "
    "z-score inequality cross-multiplied so no division, sqrt, or float "
    "ever happens and the boolean can't flip on a ULP across engines. "
    "The per-type stats frame is types-sized → broadcast back onto the "
    "hourly counts; two aggs, one tiny join.",
)
def q122_anomalous_hours(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    h = (
        e.select("event_type", F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").cast("bigint").alias("sm"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    )
    j = h.join(F.broadcast(s), "event_type")
    dev = F.col("c") * F.col("n") - F.col("sm")
    anom = dev * dev > 4 * (F.col("n") * F.col("ss") - F.col("sm") * F.col("sm"))
    return j.groupBy("event_type").agg(
        F.sum(anom.cast("int")).cast("bigint").alias("n_anomalous"),
        F.min("n").cast("bigint").alias("n_hours"),
        F.min("sm").cast("bigint").alias("total_events"),
    )


@register(
    "q123_revenue_share_bp",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                 * 100.0) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, cents,
           CAST(cents * 10000 // SUM(cents) OVER (PARTITION BY region)
                AS BIGINT) AS share_bp
    FROM rev
    """,
    doc="percent-of-total as a window over an aggregate: per-nation "
    "revenue share within its region in basis points, computed as "
    "integer cents * 10000 floor-div the region window sum — no float "
    "ratio, exact across engines. The star join broadcasts every "
    "dimension (locked pattern from q02); the window partitions the "
    "25-row agg result, costing nothing.",
)
def q123_revenue_share_bp(spark: SparkSession, sf_dir: str):
    l, o, c, n, r = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
    ).cast("bigint")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(w).alias("_tot"),
    ).select(
        "region",
        "nation",
        "cents",
        # integer floor-div, matching DuckDB's `//` exactly — a double
        # division truncated could flip on a quotient's ULP boundary
        F.expr("(cents * 10000) div _tot").cast("bigint").alias("share_bp"),
    )


@register(
    "q124_funnel_windowed",
    """
    WITH ev AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    s1 AS (
      SELECT user_id, MIN(ts) AS t FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM ev e JOIN s1 p ON e.user_id = p.user_id
       AND e.ts > p.t AND e.ts <= p.t + INTERVAL 1 DAY
      WHERE e.event_type = 'view' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM ev e JOIN s2 p ON e.user_id = p.user_id
       AND e.ts > p.t AND e.ts <= p.t + INTERVAL 1 DAY
      WHERE e.event_type = 'click' GROUP BY e.user_id
    )
    SELECT '1_signup' AS step, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT '2_view_24h', COUNT(*) FROM s2
    UNION ALL SELECT '3_click_24h', COUNT(*) FROM s3
    """,
    doc="conversion-window funnel — q108's ordered chain with a 24 h "
    "deadline per step (the form product funnels actually use: a view a "
    "week after signup doesn't convert). Same reused user_id shuffle; "
    "the deadline is one extra co-partition predicate. Timestamp + "
    "interval arithmetic is exact micros on both engines.",
)
def q124_funnel_windowed(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")

    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )

    def stage(prev, etype):
        ev = e.filter(F.col("event_type") == etype).alias("e")
        p = prev.alias("p")
        return (
            ev.join(
                p,
                (F.col("e.user_id") == F.col("p.user_id"))
                & (F.col("e.ts") > F.col("p.t"))
                & (F.col("e.ts") <= F.col("p.t") + F.expr("INTERVAL 1 DAY")),
            )
            .groupBy(F.col("e.user_id").alias("user_id"))
            .agg(F.min("e.ts").alias("t"))
        )

    s2 = stage(s1, "view")
    s3 = stage(s2, "click")

    def level(df, step):
        return df.agg(
            F.lit(step).alias("step"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        level(s1, "1_signup")
        .unionAll(level(s2, "2_view_24h"))
        .unionAll(level(s3, "3_click_24h"))
    )


@register(
    "q125_copurchase_pairs",
    """
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    counts AS (
      SELECT part_a, part_b, COUNT(*) AS support FROM pairs GROUP BY 1, 2
    )
    SELECT part_a, part_b, support
    FROM (SELECT part_a, part_b, support,
                 ROW_NUMBER() OVER (ORDER BY support DESC, part_a, part_b)
                   AS rnk
          FROM counts)
    WHERE rnk <= 10
    """,
    doc="market-basket co-occurrence: part pairs bought in the same "
    "order, global top-10 by support with a total-order tiebreak. The "
    "pair expansion is bounded by basket size (≤7 lines per order → ≤21 "
    "pairs), so the self-join on orderkey never blows up — the same "
    "bounded-fan-out discipline as chunking/banding. The global top-10 "
    "runs as TakeOrderedAndProject over the pair agg, not a full sort.",
)
def q125_copurchase_pairs(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    # posting-list double-explode instead of distinct + self-join (the
    # q160/q152 edge-build shape): collect_set folds the per-basket
    # distinct into the ONE basket exchange (map-side partial
    # aggregation), and the a<b pair expansion runs inside the same
    # codegen stage — no distinct exchange, no second join side, no
    # SMJ sorts. Identical pair multiset: collect_set = per-order
    # distinct parts, exactly what the old distinct() fed the join.
    pairs = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("part_a"), "ps")
        .select("part_a", F.explode("ps").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
    )
    counts = pairs.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("support")
    )
    return (
        counts.orderBy(F.desc("support"), "part_a", "part_b")
        .limit(10)
        .select("part_a", "part_b", "support")
    )


@register(
    "q126_bounce_rate",
    """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - COALESCE(epoch_us(CAST(LAG(ts) OVER w AS TIMESTAMP)),
                                  -3600000000 * 24)
                       > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o
    ),
    first_ev AS (
      SELECT user_id, sess_id, event_type AS first_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, sess_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY user_id, sess_id) AS n_events
      FROM sess
    )
    SELECT first_type,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce
    FROM first_ev WHERE rn = 1 GROUP BY first_type
    """,
    doc="bounce rate by session entry point: 30-minute-gap "
    "sessionization (q51's running-sum-of-boundaries trick), then each "
    "session keyed by its FIRST event's type; bounce = single-event "
    "session. Epoch-micros integer gap test — no interval-type "
    "comparison drift. All three windows partition by user_id: one sort "
    "serves the lag, the running sum, and the per-session agg stays "
    "co-partitioned.",
)
def q126_bounce_rate(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # unknown-time events have no session position (and the engines'
    # NULL sort defaults disagree) — excluded on both sides
    e = e.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)").alias("_us"),
    )
    o = base.withColumn("_prev", F.lag("_us").over(w)).withColumn(
        "new_sess",
        (
            F.col("_us") - F.coalesce(F.col("_prev"), F.lit(-86400000000))
            > 1800000000
        ).cast("int"),
    )
    sess = o.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).select("user_id", "event_type", "ts", "event_id", "sess_id")
    # first event per session via rn=1 with the SAME (ts, event_id)
    # tiebreak as the session windows — a join-back on ts = min(ts)
    # would duplicate sessions whose first two events share a timestamp
    ws = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id", "sess_id")
    first_ev = (
        sess.withColumn("rn", F.row_number().over(ws))
        .withColumn("n_events", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(F.col("event_type").alias("first_type"), "n_events")
    )
    return first_ev.groupBy("first_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).cast("bigint").alias("n_bounce"),
    )


@register(
    "q127_hierarchy_depth",
    """
    WITH RECURSIVE parents AS (
      SELECT p_partkey AS node,
             CASE WHEN p_partkey = 0 THEN 0
                  ELSE ('0x' || substring(md5(CAST(p_partkey AS VARCHAR)), 1, 4))
                         ::BIGINT % p_partkey END AS parent
      FROM part
    ),
    walk(node, anc, d) AS (
      SELECT node, parent, 1 FROM parents WHERE node > 0
      UNION ALL
      SELECT w.node, p.parent, w.d + 1
      FROM walk w JOIN parents p ON w.anc = p.node
      WHERE w.anc > 0
    ),
    depth AS (
      SELECT node, d FROM walk WHERE anc = 0
      UNION ALL SELECT 0, 0
    )
    SELECT CAST(d AS BIGINT) AS depth, COUNT(*) AS n_parts
    FROM depth GROUP BY d
    """,
    doc="hierarchy depth rollup WITHOUT recursive SQL (Spark has none): "
    "a deterministic random forest over partkeys (parent = md5-hash mod "
    "node, strictly decreasing → acyclic, rooted at 0) traversed by "
    "POINTER DOUBLING — each round joins the ancestor map with itself, "
    "so reach doubles per round and depth-64 chains resolve in six "
    "self-joins, O(log depth) shuffles instead of O(depth). The oracle "
    "walks the same forest with a real WITH RECURSIVE. Output: node "
    "count per depth.",
)
def q127_hierarchy_depth(spark: SparkSession, sf_dir: str):
    (p,) = load(spark, sf_dir, "part")
    nodes = p.select(F.col("p_partkey").alias("node"))
    parents = nodes.select(
        "node",
        F.when(F.col("node") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.conv(
                F.substring(F.md5(F.col("node").cast("string")), 1, 4), 16, 10
            ).cast("bigint")
            % F.col("node")
        )
        .alias("parent"),
    )
    # pointer-doubling state: (node, anc, d) with anc = ancestor reached,
    # d = steps taken; the root is its own fixpoint with d contribution 0
    f = parents.filter(F.col("node") > 0).select(
        "node", F.col("parent").alias("anc"), F.lit(1).cast("bigint").alias("d")
    ).unionAll(
        parents.filter(F.col("node") == 0).select(
            "node", F.lit(0).cast("bigint").alias("anc"),
            F.lit(0).cast("bigint").alias("d"),
        )
    )
    # Reach doubles per round, so ceil(log2(max depth)) rounds suffice;
    # the scalar convergence check stops as soon as every chain reached
    # the root (depth 23 at sf0.1 → 5 rounds, not the 7-round worst
    # case). localCheckpoint truncates the self-join's otherwise
    # exponentially-doubling lineage — the same scaffolding as
    # functions/graph.connected_components; driver traffic is one scalar
    # per round.
    for _ in range(7):
        f = f.localCheckpoint(eager=False)
        if f.filter(F.col("anc") > 0).limit(1).count() == 0:
            break
        a, b = f.alias("a"), f.alias("b")
        f = a.join(b, F.col("a.anc") == F.col("b.node")).select(
            F.col("a.node").alias("node"),
            F.col("b.anc").alias("anc"),
            (F.col("a.d") + F.col("b.d")).alias("d"),
        )
    return (
        f.filter(F.col("anc") == 0)
        .groupBy(F.col("d").cast("bigint").alias("depth"))
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


@register(
    "q128_weighted_median",
    """
    WITH t AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(FLOOR(l_quantity) AS BIGINT) AS w
      FROM lineitem
    ),
    c AS (
      SELECT flag, price, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY price, w
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM t
    )
    SELECT flag, MIN(price) AS weighted_median_price,
           CAST(MIN(tw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cw >= tw GROUP BY flag
    """,
    doc="quantity-weighted median price per group — the weighted "
    "quantile Spark has no built-in for: one window sort by price "
    "accumulates integer weights, the answer is the first row whose "
    "cumulative weight crosses half the total (2*cw >= tw, integer "
    "cross-multiplication — no float ratio). Duplicate (price, weight) "
    "rows permute freely without changing the crossing price, so the "
    "result is deterministic on both engines. One sort + one partition "
    "total serves everything.",
)
def q128_weighted_median(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    t = l.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.floor("l_quantity").cast("bigint").alias("w"),
    )
    wo = (
        Window.partitionBy("flag")
        .orderBy("price", "w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("flag")
    c = t.select(
        "flag",
        "price",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wp).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


@register(
    "q139_psi_drift",
    """
    WITH b AS (
      SELECT CAST(MIN(ts) AS TIMESTAMP) AS t0,
             CAST(MAX(ts) AS TIMESTAMP) AS t1
      FROM events
    ),
    tagged AS (
      SELECT event_type,
             CASE WHEN epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(b.t0)
                       < (epoch_us(b.t1) - epoch_us(b.t0)) // 2
                  THEN 0 ELSE 1 END AS half
      FROM events e CROSS JOIN b
      WHERE e.ts IS NOT NULL
    ),
    c AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM tagged GROUP BY event_type
    ),
    n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM c),
    s AS (
      SELECT event_type, ca, cb,
             (1000000 * ca) // na AS pa,
             (1000000 * cb) // nb AS qb
      FROM c CROSS JOIN n
    )
    SELECT event_type, ca, cb,
           CAST(pa AS BIGINT) AS pa_ppm, CAST(qb AS BIGINT) AS qb_ppm,
           CAST((pa - qb) *
                CAST(FLOOR(1000000.0 *
                     ln(CAST(pa AS DOUBLE) / CAST(qb AS DOUBLE))) AS BIGINT)
                AS BIGINT) AS psi_contrib
    FROM s
    WHERE pa > 0 AND qb > 0
    """,
    doc="distribution-drift monitoring (population stability index) over "
    "the event-type mix: events split at the stream's temporal midpoint "
    "(integer epoch-microsecond arithmetic; NULL timestamps excluded on "
    "both engines), each type's share in either half integerized to "
    "parts-per-million, and the PSI contribution (p-q)*ln(p/q) computed "
    "as ppm-diff x floor-integerized log-ratio — so every output is "
    "exact int64 at ANY corpus size (shares are bounded by 1e6 "
    "regardless of counts; the raw-count cross products a naive "
    "formulation multiplies would overflow at ~1e12 events). The cut is "
    "on the INTEGERIZED shares (pa>0 AND qb>0, not raw counts): a type "
    "absent from a half has an unbounded PSI term (standard practice to "
    "exclude), and a sub-ppm share floors to 0, whose log the oracle "
    "engine would refuse outright where Spark would emit NULL — the "
    "ppm-level cut keeps both engines total and identical. One scan "
    "for bounds, one agg shuffle of per-type counts, scalar totals "
    "broadcast.",
)
def q139_psi_drift(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    b = e.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    # the parquet column is TIMESTAMP_NTZ, which unix_micros rejects —
    # cast through TIMESTAMP (session-tz offsets cancel: only
    # differences and a midpoint comparison are used)
    tagged = (
        e.filter(F.col("ts").isNotNull())  # oracle drops them too
        .crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp))"
                " - unix_micros(cast(t0 as timestamp))"
                " < (unix_micros(cast(t1 as timestamp))"
                "    - unix_micros(cast(t0 as timestamp))) div 2"
            ).alias("_first"),
        )
    )
    c = tagged.groupBy("event_type").agg(
        F.sum(F.col("_first").cast("int")).cast("bigint").alias("ca"),
        F.sum((~F.col("_first")).cast("int")).cast("bigint").alias("cb"),
    )
    # the PSI finalize is the SHARED kernel (functions/drift.py): the
    # streaming monitor (streaming/__init__.py streaming_psi_drift)
    # finalizes its live counts through this exact function, so this
    # query's DuckDB oracle verifies the streaming math too
    from klio_spark.functions.drift import psi_from_counts

    return psi_from_counts(c, "event_type")


@register(
    "q142_time_decay_score",
    """
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
    r AS (
      SELECT user_id,
             CAST(FLOOR(1000000.0 * value * exp(
                  -(CAST(tmax - epoch_us(ts) AS DOUBLE) / 86400000000.0)
                  / 7.0)) AS BIGINT) AS iscore
      FROM events CROSS JOIN mx
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(iscore) AS BIGINT) AS score_micros
    FROM r GROUP BY user_id
    ORDER BY score_micros DESC, user_id LIMIT 20
    """,
    doc="exponentially time-decayed engagement score (half-life-style "
    "recency weighting — the feature-engineering primitive behind "
    "recommendation freshness and churn features): each event "
    "contributes value·exp(-age/7d) measured against the table's max "
    "timestamp, floor-integerized at 1e6 PER ROW so the per-user sum is "
    "exact integer arithmetic in any order. Ages are differences of "
    "epoch-micros BIGINTs, so the NTZ-vs-LTZ session offset cancels "
    "(module doc). The plan is one scan + broadcast 1-row max + hash "
    "agg on user_id, and the top-20 rides TakeOrderedAndProject — "
    "per-partition heaps, no global sort, no driver traffic beyond "
    "k rows.",
)
def q142_time_decay_score(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    us = F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)")
    mx = e.agg(F.max(us).alias("tmax"))
    r = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.floor(
            F.lit(1000000.0)
            * F.col("value")
            * F.exp(
                -((F.col("tmax") - us).cast("double") / 86400000000.0) / 7.0
            )
        )
        .cast("bigint")
        .alias("iscore"),
    )
    per = r.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("iscore").cast("bigint").alias("score_micros"),
    )
    # asc_nulls_last matches DuckDB's ASC default at the LIMIT boundary
    return per.orderBy(
        F.desc("score_micros"), F.asc_nulls_last("user_id")
    ).limit(20)


@register(
    "q145_scd2_intervals",
    """
    WITH p AS (
      SELECT user_id,
             CAST((epoch_us(ts) + 62135596800000000) // 1000000
                  - 62135596800 AS BIGINT) AS t_s,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS value_cents,
             event_id
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           t_s AS valid_from_s,
           LEAD(t_s) OVER w AS valid_to_s,
           (LEAD(t_s) OVER w IS NULL) AS is_current,
           value_cents
    FROM p
    WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
    """,
    doc="SCD type-2 history build (the dimension-versioning half of the "
    "CDC surface — q111 answers 'what is the row now', this answers "
    "'what was it when'): each change event opens a version valid until "
    "the next change, closed by LEAD over (user_id, ts); the open "
    "version carries NULL valid_to and is_current=true. All measures "
    "integer (epoch seconds, cents), and the version/lead/current "
    "columns come from ONE window over one user_id shuffle — the same "
    "exchange a downstream as-of join (q15) against the history would "
    "reuse. Ties break on event_id, so replayed changelogs produce "
    "byte-identical history.",
)
def q145_scd2_intervals(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # NULL-ts changelog rows carry no ordering information, and the two
    # engines disagree on where ASC puts NULLs (Spark first, DuckDB
    # last) — exclude them in both
    p = e.filter(
        (F.col("event_type") == "purchase") & F.col("ts").isNotNull()
    ).select(
        "user_id",
        F.expr(_SECS.format(c="ts")).alias("t_s"),
        F.floor(F.col("value") * 100.0).cast("bigint").alias("value_cents"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    return p.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("t_s").alias("valid_from_s"),
        F.lead("t_s").over(w).alias("valid_to_s"),
        F.lead("t_s").over(w).isNull().alias("is_current"),
        "value_cents",
    )


@register(
    "q147_incremental_rollup",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events WHERE ts IS NOT NULL GROUP BY event_type
    """,
    doc="incremental materialized-rollup maintenance (the pattern that "
    "keeps a 100 TB dashboard table fresh without rescanning history): "
    "the Spark side deliberately computes the rollup as BASE ⊕ DELTA — "
    "events at or before the temporal midpoint are aggregated into a "
    "'yesterday' table, the newer slice into a delta, and the two merge "
    "by full-outer key combine (counts and integer cent-sums are "
    "associative, so the merge is exact) — while the oracle computes "
    "the same rollup directly over all events. The hash match IS the "
    "incremental-maintenance correctness claim: base+delta loses "
    "nothing. At scale only the delta slice is scanned per refresh; "
    "the base rides from the previous materialization. NULL-ts rows "
    "are excluded on both sides (they belong to no time slice).",
)
def q147_incremental_rollup(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    us = F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)")
    e = e.filter(F.col("ts").isNotNull()).select(
        "event_type",
        us.alias("_us"),
        F.floor(F.col("value") * 100.0).cast("bigint").alias("_cents"),
    )
    mid = e.agg(
        F.expr("(min(_us) + (max(_us) - min(_us)) div 2)").alias("tmid")
    )

    def agg(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("_cents").cast("bigint").alias("sum_cents"),
        )

    tagged = e.crossJoin(F.broadcast(mid))
    base = agg(tagged.filter(F.col("_us") <= F.col("tmid")))
    delta = agg(tagged.filter(F.col("_us") > F.col("tmid")))
    return (
        base.withColumnRenamed("n_events", "_nb")
        .withColumnRenamed("sum_cents", "_sb")
        .join(
            delta.withColumnRenamed("n_events", "_nd").withColumnRenamed(
                "sum_cents", "_sd"
            ),
            "event_type",
            "full_outer",
        )
        .select(
            "event_type",
            (
                F.coalesce(F.col("_nb"), F.lit(0))
                + F.coalesce(F.col("_nd"), F.lit(0))
            ).cast("bigint").alias("n_events"),
            # SUM's null semantics under merge: NULL only when BOTH slices
            # are NULL (side absent, or present with all-NULL values —
            # either way that slice contributed no non-NULL value). A bare
            # coalesce-to-0 would turn an all-NULL event_type into 0 and
            # diverge from the direct-aggregation oracle.
            F.when(
                F.col("_sb").isNull() & F.col("_sd").isNull(),
                F.lit(None).cast("bigint"),
            )
            .otherwise(
                F.coalesce(F.col("_sb"), F.lit(0))
                + F.coalesce(F.col("_sd"), F.lit(0))
            )
            .cast("bigint")
            .alias("sum_cents"),
        )
    )


@register(
    "q148_transition_matrix",
    """
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events WHERE ts IS NOT NULL
    ),
    c AS (
      SELECT prev AS prev_type, event_type AS next_type,
             COUNT(*) AS n
      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY 1)
    SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n_transitions,
           CAST(c.n * 10000 // t.tot AS BIGINT) AS prob_bp
    FROM c JOIN t USING (prev_type)
    """,
    doc="per-user event-type Markov transition matrix with probabilities "
    "in integer basis points — the session-flow profile (where do users "
    "go after a view?) behind next-action models and funnel design. One "
    "exchange on user_id serves the LAG (ties broken by event_id — the "
    "deterministic-window rule the suite standardizes on); the pair agg "
    "is map-side combinable over at most |types|² keys, and the "
    "per-prev totals join is a broadcast of that tiny matrix. NULL-ts "
    "rows are excluded (no position in the sequence); NULL user_id "
    "forms its own partition identically in both engines.",
)
def q148_transition_matrix(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        e.filter(F.col("ts").isNotNull())
        .select(
            "user_id", "event_type",
            F.lag("event_type").over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
    )
    c = s.groupBy(
        F.col("prev").alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.expr("(n * 10000) div tot").cast("bigint").alias("prob_bp"),
    )


@register(
    "q149_dau_mau",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
    mau AS (
      SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
      FROM (SELECT DISTINCT day FROM du) d
      JOIN du u ON u.day BETWEEN d.day - 27 AND d.day
      GROUP BY d.day
    )
    SELECT datediff('day', DATE '1970-01-01', dau.day) AS day_id,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(dau.dau * 10000 // mau.mau AS BIGINT) AS stickiness_bp
    FROM dau JOIN mau USING (day)
    """,
    doc="DAU / trailing-28-day MAU stickiness ledger, ratio in integer "
    "basis points. The oracle writes the natural range join; the Spark "
    "side replaces it with the q120 sliding-window shape — each "
    "(day, user) pair fans out to the 28 window-anchor days via "
    "sequence()+explode, then one distinct-count per anchor — because a "
    "non-equi range join degrades to nested-loop at scale while the "
    "fan-out is a fixed 28× of the (day,user) DISTINCT pairs (already "
    "tiny relative to raw events) and keeps everything in hash "
    "exchanges. Inner join back to observed days drops the synthetic "
    "anchors sequence() invents past the corpus edge. Days are emitted "
    "as epoch-day integers (the suite's date rule: pandas renders a "
    "DuckDB DATE as midnight timestamp, so raw DATE columns can never "
    "hash-match).",
)
def q149_dau_mau(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    du = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    anchors = du.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 27), interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    mau = anchors.groupBy("day").agg(
        F.countDistinct("user_id").alias("mau")
    )
    return dau.join(mau, "day").select(
        F.datediff("day", F.lit("1970-01-01").cast("date")).alias("day_id"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("mau").cast("bigint").alias("mau"),
        F.expr("(dau * 10000) div mau").cast("bigint").alias("stickiness_bp"),
    )


@register(
    "q154_time_weighted_avg",
    """
    WITH s AS (
      SELECT user_id,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS cents,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    iv AS (
      SELECT user_id, cents, (nxt - us) // 1000000 AS dur_s
      FROM s WHERE nxt IS NOT NULL
    ),
    agg AS (
      SELECT user_id, SUM(cents * dur_s) AS wsum, SUM(dur_s) AS dsum
      FROM iv GROUP BY user_id
    )
    SELECT user_id,
           CAST(dsum AS BIGINT) AS held_s,
           (CAST(wsum AS DOUBLE) / 100.0) / CAST(dsum AS DOUBLE) AS twap
    FROM agg WHERE dsum > 0
    """,
    doc="time-weighted average value per user (the TWAP shape: each "
    "observation holds until the next one, so its weight is the holding "
    "duration, not the sample count — the correct average for "
    "irregularly sampled gauges/prices). One user_id window computes "
    "LEAD holding intervals (same exchange as every per-user temporal "
    "query); weights are exact integers (cents × whole seconds, "
    "overflow-audited), and the final twap is two IEEE divisions on "
    "identical operands. Zero-duration histories are excluded on both "
    "engines (dsum=0 would be 0/0). NULL ts/value rows hold nothing.",
)
def q154_time_weighted_avg(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        e.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .select(
            "user_id",
            F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
            F.lead(F.expr("unix_micros(CAST(ts AS TIMESTAMP))")).over(w)
            .alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .select(
            "user_id", "cents",
            F.expr("(nxt - us) div 1000000").alias("dur_s"),
        )
    )
    agg = s.groupBy("user_id").agg(
        F.sum(F.expr("cents * dur_s")).alias("wsum"),
        F.sum("dur_s").alias("dsum"),
    )
    return agg.filter(F.col("dsum") > 0).select(
        "user_id",
        F.col("dsum").cast("bigint").alias("held_s"),
        (
            (F.col("wsum").cast("double") / F.lit(100.0))
            / F.col("dsum").cast("double")
        ).alias("twap"),
    )


@register(
    "q176_pit_scd2_join",
    """
    WITH p AS (
      SELECT user_id,
             CAST((epoch_us(ts) + 62135596800000000) // 1000000
                  - 62135596800 AS BIGINT) AS t_s,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS value_cents,
             event_id
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    v AS (
      SELECT user_id,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
             t_s AS valid_from_s,
             LEAD(t_s) OVER w AS valid_to_s,
             value_cents
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
    ),
    c AS (
      SELECT user_id, event_id,
             CAST((epoch_us(ts) + 62135596800000000) // 1000000
                  - 62135596800 AS BIGINT) AS t_s
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    )
    SELECT c.event_id, c.user_id, c.t_s, v.version, v.value_cents
    FROM c JOIN v
      ON c.user_id = v.user_id
     AND v.valid_from_s <= c.t_s
     AND (v.valid_to_s IS NULL OR c.t_s < v.valid_to_s)
    """,
    doc="point-in-time join against SCD2 history — the CONSUMER of "
    "q145's versioned dimension (every click resolves the purchase "
    "version that was valid at its event time; the "
    "'no-future-leakage' join every training-feature pipeline needs). "
    "The oracle states it as the declarative BETWEEN range join; the "
    "Spark side runs the SCALABLE form — version-start rows and fact "
    "rows union into ONE user_id exchange and a single forward-fill "
    "window (last non-null version at or before each fact, version "
    "rows sorted before same-timestamp facts for inclusive-start "
    "semantics, same-timestamp versions resolved to the newest — "
    "exactly the rows the interval predicate admits, since a "
    "superseded same-second version has valid_to = t and fails "
    "t < valid_to). No range-join explosion, no per-interval fan-out; "
    "this is q15's as-of machinery applied to versioned dimensions, "
    "the shape that holds when both sides are 1e11 rows. All-integer "
    "outputs — hash-exact.",
)
def q176_pit_scd2_join(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # NULL user_id rows drop: the oracle's equi join never matches NULL
    # keys, while a window PARTITION BY groups NULLs together — without
    # this filter a NULL-user click would forward-fill from a NULL-user
    # purchase (caught by the randomized differential corpus)
    base = e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    p = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.expr(_SECS.format(c="ts")).alias("t_s"),
        F.floor(F.col("value") * 100.0).cast("bigint").alias("value_cents"),
        "event_id",
    )
    wv = Window.partitionBy("user_id").orderBy("t_s", "event_id")
    starts = p.select(
        "user_id",
        F.col("t_s").alias("t"),
        F.lit(0).alias("_tag"),
        F.row_number().over(wv).cast("bigint").alias("version"),
        "value_cents",
        F.lit(None).cast("long").alias("event_id"),
    )
    clicks = base.filter(F.col("event_type") == "click").select(
        "user_id",
        F.expr(_SECS.format(c="ts")).alias("t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("bigint").alias("version"),
        F.lit(None).cast("bigint").alias("value_cents"),
        "event_id",
    )
    u = starts.unionByName(clicks)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t", "_tag", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # fill version+value as ONE struct: filling them independently would
    # pair a NULL-valued version's number with an OLDER version's value
    ver_struct = F.when(
        F.col("_tag") == 0, F.struct("version", "value_cents")
    )
    filled = F.last(ver_struct, ignorenulls=True).over(wf)
    return (
        u.withColumn("_f", filled)
        .filter((F.col("_tag") == 1) & F.col("_f").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("t_s"),
            F.col("_f.version").alias("version"),
            F.col("_f.value_cents").alias("value_cents"),
        )
    )


_EWMA_K = 8  # lags; weight of lag k is 2^(K-1-k)


def ewma_features(e, segment_s: int | None = None):
    """Truncated-EWMA feature kernel (q179's registration docstring has
    the semantics). ``segment_s`` is the entity-window skew lever
    (segmented_carry has the general argument); the K-lag fold's carry
    state is the last K-1 (cents) values per user — bounded by K, which
    is WHY the truncated form was chosen over the sequential recursive
    EWMA in the first place. Segmented: each chunk's intra-chunk LAGs
    run in a (user, seg) window; the per-chunk summary is the chunk's
    last K-1 cents in (t_s, event_id) order; the carry fold
    concatenates preceding chunks' tails in seg order (chunk times are
    disjoint, so concatenation IS global time order) and keeps the last
    K-1 — exactly the events the chunk's first rows are missing. An
    event at intra-chunk row r fills its NULL lag k from the carry's
    (k - r + 1)-th element from the end; lags past the user's history
    stay NULL, so the warmup denominator mask is preserved exactly and
    the segmented output is hash-identical to the monolithic window."""
    p = e.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
        F.expr(_SECS.format(c="ts")).alias("t_s"),
    )
    if segment_s is None:
        w = Window.partitionBy("user_id").orderBy("t_s", "event_id")
        rows = p
        lags = [F.lag("cents", k).over(w) for k in range(_EWMA_K)]
    else:
        tail_len = _EWMA_K - 1

        def tails(c):
            return (
                c.groupBy("user_id", "seg")
                .agg(
                    F.sort_array(
                        F.collect_list(
                            F.struct("t_s", "event_id", "cents")
                        )
                    ).alias("_evs")
                )
                .select(
                    "user_id",
                    "seg",
                    F.expr(
                        "transform(slice(_evs,"
                        f" greatest(1, size(_evs) - {tail_len - 1}),"
                        f" {tail_len}), x -> x.cents)"
                    ).alias("tail"),
                )
            )

        def carry_expr(sw):
            arr = F.flatten(F.collect_list("tail").over(sw))
            return F.slice(
                arr,
                F.greatest(F.lit(1), F.size(arr) - F.lit(tail_len - 1)),
                F.lit(tail_len),
            )

        chunked, carry = segmented_carry(
            p, ["user_id"], "t_s", segment_s, tails, {"carry": carry_expr}
        )
        cw = Window.partitionBy("user_id", "seg").orderBy(
            "t_s", "event_id"
        )
        # null-safe on user_id: the monolithic window keeps NULL user_id
        # rows as their own partition (p filters only ts/value), and the
        # carry table groups them the same way — a plain equi-join would
        # silently drop them and break the hash-identical guarantee.
        # <=> is still planned as an equi-join key (no cartesian).
        c = carry.select(
            F.col("user_id").alias("_cu"),
            F.col("seg").alias("_cs"),
            "carry",
        )
        rows = (
            chunked.join(
                c,
                F.col("user_id").eqNullSafe(F.col("_cu"))
                & (F.col("seg") == F.col("_cs")),
            )
            .drop("_cu", "_cs")
            .withColumn("_rn", F.row_number().over(cw))
        )
        lags = [F.col("cents")]
        for k in range(1, _EWMA_K):
            intra = F.lag("cents", k).over(cw)
            # intra is NULL iff _rn <= k; then lag k is the
            # (k - _rn + 1)-th element from the carry's end, i.e.
            # 1-based index size - k + _rn (guarded: index < 1 means
            # the user's history is shorter than k — stay NULL, the
            # warmup mask shortens the denominator exactly as the
            # monolithic window does)
            idx = F.size("carry") - F.lit(k) + F.col("_rn")
            lags.append(
                F.coalesce(
                    intra,
                    F.when(idx >= 1, F.element_at("carry", idx)),
                )
            )
    num = sum(
        (
            F.coalesce(
                lags[k] * F.lit(1 << (_EWMA_K - 1 - k)), F.lit(0)
            )
            for k in range(_EWMA_K)
        ),
        F.lit(0),
    )
    den = sum(
        (
            F.when(lags[k].isNull(), 0).otherwise(
                F.lit(1 << (_EWMA_K - 1 - k))
            )
            for k in range(_EWMA_K)
        ),
        F.lit(0),
    )
    return rows.select(
        "user_id",
        "event_id",
        num.cast("bigint").alias("ewma_num"),
        den.cast("bigint").alias("ewma_den"),
    )


@register(
    "q179_ewma_features",
    f"""
    WITH p AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS cents,
             CAST((epoch_us(ts) + 62135596800000000) // 1000000
                  - 62135596800 AS BIGINT) AS t_s
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    lagged AS (
      SELECT user_id, event_id, t_s,
             {", ".join(
                 f"LAG(cents, {k}) OVER w AS c{k}" for k in range(_EWMA_K)
             )}
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY t_s, event_id)
    )
    SELECT user_id, event_id,
           CAST({" + ".join(
               f"COALESCE(c{k} * {1 << (_EWMA_K - 1 - k)}, 0)"
               for k in range(_EWMA_K)
           )} AS BIGINT) AS ewma_num,
           CAST({" + ".join(
               f"CASE WHEN c{k} IS NULL THEN 0 ELSE {1 << (_EWMA_K - 1 - k)} END"
               for k in range(_EWMA_K)
           )} AS BIGINT) AS ewma_den
    FROM lagged
    """,
    doc="truncated exponentially-weighted activity feature per event "
    "(alpha = 1/2, horizon 8): the decayed-engagement feature column "
    "every behavioral model consumes, stated EXACTLY — weight of lag k "
    "is the integer 2^(7-k), the numerator/denominator pair is exact "
    "(the caller divides at serving time), so no float recursion or "
    "exp() enters the pipeline and both engines emit identical "
    "integers. One user_id window with 8 LAGs (ONE exchange + one "
    "sort serves all lags — Spark fuses same-window functions into a "
    "single WindowExec); at stream start the available-lag mask "
    "shortens the denominator, matching online-EWMA warmup. The "
    "recursive EWMA definition is deliberately truncated: an untruncated "
    "recurrence is sequential per key, while the K-term form is "
    "windowable and distributed — the standard production tradeoff.",
)
def q179_ewma_features(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # monolithic (segment_s=None) — the registered/oracle-paired shape;
    # segment_s is the documented skew lever for degenerate users
    return ewma_features(e)


@register(
    "q191_event_paths",
    """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    paths AS (
      SELECT event_type AS step1, e2 AS step2, e3 AS step3,
             COUNT(*) AS n
      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT SUM(n) AS t FROM paths)
    SELECT step1, step2, step3, CAST(n AS BIGINT) AS n_paths,
           CAST(n * 10000 // tot.t AS BIGINT) AS share_bp
    FROM paths CROSS JOIN tot
    ORDER BY n DESC, step1, step2, step3
    LIMIT 20
    """,
    doc="top-20 three-step user journeys (event-type path mining) — the "
    "funnel-DISCOVERY op that q148's first-order transition matrix "
    "can't express (a Markov matrix factorizes paths; the journey "
    "table shows which full sequences actually dominate, e.g. "
    "view→view→purchase vs view→click→purchase). Consecutive triples "
    "come from two LEAD windows over the per-user timeline (ts, "
    "event_id total order — one user-keyed exchange and sort, shared "
    "by both leads), path counts are map-side combinable, the share "
    "is integer basis points, and the top-20 is "
    "TakeOrderedAndProject with a full lexicographic tie-break — "
    "hash-exact on both engines.",
)
def q191_event_paths(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .filter(F.col("step2").isNotNull() & F.col("step3").isNotNull())
    )
    paths = s.groupBy("step1", "step2", "step3").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = paths.agg(F.sum("n").alias("t"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "step1", "step2", "step3",
            F.col("n").cast("bigint").alias("n_paths"),
            F.expr("n * 10000 div t").cast("bigint").alias("share_bp"),
        )
        .orderBy(
            F.desc("n_paths"), F.asc("step1"), F.asc("step2"), F.asc("step3")
        )
        .limit(20)
    )


@register(
    "q192_association_rules",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    item AS (SELECT l_partkey AS p, COUNT(*) AS n FROM li GROUP BY 1),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
    pair AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 3
    ),
    rules AS (
      SELECT pa AS antecedent, pb AS consequent, n_ab FROM pair
      UNION ALL
      SELECT pb, pa, n_ab FROM pair
    )
    SELECT antecedent, consequent, CAST(n_ab AS BIGINT) AS support,
           CAST(n_ab * 10000 // ia.n AS BIGINT) AS confidence_bp,
           CAST(n_ab * nb.n_baskets * 1000000 // (ia.n * ic.n) AS BIGINT)
             AS lift_ppm
    FROM rules
    JOIN item ia ON ia.p = rules.antecedent
    JOIN item ic ON ic.p = rules.consequent
    CROSS JOIN nb
    ORDER BY lift_ppm DESC, antecedent, consequent
    LIMIT 20
    """,
    doc="market-basket association rules: top-20 item rules a=>b by "
    "LIFT, with support and confidence — the recommender / cross-sell "
    "shape q125's raw co-purchase counts feed but can't rank "
    "(frequent pairs are dominated by individually-popular items; "
    "lift normalizes by both marginals exactly as PMI does for "
    "words). All three metrics integer-exact: confidence_bp = "
    "n_ab*1e4 // n_a, lift_ppm = n_ab*N*1e6 // (n_a*n_b) — the "
    "log-free monotone ranking trick (q187). Shape: basket pair "
    "counts expand from per-order posting lists on ONE orderkey "
    "exchange (collect_set folds the distinct; the q125/q201 shape; "
    "min-support 3 prunes before ranking), marginals broadcast, "
    "TakeOrderedAndProject with lexicographic tie-break — hash-exact.",
)
def q192_association_rules(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return association_rules(l, broadcast_marginals=True)


def association_rules(
    l, *, topn: int = 20, min_support: int = 3,
    broadcast_marginals: bool = True,
):
    """Integer-lift association rules; see the q192 registration
    docstring. ``broadcast_marginals``: item marginals are a catalog
    dimension and broadcast in the serving shape; False drops the hint
    for catalogs beyond executor broadcast memory — the joins run
    item-keyed as shuffle joins, row-identically (q152 lever
    discipline)."""
    mb = F.broadcast if broadcast_marginals else (lambda df: df)
    li = l.select("l_orderkey", "l_partkey").distinct()
    item = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n")
    )
    nb = li.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    # the PAIR stream expands basket posting lists instead of the
    # distinct-then-self-join (the q125/q201 shape): collect_set folds
    # the per-basket distinct into ONE orderkey exchange and the a<b
    # expansion runs in-stage — no second join side, no SMJ sorts.
    # Measured (warm interleaved, 4 alternating rounds): basket pair +
    # untouched li marginals wins every round (~x0.75); persisting ONE
    # shared basket table for all consumers LOSES both eager (the fill
    # serializes in front) and lazy (broadcast-branch cache races) —
    # the marginal branches overlap on idle cores, the q107/q152
    # pattern, so they deliberately stay on their own li subtree.
    pair = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("ps"))
        .select(F.explode("ps").alias("pa"), "ps")
        .select("pa", F.explode("ps").alias("pb"))
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    rules = pair.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"),
        "n_ab",
    ).unionByName(
        pair.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"),
            "n_ab",
        )
    )
    return (
        rules.join(
            mb(item.select(F.col("p").alias("antecedent"),
                           F.col("n").alias("n_a"))),
            "antecedent",
        )
        .join(
            mb(item.select(F.col("p").alias("consequent"),
                           F.col("n").alias("n_c"))),
            "consequent",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "antecedent", "consequent",
            F.col("n_ab").cast("bigint").alias("support"),
            F.expr("n_ab * 10000 div n_a").cast("bigint").alias(
                "confidence_bp"
            ),
            F.expr("n_ab * n_baskets * 1000000 div (n_a * n_c)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("antecedent"), F.asc("consequent"))
        .limit(topn)
    )


@register(
    "q193_conversion_lifetable",
    """
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase,
             MAX(ts) AS last_seen
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id
    ),
    cohort AS (
      SELECT user_id,
             CASE WHEN first_purchase IS NOT NULL
                    AND first_purchase >= first_view
                  THEN CAST(date_diff('day', first_view, first_purchase)
                            AS BIGINT) END AS event_day,
             CAST(date_diff('day', first_view, last_seen) AS BIGINT)
               AS censor_day
      FROM u WHERE first_view IS NOT NULL
    ),
    days AS (
      SELECT DISTINCT COALESCE(event_day, censor_day) AS d FROM cohort
    )
    SELECT d AS day,
           CAST((SELECT COUNT(*) FROM cohort c
                 WHERE COALESCE(c.event_day, c.censor_day) >= days.d)
                AS BIGINT) AS n_at_risk,
           CAST((SELECT COUNT(*) FROM cohort c WHERE c.event_day = days.d)
                AS BIGINT) AS n_converted,
           CAST((SELECT COUNT(*) FROM cohort c
                 WHERE c.event_day IS NULL AND c.censor_day = days.d)
                AS BIGINT) AS n_censored
    FROM days
    ORDER BY day
    """,
    doc="conversion life table (the Kaplan-Meier estimator's input): "
    "per day-since-first-view, how many users were still AT RISK "
    "(neither converted nor censored before that day), how many "
    "converted that day (first purchase), and how many were censored "
    "(last seen, no purchase) — the survival-analysis shape behind "
    "time-to-conversion and retention-hazard curves, with censoring "
    "handled correctly where a naive conversion-rate-by-day silently "
    "drops users still under observation. All quantities are integer "
    "counts on integer day offsets (date_diff both engines); the KM "
    "product over (1 - d_i/n_i) is left to the consumer, as the "
    "estimator is a trivial fold of this table. Scale shape: ONE "
    "user-keyed agg builds the per-user (event_day, censor_day) "
    "cohort; at-risk counts come from one day-keyed agg + a running "
    "window over the tiny day table (the oracle states them as "
    "correlated subqueries for clarity — same integers).",
)
def q193_conversion_lifetable(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    u = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "first_view"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("first_purchase"),
            F.max("ts").alias("last_seen"),
        )
        .filter(F.col("first_view").isNotNull())
    )
    cohort = u.select(
        F.when(
            F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") >= F.col("first_view")),
            F.datediff(F.col("first_purchase"), F.col("first_view")),
        )
        .cast("bigint")
        .alias("event_day"),
        F.datediff(F.col("last_seen"), F.col("first_view"))
        .cast("bigint")
        .alias("censor_day"),
    ).select(
        "event_day",
        "censor_day",
        F.coalesce(F.col("event_day"), F.col("censor_day")).alias("out_day"),
    )
    per_day = cohort.groupBy(F.col("out_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_out"),
        F.sum(
            (F.col("event_day") == F.col("out_day")).cast("bigint")
        ).alias("n_conv"),
        F.sum(
            (
                F.col("event_day").isNull()
                & (F.col("censor_day") == F.col("out_day"))
            ).cast("bigint")
        ).alias("n_cens"),
    )
    # at-risk on day d = users leaving on ANY day >= d: a reversed
    # running sum over the tiny day table
    w = Window.orderBy(F.desc("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_day.withColumn("n_at_risk", F.sum("n_out").over(w))
        .select(
            "day",
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            F.coalesce(F.col("n_conv"), F.lit(0))
            .cast("bigint")
            .alias("n_converted"),
            F.coalesce(F.col("n_cens"), F.lit(0))
            .cast("bigint")
            .alias("n_censored"),
        )
        .orderBy("day")
    )


@register(
    "q198_interval_coverage",
    """
    WITH t AS (
      SELECT user_id, event_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    m AS (
      SELECT user_id, event_id, s, s + 1800 AS e,
             MAX(s + 1800) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM t
    ),
    f AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN prev_end IS NULL OR s > prev_end THEN 1 ELSE 0 END
               AS new_island
      FROM m
    ),
    i AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM f
    ),
    g AS (
      SELECT user_id, island, MIN(s) AS ist, MAX(e) AS ien
      FROM i GROUP BY user_id, island
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(ien - ist) AS BIGINT) AS covered_secs
    FROM g GROUP BY user_id
    """,
    doc="interval union / range consolidation — merge each user's "
    "[ts, ts+30min) activity intervals into maximal covered spans and "
    "report span count + total covered seconds (the 'actual listening "
    "time' metric naive SUM(duration) double-counts whenever intervals "
    "overlap; also the coverage step of SLA/uptime math). Gaps-and-"
    "islands with a RUNNING-MAX twist q110's day-grid runs don't need: "
    "an interval starts a new island only if its start exceeds the MAX "
    "end of ALL predecessors (a long interval can swallow several "
    "short ones — LAG alone gets that wrong), so the island flag rides "
    "MAX(e) OVER (... ROWS 1 PRECEDING) and islands accumulate by "
    "running SUM. ROWS frames are tie-sensitive, so both engines order "
    "by (s, event_id) — bit-deterministic under the dense same-"
    "microsecond ties the round-6 fuzz corpora stress. Epoch seconds "
    "use the year-1-shift floor-div convention (_SECS) so pre-epoch "
    "timestamps bucket identically. Shape: ONE exchange on user_id "
    "feeds every window plus the island agg (same-key reuse); the "
    "output is one row per user.",
)
def q198_interval_coverage(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # monolithic (segment_s=None) — the registered/oracle-paired shape;
    # segment_s is the documented skew lever for degenerate users
    return interval_coverage(e)


def interval_coverage(e, segment_s: int | None = None):
    """Interval-union kernel (q198's registration docstring has the
    semantics). ``segment_s`` is the entity-window skew lever
    (segmented_carry has the general argument); the gaps-and-islands
    fold's carry state is THREE scalars — the running max end plus the
    accumulated (island count, covered seconds) — exactly the state its
    streaming twin (stateful_interval_coverage) keeps per user.
    Segmented: islands are computed intra-chunk in (user, seg) windows;
    the per-chunk summary is (first start fs, max end me, island count
    ni, covered ci); the carry is the running max of me over preceding
    chunks. ONLY the chunk's FIRST island can merge with the carry:
    every previous event's s is below the chunk boundary, so
    carry < fs + 1800 <= the first island's running-max end, which
    every later island's start must exceed. A merge (fs <= carry)
    removes one island and double-counts exactly (carry - fs) covered
    seconds (the previous piece already covered up to carry, and
    carry < fs + 1800 <= the first island's end, so the first island
    always extends past it), so the per-chunk corrections sum to the
    monolithic answer exactly — multi-chunk islands telescope through
    consecutive merges. Hash-identical to the monolithic window."""
    t = e.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id", "event_id", F.expr(_SECS.format(c="ts")).alias("s")
    )

    def islands(t, seg_keys):
        """The gaps-and-islands pass over whatever keying it's given —
        (user) monolithic, (user, seg) intra-chunk."""
        w_prev = (
            Window.partitionBy(*seg_keys)
            .orderBy("s", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        m = t.select(
            *seg_keys, "event_id", "s", (F.col("s") + 1800).alias("e"),
            F.max(F.col("s") + 1800).over(w_prev).alias("prev_end"),
        )
        f = m.select(
            *seg_keys, "event_id", "s", "e",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("s") > F.col("prev_end")),
                1,
            )
            .otherwise(0)
            .alias("new_island"),
        )
        # every window rides ONE (s, event_id) order — ROWS frames are
        # tie-sensitive, and the island flag's meaning is bound to the
        # same order that computed prev_end
        w_run = (
            Window.partitionBy(*seg_keys)
            .orderBy("s", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        i = f.select(
            *seg_keys, "s", "e",
            F.sum("new_island").over(w_run).alias("island"),
        )
        return i.groupBy(*seg_keys, "island").agg(
            F.min("s").alias("ist"), F.max("e").alias("ien")
        )

    if segment_s is None:
        return islands(t, ["user_id"]).groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum(F.col("ien") - F.col("ist"))
            .cast("bigint")
            .alias("covered_secs"),
        )

    def chunk_summary(chunked):
        return (
            islands(chunked, ["user_id", "seg"])
            .groupBy("user_id", "seg")
            .agg(
                F.min("ist").alias("fs"),
                F.max("ien").alias("me"),
                F.count(F.lit(1)).alias("ni"),
                F.sum(F.col("ien") - F.col("ist")).alias("ci"),
            )
        )

    _, fold = segmented_carry(
        t, ["user_id"], "s", segment_s, chunk_summary,
        {"carry": lambda sw: F.max("me").over(sw)},
    )
    merged = F.col("carry").isNotNull() & (F.col("fs") <= F.col("carry"))
    adj = fold.select(
        "user_id",
        (F.col("ni") - merged.cast("long")).alias("ni_adj"),
        (
            F.col("ci")
            - F.when(merged, F.col("carry") - F.col("fs")).otherwise(0)
        ).alias("ci_adj"),
    )
    return adj.groupBy("user_id").agg(
        F.sum("ni_adj").cast("bigint").alias("n_intervals"),
        F.sum("ci_adj").cast("bigint").alias("covered_secs"),
    )


def last_touch_attribution(
    e,
    lookback_s: int = 604800,
    segment_s: int | None = None,
):
    """Last-touch attribution kernel (q199's registration docstring has
    the semantics). ``segment_s`` is the entity-window SKEW lever the
    round-6 rehearsal priced but left as prose: the monolithic path
    runs ONE window partitioned by user_id — correct, but a degenerate
    user owning 20% of a 100 TB stream makes that user's ordered sort a
    single 20 TB task, and no join hint fixes ordered-window semantics.
    The last-touch recurrence is ASSOCIATIVE (the streaming twin's
    two-scalar state proves the fold), so it SEGMENTS: with
    ``segment_s`` set, events split into per-(user, s div segment_s)
    time chunks; each chunk computes its intra-chunk running last touch
    in a window partitioned by BOTH keys (task width bounded by the
    chunk's event count, not the user's), a per-(user, chunk) summary
    — max (s, event_id, type) struct over the chunk's touches, one
    map-side-combinable agg — feeds a carry fold over the tiny
    (user, chunk) table (rows per user = #chunks), and each event's
    effective last touch is COALESCE(intra-chunk, carry-in). Chunking
    is by the same ``s`` the window orders by, so every carry-in is
    strictly older than every in-chunk event and the (s, event_id) tie
    rule is preserved exactly — the two paths are hash-identical
    (tests/test_behavior.py proves it on sf0.01 and the 20%-hot skew
    twin run is recorded in BASELINE.md round 7)."""
    t = e.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id", "event_id", "event_type", "value",
        F.expr(_SECS.format(c="ts")).alias("s"),
    )
    np_ = ~F.col("event_type").isin("purchase", "refund")
    if segment_s is None:
        uw = (
            Window.partitionBy("user_id")
            .orderBy("s", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w = t.select(
            "event_type", "value", "s",
            F.last(F.when(np_, F.col("event_type")), ignorenulls=True)
            .over(uw)
            .alias("lt_type"),
            F.last(F.when(np_, F.col("s")), ignorenulls=True)
            .over(uw)
            .alias("lt_s"),
        )
    else:
        t, carry = segmented_carry(
            t,
            ["user_id"],
            "s",
            segment_s,
            lambda c: c.groupBy("user_id", "seg").agg(
                F.max(
                    F.when(np_, F.struct("s", "event_id", "event_type"))
                ).alias("seg_touch")
            ),
            {
                "carry": lambda sw: F.last(
                    "seg_touch", ignorenulls=True
                ).over(sw)
            },
        )
        carry = carry.select("user_id", "seg", "carry")
        cw = (
            Window.partitionBy("user_id", "seg")
            .orderBy("s", "event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w = (
            t.join(carry, ["user_id", "seg"])
            .select(
                "event_type", "value", "s",
                F.coalesce(
                    F.last(
                        F.when(np_, F.col("event_type")), ignorenulls=True
                    ).over(cw),
                    F.col("carry.event_type"),
                ).alias("lt_type"),
                F.coalesce(
                    F.last(F.when(np_, F.col("s")), ignorenulls=True).over(
                        cw
                    ),
                    F.col("carry.s"),
                ).alias("lt_s"),
            )
        )
    return (
        w.filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.col("lt_s").isNotNull()
                    & (F.col("s") - F.col("lt_s") <= lookback_s),
                    F.col("lt_type"),
                ),
                F.lit("direct"),
            ).alias("channel"),
            F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


@register(
    "q199_attribution_last_touch",
    """
    WITH t AS (
      SELECT user_id, event_id, event_type, value,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    w AS (
      SELECT user_id, event_id, event_type, value, s,
             LAST_VALUE(CASE WHEN event_type NOT IN ('purchase', 'refund')
                             THEN event_type END IGNORE NULLS) OVER uw
               AS lt_type,
             LAST_VALUE(CASE WHEN event_type NOT IN ('purchase', 'refund')
                             THEN s END IGNORE NULLS) OVER uw AS lt_s
      FROM t
      WINDOW uw AS (PARTITION BY user_id ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT COALESCE(CASE WHEN lt_s IS NOT NULL AND s - lt_s <= 604800
                         THEN lt_type END, 'direct') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM w
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="last-touch revenue attribution — credit each purchase to the "
    "most recent preceding NON-purchase touchpoint within a 7-day "
    "lookback, else 'direct' (the marketing-analytics op funnels don't "
    "answer: WHICH interaction gets the conversion). One user-keyed "
    "window pass: LAST_VALUE ... IGNORE NULLS over ROWS UNBOUNDED "
    "PRECEDING TO 1 PRECEDING picks the latest prior touch (type and "
    "epoch-second ride the same frame, ordered (s, event_id) — the "
    "round-6 tie discipline, so same-microsecond touch/purchase ties "
    "resolve identically on both engines); the 7-day lookback is a "
    "plain integer comparison after the window, never a range join. "
    "Refunds are excluded as touchpoints AND as conversions. Revenue "
    "integerizes to cents per row (FLOOR(value*100)) before the exact "
    "int64 sum. Shape: one user_id exchange, one sort, map-side "
    "combinable channel agg — no self-join, no per-purchase scan-back.",
)
def q199_attribution_last_touch(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    # monolithic window (segment_s=None) — the registered/oracle-paired
    # shape; segment_s is the documented skew lever for degenerate users
    return last_touch_attribution(e)


@register(
    "q201_apriori_triples",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
    ),
    ms AS (
      SELECT GREATEST(2, COUNT(DISTINCT ok) // 7500) AS min_sup FROM items
    ),
    fp AS (
      SELECT a.item AS pa, b.item AS pb, COUNT(*) AS sup
      FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
      GROUP BY 1, 2
      HAVING COUNT(*) >= (SELECT min_sup FROM ms)
    ),
    cand AS (
      SELECT f.pa, f.pb, c.item AS pc, c.ok
      FROM fp f
      JOIN items a2 ON a2.item = f.pa
      JOIN items b2 ON b2.item = f.pb AND b2.ok = a2.ok
      JOIN items c  ON c.ok = a2.ok AND c.item > f.pb
    ),
    pruned AS (
      SELECT cand.pa, cand.pb, cand.pc, cand.ok FROM cand
      JOIN fp f2 ON f2.pa = cand.pa AND f2.pb = cand.pc
      JOIN fp f3 ON f3.pa = cand.pb AND f3.pb = cand.pc
    )
    SELECT pa, pb, pc, CAST(COUNT(*) AS BIGINT) AS support
    FROM pruned
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= (SELECT min_sup FROM ms)
    ORDER BY support DESC, pa, pb, pc
    LIMIT 20
    """,
    doc="frequent 3-itemsets by the A-PRIORI candidate prune (Agrawal & "
    "Srikant, VLDB 1994) — the step after q192's pair rules that naive "
    "per-order C(B,3) triple explosion cannot survive (the round-6 "
    "skew rehearsal's 480-part basket alone holds 18M triples): a "
    "triple is counted ONLY if all three of its sub-pairs are already "
    "frequent, so candidates join the (min-support-pruned, "
    "broadcast-sized) frequent-pair list three times instead of "
    "exploding baskets. Downward closure makes this lossless — every "
    "frequent triple's sub-pairs are frequent by definition. Shape: "
    "one distinct over (order, item), pair agg with map-side combine, "
    "then equi joins keyed on items; the hot basket inflates only the "
    "pair counts it genuinely contains. Minimum support is RELATIVE — "
    "greatest(2, n_transactions div 7500), an in-plan broadcast scalar "
    "— because a fixed absolute threshold makes denser corpora grow "
    "quadratically longer frequent-pair lists (the 10x rehearsal read "
    "x14.7 wall before this; x0.9 after). Top-20 by (support desc, "
    "lexicographic items) via TakeOrderedAndProject.",
)
def q201_apriori_triples(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    # ONE basket exchange feeds the whole query: collect_set folds the
    # per-order distinct into the groupBy (map-side partial agg), and
    # every later stage — the transaction count, the frequent-pair
    # support agg, and the candidate-triple expansion — derives from
    # this cached table with no further shuffle of the fact stream.
    # The old shape paid a distinct exchange + a self-join (2 more
    # exchanges + sorts) for fp and then THREE shuffling joins of the
    # items stream on ok for the candidates.
    baskets = scoped_persist(
        l.groupBy(F.col("l_orderkey").alias("ok")).agg(
            F.collect_set(F.col("l_partkey")).alias("ps")
        ),
        eager=True,
    )
    # RELATIVE minimum support (floor 2): an absolute threshold turns
    # denser corpora into quadratically longer frequent-pair lists (the
    # 10x rehearsal read x14.7 with a fixed 2) — support as a fraction
    # of the transaction count is how A-priori is actually run, and it
    # keeps the prune list broadcast-sized at every scale. In-plan
    # scalar (broadcast 1-row cross join), no driver action. One basket
    # row per distinct ok, so count(1) here IS count(DISTINCT ok).
    ms = baskets.agg(
        F.greatest(F.lit(2), F.expr("count(1) div 7500")).alias("min_sup")
    )
    # per-basket a<b pairs via the posting-list double-explode
    bpairs = (
        baskets.select("ok", "ps", F.explode("ps").alias("pa"))
        .select("ok", "ps", "pa", F.explode("ps").alias("pb"))
        .filter(F.col("pa") < F.col("pb"))
    )
    fp = (
        bpairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("sup"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("sup") >= F.col("min_sup"))
        .select("pa", "pb")
        # fp feeds FOUR consumers (the candidate join + the f2/f3
        # prunes + its own broadcast variants): without the persist the
        # whole pair-support agg re-executes per consumer and the
        # driver builds each broadcast from scratch — under the 2 GiB
        # memory-pressure rehearsal that stacked enough concurrent
        # broadcast builds to OOM the driver; cached, fp is computed
        # once and is support-bounded by construction. Scoped: the
        # harness unpersists after the final action.
    )
    fp = scoped_persist(fp)
    # candidate triples: each basket's a<b pairs that are frequent
    # (broadcast hash join on (pa,pb) — fp is support-bounded) extend
    # by every third basket item c > pb. Items are distinct per basket,
    # so this emits exactly the rows the old items⋈items⋈items chain
    # did, with zero additional exchanges.
    cand = (
        bpairs.join(F.broadcast(fp), ["pa", "pb"])
        .select("pa", "pb", F.explode("ps").alias("pc"), "ok")
        .filter(F.col("pc") > F.col("pb"))
    )
    f2 = fp.select(F.col("pa").alias("_f2a"), F.col("pb").alias("_f2b"))
    f3 = fp.select(F.col("pa").alias("_f3a"), F.col("pb").alias("_f3b"))
    pruned = cand.join(
        f2, (F.col("_f2a") == F.col("pa")) & (F.col("_f2b") == F.col("pc"))
    ).join(
        f3, (F.col("_f3a") == F.col("pb")) & (F.col("_f3b") == F.col("pc"))
    )
    return (
        pruned.groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .crossJoin(F.broadcast(ms))
        .filter(F.col("support") >= F.col("min_sup"))
        .orderBy(F.desc("support"), "pa", "pb", "pc")
        .limit(20)
        .select("pa", "pb", "pc", "support")
    )


@register(
    "q202_attribution_position_based",
    """
    WITH t AS (
      SELECT user_id, event_id, event_type, value,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    p AS (
      SELECT user_id, event_id AS pid, s AS sp,
             CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT) AS cents
      FROM t WHERE event_type = 'purchase'
    ),
    tc AS (
      SELECT user_id, event_id AS tid, s AS st, event_type AS channel
      FROM t WHERE event_type NOT IN ('purchase', 'refund')
    ),
    j AS (
      SELECT p.pid, p.cents, tc.channel, tc.st, tc.tid
      FROM p JOIN tc
        ON p.user_id = tc.user_id
       AND tc.st >= p.sp - 604800
       AND (tc.st < p.sp OR (tc.st = p.sp AND tc.tid < p.pid))
    ),
    r AS (
      SELECT pid, cents, channel,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY st, tid) AS rn,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM j
    ),
    cr AS (
      SELECT channel, cents,
             CASE WHEN n = 1 THEN 10000
                  WHEN n = 2 THEN 5000
                  WHEN rn = 1 OR rn = n THEN 4000
                  ELSE 2000 // (n - 2)
                       + CASE WHEN rn - 1 <= 2000 % (n - 2)
                              THEN 1 ELSE 0 END
             END AS share_bp
      FROM r
    ),
    direct AS (
      SELECT 'direct' AS channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
             CAST(COALESCE(SUM(cents * 10000), 0) AS BIGINT)
               AS credit_cents_bp
      FROM p WHERE pid NOT IN (SELECT pid FROM j)
    )
    SELECT channel, n_credits, credit_cents_bp FROM (
      SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_credits,
             CAST(SUM(cents * share_bp) AS BIGINT) AS credit_cents_bp
      FROM cr GROUP BY channel
      UNION ALL
      SELECT * FROM direct WHERE n_credits > 0
    )
    """,
    doc="position-based (U-shaped) multi-touch attribution — the 40/20/"
    "40 model marketing stacks run beside q199's last-touch: each "
    "purchase's credit splits 40% to the FIRST touch in the 7-day "
    "lookback, 40% to the LAST, 20% across the middles — realized as "
    "EXACT integer basis points whose per-purchase sum is 10000 by "
    "largest-remainder on the middle pool (earliest middles take the "
    "remainder; n=1 takes all, n=2 splits 50/50), so channel credits "
    "reconcile to revenue exactly. Touch-purchase matching is the "
    "STRICT (s, event_id) order (same-second earlier-id touches count "
    "— q199's tie rule). Scale shape: the touch×purchase pairing is "
    "the q114 temporal-banding trick — both sides explode into "
    "lookback-width time buckets and join EQUI on (user, bucket), so "
    "candidates are bucket-colocated rows, never per-user n² — and "
    "the ORACLE runs the naive non-equi join, proving the banding "
    "loses nothing. Purchases with no touch in range credit 'direct'.",
)
def q202_attribution_position_based(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    W = 604800
    t = e.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id", "event_id", "event_type", "value",
        F.expr(_SECS.format(c="ts")).alias("s"),
    )
    p = t.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.col("s").alias("sp"),
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    tc = t.filter(~F.col("event_type").isin("purchase", "refund")).select(
        "user_id",
        F.col("event_id").alias("tid"),
        F.col("s").alias("st"),
        F.col("event_type").alias("channel"),
    )
    # temporal banding (the q114 trick): a purchase's lookback window
    # [sp-W, sp] spans <= 2 W-wide buckets; a touch lives in exactly 1.
    # The join is EQUI on (user, bucket) + the exact predicate inside
    # the co-partition — never a per-user cartesian.
    pb = p.withColumn(
        "wk", F.explode(F.sequence(F.expr(f"(sp - {W}) div {W}"), F.expr(f"sp div {W}")))
    )
    tb = tc.withColumn("wk", F.expr(f"st div {W}"))
    j = pb.join(tb, ["user_id", "wk"]).filter(
        (F.col("st") >= F.col("sp") - W)
        & (
            (F.col("st") < F.col("sp"))
            | ((F.col("st") == F.col("sp")) & (F.col("tid") < F.col("pid")))
        )
    ).select("pid", "cents", "channel", "st", "tid")
    wr = Window.partitionBy("pid").orderBy("st", "tid")
    wp = Window.partitionBy("pid")
    r = j.select(
        "pid", "cents", "channel",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    share = F.expr(
        "CASE WHEN n = 1 THEN 10000 WHEN n = 2 THEN 5000"
        " WHEN rn = 1 OR rn = n THEN 4000"
        " ELSE 2000 div (n - 2)"
        "      + CASE WHEN rn - 1 <= 2000 % (n - 2) THEN 1 ELSE 0 END END"
    )
    credited = (
        r.select("channel", "cents", share.alias("share_bp"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.sum(F.col("cents") * F.col("share_bp"))
            .cast("bigint")
            .alias("credit_cents_bp"),
        )
    )
    direct = (
        p.join(j.select("pid").distinct(), "pid", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.coalesce(F.sum(F.col("cents") * 10000), F.lit(0))
            .cast("bigint")
            .alias("credit_cents_bp"),
        )
        .select(F.lit("direct").alias("channel"), "n_credits", "credit_cents_bp")
        .filter(F.col("n_credits") > 0)
    )
    return credited.unionByName(direct)


@register(
    "q213_lag_autocorr",
    """
    WITH b AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT t.event_type, s.hour,
             CAST(COALESCE(a.n_events, 0) AS BIGINT) AS x
      FROM spine s
      CROSS JOIN types t
      LEFT JOIN agg a ON a.hour = s.hour AND a.event_type = t.event_type
    ),
    lagged AS (
      SELECT event_type, x,
             LAG(x, 1) OVER (PARTITION BY event_type ORDER BY hour) AS y1,
             LAG(x, 24) OVER (PARTITION BY event_type ORDER BY hour) AS y24
      FROM series
    ),
    mo AS (
      SELECT event_type,
             CAST(COUNT(y1) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN y1 IS NOT NULL THEN x END) AS BIGINT) AS sx1,
             CAST(SUM(y1) AS BIGINT) AS sy1,
             CAST(SUM(x * y1) AS BIGINT) AS sxy1,
             CAST(SUM(CASE WHEN y1 IS NOT NULL THEN x * x END) AS BIGINT)
               AS sxx1,
             CAST(SUM(y1 * y1) AS BIGINT) AS syy1,
             CAST(COUNT(y24) AS BIGINT) AS n24,
             CAST(SUM(CASE WHEN y24 IS NOT NULL THEN x END) AS BIGINT) AS sx24,
             CAST(SUM(y24) AS BIGINT) AS sy24,
             CAST(SUM(x * y24) AS BIGINT) AS sxy24,
             CAST(SUM(CASE WHEN y24 IS NOT NULL THEN x * x END) AS BIGINT)
               AS sxx24,
             CAST(SUM(y24 * y24) AS BIGINT) AS syy24
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, n1 AS n_pairs_lag1, n24 AS n_pairs_lag24,
           CASE WHEN n1 * sxx1 - sx1 * sx1 > 0 AND n1 * syy1 - sy1 * sy1 > 0
                THEN ROUND(CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE)
                     / (SQRT(CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE))
                        * SQRT(CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE))), 6)
           END AS autocorr_lag1,
           CASE WHEN n24 * sxx24 - sx24 * sx24 > 0
                     AND n24 * syy24 - sy24 * sy24 > 0
                THEN ROUND(CAST(n24 * sxy24 - sx24 * sy24 AS DOUBLE)
                     / (SQRT(CAST(n24 * sxx24 - sx24 * sx24 AS DOUBLE))
                        * SQRT(CAST(n24 * syy24 - sy24 * sy24 AS DOUBLE))), 6)
           END AS autocorr_lag24
    FROM mo
    """,
    doc="lag-1 and lag-24 autocorrelation of the hourly event-count "
    "series per event type — the seasonality/burstiness diagnostic "
    "behind traffic forecasting and anomaly baselining (high lag-24 = "
    "strong daily cycle; lag-1 = short-range burst persistence). The "
    "series is densified on the q57 gap-fill spine first (zero-count "
    "hours are REAL observations — computing autocorrelation on only "
    "observed hours silently compares non-adjacent hours). Pearson r "
    "from EXACT integer moments (n, Sx, Sy, Sxy, Sxx, Syy as bigints "
    "— counts are integers, so every product and sum is exact on both "
    "engines regardless of accumulation order; DuckDB's HUGEINT sums "
    "are cast back to BIGINT to pin the type), one IEEE division + "
    "correctly-rounded sqrts at the very end, rounded at 6 per the "
    "registry rule; constant series yield NULL on both engines. "
    "Shape: one map-side hourly agg of the corpus, a #hours x #types "
    "spine join, lag windows and moments on the tiny dense table; at "
    "100 TB only the hourly agg touches the data.",
)
def q213_lag_autocorr(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = b.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    series = (
        spine.crossJoin(types)
        .join(agg, ["hour", "event_type"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("x"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = series.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("y1"),
        F.lag("x", 24).over(w).alias("y24"),
    )

    def _moments(y: str, suf: str):
        yc = F.col(y)
        x = F.col("x")
        return [
            F.count(yc).cast("bigint").alias(f"n{suf}"),
            F.sum(F.when(yc.isNotNull(), x)).cast("bigint").alias(f"sx{suf}"),
            F.sum(yc).cast("bigint").alias(f"sy{suf}"),
            F.sum(x * yc).cast("bigint").alias(f"sxy{suf}"),
            F.sum(F.when(yc.isNotNull(), x * x))
            .cast("bigint")
            .alias(f"sxx{suf}"),
            F.sum(yc * yc).cast("bigint").alias(f"syy{suf}"),
        ]

    mo = lagged.groupBy("event_type").agg(
        *(_moments("y1", "1") + _moments("y24", "24"))
    )

    def _corr(suf: str):
        n, sx, sy, sxy, sxx, syy = (
            F.col(f"{c}{suf}") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
        )
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        return F.when(
            (vx > 0) & (vy > 0),
            F.round(
                (n * sxy - sx * sy).cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                6,
            ),
        )

    return mo.select(
        "event_type",
        F.col("n1").alias("n_pairs_lag1"),
        F.col("n24").alias("n_pairs_lag24"),
        _corr("1").alias("autocorr_lag1"),
        _corr("24").alias("autocorr_lag24"),
    )


@register(
    "q217_theil_sen_trend",
    """
    WITH b AS (
      SELECT GREATEST(date_trunc('day', MIN(CAST(ts AS TIMESTAMP))),
                      date_trunc('day', MAX(CAST(ts AS TIMESTAMP)))
                        - INTERVAL 89 DAY) AS d0,
             date_trunc('day', MAX(CAST(ts AS TIMESTAMP))) AS d1
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT t.event_type,
             CAST(date_diff('day', b.d0, s.day) AS BIGINT) AS x,
             CAST(COALESCE(a.n_events, 0) AS BIGINT) AS y
      FROM spine s CROSS JOIN types t CROSS JOIN b
      LEFT JOIN agg a ON a.day = s.day AND a.event_type = t.event_type
    ),
    pairs AS (
      SELECT i.event_type,
             CAST(j.y - i.y AS DOUBLE) / CAST(j.x - i.x AS DOUBLE) AS slope,
             i.x AS xi, j.x AS xj
      FROM series i JOIN series j
        ON i.event_type = j.event_type AND i.x < j.x
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY slope, xi, xj) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS np
      FROM pairs
    ),
    ts AS (
      SELECT event_type, slope AS ts_slope, np
      FROM ranked WHERE rn = (np + 1) // 2
    ),
    mo AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM series GROUP BY event_type
    )
    SELECT m.event_type,
           m.n AS n_days,
           CAST(t.np AS BIGINT) AS n_pairs,
           t.ts_slope,
           CASE WHEN m.n * m.sxx - m.sx * m.sx > 0
                THEN ROUND(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                     / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE), 6)
           END AS ols_slope
    FROM mo m LEFT JOIN ts t ON t.event_type = m.event_type
    """,
    doc="Theil-Sen robust trend per event type (Sen 1968; the "
    "outlier-resistant daily-traffic trend detector — one incident "
    "spike drags an OLS slope arbitrarily, but barely moves the MEDIAN "
    "of pairwise slopes, which tolerates ~29% corruption): daily "
    "counts on the gap-fill day spine, every (i<j) day-pair's slope "
    "(yj-yi)/(xj-xi), lower-middle median by the house q128/q180 "
    "order-statistic rule (ties pinned by (slope, xi, xj)); OLS slope "
    "rides along from exact bigint moments for comparison. Each "
    "pairwise slope is ONE IEEE division of exact integers — "
    "bit-identical cross-engine, so the median needs no rounding. "
    "Scale shape: the corpus feels one map-side daily agg; the O(n^2) "
    "pair join runs on the #days x #types table (bounded by the "
    "calendar, never the corpus — 3 years = 1095 days = 599k pairs "
    "per type, still dwarfed by one corpus scan); single-day series "
    "emit NULL ts_slope on both engines via the left join. The "
    "series is the TRAILING 90 days ending at the corpus max day — the "
    "pair join is quadratic in SPINE length, and an unbounded calendar "
    "is an unbounded quadratic: the differential suite's far-future "
    "corpus (one stray year-2286 row -> a 115k-day spine -> 3e10 "
    "pairs) hung a 32-core box before the clamp; a trend over a "
    "window is also the statistically honest object (a 20-year slope "
    "is not a trend signal anyone acts on). Counts before the window "
    "simply fall out of the series on both engines.",
)
def q217_theil_sen_trend(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    b = ev.agg(
        F.greatest(
            F.date_trunc("day", F.min("ts")),
            F.date_trunc("day", F.max("ts")) - F.expr("INTERVAL 89 DAY"),
        ).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = b.select(
        "d0",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    series = (
        spine.crossJoin(types)
        .join(agg, ["day", "event_type"], "left")
        .select(
            "event_type",
            F.datediff(F.col("day"), F.col("d0")).cast("bigint").alias("x"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("y"),
        )
    )
    series = scoped_persist(series)
    i, j = series.alias("i"), series.alias("j")
    pairs = i.join(
        j,
        (F.col("i.event_type") == F.col("j.event_type"))
        & (F.col("i.x") < F.col("j.x")),
    ).select(
        F.col("i.event_type").alias("event_type"),
        (
            (F.col("j.y") - F.col("i.y")).cast("double")
            / (F.col("j.x") - F.col("i.x")).cast("double")
        ).alias("slope"),
        F.col("i.x").alias("xi"),
        F.col("j.x").alias("xj"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "xi", "xj")
    wp = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("np"),
    )
    ts = ranked.filter(F.col("rn") == F.expr("(np + 1) div 2")).select(
        "event_type", F.col("slope").alias("ts_slope"), "np"
    )
    mo = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mo.join(ts, "event_type", "left").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("np").cast("bigint").alias("n_pairs"),
        "ts_slope",
        F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6))
        .alias("ols_slope"),
    )


# Exact-integer exponential-decay table: round(2^(-k/7) * 1e6) for ages
# k = 0..89 days (7-day half-life, clamped at the 90-day floor weight) —
# one shared literal table on both engines, so recency weighting never
# evaluates libm pow/exp (the q227/q228 integerize-the-transcendental
# rule). Per-event weight <= 1e6 keeps per-type int64 sums exact to
# ~9.2e12 events; share numerators go through decimal(38,0)/HUGEINT
# (the q190 rule).
_DECAY_E6 = [1000000, 905724, 820335, 742997, 672950, 609507, 552045, 500000, 452862, 410168, 371499, 336475, 304753, 276022, 250000, 226431, 205084, 185749, 168238, 152377, 138011, 125000, 113215, 102542, 92875, 84119, 76188, 69006, 62500, 56608, 51271, 46437, 42059, 38094, 34503, 31250, 28304, 25635, 23219, 21030, 19047, 17251, 15625, 14152, 12818, 11609, 10515, 9524, 8626, 7812, 7076, 6409, 5805, 5257, 4762, 4313, 3906, 3538, 3204, 2902, 2629, 2381, 2156, 1953, 1769, 1602, 1451, 1314, 1190, 1078, 977, 884, 801, 726, 657, 595, 539, 488, 442, 401, 363, 329, 298, 270, 244, 221, 200, 181, 164, 149]


@register(
    "q230_recency_weighted_mix",
    f"""
    WITH anchor AS (
      SELECT MAX(date_trunc('day', ts)) AS d1 FROM events
      WHERE ts IS NOT NULL
    ),
    aged AS (
      SELECT event_type,
             {list(_DECAY_E6)}[
               LEAST(GREATEST(datediff('day', date_trunc('day', ts), d1),
                              0), 89) + 1] AS w
      FROM events, anchor WHERE ts IS NOT NULL
    ),
    agg AS (
      SELECT event_type,
             COUNT(*) AS n_events,
             SUM(w) AS decayed_e6
      FROM aged GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(CAST(n_events AS HUGEINT) * 10000
                // SUM(n_events) OVER () AS BIGINT) AS raw_share_bp,
           CAST(decayed_e6 AS BIGINT) AS decayed_e6,
           CAST(CAST(decayed_e6 AS HUGEINT) * 10000
                // SUM(decayed_e6) OVER () AS BIGINT) AS decayed_share_bp
    FROM agg
    """,
    doc="Recency-weighted source mixture — the freshness re-weighting a "
    "training-data refresh applies before sampling (news/code corpora "
    "decay fast; reference text doesn't): per event type, the raw count "
    "share vs the exponentially-decayed share (7-day half-life from the "
    "corpus max day, 90-day clamp — the q217 bounded-domain rule: decay "
    "is a function of a DATA-DERIVED age, so the table bounds it "
    "in-plan). The 2^(-k/7) weights are a 90-entry shared integer "
    "literal table (q227/q228 rule: libm pow never runs on either "
    "engine), making every sum exact int64; share numerators run in "
    "decimal(38,0)/HUGEINT. Shape: one scan, the 1-row anchor broadcast "
    "(Spark: crossJoin of an agg scalar), one map-side agg to #types "
    "rows; both OVER () windows are type-bounded.",
)
def q230_recency_weighted_mix(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    ev = ev.filter(F.col("ts").isNotNull())
    anchor = ev.agg(
        F.max(F.date_trunc("day", F.col("ts"))).alias("d1")
    )
    decay_arr = F.array(*[F.lit(v) for v in _DECAY_E6])
    aged = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.element_at(
            decay_arr,
            (
                F.least(
                    F.greatest(
                        F.datediff(
                            F.col("d1"), F.date_trunc("day", F.col("ts"))
                        ),
                        F.lit(0),
                    ),
                    F.lit(89),
                )
                + 1
            ).cast("int"),
        ).alias("w"),
    )
    agg = aged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("w").alias("decayed_e6"),
    )
    # type-bounded windows (#event_type rows), never the event log
    w_all = Window.partitionBy()
    return (
        agg.withColumn("_tn", F.sum("n_events").over(w_all))
        .withColumn("_td", F.sum("decayed_e6").over(w_all))
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr(
                "CAST(CAST(n_events AS DECIMAL(38,0)) * 10000"
                " div _tn AS BIGINT)"
            ).alias("raw_share_bp"),
            F.col("decayed_e6").cast("bigint").alias("decayed_e6"),
            F.expr(
                "CAST(CAST(decayed_e6 AS DECIMAL(38,0)) * 10000"
                " div _td AS BIGINT)"
            ).alias("decayed_share_bp"),
        )
    )


# Cumulative Poisson(1) thresholds scaled to 2^32 (k = 0..8) — the
# inverse-CDF table for deterministic Poisson bootstrap draws: a
# uniform 32-bit hash h maps to weight w = #{thresholds <= h}. One
# shared integer literal table on both engines (the q227/q228/q230
# integerize-the-transcendental rule), so the bootstrap is replayable
# and hash-exact everywhere. P(w > 8) < 1e-5 truncates to 8.
_POIS1_CDF_E32 = [
    1580030169, 3160060337, 3950075422, 4213413783, 4279248374,
    4292415292, 4294609778, 4294923276, 4294962463,
]

_N_BOOT = 20


@register(
    "q231_bootstrap_ci",
    f"""
    WITH per AS (
      SELECT c.c_custkey AS k, c.c_custkey % 2 AS arm,
             CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)),
                           0) AS BIGINT) AS spend_cents
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    drawn AS (
      SELECT arm, b.b,
             len(list_filter({list(_POIS1_CDF_E32)},
                 t -> t <= (((k % 2147483648 + b.b * 1000003) % 2147483648)
                            * 2654435761)
                          % 4294967296)) AS w,
             spend_cents
      FROM per, (SELECT unnest(range(1, {_N_BOOT} + 1)) AS b) b
    ),
    rep AS (
      SELECT b, arm, SUM(w) AS n_w,
             SUM(CAST(w AS HUGEINT) * spend_cents) AS spend_w
      FROM drawn GROUP BY b, arm
    ),
    diffs AS (
      SELECT a1.b,
             CAST(a1.spend_w // a1.n_w - a0.spend_w // a0.n_w AS BIGINT)
               AS diff_cents
      FROM rep a1 JOIN rep a0 ON a1.b = a0.b
      WHERE a1.arm = 1 AND a0.arm = 0 AND a1.n_w > 0 AND a0.n_w > 0
    ),
    point AS (
      SELECT CAST(
               (SELECT SUM(CAST(spend_cents AS HUGEINT)) FROM per
                WHERE arm = 1) // (SELECT COUNT(*) FROM per WHERE arm = 1)
             - (SELECT SUM(CAST(spend_cents AS HUGEINT)) FROM per
                WHERE arm = 0) // (SELECT COUNT(*) FROM per WHERE arm = 0)
             AS BIGINT) AS point_diff_cents
    ),
    ranked AS (
      SELECT diff_cents,
             ROW_NUMBER() OVER (ORDER BY diff_cents, b) AS rn,
             COUNT(*) OVER () AS nv
      FROM diffs
    )
    SELECT point.point_diff_cents,
           CAST(nv AS BIGINT) AS n_boot,
           CAST(MIN(CASE WHEN rn = GREATEST(1, nv * 5 // 100 + 1)
                         THEN diff_cents END) AS BIGINT) AS boot_lo_cents,
           CAST(MIN(CASE WHEN rn = nv - nv * 5 // 100
                         THEN diff_cents END) AS BIGINT) AS boot_hi_cents
    FROM ranked, point
    GROUP BY point.point_diff_cents, nv
    """,
    doc="Poisson-bootstrap confidence interval for the A/B arm "
    "difference (q117's missing uncertainty): each CUSTOMER (the "
    "cluster-bootstrap unit — resampling orders would fake independence "
    "within a user) contributes a deterministic Poisson(1) weight per "
    "replicate, drawn by comparing a Knuth hash of (custkey, replicate) "
    "against a shared integerized Poisson CDF table — the standard "
    "trick (Poisson bootstrap, Chamandy et al. 2012) that makes the "
    "bootstrap ONE pass with a constant-factor (B=20) explode instead "
    "of B shuffled resamples, and the integer table makes every draw "
    "replayable and hash-exact cross-engine (the key is reduced mod "
    "2^31 before the Knuth multiply, so the product fits int64 for ANY "
    "surrogate custkey — no silent Spark wrap vs DuckDB error past "
    "~3.4e9). Per replicate: weighted "
    "arm means in exact integer cents (HUGEINT/decimal(38,0) "
    "numerators); the 5th/95th-percentile band comes from rank "
    "formulas over the 20-row diff table. Replicates where an arm "
    "draws zero total weight drop on both engines (nv tracks the "
    "valid count). Shape: the per-customer stage shares q117's custkey "
    "shuffle; the explode multiplies the SMALL per-customer table, "
    "never the fact table; everything after is B x 2 rows.",
)
def q231_bootstrap_ci(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            F.col("c_custkey").alias("k"),
            (F.col("c_custkey") % 2).alias("arm"),
        )
        .agg(
            F.coalesce(
                F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")),
                F.lit(0),
            )
            .cast("bigint")
            .alias("spend_cents"),
        )
    )
    cdf = F.array(*[F.lit(v) for v in _POIS1_CDF_E32])
    drawn = per.select(
        "arm",
        F.explode(F.sequence(F.lit(1), F.lit(_N_BOOT))).alias("b"),
        "k",
        "spend_cents",
    ).select(
        "arm",
        "b",
        # reduce mod 2^31 BEFORE the Knuth multiply (the q112
        # convention): 2^31 * 2654435761 < 2^63, so the product never
        # wraps int64 for ANY surrogate key — the unreduced form wrapped
        # silently in Spark (vs a DuckDB overflow error) once custkey
        # passed ~3.4e9 (ADVICE r7; TPC-H at 100 TB has custkey ~1.5e10)
        F.size(
            F.filter(
                cdf,
                lambda t: t
                <= F.expr(
                    "(((k % 2147483648 + b * 1000003) % 2147483648)"
                    " * 2654435761) % 4294967296"
                ),
            )
        ).alias("w"),
        "spend_cents",
    )
    rep = drawn.groupBy("b", "arm").agg(
        F.sum("w").alias("n_w"),
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("spend_cents")).alias(
            "spend_w"
        ),
    )
    a1 = rep.filter((F.col("arm") == 1) & (F.col("n_w") > 0)).select(
        "b", F.expr("CAST(spend_w div n_w AS BIGINT)").alias("m1")
    )
    a0 = rep.filter((F.col("arm") == 0) & (F.col("n_w") > 0)).select(
        F.col("b").alias("b0"),
        F.expr("CAST(spend_w div n_w AS BIGINT)").alias("m0"),
    )
    diffs = a1.join(a0, a1["b"] == a0["b0"]).select(
        "b", (F.col("m1") - F.col("m0")).cast("bigint").alias("diff_cents")
    )
    point = per.groupBy("arm").agg(
        F.sum(F.col("spend_cents").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    p1 = point.filter(F.col("arm") == 1).select(
        F.expr("CAST(s div n AS BIGINT)").alias("pm1")
    )
    p0 = point.filter(F.col("arm") == 0).select(
        F.expr("CAST(s div n AS BIGINT)").alias("pm0")
    )
    pt = p1.crossJoin(p0).select(
        (F.col("pm1") - F.col("pm0")).cast("bigint").alias("point_diff_cents")
    )
    # rank window over the <= 20-row replicate table, never the facts
    ranked = (
        diffs.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.asc("diff_cents"), F.asc("b"))
            ),
        )
        .withColumn("nv", F.count(F.lit(1)).over(Window.partitionBy()))
    )
    band = ranked.groupBy("nv").agg(
        F.min(
            F.when(
                F.col("rn") == F.greatest(F.lit(1), F.expr("nv * 5 div 100 + 1")),
                F.col("diff_cents"),
            )
        )
        .cast("bigint")
        .alias("boot_lo_cents"),
        F.min(
            F.when(
                F.col("rn") == F.expr("nv - nv * 5 div 100"),
                F.col("diff_cents"),
            )
        )
        .cast("bigint")
        .alias("boot_hi_cents"),
    )
    return band.crossJoin(F.broadcast(pt)).select(
        "point_diff_cents",
        F.col("nv").cast("bigint").alias("n_boot"),
        "boot_lo_cents",
        "boot_hi_cents",
    )


@register(
    "q241_burstiness",
    """
    WITH t AS (
      SELECT user_id, event_type, event_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    gaps AS (
      SELECT event_type,
             s - LAG(s) OVER (PARTITION BY user_id, event_type
                              ORDER BY s, event_id) AS gap_s
      FROM t
    ),
    m AS (
      SELECT event_type, COUNT(gap_s) AS n_gaps,
             SUM(CAST(gap_s AS HUGEINT)) AS s1,
             SUM(CAST(gap_s AS HUGEINT) * gap_s) AS s2
      FROM gaps WHERE gap_s IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(s1 // n_gaps AS BIGINT) AS mean_gap_s,
           CASE WHEN n_gaps > 1 AND n_gaps * s2 - s1 * s1 > 0 THEN ROUND(
             (SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / n_gaps
              - CAST(s1 AS DOUBLE) / n_gaps)
             / (SQRT(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) / n_gaps
                + CAST(s1 AS DOUBLE) / n_gaps), 6)
           END AS burstiness_r6
    FROM m
    """,
    doc="Inter-arrival burstiness per event type (Goh & Barabasi 2008: "
    "B = (sigma - mu)/(sigma + mu) of the within-user inter-arrival "
    "gaps — B~-1 periodic/heartbeat, B~0 Poisson, B->1 bursty/human; "
    "the traffic-shape diagnostic behind capacity planning and bot "
    "detection): gaps from ONE LAG window per (user, type) ordered by "
    "the q198 epoch-second convention with event_id tie-breaks; gap "
    "moments exact in HUGEINT/decimal(38,0); sigma and mu divide out "
    "of the SAME exact integers, so B is a handful of IEEE ops on "
    "identical doubles (correctly-rounded sqrt — the q233 rule), "
    "rounded at 6. Types with <2 gaps or zero variance emit NULL on "
    "both engines. Shape: one user-keyed window exchange (the shuffle "
    "every per-user op shares), then a map-side moment agg to #types "
    "rows.",
)
def q241_burstiness(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_type",
        "event_id",
        F.expr(_SECS.format(c="ts")).alias("s"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "s", "event_id"
    )
    gaps = t.select(
        "event_type", (F.col("s") - F.lag("s").over(w)).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    g = F.col("gap_s").cast("decimal(38,0)")
    m = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(g).alias("s1"),
        F.sum(g * F.col("gap_s")).alias("s2"),
    )
    var_n2 = F.expr("n_gaps * s2 - s1 * s1")
    sd_n = F.sqrt(var_n2.cast("double")) / F.col("n_gaps")
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    return m.select(
        "event_type",
        "n_gaps",
        F.expr("CAST(s1 div n_gaps AS BIGINT)").alias("mean_gap_s"),
        F.when(
            (F.col("n_gaps") > 1) & (var_n2 > 0),
            F.round((sd_n - mu) / (sd_n + mu), 6),
        ).alias("burstiness_r6"),
    )


@register(
    "q242_churn_labels",
    """
    WITH t AS (
      SELECT user_id, event_id, event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    cut AS (SELECT MAX(s) - 14 * 86400 AS c FROM t),
    lab AS (
      SELECT user_id,
             COUNT(CASE WHEN s <= c THEN 1 END) AS n_before,
             COUNT(DISTINCT CASE WHEN s <= c THEN event_type END)
               AS n_types_before,
             MAX(CASE WHEN s <= c THEN s END) AS last_s,
             MAX(CASE WHEN s > c THEN 1 ELSE 0 END) AS label_active
      FROM t, cut GROUP BY user_id, c
      HAVING COUNT(CASE WHEN s <= c THEN 1 END) > 0
    )
    SELECT user_id,
           CAST(n_before AS BIGINT) AS n_before,
           CAST(n_types_before AS BIGINT) AS n_types_before,
           CAST((SELECT MAX(c) FROM cut, (SELECT 1)) - last_s AS BIGINT)
             AS recency_s,
           CAST(label_active AS BIGINT) AS label_active
    FROM lab
    """,
    doc="Churn-label generation — the supervised-dataset construction "
    "step for retention models, built the leakage-safe way: a single "
    "cutoff (corpus max minus 14 days), FEATURES strictly from events "
    "at-or-before the cutoff (activity count, type breadth, recency), "
    "LABEL strictly from after it (any activity in the holdout window "
    "= retained, else churned) — the temporal firewall whose absence "
    "is the classic silent leak in retention models. Users with no "
    "pre-cutoff history drop (nothing to predict from). Epoch seconds "
    "via the q198 year-1-shift floor convention so pre-epoch and "
    "sub-second corpora bucket identically. Shape: the 1-row cutoff "
    "broadcasts; features and label fold in ONE user-keyed agg over "
    "one scan — label generation costs the shuffle every per-user "
    "op already pays.",
)
def q242_churn_labels(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_type",
        F.expr(_SECS.format(c="ts")).alias("s"),
    )
    cut = t.agg((F.max("s") - 14 * 86400).alias("c"))
    lab = (
        t.crossJoin(F.broadcast(cut))
        .groupBy("user_id", "c")
        .agg(
            F.count(F.when(F.col("s") <= F.col("c"), 1)).alias("n_before"),
            F.count_distinct(
                F.when(F.col("s") <= F.col("c"), F.col("event_type"))
            ).alias("n_types_before"),
            F.max(F.when(F.col("s") <= F.col("c"), F.col("s"))).alias(
                "last_s"
            ),
            F.max(
                F.when(F.col("s") > F.col("c"), 1).otherwise(0)
            ).alias("label_active"),
        )
        .filter(F.col("n_before") > 0)
    )
    return lab.select(
        "user_id",
        F.col("n_before").cast("bigint").alias("n_before"),
        F.col("n_types_before").cast("bigint").alias("n_types_before"),
        (F.col("c") - F.col("last_s")).cast("bigint").alias("recency_s"),
        F.col("label_active").cast("bigint").alias("label_active"),
    )


@register(
    "q243_seasonality_profile",
    """
    WITH t AS (
      SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800) AS s
      FROM events WHERE ts IS NOT NULL
    ),
    cells AS (
      -- s2 = s + 105000 weeks: positive for any timestamp >= year 1 and
      -- week-aligned, so dow/hod are unchanged while // and div agree
      -- (trunc == floor on non-negative operands)
      SELECT ((s + 63504000000) // 86400 + 4) % 7 AS dow,
             ((s + 63504000000) % 86400) // 3600 AS hod,
             COUNT(*) AS n
      FROM t GROUP BY 1, 2
    )
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
           CAST(n AS BIGINT) AS n,
           CAST(CAST(n AS HUGEINT) * 1000000 // SUM(n) OVER () AS BIGINT)
             AS share_ppm,
           CAST(CAST(n AS HUGEINT) * 168 * 1000000 // SUM(n) OVER ()
                - 1000000 AS BIGINT) AS lift_vs_uniform_ppm
    FROM cells
    """,
    doc="Weekday x hour seasonality heatmap with uniformity lift — the "
    "traffic-calendar profile behind alert-threshold schedules and "
    "q122's anomaly baselines: per (day-of-week, hour-of-day) cell, "
    "count, corpus share ppm, and the lift vs a uniform 168-cell week "
    "(168*share - 1, in ppm — positive = hot cell). Day-of-week comes "
    "from PURE INTEGER epoch-day arithmetic — (days+4) mod 7, Sunday=0, "
    "1970-01-01 a Thursday — on seconds pre-shifted by a WEEK-ALIGNED "
    "positive constant (+105000 weeks) so truncating div and floor // "
    "agree even on pre-epoch corpora; engine calendar functions "
    "(dayofweek/dow) disagree on 0-vs-1-based and Sunday-vs-Monday "
    "conventions, so neither engine's is used. Epoch seconds via the q198 year-1-shift floor "
    "convention. Shape: one scan, map-side agg bounded at 168 cells, "
    "cell-bounded share windows.",
)
def q243_seasonality_profile(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(F.col("ts").isNotNull()).select(
        F.expr(_SECS.format(c="ts")).alias("s")
    )
    cells = t.groupBy(
        F.expr("((s + 63504000000) div 86400 + 4) % 7")
        .cast("bigint")
        .alias("dow"),
        F.expr("((s + 63504000000) % 86400) div 3600")
        .cast("bigint")
        .alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # windows over the <= 168 weekday x hour cells, never the events
    w = Window.partitionBy()
    return (
        cells.withColumn("_tot", F.sum("n").over(w))
        .select(
            "dow",
            "hod",
            F.col("n").cast("bigint").alias("n"),
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div _tot"
                " AS BIGINT)"
            ).alias("share_ppm"),
            F.expr(
                "CAST(CAST(n AS DECIMAL(38,0)) * 168 * 1000000 div _tot"
                " - 1000000 AS BIGINT)"
            ).alias("lift_vs_uniform_ppm"),
        )
    )


@register(
    "q244_duplicate_delivery",
    """
    WITH t AS (
      SELECT user_id, event_type, event_id, props,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    lagged AS (
      SELECT event_type,
             us - LAG(us) OVER (PARTITION BY user_id, event_type, props
                                ORDER BY us, event_id) AS gap_us
      FROM t
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 5000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 5000000
                         THEN 1 ELSE 0 END) * 10000 // COUNT(*)
                AS BIGINT) AS dup_bp
    FROM lagged GROUP BY event_type
    """,
    doc="Duplicate-delivery audit — the at-least-once-transport health "
    "check every event pipeline needs (retries and replays surface as "
    "same-payload events microseconds apart; a rising dup_bp is a "
    "producer or broker incident): an event is a duplicate when the "
    "SAME (user, type, props) payload occurred within the preceding 5 "
    "seconds — one LAG window per payload key ordered by (micros, "
    "event_id), so k repeated deliveries count exactly k-1 duplicates "
    "(chained gaps), the idempotent-consumer semantics. NULL props "
    "group together (null-safe partition key on both engines, the "
    "payload-absent case). Exact integer micros; per-type rates in "
    "basis points. Shape: one payload-keyed window exchange, then a "
    "map-side agg to #types rows.",
)
def q244_duplicate_delivery(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_type",
        "event_id",
        "props",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id", "event_type", "props").orderBy(
        "us", "event_id"
    )
    lagged = t.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    )
    dup = F.col("gap_us").isNotNull() & (F.col("gap_us") <= 5_000_000)
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(dup.cast("long")).cast("bigint").alias("n_dups"),
        F.expr(
            "CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 5000000"
            " THEN 1 ELSE 0 END) * 10000 div COUNT(*) AS BIGINT)"
        ).alias("dup_bp"),
    )


@register(
    "q246_peak_concurrency",
    """
    WITH t AS (
      SELECT user_id, event_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    marks AS (
      SELECT (s + 63504000000) // 86400 AS day, s AS t_s, 1 AS delta,
             event_id
      FROM t
      UNION ALL
      SELECT (s + 63504000000) // 86400 AS day,
             LEAST(s + 1800,
                   ((s + 63504000000) // 86400 + 1) * 86400
                     - 63504000000) AS t_s,
             -1 AS delta, event_id
      FROM t
    ),
    sweep AS (
      SELECT day,
             SUM(delta) OVER (PARTITION BY day
                              ORDER BY t_s, delta, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS load,
             t_s
      FROM marks
    )
    SELECT CAST(day - 63504000000 // 86400 AS BIGINT) AS epoch_day,
           CAST(MAX(load) AS BIGINT) AS peak_concurrent,
           CAST(MIN(CASE WHEN load_rank = 1 THEN t_s END) AS BIGINT)
             AS peak_at_s
    FROM (
      SELECT day, load, t_s,
             RANK() OVER (PARTITION BY day ORDER BY load DESC) AS load_rank
      FROM sweep
    )
    GROUP BY day
    """,
    doc="Daily peak concurrency — the capacity-planning number (max "
    "simultaneous active sessions, each event opening a 30-minute "
    "session): the classic sweep-line as SQL — +1 at each start, -1 at "
    "each end, running sum ordered by (time, delta, event_id) so an "
    "end at instant t closes BEFORE a start at t opens (half-open "
    "intervals; delta=-1 sorts first) — per-day partitions bound every "
    "sort to one day's events (the scale lever: a global sweep would "
    "be one total order over the corpus), with sessions clamped at "
    "midnight (standard daily-report semantics, stated). Day ids use "
    "the q243 week-aligned positive shift so pre-epoch days floor "
    "identically. Output per day: the peak and the earliest second it "
    "was reached.",
)
def q246_peak_concurrency(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "event_id",
        F.expr(_SECS.format(c="ts")).alias("s"),
    )
    t = t.withColumn("day", F.expr("(s + 63504000000) div 86400"))
    starts = t.select(
        "day", F.col("s").alias("t_s"), F.lit(1).alias("delta"), "event_id"
    )
    ends = t.select(
        "day",
        F.least(
            F.col("s") + 1800,
            F.expr("(day + 1) * 86400 - 63504000000"),
        ).alias("t_s"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    marks = starts.unionByName(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("t_s", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = marks.select(
        "day", "t_s", F.sum("delta").over(w).alias("load")
    )
    ranked = sweep.withColumn(
        "load_rank",
        F.rank().over(Window.partitionBy("day").orderBy(F.desc("load"))),
    )
    return ranked.groupBy("day").agg(
        F.max("load").cast("bigint").alias("peak_concurrent"),
        F.min(F.when(F.col("load_rank") == 1, F.col("t_s")))
        .cast("bigint")
        .alias("peak_at_s"),
    ).select(
        F.expr("CAST(day - 63504000000 div 86400 AS BIGINT)").alias(
            "epoch_day"
        ),
        "peak_concurrent",
        "peak_at_s",
    )


@register(
    "q247_ab_significance",
    """
    WITH per AS (
      SELECT c.c_custkey % 2 AS arm,
             CASE WHEN COUNT(o.o_orderkey) > 0 THEN 1 ELSE 0 END AS conv
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n, SUM(conv) AS x FROM per GROUP BY arm
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN x END) AS x0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN x END) AS x1
      FROM arms
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(x0 AS BIGINT) AS x0,
           CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
           CAST(x0 * 1000000 // n0 AS BIGINT) AS p0_ppm,
           CAST(x1 * 1000000 // n1 AS BIGINT) AS p1_ppm,
           CASE WHEN (x0 + x1) > 0 AND (x0 + x1) < (n0 + n1) THEN ROUND(
             (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
             / SQRT((CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                    * (1.0 - CAST(x0 + x1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6)
           END AS z_r6,
           ROUND(((CAST(x1 AS DOUBLE) + 1.9208)
                  - 1.96 * SQRT(CAST(x1 AS DOUBLE) * (n1 - x1) / n1
                                + 0.9604))
                 / (n1 + 3.8416), 6) AS p1_wilson_lo_r6,
           ROUND(((CAST(x1 AS DOUBLE) + 1.9208)
                  + 1.96 * SQRT(CAST(x1 AS DOUBLE) * (n1 - x1) / n1
                                + 0.9604))
                 / (n1 + 3.8416), 6) AS p1_wilson_hi_r6
    FROM wide
    """,
    doc="A/B conversion significance — the statistical completion of "
    "q117's point readout and q231's bootstrap band: the two-proportion "
    "pooled z statistic and the Wilson 95% interval for the treatment "
    "arm (Wilson 1927 — the interval that behaves at small n and "
    "extreme p where the naive Wald interval collapses). Every input "
    "is an exact integer count; z and the Wilson bounds are IEEE "
    "arithmetic on identical int-derived doubles — divisions, one "
    "correctly-rounded sqrt each (the q233 rule), and the z-derived "
    "constants (1.96, 1.96^2=3.8416, half of it, its quarter 0.9604) "
    "written as exact decimal literals shared by both engines — "
    "rounded at 6. Degenerate corpora (all convert or none) emit NULL "
    "z on both engines. Shape: the q117 custkey-shared join, a 2-row "
    "arm agg, a 1-row pivot — significance costs nothing beyond the "
    "readout it annotates.",
)
def q247_ab_significance(spark: SparkSession, sf_dir: str):
    c, o = load(spark, sf_dir, "customer", "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            (F.count("o_orderkey") > 0).cast("long").alias("conv"),
            (F.first("c_custkey") % 2).alias("arm"),
        )
    )
    arms = per.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("x"))).alias("x1"),
    )
    p0 = F.col("x0").cast("double") / F.col("n0")
    p1 = F.col("x1").cast("double") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (p1 - p0) / F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    wl_num_base = F.col("x1").cast("double") + 1.9208
    wl_sd = F.sqrt(
        F.col("x1").cast("double")
        * (F.col("n1") - F.col("x1"))
        / F.col("n1")
        + 0.9604
    )
    wl_den = (F.col("n1") + 3.8416)
    return wide.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("x0").cast("bigint").alias("x0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("x1").cast("bigint").alias("x1"),
        F.expr("CAST(x0 * 1000000 div n0 AS BIGINT)").alias("p0_ppm"),
        F.expr("CAST(x1 * 1000000 div n1 AS BIGINT)").alias("p1_ppm"),
        F.when(
            ((F.col("x0") + F.col("x1")) > 0)
            & ((F.col("x0") + F.col("x1")) < (F.col("n0") + F.col("n1"))),
            F.round(z, 6),
        ).alias("z_r6"),
        F.round((wl_num_base - F.lit(1.96) * wl_sd) / wl_den, 6).alias(
            "p1_wilson_lo_r6"
        ),
        F.round((wl_num_base + F.lit(1.96) * wl_sd) / wl_den, 6).alias(
            "p1_wilson_hi_r6"
        ),
    )


@register(
    "q248_cohort_ltv",
    """
    WITH t AS (
      SELECT user_id,
             ((epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 + 63504000000) // 604800 AS wk,
             CAST(FLOOR(COALESCE(value, 0) * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    coh AS (
      SELECT user_id, MIN(wk) AS cohort_wk FROM t GROUP BY user_id
    ),
    cell AS (
      SELECT c.cohort_wk, t.wk - c.cohort_wk AS age_wk,
             COUNT(DISTINCT t.user_id) AS n_active,
             SUM(t.cents) AS spend_cents
      FROM t JOIN coh c ON t.user_id = c.user_id
      GROUP BY 1, 2
    ),
    sized AS (SELECT cohort_wk, COUNT(*) AS n_cohort FROM coh GROUP BY 1)
    SELECT CAST(cell.cohort_wk - 63504000000 // 604800 AS BIGINT)
             AS cohort_wk,
           CAST(age_wk AS BIGINT) AS age_wk,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(spend_cents AS BIGINT) AS spend_cents,
           CAST(SUM(spend_cents) OVER (PARTITION BY cell.cohort_wk
                                       ORDER BY age_wk) AS BIGINT)
             AS cum_spend_cents,
           CAST(CAST(SUM(spend_cents) OVER (PARTITION BY cell.cohort_wk
                                            ORDER BY age_wk) AS HUGEINT)
                * 100 // n_cohort AS BIGINT) AS cum_ltv_cents_x100
    FROM cell JOIN sized ON cell.cohort_wk = sized.cohort_wk
    """,
    doc="Cohort LTV curves — the revenue deepening of q109's retention "
    "triangle (the growth team's 'when does a cohort pay back' table): "
    "per (signup-week cohort, age-in-weeks), active users, spend, "
    "cumulative spend, and cumulative LTV per cohort member (x100 "
    "fixed-point, denominated over the FULL cohort size so curves are "
    "comparable across cohorts regardless of week-to-week activity). "
    "Weeks via the q243 week-aligned positive shift (trunc == floor on "
    "pre-epoch corpora); spend in exact FLOOR(value*100) cents; the "
    "cumulative windows partition per cohort over age-bounded rows "
    "(#weeks, never events). Shape: two user-keyed aggs sharing the "
    "user shuffle, a cohort-keyed cell agg, cohort-bounded windows.",
)
def q248_cohort_ltv(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.expr(
            "(" + _SECS.format(c="ts") + " + 63504000000) div 604800"
        ).alias("wk"),
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    coh = t.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    cell = (
        t.join(coh, "user_id")
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_wk")
        )
        .agg(
            F.count_distinct("user_id").alias("n_active"),
            F.sum("cents").alias("spend_cents"),
        )
    )
    sized = coh.groupBy("cohort_wk").agg(F.count(F.lit(1)).alias("n_cohort"))
    j = cell.join(sized, "cohort_wk")
    w = (
        Window.partitionBy("cohort_wk")
        .orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.expr("CAST(cohort_wk - 63504000000 div 604800 AS BIGINT)").alias(
            "cohort_wk"
        ),
        F.col("age_wk").cast("bigint").alias("age_wk"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("spend_cents").cast("bigint").alias("spend_cents"),
        F.sum("spend_cents").over(w).cast("bigint").alias("cum_spend_cents"),
        F.expr(
            "CAST(CAST(SUM(spend_cents) OVER (PARTITION BY cohort_wk"
            " ORDER BY age_wk) AS DECIMAL(38,0)) * 100 div n_cohort"
            " AS BIGINT)"
        ).alias("cum_ltv_cents_x100"),
    )


@register(
    "q259_rolling_exact_distinct",
    """
    WITH base AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    x AS (
      SELECT user_id, d + CAST(i AS INTEGER) AS day, i
      FROM base, LATERAL unnest(range(0, 7)) AS u(i)
    )
    SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT)
             AS day_epoch,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_7d,
           CAST(COUNT(DISTINCT CASE WHEN i = 0 THEN user_id END) AS BIGINT)
             AS n_active_today
    FROM x GROUP BY 1
    """,
    doc="EXACT 7-day rolling distinct actives per day — the ground-truth "
    "twin of q146's rolling HLL sketch (same readout, zero error; run "
    "both and the delta IS the sketch's measured accuracy). The naive "
    "formulation — per-day distinct user SETS unioned across a sliding "
    "window — is quadratic state; the scalable identity: dedup to "
    "(user, day) pairs FIRST (one exchange, output bounded by "
    "users x days, not events), then each pair votes for the 7 target "
    "days it covers via a 7-wide explode, and one count-distinct per "
    "target day finishes. Shuffle volume is 7x the deduped pair table "
    "— independent of event count, the term that dominates at 100 TB. "
    "Trailing days past the corpus edge appear with their partial "
    "windows on both engines (a calendar dim would trim them in "
    "production).",
)
def q259_rolling_exact_distinct(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    base = (
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    x = base.select(
        "user_id",
        F.posexplode(F.expr("sequence(d, date_add(d, 6))")).alias("i", "day"),
    ).select(
        "user_id",
        "i",
        # integer epoch-days, not DATE: pandas date-vs-timestamp dtype
        # divergence between the two engines is a canon hazard (module
        # convention — every date output ships as a day count)
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_epoch"),
    )
    return x.groupBy("day_epoch").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active_7d"),
        F.countDistinct(F.when(F.col("i") == 0, F.col("user_id")))
        .cast("bigint")
        .alias("n_active_today"),
    )


@register(
    "q262_groupwise_ols",
    f"""
    WITH p AS (
      SELECT event_type,
             (epoch_us(ts) + 62135596800000000) // 1000000 // 3600
               - 17733240 AS x,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS y
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM p GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
             THEN ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * sx), 6)
           END AS slope_r6,
           CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
             THEN ROUND((CAST(sy AS DOUBLE)
                         - (CAST(n AS DOUBLE) * sxy
                            - CAST(sx AS DOUBLE) * sy)
                           / (CAST(n AS DOUBLE) * sxx
                              - CAST(sx AS DOUBLE) * sx) * sx)
                        / CAST(n AS DOUBLE), 6)
           END AS intercept_r6,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy) > 0
             THEN ROUND(
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
           END AS r2_r6
    FROM m
    """,
    doc="group-wise OLS trend (slope / intercept / R^2 per event type, "
    "value-cents against hours) — the parametric complement to q217's "
    "Theil-Sen median slope: one scan, five exact-bigint moment sums "
    "per group (map-side combine does all the work; the shuffle "
    "carries 6 integers per group), then closed-form IEEE arithmetic "
    "rounded 6. The x axis is integer HOURS since 2024-01-01, shifted "
    "through the year-1 epoch so the floor-division is on a "
    "non-negative numerator (the _SECS trick — Spark div truncates, "
    "DuckDB // floors; they agree only for non-negative operands). "
    "Bounds documented: sxx <= n * max_hours^2 and syy <= n * "
    "max_cents^2 must stay under 2^63 — at 1e5-cent values that is "
    "~9e8 rows per group; past that, pre-aggregate y to coarser units. "
    "Degenerate groups (constant x or y) emit NULL slope/R^2 on both "
    "engines.",
)
def q262_groupwise_ols(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    p = e.filter(F.col("ts").isNotNull() & F.col("value").isNotNull()).select(
        "event_type",
        F.expr(
            "((CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
            " + 62135596800000000) div 1000000 div 3600) - 17733240"
        ).alias("x"),
        F.floor(F.col("value") * 100.0).cast("bigint").alias("y"),
    )
    m = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    den = nd * F.col("sxx") - sxd * F.col("sx")
    cov = nd * F.col("sxy") - sxd * F.col("sy")
    deny = nd * F.col("syy") - syd * F.col("sy")
    slope = cov / den
    return m.select(
        "event_type",
        "n",
        F.when(den > 0, F.round(slope, 6)).alias("slope_r6"),
        F.when(
            den > 0,
            F.round((syd - slope * F.col("sx")) / nd, 6),
        ).alias("intercept_r6"),
        F.when(den * deny > 0, F.round(cov * cov / (den * deny), 6)).alias(
            "r2_r6"
        ),
    )


@register(
    "q258_kaplan_meier",
    """
    WITH p AS (
      SELECT user_id, event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS t_s
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    s0 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN t_s END) AS t0
      FROM p GROUP BY user_id
    ),
    ev AS (
      SELECT p.user_id, MIN(p.t_s) AS te
      FROM p JOIN s0 USING (user_id)
      WHERE p.event_type = 'purchase' AND p.t_s >= s0.t0
      GROUP BY p.user_id
    ),
    mx AS (SELECT MAX(t_s) AS tmax FROM p),
    u AS (
      SELECT s0.user_id % 2 AS arm,
             CASE WHEN ev.te IS NOT NULL
                  THEN (ev.te - s0.t0) // 86400
                  ELSE (mx.tmax - s0.t0) // 86400 END AS t_day,
             CASE WHEN ev.te IS NOT NULL THEN 1 ELSE 0 END AS obs
      FROM s0 CROSS JOIN mx LEFT JOIN ev USING (user_id)
      WHERE s0.t0 IS NOT NULL
    ),
    g AS (
      SELECT arm, t_day,
             CAST(SUM(obs) AS BIGINT) AS d,
             CAST(SUM(1 - obs) AS BIGINT) AS c
      FROM u GROUP BY arm, t_day
    ),
    r AS (
      SELECT arm, t_day, d, c,
             CAST(SUM(d + c) OVER (PARTITION BY arm) AS BIGINT)
             - CAST(COALESCE(SUM(d + c) OVER (
                 PARTITION BY arm ORDER BY t_day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM g
    ),
    li AS (
      SELECT arm, t_day, d, c, n_risk,
             CASE WHEN d = 0 THEN 0
                  WHEN d < n_risk THEN CAST(FLOOR(
                    1000000000000.0
                    * LN(1.0 - CAST(d AS DOUBLE) / n_risk)) AS BIGINT)
             END AS lt,
             CASE WHEN d >= n_risk AND d > 0 THEN 1 ELSE 0 END AS dead
      FROM r
    ),
    cum AS (
      SELECT arm, t_day, d, c, n_risk,
             CAST(SUM(lt) OVER w AS BIGINT) AS cl,
             MAX(dead) OVER w AS cd
      FROM li
      WINDOW w AS (PARTITION BY arm ORDER BY t_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(arm AS BIGINT) AS arm, CAST(t_day AS BIGINT) AS t_day,
           n_risk, d AS n_event, c AS n_censor,
           CASE WHEN cd = 1 THEN 0.0
                ELSE ROUND(EXP(CAST(cl AS DOUBLE) / 1000000000000.0), 6)
           END AS surv_r6
    FROM cum
    """,
    doc="Kaplan-Meier survival estimate (signup -> first purchase, "
    "censored at corpus end, two arms by user parity) — the time-to-"
    "event completion of the funnel/retention family (q108 counts "
    "conversions, q193 builds the lifetable; KM is THE estimator "
    "under right-censoring). Distributed shape: per-user reduction to "
    "(arm, duration_day, observed) — two aggs on the user_id exchange "
    "— then the KM product over the tiny (arm, day) table: n_risk by "
    "prefix-subtraction, and the product turned into a SUM by the "
    "integerize-the-transcendental rule — per-row floor(1e12 * "
    "ln(1 - d/n)) is an exact bigint (identical IEEE inputs -> "
    "identical ln -> identical floor), prefix-summed exactly, "
    "exponentiated and rounded 6 once per row. The d = n_risk "
    "boundary (everyone at risk dies) sets survival EXACTLY 0 from "
    "that day on via a prefix-max flag — no ln(0) on either engine. "
    "Censored-at-t users count at risk for deaths at t (the standard "
    "deaths-before-censors convention, encoded identically by the "
    "shared grouping).",
)
def q258_kaplan_meier(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    p = e.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_type",
        F.expr(_SECS.format(c="ts")).alias("t_s"),
    )
    s0 = p.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("t_s"))).alias(
            "t0"
        )
    )
    ev = (
        p.filter(F.col("event_type") == "purchase")
        .join(s0, "user_id")
        .filter(F.col("t_s") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("t_s").alias("te"))
    )
    mx = p.agg(F.max("t_s").alias("tmax"))
    u = (
        s0.filter(F.col("t0").isNotNull())
        .crossJoin(F.broadcast(mx))
        .join(ev, "user_id", "left")
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.when(
                F.col("te").isNotNull(),
                F.expr("(te - t0) div 86400"),
            )
            .otherwise(F.expr("(tmax - t0) div 86400"))
            .alias("t_day"),
            F.col("te").isNotNull().cast("int").alias("obs"),
        )
    )
    g = u.groupBy("arm", "t_day").agg(
        F.sum("obs").cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col("obs")).cast("bigint").alias("c"),
    )
    wa = Window.partitionBy("arm")
    wb = Window.partitionBy("arm").orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wc = Window.partitionBy("arm").orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.select(
        "arm",
        "t_day",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(wa).cast("bigint")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(wb), F.lit(0)
            ).cast("bigint")
        ).alias("n_risk"),
    )
    lt = F.when(F.col("d") == 0, F.lit(0).cast("bigint")).when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.lit(1000000000000.0)
            * F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
        ).cast("bigint"),
    )
    dead = (
        (F.col("d") >= F.col("n_risk")) & (F.col("d") > 0)
    ).cast("int")
    li = r.select(
        "arm", "t_day", "d", "c", "n_risk", lt.alias("lt"), dead.alias("dead")
    )
    cum = li.select(
        "arm",
        "t_day",
        "d",
        "c",
        "n_risk",
        F.sum("lt").over(wc).cast("bigint").alias("cl"),
        F.max("dead").over(wc).alias("cd"),
    )
    return cum.select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("t_day").cast("bigint").alias("t_day"),
        "n_risk",
        F.col("d").alias("n_event"),
        F.col("c").alias("n_censor"),
        F.when(F.col("cd") == 1, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(F.col("cl").cast("double") / F.lit(1000000000000.0)), 6
            )
        )
        .alias("surv_r6"),
    )


# q268's IEEE fragments in ONE shared textual form (the q257/q266
# identical-expression discipline): both engines parse these exact
# strings, so every double op sees identical operands in identical
# order. Moments arrive exact (HUGEINT on DuckDB, DECIMAL(38,0) sums
# of 19-digit products on Spark); the CAST to DOUBLE of the same exact
# integer rounds identically everywhere.
_Q268_THETA = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_Q268_YADJ = (
    "CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)"
    f" - ({_Q268_THETA})"
    " * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
)
_Q268_VARRED = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@register(
    "q268_cuped_adjustment",
    f"""
    WITH t AS (
      SELECT user_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) + 62135596800000000)
               // 1000000 - 62135596800 AS s,
             CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                  THEN CAST(FLOOR(value * 100.0) AS BIGINT) ELSE 0 END
               AS cents
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    cut AS (SELECT MAX(s) - 14 * 86400 AS c FROM t),
    per AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CASE WHEN s <= c THEN cents ELSE 0 END) AS BIGINT)
               AS x,
             CAST(SUM(CASE WHEN s > c THEN cents ELSE 0 END) AS BIGINT)
               AS y
      FROM t, cut GROUP BY user_id, user_id % 2
    ),
    g AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy,
             MIN(x) AS minx, MAX(x) AS maxx,
             MIN(y) AS miny, MAX(y) AS maxy
      FROM per
    ),
    a AS (
      SELECT arm, COUNT(*) AS na, SUM(x) AS sxa, SUM(y) AS sya
      FROM per GROUP BY arm
    )
    SELECT arm, CAST(na AS BIGINT) AS n_users,
           ROUND(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE), 6) AS y_mean_r6,
           CASE WHEN maxx > minx
             THEN ROUND({_Q268_YADJ}, 6)
             ELSE ROUND(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE), 6)
           END AS y_cuped_r6,
           CASE WHEN maxx > minx THEN ROUND({_Q268_THETA}, 6) END
             AS theta_r6,
           CASE WHEN maxx > minx AND maxy > miny
             THEN ROUND({_Q268_VARRED}, 6) END AS var_red_r6
    FROM a, g
    """,
    doc="CUPED variance-reduced experiment readout (Deng et al. 2013 — "
    "the pre-period covariate adjustment every mature experimentation "
    "platform applies before q247's significance call): covariate x = "
    "pre-cutoff purchase cents per user, metric y = post-cutoff cents, "
    "the q242 temporal firewall (cutoff = corpus max - 14 days) "
    "splitting them so the covariate is provably pre-assignment. "
    "theta = cov(x,y)/var(x) from exact global moments — five sums "
    "ride ONE user-keyed agg; Sxx/Sxy/Syy are HUGEINT (DuckDB) / "
    "DECIMAL(38,0) sums of 19-digit-capped products (Spark), exact to "
    "x ~ 1e19 cents-squared per user, so the double cast sees the SAME "
    "integer on both engines. Adjusted mean per arm = y_bar_arm - "
    "theta * (x_bar_arm - x_bar); variance-reduction readout rho^2. "
    "Degenerate guards are EXACT order-statistic comparisons (var = 0 "
    "iff min = max — no big-integer compare, no float epsilon): "
    "constant x falls back to the raw mean, constant y NULLs rho^2. "
    "All IEEE steps in shared textual form (q257 discipline), rounded "
    "6. Shape: one scan, one user exchange, a 2-row arm agg x 1-row "
    "global broadcast — CUPED costs nothing beyond the per-user agg "
    "q117/q247 already pay.",
)
def q268_cuped_adjustment(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    t = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.expr(_SECS.format(c="ts")).alias("s"),
        F.when(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
            F.floor(F.col("value") * 100.0).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    cut = t.agg((F.max("s") - 14 * 86400).alias("c"))
    # two consumers (global moments g, arm agg a) read the per-user
    # frame — persist it once or the events scan + user agg run twice
    per = scoped_persist(
        t.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("s") <= F.col("c"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("s") > F.col("c"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    g = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(yd * yd).alias("syy"),
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    a = per.groupBy("arm").agg(
        F.count(F.lit(1)).alias("na"),
        F.sum("x").cast("bigint").alias("sxa"),
        F.sum("y").cast("bigint").alias("sya"),
    )
    return a.crossJoin(F.broadcast(g)).select(
        "arm",
        F.col("na").cast("bigint").alias("n_users"),
        F.expr(
            "ROUND(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE), 6)"
        ).alias("y_mean_r6"),
        F.expr(
            f"CASE WHEN maxx > minx THEN ROUND({_Q268_YADJ}, 6)"
            " ELSE ROUND(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE), 6) END"
        ).alias("y_cuped_r6"),
        F.expr(
            f"CASE WHEN maxx > minx THEN ROUND({_Q268_THETA}, 6) END"
        ).alias("theta_r6"),
        F.expr(
            f"CASE WHEN maxx > minx AND maxy > miny"
            f" THEN ROUND({_Q268_VARRED}, 6) END"
        ).alias("var_red_r6"),
    )
