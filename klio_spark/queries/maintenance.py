"""Table-maintenance operators: compaction planning and zone-map
(data-skipping) pruning — the housekeeping surface a 100 TB lakehouse
deployment runs nightly.

Neither has a reference twin (klio delegates storage to GCS/BQ); they are
extension rows in the SURVEY §2.9 spirit: the two operations that keep a
petabyte parquet estate scannable (small-files compaction) and
prunable (min/max stats), expressed as exact-integer plans a DuckDB
oracle verifies hash-for-hash.

Determinism rules as per the queries module doc: every measure integer,
floor-division only on non-negative numerators (Spark `div` truncates
toward zero while the oracle's `//` floors — numerators here are
cumulative sums of filtered-positive sizes, so the two agree).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.queries import load, register

_TARGET = 20_000  # compaction target bin size (chars stand in for bytes)


@register(
    "q158_compaction_plan",
    f"""
    WITH f AS (
      SELECT doc_id AS file_id, source, n_chars AS sz
      FROM documents WHERE n_chars > 0
    ),
    c AS (
      SELECT file_id, source, sz,
             SUM(sz) OVER (PARTITION BY source
                           ORDER BY sz DESC, file_id
                           ROWS UNBOUNDED PRECEDING) AS cum
      FROM f
    ),
    b AS (
      SELECT file_id, source, sz, (cum - 1) // {_TARGET} AS bin FROM c
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(sz) AS BIGINT) AS bin_bytes,
           CAST(MIN(file_id) AS BIGINT) AS first_file,
           CAST(MAX(file_id) AS BIGINT) AS last_file
    FROM b GROUP BY source, bin
    """,
    doc="small-files compaction planner (the OPTIMIZE/rewrite step every "
    "parquet estate needs: a 100 TB table ingested in small increments "
    "degrades into millions of KB-files whose open/footer overhead "
    "dominates scans): files (stand-in: documents, size = n_chars) are "
    "assigned to target-size output bins per partition (source) by "
    "cumulative-fill — sort by size DESC with id tie-break, running sum, "
    "bin = (cum-1) div target — the deterministic, ONE-window "
    "formulation of bin packing (first-fit-decreasing's sequential scan "
    "cannot distribute; cumulative-fill gives the same ≈target bins and "
    "is a single per-partition sort). All integer: sizes are filtered "
    "positive so the truncating div equals the oracle's floor div. The "
    "plan per source is one exchange + one window + one agg that reuses "
    "the window's partitioning; at scale 'source' is the table "
    "partition key, so the planner shuffles file METADATA (one row per "
    "file), never data.",
)
def q158_compaction_plan(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    f = d.filter(F.col("n_chars") > 0).select(
        F.col("doc_id").alias("file_id"), "source", F.col("n_chars").alias("sz")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("sz"), F.asc("file_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    b = f.withColumn("cum", F.sum("sz").over(w)).withColumn(
        "bin", F.expr(f"(cum - 1) div {_TARGET}")
    )
    return b.groupBy("source", F.col("bin").cast("bigint").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("sz").cast("bigint").alias("bin_bytes"),
        F.min("file_id").cast("bigint").alias("first_file"),
        F.max("file_id").cast("bigint").alias("last_file"),
    )


_ZLO, _ZHI = 10.0, 50.0  # the range predicate the zone maps answer
_BLK = 1000  # rows per synthetic block ("file")


@register(
    "q159_zonemap_pruning",
    f"""
    WITH e AS (
      SELECT event_id, value, event_id // {_BLK} AS blk
      FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
    ),
    z AS (
      SELECT blk, MIN(value) AS lo, MAX(value) AS hi,
             COUNT(*) AS n
      FROM e GROUP BY blk
    ),
    cls AS (
      SELECT blk, n,
             CASE WHEN lo >= {_ZLO} AND hi < {_ZHI} THEN 2
                  WHEN hi < {_ZLO} OR lo >= {_ZHI} THEN 0
                  ELSE 1 END AS c
      FROM z
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS full_blocks,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS partial_blocks,
             CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS pruned_blocks,
             CAST(SUM(CASE WHEN c = 2 THEN n ELSE 0 END) AS BIGINT)
               AS rows_from_stats
      FROM cls
    ),
    scan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_from_scan
      FROM e JOIN cls USING (blk)
      WHERE cls.c = 1 AND e.value >= {_ZLO} AND e.value < {_ZHI}
    ),
    direct AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS direct_rows
      FROM e WHERE value >= {_ZLO} AND value < {_ZHI}
    )
    SELECT a.n_blocks, a.full_blocks, a.partial_blocks, a.pruned_blocks,
           a.rows_from_stats, s.rows_from_scan,
           a.rows_from_stats + s.rows_from_scan AS total_rows,
           (a.rows_from_stats + s.rows_from_scan = d.direct_rows)
             AS lossless
    FROM agg a CROSS JOIN scan s CROSS JOIN direct d
    """,
    doc="zone-map (min/max data-skipping) pruning — the stats-table "
    "pattern behind every lakehouse range scan (parquet row-group "
    "stats, Delta file stats): per-block min/max/count zone maps are "
    "built once (stand-in blocks: event_id div 1000 ≈ files), a range "
    "predicate classifies each block full/partial/pruned from STATS "
    "ALONE, fully-covered blocks answer from their counts without "
    "touching rows, only partial blocks rescan (broadcast semi-join on "
    "the tiny partial-block id set), and the `lossless` envelope "
    "boolean proves stats+scan equals the direct filter on BOTH "
    "engines — the same referee pattern as q98/q147. At 100 TB the z "
    "frame is the persisted stats table (q98's sketch-table "
    "lifecycle); the fact table is scanned once to build it and only "
    "partial blocks thereafter.",
)
def q159_zonemap_pruning(spark: SparkSession, sf_dir: str):
    (ev,) = load(spark, sf_dir, "events")
    e = ev.filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull()
    ).select(
        "event_id",
        "value",
        # block id = event_id div 1000 on BOTH engines' truncating
        # integer division (Spark `div`, DuckDB integer `//` — measured:
        # both round toward zero), so negative ids land in the same
        # block on both sides; blocks only need to be CONSISTENT, not
        # calendar-floored, for pruning to be lossless
        F.expr(f"event_id div {_BLK}").alias("blk"),
    )
    z = e.groupBy("blk").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    cls = z.select(
        "blk",
        "n",
        F.when((F.col("lo") >= _ZLO) & (F.col("hi") < _ZHI), 2)
        .when((F.col("hi") < _ZLO) | (F.col("lo") >= _ZHI), 0)
        .otherwise(1)
        .alias("c"),
    )
    agg = cls.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum((F.col("c") == 2).cast("int")).cast("bigint").alias("full_blocks"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("partial_blocks"),
        F.sum((F.col("c") == 0).cast("int")).cast("bigint").alias("pruned_blocks"),
        F.sum(F.when(F.col("c") == 2, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_from_stats"),
    )
    partial = cls.filter(F.col("c") == 1).select("blk")
    scan = (
        e.join(F.broadcast(partial), "blk", "left_semi")
        .filter((F.col("value") >= _ZLO) & (F.col("value") < _ZHI))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_from_scan"))
    )
    direct = e.filter(
        (F.col("value") >= _ZLO) & (F.col("value") < _ZHI)
    ).agg(F.count(F.lit(1)).cast("bigint").alias("direct_rows"))
    return (
        agg.crossJoin(F.broadcast(scan))
        .crossJoin(F.broadcast(direct))
        .select(
            "n_blocks",
            "full_blocks",
            "partial_blocks",
            "pruned_blocks",
            "rows_from_stats",
            "rows_from_scan",
            (F.col("rows_from_stats") + F.col("rows_from_scan")).alias(
                "total_rows"
            ),
            (
                F.col("rows_from_stats") + F.col("rows_from_scan")
                == F.col("direct_rows")
            ).alias("lossless"),
        )
    )


@register(
    "q161_incremental_join_view",
    """
    WITH b_new AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_custkey % 20 = 0
                  THEN CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) + 10000
                  ELSE CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) END AS bal_c
      FROM customer
    )
    SELECT b.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_price_cents,
           CAST(SUM(b.bal_c) AS BIGINT) AS sum_bal_cents
    FROM orders o JOIN b_new b ON o.o_custkey = b.c_custkey
    GROUP BY 1
    """,
    doc="incremental JOIN-view maintenance — the denormalized-rollup "
    "refresh a 100 TB warehouse runs when BOTH sides change (q147 "
    "maintains an aggregate over one table; this maintains an "
    "aggregate over orders ⋈ customer): the Spark side deliberately "
    "computes new_view = old_view ⊖ (orders ⋈ ΔB_old) ⊕ (orders ⋈ "
    "ΔB_new) — customers with custkey % 20 = 0 are the 'updated' "
    "dimension rows (balance +100.00), handled as delete+insert of "
    "their join contributions — while the oracle joins the post-update "
    "tables directly. The hash match proves the algebra: count/sum "
    "aggregates are abelian-group-valued, so retract-then-assert is "
    "exact in integer cents. At scale only the Δ-customer semi-joined "
    "slice of orders is rescanned (broadcast semi-join on the changed "
    "keys); old_view rides from the previous materialization.",
)
def q161_incremental_join_view(spark: SparkSession, sf_dir: str):
    o, c = load(spark, sf_dir, "orders", "customer")
    oo = o.select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0).cast("bigint").alias("_pc"),
    )
    bal = F.floor(F.col("c_acctbal") * 100.0).cast("bigint")
    changed = F.col("c_custkey") % 20 == 0
    b_old = c.select("c_custkey", "c_nationkey", bal.alias("bal_c"))
    delta_keys = c.filter(changed).select("c_custkey")

    def view(b):
        return (
            oo.join(b, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum("_pc").cast("bigint").alias("sum_price_cents"),
                F.sum("bal_c").cast("bigint").alias("sum_bal_cents"),
            )
        )

    old_view = view(b_old)
    # retract the changed customers' old contributions, assert the new:
    # only orders of changed customers are touched (broadcast semi-join)
    od = oo.join(F.broadcast(delta_keys), F.col("o_custkey") == F.col("c_custkey")).drop("c_custkey")
    b_delta_old = b_old.join(F.broadcast(delta_keys), "c_custkey")
    b_delta_new = b_delta_old.withColumn("bal_c", F.col("bal_c") + F.lit(10000))
    retract = (
        od.join(b_delta_old, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_rn"),
            F.sum("_pc").cast("bigint").alias("_rp"),
            F.sum("bal_c").cast("bigint").alias("_rb"),
        )
    )
    assert_ = (
        od.join(b_delta_new, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_an"),
            F.sum("_pc").cast("bigint").alias("_ap"),
            F.sum("bal_c").cast("bigint").alias("_ab"),
        )
    )
    z = F.lit(0).cast("bigint")
    return (
        old_view.join(retract, "c_nationkey", "full_outer")
        .join(assert_, "c_nationkey", "full_outer")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            (
                F.coalesce("n_orders", z)
                - F.coalesce("_rn", z)
                + F.coalesce("_an", z)
            ).cast("bigint").alias("n_orders"),
            (
                F.coalesce("sum_price_cents", z)
                - F.coalesce("_rp", z)
                + F.coalesce("_ap", z)
            ).cast("bigint").alias("sum_price_cents"),
            (
                F.coalesce("sum_bal_cents", z)
                - F.coalesce("_rb", z)
                + F.coalesce("_ab", z)
            ).cast("bigint").alias("sum_bal_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )


from klio_spark.plans.zorder import morton_expr, morton_sql  # noqa: E402

_ZB = 6  # morton bits per dimension -> 4096 cells
_ZBUCKET = 4 ** _ZB // 32  # 32 z-range "files"


@register(
    "q164_zorder_cells",
    f"""
    WITH pts AS (
      SELECT ((o_custkey % {2 ** _ZB}) + {2 ** _ZB}) % {2 ** _ZB} AS x,
             ((o_orderkey % {2 ** _ZB}) + {2 ** _ZB}) % {2 ** _ZB} AS y
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    ),
    coded AS (
      SELECT x, y, {morton_sql('x', 'y', _ZB)} AS zkey FROM pts
    )
    SELECT CAST(zkey // {_ZBUCKET} AS BIGINT) AS zfile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_lo, CAST(MAX(x) AS BIGINT) AS x_hi,
           CAST(MIN(y) AS BIGINT) AS y_lo, CAST(MAX(y) AS BIGINT) AS y_hi,
           CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
           CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
    FROM coded GROUP BY 1
    """,
    doc="z-order (Morton) clustering cells — the layout math behind "
    "Delta/Iceberg OPTIMIZE ZORDER (plans/zorder.py; the physical "
    "file-clustering effect — every output file covering a compact "
    "(x, y) rectangle so min/max zone maps prune on EITHER column — is "
    "asserted on real parquet writes in tests/test_layout.py). The "
    "Morton interleave is an unrolled integer div/mod expression "
    "(JVM-codegen'd, no shuffle to compute), replayed bit-for-bit by "
    "the DuckDB oracle; rows are assigned to 32 z-range 'files' "
    "(zkey div {0}) exactly as write_zordered's repartitionByRange "
    "would, and the per-file x/y min/max spans ARE the zone-map "
    "envelope q159 prunes with. One exchange at write time, same as a "
    "plain sort.".format(_ZBUCKET),
)
def q164_zorder_cells(spark: SparkSession, sf_dir: str):
    (orders,) = load(spark, sf_dir, "orders")
    m = 2 ** _ZB
    pts = orders.filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderkey").isNotNull()
    ).select(
        F.pmod(F.col("o_custkey"), F.lit(m)).alias("x"),
        F.pmod(F.col("o_orderkey"), F.lit(m)).alias("y"),
    )
    coded = pts.withColumn("zkey", morton_expr(F.col("x"), F.col("y"), _ZB))
    return (
        coded.withColumn("zfile", F.expr(f"zkey div {_ZBUCKET}"))
        .groupBy("zfile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").cast("bigint").alias("x_lo"),
            F.max("x").cast("bigint").alias("x_hi"),
            F.min("y").cast("bigint").alias("y_lo"),
            F.max("y").cast("bigint").alias("y_hi"),
            (F.max("x") - F.min("x")).cast("bigint").alias("x_span"),
            (F.max("y") - F.min("y")).cast("bigint").alias("y_span"),
        )
        .select("zfile", "n_rows", "x_lo", "x_hi", "y_lo", "y_hi",
                "x_span", "y_span")
    )


@register(
    "q218_rendezvous_reshard",
    """
    WITH ks AS (
      SELECT c_custkey AS k, unnest(range(0, 9)) AS s
      FROM customer
    ),
    h AS (
      SELECT k, s,
             ('0x' || substring(md5(CAST(k AS VARCHAR) || ':'
                                    || CAST(s AS VARCHAR)), 1, 14))::BIGINT
               * 16 + s AS hs
      FROM ks
    ),
    pick AS (
      SELECT k,
             MAX(CASE WHEN s < 8 THEN hs END) % 16 AS old_shard,
             MAX(hs) % 16 AS new_shard
      FROM h GROUP BY k
    )
    SELECT CAST(old_shard AS BIGINT) AS old_shard,
           COUNT(*) AS n_keys,
           CAST(SUM(CASE WHEN new_shard != old_shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_moved_rv,
           CAST(SUM(CASE WHEN new_shard != old_shard THEN 1 ELSE 0 END)
                * 10000 // COUNT(*) AS BIGINT) AS moved_rv_bp,
           CAST(SUM(CASE WHEN k % 9 != k % 8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved_mod,
           CAST(SUM(CASE WHEN k % 9 != k % 8 THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS moved_mod_bp
    FROM pick GROUP BY old_shard
    """,
    doc="rendezvous-hash resharding audit (highest-random-weight, "
    "Thaler/Ravishankar 1998 — the consistent-placement scheme behind "
    "every shard-count change in a sharded store / streaming-state "
    "rescale): each key's shard is argmax over shards of "
    "md5(key:shard), so growing 8 -> 9 shards moves ONLY the keys "
    "whose new shard 8 wins (~1/9 = ~1111 bp), vs naive mod-N "
    "resharding which moves ~8/9 (~8889 bp) — the audit emits both "
    "movement rates per old shard, the before/after placement proof a "
    "migration plan is costed from. Portable determinism: the 14-hex "
    "(56-bit) md5 prefix rides the q86 '0x'-cast protocol; argmax is "
    "a plain integer MAX over hs = h*16 + s (s < 16, no overflow at "
    "2^60), so hash ties — ~2^-56 per key-pair — break toward the "
    "larger shard id IDENTICALLY on both engines, no engine-specific "
    "arg_max tie semantics anywhere. Shape: one x9 literal explode, "
    "one map-side-combinable per-key MAX agg, one tiny groupBy — no "
    "joins, no windows; at 100 TB this is one scan of the key table.",
)
def q218_rendezvous_reshard(spark: SparkSession, sf_dir: str):
    (c,) = load(spark, sf_dir, "customer")
    ks = c.select(
        F.col("c_custkey").alias("k"),
        F.explode(F.array(*[F.lit(i) for i in range(9)])).alias("s"),
    )
    h = ks.select(
        "k",
        "s",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("k").cast("string"),
                            F.lit(":"),
                            F.col("s").cast("string"),
                        )
                    ),
                    1,
                    14,
                ),
                16,
                10,
            ).cast("bigint")
            * 16
            + F.col("s")
        ).alias("hs"),
    )
    pick = h.groupBy("k").agg(
        (F.max(F.when(F.col("s") < 8, F.col("hs"))) % 16).alias("old_shard"),
        (F.max("hs") % 16).alias("new_shard"),
    )
    return pick.groupBy(
        F.col("old_shard").cast("bigint").alias("old_shard")
    ).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("new_shard") != F.col("old_shard"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved_rv"),
        F.expr(
            "CAST(SUM(CASE WHEN new_shard != old_shard THEN 1 ELSE 0 END)"
            " * 10000 div COUNT(*) AS BIGINT)"
        ).alias("moved_rv_bp"),
        F.sum(F.when(F.col("k") % 9 != F.col("k") % 8, 1).otherwise(0))
        .cast("bigint")
        .alias("n_moved_mod"),
        F.expr(
            "CAST(SUM(CASE WHEN k % 9 != k % 8 THEN 1 ELSE 0 END)"
            " * 10000 div COUNT(*) AS BIGINT)"
        ).alias("moved_mod_bp"),
    )


@register(
    "q253_incremental_distinct_view",
    """
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active_custs,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 17 <> 0
    GROUP BY 1
    """,
    doc="incremental view maintenance with COUNT(DISTINCT) — the "
    "non-abelian case q161 documents away (retract/assert works only "
    "for group-valued aggregates; a distinct count cannot subtract a "
    "deletion without knowing whether other contributions remain). The "
    "standard two-level construction: a SUPPORT table keyed by "
    "(group, distinct-key) holds abelian per-key counts (maintained by "
    "retract/assert exactly like q161 — here orders with orderkey%17=0 "
    "are the deleted delta), and the view re-derives the distinct "
    "count as COUNT(*) of support rows whose refcount stays > 0. The "
    "oracle aggregates the post-delete tables directly; the hash match "
    "proves the algebra including the hard case — a customer whose "
    "LAST order is deleted leaves the distinct count. At 100 TB the "
    "support table is the only state kept (one row per (nation, "
    "customer)), the delta semi-join touches only deleted keys, and "
    "both shuffles key on the same c_custkey exchange. "
    "Ref parity: reference has no SQL engine; this extends SURVEY §2.9 "
    "north-star coverage (materialized-view maintenance family with "
    "q147/q161).",
)
def q253_incremental_distinct_view(spark: SparkSession, sf_dir: str):
    o, c = load(spark, sf_dir, "orders", "customer")
    oo = o.select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0).cast("bigint").alias("_pc"),
    )
    cd = c.select("c_custkey", "c_nationkey")
    joined = oo.join(cd, oo.o_custkey == cd.c_custkey)
    # previous materialization: per-(nation, customer) support counts
    sup_old = joined.groupBy("c_nationkey", "c_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("_pc").cast("bigint").alias("pc"),
    )
    # the deletion delta: only deleted orders are rescanned/joined
    retract = (
        joined.filter(F.col("o_orderkey") % 17 == 0)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("_rc"),
            F.sum("_pc").cast("bigint").alias("_rp"),
        )
    )
    z = F.lit(0).cast("bigint")
    sup_new = (
        sup_old.join(retract, ["c_nationkey", "c_custkey"], "left")
        .select(
            "c_nationkey",
            "c_custkey",
            (F.col("cnt") - F.coalesce("_rc", z)).alias("cnt"),
            (F.col("pc") - F.coalesce("_rp", z)).alias("pc"),
        )
        # refcount 0 = the customer's last order was deleted: the row
        # leaves the support table and the distinct count drops — the
        # exact step plain retract/assert cannot express
        .filter(F.col("cnt") > 0)
    )
    return sup_new.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_custs"),
        F.sum("cnt").cast("bigint").alias("n_orders"),
        F.sum("pc").cast("bigint").alias("sum_price_cents"),
    ).select(
        F.col("c_nationkey").alias("nationkey"),
        "n_active_custs",
        "n_orders",
        "sum_price_cents",
    )
