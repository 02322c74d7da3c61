#!/usr/bin/env python
"""Skewed-corpus rehearsal: hot-key twins of the testdata through the
join/window/graph/dedup stack.

Every scale rehearsal so far (tools/scale_rehearsal.py) amplifies the
corpus STRUCTURE-PRESERVINGLY — uniform key distributions stay uniform.
Real 100 TB corpora are zipfian: one user owns a visible share of the
event stream, one wholesale order holds a three-digit basket, one
boilerplate document family swamps a dedup bucket. This tool builds two
deterministic skewed twins of sf0.1 and times the skew-sensitive stack
on base vs twin, so a hot key that would stall a 1000-executor stage
(one straggler task holding the fat partition) shows up here as a wall
ratio far above the row-count ratio.

Twin A — ``.scale/skew/`` (same row counts as sf0.1 except documents/
embeddings, which gain one near-dup mega-cluster each):
  * events — 20% of rows remap to ONE hot user (the q143_skew_profile
    planning shape: top key ~20% of the stream vs ~0.07% at base).
    Stresses every per-user window/funnel/session/stateful group.
  * lineitem — (a) ~500 rows remap to ONE hot order: a 30x basket
    (~480 distinct parts vs max 7 at base) that turns into a clique in
    the co-purchase graph (q125 pairs, q152 pagerank, q160 triangles,
    q169 BFS); (b) 2% of rows remap to ONE hot part: a hot graph NODE
    plus a hot (part, week) interval-join key (q114).
  * documents — +2,000 near-dup variants of one 200-token base text
    (each with a unique tail token: pairwise jaccard ~0.98, one
    LSH mega-bucket ~2x bucket_cap, ~2M true pairs to verify).
  * embeddings — +2,000 tiny deterministic perturbations of one base
    vector: one semantic mega-cluster for q72/q134 (~2M cosine pairs).

Twin B — ``.scale/degen/``: documents + 12,600 IDENTICAL copies of the
base text — one signature-0 cluster listing C(12600,2) ~ 79M pairs,
beyond round 4's 60M-pair case. Run on the cheap-listing queries only
(q64 exact groups, q67 simhash pair listing): the jaccard-verify stack
is EXCLUDED by design — production pipelines exact-dedup a fully
degenerate family before pairwise verification (BASELINE.md round-4),
and 16 bands x 79M candidates is that anti-pattern, not a plan flaw.

Usage:
    python tools/skew_rehearsal.py [--queries q..,q..] [--degen-only]

Prints one JSON line: per-query base/skew seconds + rows, plus the
q143 skew profiles of both event corpora (the planning evidence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_USER = 777_000_001
HOT_ORDER_FALLBACK = 1
MEGA_ID_BASE = 10_000_000

SKEW_QUERIES = [
    # per-user window / funnel / session family
    "q51_sessionization", "q108_event_funnel", "q109_retention_cohorts",
    "q110_activity_runs", "q113_keep_latest", "q119_growth_accounting",
    "q120_sliding_window_counts", "q122_anomalous_hours",
    "q124_funnel_windowed", "q126_bounce_rate", "q148_transition_matrix",
    "q191_event_paths", "q143_skew_profile",
    # co-purchase graph + interval join (hot order clique, hub part)
    "q114_interval_overlap_join", "q125_copurchase_pairs",
    "q152_pagerank", "q160_triangle_count", "q169_bfs_khop",
    # round-9 (VERDICT r8 item 5): the two most expensive graph queries
    # get hub evidence — q214's top-32-strongest truncation should
    # absorb the hub, q160's degree-ordered orientation bounds it
    "q214_common_neighbors", "q215_k_core",
    # dedup stack on the near-dup mega-cluster
    "q64_exact_dedup", "q66_minhash_lsh_dedup", "q67_simhash_dedup",
    "q85_dedup_clusters", "q133_dedup_survivors", "q185_cluster_safe_split",
    "q188_winnowing_pairs", "q129_minhash_bucket_table",
    # embedding mega-cluster
    "q72_embedding_near_dups", "q134_semantic_dedup",
    # round-10 (VERDICT r9 item 6): q259's hot-user twin, the CUPED
    # per-user moments under the same hot user, and the three text ops
    # whose gram/token keys the mega-dup family makes hot — q267's
    # 2..8 frequency cap must EXCLUDE the 2000-deep boilerplate grams
    "q259_rolling_exact_distinct", "q268_cuped_adjustment",
    "q266_trigram_lm", "q267_edit_distance_verify", "q270_js_divergence",
]

DEGEN_QUERIES = ["q64_exact_dedup", "q67_simhash_dedup"]

_BASE_TEXT = " ".join(f"boiler{i:03d}" for i in range(200))


def _copy_passthrough(spark, src, dst, tables):
    from pyspark.sql import functions as F  # noqa: F401

    for t in tables:
        out = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(out):
            spark.read.parquet(os.path.join(src, f"{t}.parquet")).write.mode(
                "overwrite"
            ).parquet(out)


def build_skew_twin(spark, src: str, dst: str) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from klio_spark.queries import load

    os.makedirs(dst, exist_ok=True)
    _copy_passthrough(
        spark, src, dst, ["region", "nation", "customer", "supplier",
                          "part", "orders"]
    )

    # events: 1-in-5 rows -> the hot user
    out = os.path.join(dst, "events.parquet")
    if not os.path.exists(out):
        (e,) = load(spark, src, "events")
        e.withColumn(
            "user_id",
            F.when(
                F.col("user_id").isNotNull()
                & (F.pmod(F.xxhash64("event_id"), F.lit(5)) == 0),
                F.lit(HOT_USER),
            ).otherwise(F.col("user_id")),
        ).repartition(8).write.mode("overwrite").parquet(out)

    # lineitem: hot basket (1/1200 rows -> one order) + HUB part.
    # The hub rule (round 9, VERDICT r8 item 5): besides the original
    # 2%-of-rows remap, line 1 of every 5th ORDER becomes the hub part,
    # so the hub sits in ~20% of BASKETS — the degree-structural shape
    # q214's top-32 truncation and q160's orientation bound must absorb
    # (a graph HUB, not just a fat join key).
    out = os.path.join(dst, "lineitem.parquet")
    if not os.path.exists(out):
        li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
        hot_order = (
            li.agg(F.min("l_orderkey")).first()[0] or HOT_ORDER_FALLBACK
        )
        hot_part = li.agg(F.min("l_partkey")).first()[0]
        h = F.xxhash64("l_orderkey", "l_linenumber")
        hub = (F.pmod(F.col("l_orderkey"), F.lit(5)) == 0) & (
            F.col("l_linenumber") == 1
        )
        li.withColumn(
            "l_orderkey",
            F.when(F.pmod(h, F.lit(1200)) == 0, F.lit(hot_order)).otherwise(
                F.col("l_orderkey")
            ),
        ).withColumn(
            "l_partkey",
            F.when(
                (F.pmod(h, F.lit(50)) == 1) | hub, F.lit(hot_part)
            ).otherwise(F.col("l_partkey")),
        ).repartition(8).write.mode("overwrite").parquet(out)

    # documents: + one 2,000-doc near-dup family (unique tail tokens)
    out = os.path.join(dst, "documents.parquet")
    if not os.path.exists(out):
        d = spark.read.parquet(os.path.join(src, "documents.parquet"))
        mega = spark.range(2000).select(
            (F.col("id") + MEGA_ID_BASE).alias("doc_id"),
            F.concat(
                F.lit(_BASE_TEXT), F.lit(" tail"), F.col("id").cast("string")
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("megadup").alias("source"),
        )
        mega = mega.withColumn("n_chars", F.length("text").cast("long"))
        d.unionByName(mega).repartition(8).write.mode("overwrite").parquet(out)

    # embeddings: + one 2,000-vector near-identical cluster
    out = os.path.join(dst, "embeddings.parquet")
    if not os.path.exists(out):
        emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
        base = np.asarray(
            emb.orderBy("vec_id").first()["embedding"], dtype=np.float64
        )
        rng = np.random.default_rng(7)
        vecs = base[None, :] + rng.normal(scale=1e-3, size=(2000, len(base)))
        rows = [
            (MEGA_ID_BASE + i, [float(x) for x in v], 99)
            for i, v in enumerate(vecs.astype(np.float32))
        ]
        mega = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        emb.unionByName(mega).repartition(8).write.mode(
            "overwrite"
        ).parquet(out)


def build_degen_twin(spark, src: str, dst: str, n_copies: int = 12600) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    out = os.path.join(dst, "documents.parquet")
    if not os.path.exists(out):
        d = spark.read.parquet(os.path.join(src, "documents.parquet"))
        mega = spark.range(n_copies).select(
            (F.col("id") + MEGA_ID_BASE).alias("doc_id"),
            F.lit(_BASE_TEXT).alias("text"),  # IDENTICAL: signature-0
            F.lit("en").alias("lang"),
            F.lit("megadup").alias("source"),
        )
        mega = mega.withColumn("n_chars", F.length("text").cast("long"))
        d.unionByName(mega).repartition(8).write.mode("overwrite").parquet(out)


def _time_queries(spark, qs, names, dirs):
    # warm the JVM/codegen/parquet paths so the first timed slot does
    # not absorb session warmup (see scale_rehearsal.py, same fix)
    warm = os.path.join(dirs[0][1], "nation.parquet") if dirs else None
    if warm and os.path.exists(warm):
        spark.read.parquet(warm).write.mode("overwrite").format(
            "noop"
        ).save()
    out = {}
    for name in names:
        spec = qs[name]
        entry = {}
        for label, d in dirs:
            t0 = time.perf_counter()
            # noop write before count: count() alone lets Catalyst
            # prune window/computed columns (round-8 lesson — see
            # scale_rehearsal.py) and would time a cheaper query
            df = spec.fn(spark, d)
            df.write.mode("overwrite").format("noop").save()
            entry[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            entry[f"{label}_rows"] = df.count()  # untimed re-run
            spark.catalog.clearCache()
        if entry.get("base_sec", 0) > 0 and "skew_sec" in entry:
            entry["ratio"] = round(entry["skew_sec"] / entry["base_sec"], 2)
        out[name] = entry
        print(f"{name}: {entry}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", default=",".join(SKEW_QUERIES))
    ap.add_argument("--degen-only", action="store_true")
    ap.add_argument("--skip-degen", action="store_true")
    args = ap.parse_args()

    from klio_spark.queries import all_queries
    from klio_spark.session import get_spark

    spark = get_spark(app_name="skew-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    qs = all_queries()
    result = {}

    if not args.degen_only:
        skew_dir = os.path.join(root, ".scale", "skew")
        build_skew_twin(spark, args.src, skew_dir)
        # planning evidence: the achieved key-skew profile on both sides
        result["skew_profile"] = {
            label: [
                r.asDict()
                for r in qs["q143_skew_profile"].fn(spark, d).collect()
            ]
            for label, d in (("base", args.src), ("skew", skew_dir))
        }
        names = [n for n in args.queries.split(",") if n]
        result["skew"] = _time_queries(
            spark, qs, names, [("base", args.src), ("skew", skew_dir)]
        )

    if not args.skip_degen:
        degen_dir = os.path.join(root, ".scale", "degen")
        build_degen_twin(spark, args.src, degen_dir)
        result["degen"] = _time_queries(
            spark, qs, DEGEN_QUERIES,
            [("base", args.src), ("skew", degen_dir)],
        )

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
