#!/usr/bin/env python
"""Decompose the fixed per-query cost of the bench tail (guide §1,
VERDICT r10 item 3): for each named query, split wall into

  t_build  — spec.fn(spark, sf_dir): parquet read resolution (driver
             file listing + footer read), DataFrame construction
             (py4j round-trips, eager analysis per transformation)
  t_exec   — the noop write: optimization + physical planning + AQE +
             job/stage/task scheduling + execution

plus two floor probes per session: a spark.range(1) noop write (pure
job submission) and a raw spark.read.parquet(...) resolution.

Usage: python tools/overhead_probe.py [sf_dir] [query ...]
Defaults to a representative sub-second sample. Times are min of REPS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 3

SAMPLE = [
    "q03_group_stats",
    "q10_semi_join",
    "q23_top_items_global",
    "q41_date_funcs",
    "q52_events_json_props",
    "q60_token_stats",
    "q75_embedding_centroids",
    "q96_lm_rarity_score",
    "q109_retention_cohorts",
    "q115_table_profile",
    "q142_time_decay_score",
    "q153_weighted_sample",
    "q177_grouping_sets",
    "q199_attribution_last_touch",
    "q216_script_mix",
    "q230_recency_weighted_mix",
    "q241_burstiness",
    "q256_mann_whitney",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or SAMPLE

    from klio_spark.queries import all_queries, release_scoped_caches
    from klio_spark.session import get_spark

    spark = get_spark("overhead-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # warm-up identical to bench.py
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    _inc = pandas_udf(lambda s: s + 1, "long")
    _inc.__wrapped__.__annotations__ = {"s": pd.Series, "return": pd.Series}
    a = spark.range(100).withColumn("v", _inc(F.col("id")))
    a.join(F.broadcast(spark.range(10)), "id").groupBy().sum("v").collect()

    # floor probes
    def floor_noop():
        spark.range(1).write.mode("overwrite").format("noop").save()

    def floor_read(tbl):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet")

    for label, fn in [
        ("floor: range(1) noop write", floor_noop),
        ("floor: read.parquet(lineitem) resolve", lambda: floor_read("lineitem")),
        ("floor: read.parquet(documents) resolve", lambda: floor_read("documents")),
        ("floor: read.parquet(events) resolve", lambda: floor_read("events")),
    ]:
        ts = []
        for _ in range(max(REPS, 5)):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: min {min(ts)*1000:.0f} ms  (all: "
              + " ".join(f"{t*1000:.0f}" for t in ts) + ")")

    print(f"\n{'query':<32} {'build_ms':>9} {'exec_ms':>9} {'total_ms':>9}")
    tot_b = tot_e = 0.0
    for name in names:
        spec = specs[name]
        bb = ee = None
        for _ in range(REPS):
            release_scoped_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            b, e = t1 - t0, t2 - t1
            if bb is None or b + e < bb + ee:
                bb, ee = b, e
        tot_b += bb
        tot_e += ee
        print(f"{name:<32} {bb*1000:9.0f} {ee*1000:9.0f} {(bb+ee)*1000:9.0f}")
    n = len(names)
    print(f"\nmeans over {n}: build {tot_b/n*1000:.0f} ms, "
          f"exec {tot_e/n*1000:.0f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
