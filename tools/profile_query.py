#!/usr/bin/env python
"""Per-query stage-level profiler (optimization rounds, guide §1/§7).

Runs one declared query with a noop sink (full computation, no sink
cost), then pulls stage metrics from the local Spark REST API
(http://localhost:4040) and prints the top stages by executor run time
with shuffle read/write bytes — the empirical loop of
spark_optimization_guide.md §1.1 without needing the interactive UI.

Usage: python tools/profile_query.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(path: str):
    url = f"http://localhost:4040/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from klio_spark.queries import all_queries, release_scoped_caches
    from klio_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()[name]

    # warm-up pass mirroring bench.py: JVM/codegen/Arrow pool
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    app_id = spark.sparkContext.applicationId
    times = []
    for i in range(reps):
        release_scoped_caches()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times.append(time.perf_counter() - t0)
    print(f"{name}: reps={['%.3f' % t for t in times]}  min={min(times):.3f}")

    stages = rest(f"applications/{app_id}/stages?status=complete")
    # keep only stages submitted during the LAST rep
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    total_run = sum(s.get("executorRunTime") or 0 for s in stages)
    print(f"total executorRunTime over all reps: {total_run/1000.0:.1f}s "
          f"(cumulative core-time, {len(stages)} stages)")
    print(f"{'runT(s)':>8} {'cpuT(s)':>8} {'shRead':>9} {'shWrite':>9} "
          f"{'inBytes':>9} {'tasks':>5}  stage")
    for s in stages[:18]:
        rt = (s.get("executorRunTime") or 0) / 1000.0
        ct = (s.get("executorCpuTime") or 0) / 1e9
        sr = s.get("shuffleReadBytes") or 0
        sw = s.get("shuffleWriteBytes") or 0
        ib = s.get("inputBytes") or 0
        nt = s.get("numCompleteTasks") or 0
        desc = (s.get("description") or s.get("name") or "")[:90]
        print(f"{rt:8.2f} {ct:8.2f} {sr:9d} {sw:9d} {ib:9d} {nt:5d}  "
              f"[{s['stageId']}] {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
