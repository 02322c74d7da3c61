#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r10/<q>_<tag>.txt.

Optimization-round evidence (guide §1): run once from the pre-change
commit's worktree with tag=before and once from the live tree with
tag=after.

Usage: python tools/dump_r10_plans.py <out_dir> <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from klio_spark.queries import all_queries, release_scoped_caches
    from klio_spark.session import get_spark

    spark = get_spark("plan-dump-r10")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} [{tag}] explain('formatted') at {sf_dir}\n")
            f.write(txt)
        release_scoped_caches()
        spark.catalog.clearCache()
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
