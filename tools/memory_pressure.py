#!/usr/bin/env python
"""Memory-pressure rehearsal: run the dedup stack at 10× amplified data
under a deliberately starved heap and prove the spill paths carry it.

The cap/spill arguments for the dedup stack are plan-level claims:
wide LSH buckets stream through a sort-merge self-join whose per-key
buffers spill, the banded/collision caches are MEMORY_AND_DISK, and
simhash candidates stream through block self-joins instead of
buffering. This tool makes the claim empirical: a fresh JVM with
``SPARK_DRIVER_MEM`` (default 2g — 1/64th of the dev box) runs

  * minhash_lsh_dedup at the default cap (narrow+wide mixed), and
  * minhash_lsh_dedup at bucket_cap=2 (EVERY collision bucket routed
    through the wide sort-merge branch), and
  * simhash_near_dups (block self-join + distinct)

over ``.scale/x10`` (build it first: ``python tools/scale_rehearsal.py
--factor 10``) and asserts completion with the same pair counts the
unconstrained run produces. OOM = non-zero exit, wrong counts = fail.

Usage:  SPARK_DRIVER_MEM=2g python tools/memory_pressure.py
Wired into the suite as tests/test_memory_pressure.py (slow marker).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale", "x10",
)


def main() -> int:
    if not os.path.isdir(X10):
        print(f"# missing {X10}; run tools/scale_rehearsal.py first",
              file=sys.stderr)
        return 2
    os.environ.setdefault("SPARK_DRIVER_MEM", "2g")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from klio_spark.functions.dedup import minhash_lsh_dedup, simhash_near_dups
    from klio_spark.session import get_spark

    spark = get_spark("memory-pressure")
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.conf.get("spark.driver.memory")
    docs = spark.read.parquet(os.path.join(X10, "documents.parquet"))

    out: dict[str, dict] = {}

    def run(name, df):
        t0 = time.perf_counter()
        n = df.count()
        out[name] = {"rows": n, "sec": round(time.perf_counter() - t0, 2)}
        spark.catalog.clearCache()

    run("minhash_default_cap",
        minhash_lsh_dedup(docs, "text", "doc_id"))
    run("minhash_cap2_all_wide",
        minhash_lsh_dedup(docs, "text", "doc_id", bucket_cap=2))
    run("simhash", simhash_near_dups(docs, "text", "doc_id"))

    # round-6 additions: the auto-blocked exact-pairs kernel (the 100×
    # OOM fix) must be result-invariant AND complete under the starved
    # heap — once with auto sizing, once with blocks pinned coarse and
    # the matmul tiles pinned tiny (worst spill pattern); and the
    # A-priori pair-support pass (the heaviest new-operator stage at
    # 100×) must complete
    from klio_spark.functions.similarity import exact_pairs_grouped
    from klio_spark.queries import all_queries

    emb = spark.read.parquet(os.path.join(X10, "embeddings.parquet"))
    run("exact_pairs_auto",
        exact_pairs_grouped(emb, "embedding", "vec_id", threshold=0.35))
    run("exact_pairs_pinned_tiny_tiles",
        exact_pairs_grouped(emb, "embedding", "vec_id", threshold=0.35,
                            n_blocks=8, chunk_rows=64))
    run("apriori_triples",
        all_queries()["q201_apriori_triples"].fn(spark, X10))

    ok = (
        out["minhash_default_cap"]["rows"]
        == out["minhash_cap2_all_wide"]["rows"]
        > 0
        and out["simhash"]["rows"] > 0
        and out["exact_pairs_auto"]["rows"]
        == out["exact_pairs_pinned_tiny_tiles"]["rows"]
        > 0
        and out["apriori_triples"]["rows"] >= 0
    )
    print(json.dumps({"heap": heap, "ok": ok, **out}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
