#!/usr/bin/env python
"""Scale rehearsal: run the heavy dedup/ANN/graph stack at an amplified
scale factor and record the scaling curve.

The driver ships testdata up to sf0.1; every plan audit so far is at
that scale. This tool amplifies sf0.1 by K× (default 10 → "sf1") into
``.scale/sf1/`` under the repo and times the stack at both scales, so a
super-linear query (an uncapped bucket, a non-broadcast join that stops
being broadcastable, a driver collect that grows with N) shows up as a
ratio well above K before it shows up as a 100 TB incident.

Amplification preserves each workload's STRUCTURE instead of distorting
it with K exact copies:
  * documents — copy k Caesar-shifts the alphabet (translate(), a cheap
    JVM bijection): token equality WITHIN a copy is preserved exactly
    (same near-dup clusters, same shingle distribution), while tokens
    across copies differ (no artificial K-wide cross-copy duplicate
    clusters that would blow up pair outputs superlinearly and make the
    timing curve meaningless). doc_id shifts by k*ID_STRIDE.
  * embeddings — copy k applies a deterministic random rotation
    (orthogonal: within-copy norms/cosines exactly preserved,
    cross-copy cosines decorrelate to the corpus background rate);
    vec_id shifts.
  * events — user_id/event_id shift by k*ID_STRIDE; timestamps are kept
    (10× the events over the same time range — how a bigger deployment
    actually looks).
  * orders/lineitem — o_orderkey/l_orderkey shift; part/customer keys
    are kept (same catalog, more orders — q152's graph gains edge
    weight, not artificial nodes).
Dimension tables copy through unchanged.

Usage:
    python tools/scale_rehearsal.py [--factor 10] [--queries q65,q66,...]

Prints one JSON line with per-query seconds at each scale and the
time ratio; linear-with-log scaling means ratio ≈ factor (shuffles are
O(N log N) at worst); anything far above warrants a plan fix.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ID_STRIDE = 1_000_000_000

DEFAULT_QUERIES = [
    "q65_ngram_jaccard_pairs",
    "q66_minhash_lsh_dedup",
    "q85_dedup_clusters",
    "q106_minhash_lsh_recall",
    "q129_minhash_bucket_table",
    "q144_inverted_index_topk",
    "q152_pagerank",
    "q67_simhash_dedup",
    "q134_semantic_dedup",
    "q70_ann_bruteforce_topk",
    # round-5 wave heavies
    "q181_misra_gries_heavy_hitters",
    "q185_cluster_safe_split",
    "q186_bpe_train_rounds",
    "q188_winnowing_pairs",
    "q189_textrank_keywords",
]

CAESAR_SRC = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def caesar(k: int) -> str:
    """Per-copy character bijection: letter rotation × digit rotation —
    260 distinct members, so copies stay pairwise-distinct up to
    factor 260 (letters alone repeat at k=26, which would reintroduce
    exact cross-copy duplicate text for k >= 26)."""
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    dg = "0123456789"
    # letters and digits rotate INDEPENDENTLY (k%26, k%10): distinct
    # pairs for k < lcm(26,10) = 130, and digit-heavy tokens (ids,
    # prices) decorrelate from copy 1 — (k//26)%10 would leave digits
    # identity for the whole first 26 copies
    s = k % 26
    d = k % 10
    return lo[s:] + lo[:s] + up[s:] + up[:s] + dg[d:] + dg[:d]


def _make_rotator(k: int, dim: int):
    """Arrow UDF applying copy-k's deterministic random rotation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(1_000 + k)
    a = rng.standard_normal((dim, dim))
    q, r = np.linalg.qr(a)
    q = (q * np.sign(np.diag(r))).astype(np.float32)  # det-stable QR

    def rot(s):
        out = []
        for v in s:
            if v is None:
                out.append(None)
            else:
                out.append((np.asarray(v, dtype=np.float32) @ q.T))
        return pd.Series(out)

    # explicit annotations: `from __future__ import annotations` turns
    # inline hints into strings pandas_udf cannot resolve here
    rot.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(rot, "array<float>")


def amplify(spark, src_dir: str, dst_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(os.path.join(src_dir, f"{t}.parquet"))
        if t in ("region", "nation", "customer", "supplier", "part"):
            out = df
        else:
            copies = []
            emb_dim = (
                df.selectExpr("max(size(embedding)) AS d").first().d
                if t == "embeddings"
                else None
            )
            for k in range(factor):
                c = df
                if t == "documents":
                    c = c.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(k * ID_STRIDE)
                    ).withColumn(
                        "text",
                        F.translate("text", CAESAR_SRC, caesar(k)),
                    )
                elif t == "embeddings":
                    c = c.withColumn(
                        "vec_id", F.col("vec_id") + F.lit(k * ID_STRIDE)
                    )
                    if k > 0:
                        # per-copy deterministic random ROTATION (QR of a
                        # seeded gaussian): an orthogonal transform, so
                        # within-copy geometry (norms, pairwise cosines,
                        # near-dup clusters) is EXACTLY preserved, while
                        # cross-copy cosines decorrelate. NB sign flips
                        # are NOT enough: the corpus has axis-aligned
                        # cluster structure that reflections map onto
                        # itself, manufacturing quadratic cross-copy
                        # near-dup clusters (measured: 103× pair growth
                        # at 10× data); a generic rotation does not.
                        c = c.withColumn(
                            "embedding", _make_rotator(k, emb_dim)(F.col("embedding"))
                        )
                elif t == "events":
                    for col in ("event_id", "user_id"):
                        if col in c.columns:
                            c = c.withColumn(
                                col, F.col(col) + F.lit(k * ID_STRIDE)
                            )
                elif t == "orders":
                    c = c.withColumn(
                        "o_orderkey", F.col("o_orderkey") + F.lit(k * ID_STRIDE)
                    )
                elif t == "lineitem":
                    c = c.withColumn(
                        "l_orderkey", F.col("l_orderkey") + F.lit(k * ID_STRIDE)
                    )
                copies.append(c)
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        # write as a single parquet FILE path (load() reads a path, and
        # a directory of part files works identically)
        out.repartition(8).write.mode("overwrite").parquet(dst)
        print(f"amplified {t}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--skip-base", action="store_true",
                    help="only time the amplified scale")
    args = ap.parse_args()

    from klio_spark.session import get_spark

    spark = get_spark(app_name="scale-rehearsal")
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", f"x{args.factor}",
    )
    amplify(spark, args.src, dst, args.factor)

    from klio_spark.queries import all_queries

    qs = all_queries()
    names = [n for n in args.queries.split(",") if n]
    # warm the JVM/codegen/parquet paths before the first timed slot:
    # the first query otherwise absorbs ~5-6 s of session warmup and
    # reads as a phantom regression (round-9 q240 misread x0.44)
    spark.read.parquet(os.path.join(args.src, "nation.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()
    result = {"factor": args.factor, "queries": {}}
    for name in names:
        spec = qs[name]
        entry = {}
        for label, d in (("base", args.src), ("scaled", dst)):
            if label == "base" and args.skip_base:
                continue
            t0 = time.perf_counter()
            # noop write, NOT count(): count() lets Catalyst PRUNE
            # expressions the aggregate doesn't need (window/computed
            # columns vanish from the plan), so a count-timed window op
            # measures a different, cheaper query (round-8 lesson:
            # ewma read 0.62 s by count, 19.9 s materialized). The noop
            # sink forces every output column like bench.py does.
            df = spec.fn(spark, d)
            df.write.mode("overwrite").format("noop").save()
            entry[f"{label}_sec"] = round(time.perf_counter() - t0, 2)
            entry[f"{label}_rows"] = df.count()  # untimed re-run
            spark.catalog.clearCache()
        if "base_sec" in entry and entry["base_sec"] > 0:
            entry["ratio"] = round(entry["scaled_sec"] / entry["base_sec"], 2)
        result["queries"][name] = entry
        print(f"{name}: {entry}", file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
