"""Similarity search over embedding columns (SURVEY §2.9).

Two paths:
  * brute_force_topk — exact: broadcast the (small) query set against the
    corpus, cosine in JVM expressions, per-query top-k via window. The
    corpus is never shuffled; cost is one scan. This is the oracle
    baseline and the right plan whenever |queries| is broadcastable.
  * lsh_topk / lsh_candidates — random-hyperplane LSH (Charikar '02
    SRP): sign-bit signatures bucketize the corpus; candidates come from
    multi-table bucket joins; exact cosine re-ranks. Scales to corpora
    where the cross join is impossible; recall tunable via (bits, tables).

Hyperplanes are generated from a fixed seed at plan-build time and
embedded as literals — deterministic across runs and executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from klio_spark.functions.vectors import cosine_sim


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row.

    Output: query_id, neighbor_id, cosine — ties broken by neighbor_id so
    results are fully deterministic (oracle-comparable).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = q.crossJoin(c).withColumn(
        "cosine", cosine_sim(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def srp_signature(vec_col, planes: np.ndarray):
    """Sign-random-projection signature for one table: int bucket id from
    `bits` sign bits. Dot products via zip_with/aggregate (JVM-side)."""
    bits = []
    for i, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(vec_col, lits, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    bits: int = 12,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs (id_a < id_b, _va, _vb) sharing any table bucket."""
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, tables, seed)
    sigs = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(
            F.array(*[srp_signature(F.col(vec_col), planes[t]) for t in range(tables)])
        ).alias("_table", "_sig"),
    )
    l = sigs.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_table", "_sig"
    )
    r = sigs.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_table", "_sig"
    )
    return (
        l.join(r, ["_table", "_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .dropDuplicates(["id_a", "id_b"])
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    bits: int = 10,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket-join queries→corpus across `tables`
    signature tables, exact cosine re-rank within candidates.

    At scale the corpus side is hash-partitioned by (_table, _sig) — each
    query probes only its buckets instead of the full corpus.
    """
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, tables, seed)

    def signed(df: DataFrame, id_alias: str, v_alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(v_alias),
            F.posexplode(
                F.array(
                    *[srp_signature(F.col(vec_col), planes[t]) for t in range(tables)]
                )
            ).alias("_table", "_sig"),
        )

    q = F.broadcast(signed(queries, "query_id", "_qv"))
    c = signed(corpus, "neighbor_id", "_cv")
    cand = (
        q.join(c, ["_table", "_sig"])
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_sim(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
