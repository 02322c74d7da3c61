"""Distributed linear algebra for embedding analytics: quantized Gram
matrix and integer-exact power iteration (top principal direction).

The 100 TB shape (reference parity: klio has no linalg — this extends
the embedding toolbox of functions/vectors.py the way large-scale
training pipelines need it, e.g. PCA whitening / principal-direction
drift checks before ANN indexing):

  * the ONLY distributed pass is the Gram/second-moment aggregation —
    each Arrow batch contributes a d x d partial (``Q^T Q`` over the
    batch, one numpy matmul), so the shuffle moves
    ``partitions x d(d+1)/2`` small integer rows, INDEPENDENT of corpus
    row count. This is the canonical map-side-combine for covariance:
    at 1e12 rows the exchange is still ~2080 rows per partition.
  * the eigen-solve runs on the d x d result at the driver — the
    industry-standard split (a 64x64 problem does not deserve a
    cluster), mirroring how IVF trains its coarse quantizer on a
    bounded sample (functions/similarity.py).

Integer exactness contract (same discipline as q152's integer
PageRank): components quantize per-row as FLOOR(x * scale) — identical
IEEE doubles floor identically on every engine — and everything after
is integer arithmetic. Power iteration renormalizes each round with a
TRUNCATING integer division (DuckDB HUGEINT ``//`` semantics, exact and
toward-zero; replicated here with exact Python ints), so a DuckDB
oracle can replay the entire iteration bit-for-bit. Truncation is
sign-symmetric, so the final deterministic sign flip (largest-|v|
component positive, ties to the lowest index) commutes with it.

Overflow budget: |q| <= scale * max|x|; a batch partial is bounded by
batch_rows * (scale*max|x|)^2 (Arrow batches are bounded, so the numpy
int64 matmul cannot wrap); the global sum accumulates in decimal(38,0)
on the Spark side and HUGEINT in DuckDB. Matvec terms stay inside
HUGEINT by ~15 decimal digits of headroom at d=64, scale=1e6, v-scale
2^20.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, functions as F

#: per-component quantization for the Gram pass
GRAM_SCALE = 10**6
#: power-iteration vector renormalization scale (2^20)
VEC_SCALE = 1 << 20


def quantized_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    scale: int = GRAM_SCALE,
) -> DataFrame:
    """Upper-triangle quantized Gram matrix ``G[i][j] = sum_rows
    floor(x_i*scale) * floor(x_j*scale)`` as (i, j, g) rows, i <= j.

    One mapInPandas pass emits a d(d+1)/2-row integer partial per Arrow
    batch (numpy int64 matmul — exact, see module overflow budget); the
    groupBy sums partials in decimal(38,0) and returns bigint. Rows with
    NULL vectors are skipped.
    """
    import pandas as pd

    def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v)]
            if not vecs:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            q = np.floor(x * scale).astype(np.int64)
            g = q.T @ q  # (d, d) int64, bounded per the module budget
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {"i": iu.astype("int32"), "j": ju.astype("int32"),
                 "partial": g[iu, ju]}
            )

    parts = df.select(vec_col).mapInPandas(part, "i int, j int, partial long")
    return (
        parts.groupBy("i", "j")
        .agg(
            F.sum(F.col("partial").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("g")
        )
    )


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero (DuckDB ``//`` / Spark
    ``div`` semantics) on exact Python ints."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def power_iteration(
    gram_rows, dim: int, iters: int = 8, vec_scale: int = VEC_SCALE
) -> list[int]:
    """Integer-exact power iteration on a collected upper-triangle Gram
    table (rows with .i/.j/.g) — returns the quantized top-eigenvector
    direction as d ints in [-vec_scale, vec_scale].

    v0 = all-ones * vec_scale; each round: w = G @ v (exact Python
    ints), then v = trunc(w * vec_scale / max|w|). Deterministic sign:
    the largest-|v| component (ties -> lowest index) is made
    non-negative. Every step is replayable in integer SQL (HUGEINT),
    which is how q171's oracle checks it.
    """
    g = [[0] * dim for _ in range(dim)]
    for r in gram_rows:
        g[r.i][r.j] = int(r.g)
        g[r.j][r.i] = int(r.g)
    v = [vec_scale] * dim
    for _ in range(iters):
        w = [sum(g[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w) or 1
        v = [_tdiv(x * vec_scale, m) for x in w]
    pivot = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[pivot] < 0:
        v = [-x for x in v]
    return v


def top_eigvec_df(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    iters: int = 8,
    scale: int = GRAM_SCALE,
    vec_scale: int = VEC_SCALE,
) -> DataFrame:
    """Distributed Gram pass + driver-side integer power iteration ->
    (component, eigvec_q) DataFrame. The collect is the d(d+1)/2-row
    Gram table (d=64 -> 2080 rows), never corpus rows. ``dim`` defaults
    to the dimension the Gram table exhibits."""
    rows = quantized_gram(df, vec_col=vec_col, scale=scale).collect()
    if dim is None:
        dim = max(r.i for r in rows) + 1 if rows else 0
    v = power_iteration(rows, dim, iters=iters, vec_scale=vec_scale)
    spark = df.sparkSession
    arr = F.array(*[F.lit(int(x)).cast("bigint") for x in v])
    return spark.range(dim).select(
        F.col("id").cast("int").alias("component"),
        F.element_at(arr, F.col("id").cast("int") + 1).alias("eigvec_q"),
    )


def _nearest_centroid_udf(cents: list[tuple[int, list[int]]]):
    """Iterator pandas UDF: quantized vector → nearest-centroid id.

    The (k, d) int64 centroid matrix lives in the closure (built once
    per task, amortized over every batch — guide-standard iterator
    form), so the plan carries ONE ArrowEvalPython node instead of k*d
    literals. Distances are exact int64 numpy arithmetic — identical
    values to the SQL oracle's per-component sums ((x-c)^2 <= 4e12, ×d
    stays far inside int64) — and np.argmin returns the FIRST minimum,
    the same lowest-centroid-id tie-break as the oracle's
    (dist, cid)-ordered rank."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.array([vec for _cid, vec in cents], dtype=np.int64)
    cids = np.array([cid for cid, _vec in cents], dtype=np.int64)

    def _assign(batches: Iterator["pd.Series"]) -> Iterator["pd.Series"]:
        for q in batches:
            x = np.vstack(q.to_numpy()).astype(np.int64)
            d = ((x[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            yield pd.Series(cids[np.argmin(d, axis=1)])

    _assign.__annotations__ = {
        "batches": Iterator[pd.Series], "return": Iterator[pd.Series]
    }
    return pandas_udf(_assign, "long")


def lloyd_iterations(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    scale: int = GRAM_SCALE,
) -> DataFrame:
    """Distributed Lloyd (k-means) refinement, integer-exact — the
    k-means TRAINING step (functions/similarity.py trains its coarse
    quantizers on a bounded driver-side sample; this is the full-corpus
    refinement a production pipeline runs on top).

    Per iteration, the distributed pass is: assignment — each point's
    squared distances to all k centroids as ONE vectorized numpy
    matmul-shaped batch op inside an iterator pandas UDF (the centroid
    matrix rides the closure, built once per task: no join, no
    shuffle, and a CONSTANT-size plan — the earlier k-literal-array
    zip_with/aggregate expression put k*d literals into the plan,
    which Catalyst re-analyzed per action; at k=8, d=64 that planning
    overhead alone was ~4x the whole query's task time) — then ONE
    exchange: the per-(cluster, component) sum/count aggregation
    (posexplode feeds partial aggregation, so the shuffle carries k*d
    partials per partition, never corpus rows). Between iterations
    only the k x d centroid table returns to the driver (the same
    bounded-collect shape as IVF's trained quantizer). The quantized
    points persist across the seed scan, per-iteration jobs, and the
    final agg instead of re-reading parquet per action.

    Exactness: components quantize as FLOOR(double(x)*scale); distances
    and sums are exact integers; new centroid components are truncating
    integer divisions (sum div n). Argmin tie-breaks to the lowest
    centroid id (array_position finds the FIRST minimum). Every step is
    replayable in integer SQL — q172's oracle. Seeding: the k lowest
    ``id_col`` rows (deterministic). Emptied clusters drop on both
    engines identically.

    Returns (cluster, component, centroid_q, n) after ``iters`` rounds.
    """
    qvec = F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "bigint"
        ),
    )
    from klio_spark.queries import scoped_persist

    pts = scoped_persist(
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), qvec.alias("_q"))
    )
    seed = pts.orderBy(id_col).limit(k).collect()
    cents = [(i, [int(v) for v in r["_q"]]) for i, r in enumerate(seed)]

    agg = None
    for it in range(iters):
        asg = pts.withColumn(
            "_c", _nearest_centroid_udf(cents)(F.col("_q"))
        )
        agg = (
            asg.select("_c", F.posexplode("_q").alias("i", "v"))
            .groupBy("_c", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        if it < iters - 1:
            rows = agg.collect()  # k*d bounded
            by_cid: dict[int, dict[int, int]] = {}
            for r in rows:
                by_cid.setdefault(r["_c"], {})[r.i] = _tdiv(int(r.s), int(r.n))
            cents = [
                (cid, [comp[i] for i in sorted(comp)])
                for cid, comp in sorted(by_cid.items())
            ]
    return agg.select(
        F.col("_c").alias("cluster"),
        F.col("i").cast("int").alias("component"),
        F.expr("s div n").alias("centroid_q"),
        F.col("n").cast("bigint").alias("n"),
    )
