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
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row.

    Output: query_id, neighbor_id, cosine — ties broken by neighbor_id so
    results are fully deterministic (oracle-comparable).

    ``broadcast_queries``: the hint fits the serving shape (queries <<
    corpus); False drops it for a query side beyond executor broadcast
    memory (partitioned cartesian — inherent to the exact all-pairs
    semantics; prune with IVF/LSH/PQ instead at that scale).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    if broadcast_queries:
        q = F.broadcast(q)
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


def srp_signatures(vec_col, *, bits: int, tables: int, seed: int = 42):
    """All-tables sign-random-projection signatures in one shot.

    One Arrow-batched pandas_udf doing a single (batch × dim) @ (dim ×
    tables·bits) matmul — the expression-tree alternative (tables·bits
    fold expressions) spends more time in codegen than compute and scales
    badly past ~32 planes. Returns ARRAY<INT>, one bucket id per table.

    Hyperplanes are derived INSIDE the UDF from (seed, dim) on the first
    batch each worker sees — deterministic everywhere (same rng stream),
    and plan building stays side-effect-free: no driver-side `first()` to
    sniff the dimension, no job runs until the query itself executes.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = (1 << np.arange(bits)).astype(np.int64)
    cache: dict[int, np.ndarray] = {}

    def _sig(v):
        m = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        dim = m.shape[1]
        flat = cache.get(dim)
        if flat is None:
            planes = _hyperplanes(dim, bits, tables, seed)
            flat = planes.reshape(tables * bits, dim).T  # (dim, T*B)
            cache[dim] = flat
        proj = (m @ flat) > 0  # (n, T*B)
        b = proj.reshape(len(v), tables, bits) @ weights  # (n, T)
        return pd.Series(list(b.astype(np.int32)))

    # set hints explicitly: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's signature inspection rejects
    _sig.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "array<int>")(vec_col)


def _kmeans_centroids(
    m: np.ndarray, k: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic mini k-means on a sample (driver-side, numpy).
    Spherical variant: centroids re-normalized each step so assignment by
    max dot == min angular distance."""
    rng = np.random.default_rng(seed)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    c = mn[rng.choice(len(mn), size=min(k, len(mn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mn @ c.T, axis=1)
        for j in range(len(c)):
            members = mn[assign == j]
            if len(members):
                v = members.sum(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
    return c


def _assign_udf(cents: np.ndarray):
    """pandas UDF: vector → nearest-centroid list id (spherical argmax)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _assign(v):
        mm = np.stack(v.to_numpy()).astype(np.float64)
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        return pd.Series((mm @ cents.T).argmax(axis=1).astype(np.int32))

    _assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_assign, "int")


def _probes_udf(cents: np.ndarray, n_probe: int):
    """pandas UDF: vector → its n_probe closest centroid list ids."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _probes(v):
        mm = np.stack(v.to_numpy()).astype(np.float64)
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mm @ cents.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    _probes.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_probes, "array<int>")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    sample: int = 2048,
    seed: int = 42,
    rank_round: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into n_lists
    centroids (trained on a deterministic sample), probe the n_probe
    closest lists per query, exact cosine re-rank inside them.

    Scale shape: the corpus is partitioned by list id (a stable int — at
    rest this is a partition column, so a probe reads n_probe/n_lists of
    the data); queries broadcast with their probe lists. Recall/cost
    tunes via n_probe. Complements SRP-LSH: IVF adapts to the data
    distribution, LSH is data-independent.

    ``n_probe == n_lists`` is the exact parameterization: every list is
    probed, so the candidate set is the whole corpus and the result is
    identical to brute_force_topk — the oracle-checkable configuration.
    ``rank_round`` ranks by ROUND(cosine, d) (ties → neighbor_id) so
    sub-ulp engine differences can't reorder the top-k across engines.
    """
    # ORDERED sample: bare limit() is not deterministic across runs or
    # partition layouts, which would train different centroids for the
    # same (sample, seed) and break the documented identical-neighbors
    # guarantee. orderBy+limit compiles to TakeOrderedAndProject.
    samp = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in samp])
    cents = _kmeans_centroids(m, n_lists, seed=seed)
    assign_udf = _assign_udf(cents)
    probes_udf = _probes_udf(cents, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        assign_udf(F.col(vec_col)).alias("_list"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probes_udf(F.col(vec_col))).alias("_list"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    cand = q.join(c, "_list").withColumn(
        "cosine", cosine_sim(F.col("_qv"), F.col("_cv"))
    )
    if rank_round is not None:
        cand = cand.withColumn("cosine", F.round("cosine", rank_round))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    sample: int = 2048,
    seed: int = 42,
) -> None:
    """Materialize an IVF index: build once, query many.

    Writes two artifacts:
      * ``index_path`` — the corpus PARTITIONED BY its coarse list id
        (``_list``), so at rest each inverted list is its own partition
        directory. A probe of n_probe lists reads n_probe/n_lists of the
        bytes — partition pruning, not a filter after a full scan.
      * ``index_path + "_centroids"`` — the n_lists centroid vectors
        (tiny: n_lists × dim doubles).

    This is the serving-path counterpart of the ad-hoc ``ivf_topk``
    (which re-trains and re-assigns per call — right for one-shot
    analytics, wasteful for repeated querying). Centroid training uses
    the same bounded deterministic sample, so for equal (sample, seed,
    n_lists) the two paths return identical neighbors.
    """
    # ORDERED sample: bare limit() is not deterministic across runs or
    # partition layouts, which would train different centroids for the
    # same (sample, seed) and break the documented identical-neighbors
    # guarantee. orderBy+limit compiles to TakeOrderedAndProject.
    samp = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in samp])
    cents = _kmeans_centroids(m, n_lists, seed=seed)
    spark = corpus.sparkSession

    assign_udf = _assign_udf(cents)
    (
        corpus.select(
            F.col(id_col), F.col(vec_col), assign_udf(F.col(vec_col)).alias("_list")
        )
        .write.mode("overwrite")
        .partitionBy("_list")
        .parquet(index_path)
    )
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "list_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(index_path + "_centroids")


def ivf_topk_indexed(
    queries: DataFrame,
    index_path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probe: int = 4,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k over a prebuilt IVF index (see build_ivf_index).

    The probe-list join keys on the index's PARTITION column, and the
    union of probed lists (a set of ≤ n_lists ints, computed up front
    from the query batch) becomes a STATIC partition filter — the scan
    provably opens only the probed list directories, no reliance on
    runtime dynamic pruning. Driver traffic is bounded by n_lists twice
    (centroid read + probed-list set), never by corpus or query size."""
    spark = queries.sparkSession
    crows = spark.read.parquet(index_path + "_centroids").collect()
    cents = np.stack(
        [np.asarray(r.centroid, dtype=np.float64) for r in sorted(crows, key=lambda r: r.list_id)]
    )
    n_probe = min(n_probe, len(cents))

    probes_udf = _probes_udf(cents, n_probe)
    # no persist: this is the query-many serving path, and a per-call
    # persist would leak one cached frame per invocation in a long-lived
    # session. The probes UDF therefore evaluates twice over the QUERY
    # batch (probed-set collect + the join) — query batches are small by
    # contract; the corpus side is untouched either way.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probes_udf(F.col(vec_col))).alias("_list"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    probed = [r[0] for r in q.select("_list").distinct().collect()]
    c = (
        spark.read.parquet(index_path)
        .filter(F.col("_list").isin(probed))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            F.col("_list"),
        )
    )
    cand = q.join(c, "_list").withColumn(
        "cosine", cosine_sim(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def exact_pairs_blocked(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float,
    round_digits: int = 6,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked matmul.

    The corpus (id, L2-normalized vector) is broadcast to executors once;
    each partition multiplies its block against the full matrix in BLAS
    (float64) and emits only pairs (id_a < id_b) whose ROUNDED cosine
    clears the threshold. Work distributes linearly over blocks; the
    broadcast is O(corpus) memory — the *exact* variant's inherent floor.
    Beyond broadcastable corpora, use lsh_candidates (sub-quadratic).
    """
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    b = df.sparkSession.sparkContext.broadcast((ids, mn))

    def run(batches):
        all_ids, corpus = b.value
        lookup = {int(i): k for k, i in enumerate(all_ids)}
        for pdf in batches:
            rows_out = {"id_a": [], "id_b": [], "cosine": []}
            idx = np.array([lookup[int(i)] for i in pdf[id_col]], dtype=np.int64)
            block = corpus[idx]  # (nb, dim) — already normalized
            sims = np.round(block @ corpus.T, round_digits)  # (nb, N)
            my_ids = all_ids[idx]
            mask = (sims >= threshold) & (my_ids[:, None] < all_ids[None, :])
            ai, bj = np.nonzero(mask)
            rows_out["id_a"] = my_ids[ai]
            rows_out["id_b"] = all_ids[bj]
            rows_out["cosine"] = sims[ai, bj]
            yield pd.DataFrame(rows_out)

    return df.select(id_col).mapInPandas(
        run, schema="id_a long, id_b long, cosine double"
    )


def exact_pairs_grouped(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float,
    round_digits: int = 6,
    n_blocks: int | str = "auto",
    target_block_rows: int = 4096,
    chunk_rows: int = 2048,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold, fully distributed (triangle join).

    The scale-safe exact path: rows hash into ``n_blocks`` blocks; every
    unordered block pair (i ≤ j) becomes one task; each row is shuffled to
    the n_blocks tasks that involve its block; inside a task BLAS matmuls
    score block-i × block-j and emit pairs whose ROUNDED cosine clears the
    threshold. No driver collect, no broadcast — replication factor is
    n_blocks per row, shuffle volume n_blocks·|corpus|, compute
    Σ block_i × block_j = the same N²/2 dots as any exact sweep but
    spread across executors.

    TWO memory levers, both result-invariant (the block partition and the
    matmul tiling change WHERE dots are computed, never their values):

    * ``n_blocks='auto'`` (default) sizes the block count from one
      count() so blocks hold ≤ ``target_block_rows`` rows each. The
      round-6 100× rehearsal caught the fixed default: at 200k vectors,
      8 blocks meant a 25k×25k float64 sims matrix — 5 GB in ONE Python
      worker × 24 concurrent tasks, OOM-killing the workers. Auto keeps
      per-task score tiles constant-size no matter the corpus; pass an
      int to pin it (plan tests, known-small corpora).
    * ``chunk_rows`` tiles the matmul inside a task, bounding the peak
      sims allocation at chunk_rows × block_rows doubles (~64 MB at the
      defaults) even when a skewed block outgrows its target.

    Same math as exact_pairs_blocked (normalize → float64 matmul → round)
    so both paths agree bit-for-bit with each other and the SQL oracle.
    """
    import pandas as pd

    if n_blocks == "auto":
        # one scalar job — noise next to the O(N²) sweep it sizes
        n = df.count()
        P = max(8, -(-int(n) // target_block_rows))
    else:
        P = n_blocks
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(P)).cast("int").alias("_blk"),
    )
    # a row in block b belongs to exactly the P pairs {(min(x,b),
    # max(x,b)) : x in 0..P-1} — emit those P structs directly instead
    # of exploding all P(P+1)/2 pairs and filtering (which costs O(P²)
    # emitted structs per row once 'auto' raises P on a big corpus)
    exploded = base.select(
        "_id", "_v", "_blk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(P - 1)),
                lambda x: F.struct(
                    F.least(x, F.col("_blk")).alias("i"),
                    F.greatest(x, F.col("_blk")).alias("j"),
                ),
            )
        ).alias("_p"),
    )
    tasks = exploded.select(
        "_id", "_v", "_blk", F.col("_p.i").alias("_i"), F.col("_p.j").alias("_j")
    )

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        i, j = key
        ids = pdf["_id"].to_numpy(dtype=np.int64)
        m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        blk = pdf["_blk"].to_numpy()
        if i == j:
            aids, bids, mna, mnb = ids, ids, mn, mn
        else:
            a_sel, b_sel = blk == i, blk == j
            aids, bids = ids[a_sel], ids[b_sel]
            mna, mnb = mn[a_sel], mn[b_sel]
        out_a, out_b, out_c = [], [], []
        # tile the a-side: peak sims allocation is chunk_rows × |b| doubles
        for c0 in range(0, len(aids), chunk_rows):
            c1 = c0 + chunk_rows
            sims = np.round(mna[c0:c1] @ mnb.T, round_digits)
            mask = sims >= threshold
            if i == j:
                mask &= aids[c0:c1, None] < bids[None, :]
            ai, bj = np.nonzero(mask)
            ra, rb = aids[c0:c1][ai], bids[bj]
            out_a.append(np.minimum(ra, rb))
            out_b.append(np.maximum(ra, rb))
            out_c.append(sims[ai, bj])
        cat = lambda xs, d: (  # noqa: E731
            np.concatenate(xs) if xs else np.array([], dtype=d)
        )
        return pd.DataFrame(
            {
                "id_a": cat(out_a, np.int64),
                "id_b": cat(out_b, np.int64),
                "cosine": cat(out_c, np.float64),
            }
        )

    return tasks.groupBy("_i", "_j").applyInPandas(
        score, schema="id_a long, id_b long, cosine double"
    )


def lsh_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    bits: int = 12,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Candidate pairs (id_a < id_b, _va, _vb) sharing any table bucket.

    Pair GENERATION runs on ids only — bucket-grouped collect_list +
    double explode, the same expansion as minhash_lsh_dedup — so the
    signature UDF evaluates once and no shuffle carries embeddings until
    the final id-keyed joins fetch the two vectors per surviving pair
    (the caller's verify step needs them). A vector-laden band self-join
    would replicate every embedding `tables`× onto both exchange sides.
    """
    sigs = df.select(
        F.col(id_col),
        F.posexplode(
            srp_signatures(F.col(vec_col), bits=bits, tables=tables, seed=seed)
        ).alias("_table", "_sig"),
    )
    pairs = (
        sigs.groupBy("_table", "_sig")
        .agg(F.collect_list(F.col(id_col)).alias("xs"))
        .filter(F.size("xs") > 1)
        .select(F.explode("xs").alias("id_a"), "xs")
        .select("id_a", F.explode("xs").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    v = df.select(F.col(id_col), F.col(vec_col))
    return pairs.join(
        v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")), "id_a"
    ).join(
        v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")), "id_b"
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
    rank_round: int | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: bucket-join queries→corpus across `tables`
    signature tables, exact cosine re-rank within candidates.

    At scale the corpus side is hash-partitioned by (_table, _sig) — each
    query probes only its buckets instead of the full corpus.

    Small ``bits`` with many ``tables`` is the exhaustive-recall regime:
    a true neighbor evades the candidate set only by landing in a
    different 2^bits-way bucket in EVERY table — for bits=2, tables=24
    that is < 1e-7 per pair even for orthogonal vectors, and because the
    hyperplanes are seed-deterministic the result is a fixed function of
    the data: verified equal to brute_force_topk, it stays equal.
    ``rank_round`` ranks by ROUND(cosine, d) (ties → neighbor_id) for
    cross-engine determinism.
    """
    def signed(df: DataFrame, id_alias: str, v_alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(v_alias),
            F.posexplode(
                srp_signatures(F.col(vec_col), bits=bits, tables=tables, seed=seed)
            ).alias("_table", "_sig"),
        )

    q = signed(queries, "query_id", "_qv")
    if broadcast_queries:
        q = F.broadcast(q)
    c = signed(corpus, "neighbor_id", "_cv")
    cand = (
        q.join(c, ["_table", "_sig"])
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_sim(F.col("_qv"), F.col("_cv")))
    )
    if rank_round is not None:
        cand = cand.withColumn("cosine", F.round("cosine", rank_round))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
