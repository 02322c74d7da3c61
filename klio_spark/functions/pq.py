"""Product quantization (PQ) — compressed-domain ANN scoring.

The third leg of the ANN stack (similarity.py: brute force = referee,
SRP-LSH = data-independent, IVF = data-adaptive partitioning): PQ
compresses each D-dim float vector to `m` one-byte codes by splitting
it into m subvectors and snapping each to its nearest entry in a
256-way per-subspace codebook (Jegou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011). Search scores candidates
WITHOUT touching the original vectors: per query, build an m x k_sub
lookup table of subspace dot products, then a candidate's score is the
sum of m table lookups (asymmetric distance computation, ADC).

Why this matters at 100 TB: a 768-dim float32 corpus is 3 KB/vector;
PQ at m=96 is 96 B/vector — 32x less to store, shuffle, and scan. The
codes table becomes the thing you keep hot; full vectors are only
fetched (if at all) for a final exact re-rank of the shortlist.

Scale shape mirrors ivf_topk: codebooks train driver-side on a small
deterministic sample (m independent k-means — tiny), broadcast to
executors; encoding is one Arrow-vectorized pass over the corpus;
ADC scoring joins the query DataFrame against the codes scan and
builds each LUT executor-side from the codebook closure — no query
ever collects to the driver, so the query side scales past driver
memory. Composes with IVF (IVF-PQ): partition by coarse list id, PQ
within lists — both pieces exist here independently.

Accuracy is quantization-bounded, not exact, so there is no hash-exact
parameterization; the registry entry (q167) is a driver-checked regret
bound in the q107 style, and tests/test_pq.py asserts recall against
the brute-force referee plus the exact-reconstruction special case
(corpus vectors that ARE codebook entries -> ADC == exact dot).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from klio_spark.functions.similarity import (
    _assign_udf,
    _kmeans_centroids,
    _probes_udf,
)


def pq_train(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k_sub: int = 16,
    sample: int = 2048,
    seed: int = 42,
    train_mat: np.ndarray | None = None,
) -> np.ndarray:
    """Train per-subspace codebooks on a deterministic ordered sample.

    Returns an (m, k_sub, D/m) float64 array. Reuses the deterministic
    seeding/iteration of _kmeans_centroids per subspace; because that
    helper returns unit-norm directions and ADC sums RAW dot products
    (codewords must live where the data lives, not on the unit sphere),
    each codeword is rescaled to the mean norm of its assigned training
    subvectors. Deterministic for fixed (sample, seed).

    ``train_mat`` lets a caller that already collected the identical
    deterministic sample (IVF-PQ trains both quantizers on the same
    ordered sample) pass it in, so the sample job runs once, not once
    per quantizer.
    """
    if train_mat is not None:
        mat = train_mat
    else:
        samp = (
            corpus.filter(F.col(vec_col).isNotNull())
            .select(id_col, vec_col)
            .orderBy(id_col)
            .limit(sample)
            .collect()
        )
        mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in samp])
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.zeros((m, k_sub, sub))
    for j in range(m):
        block = mat[:, j * sub : (j + 1) * sub]
        cents = _kmeans_centroids(block, k_sub, seed=seed + j)
        # _kmeans_centroids returns unit-norm directions; restore scale
        # by assigning training points and matching member mean norms.
        bn = block / np.maximum(
            np.linalg.norm(block, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(bn @ cents.T, axis=1)
        for c in range(len(cents)):
            members = block[assign == c]
            scale = (
                np.linalg.norm(members, axis=1).mean() if len(members) else 1.0
            )
            books[j, c] = cents[c] * scale
    return books


def _encode_udf(books: np.ndarray):
    """pandas UDF: vector -> array<int> of m nearest-codeword ids
    (min L2 per subspace — the standard PQ assignment)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, k_sub, sub = books.shape

    def _enc(v: "pd.Series") -> "pd.Series":
        mat = np.stack(v.to_numpy()).astype(np.float64)
        out = np.zeros((len(mat), m), dtype=np.int32)
        for j in range(m):
            block = mat[:, j * sub : (j + 1) * sub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin drops ||x||^2
            d2 = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * (
                block @ books[j].T
            )
            out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    _enc.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "array<int>")


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus -> (neighbor_id, pq_code array<int>). The compressed
    representation: m small ints per vector instead of D floats.
    NULL embeddings are dropped (they have no codes; same convention
    as ivf_topk's list assignment)."""
    return corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        _encode_udf(books)(F.col(vec_col)).alias("pq_code"),
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    score_round: int | None = 6,
    broadcast_queries: bool = True,
) -> DataFrame:
    """ADC top-k over the codes table: score(q, x) ~= q . recon(x)
    = sum_j <q_sub_j, codeword(code_j)>, computed entirely from the
    m-byte codes.

    The query side never touches the driver: the queries DataFrame
    joins (broadcast by default) against the codes scan and each pair
    is scored by an Arrow-vectorized UDF that gathers the m codewords
    from the broadcast codebook closure — the per-query LUT is implicit
    in the gather, built executor-side batch by batch. A query set of
    any size streams through in Arrow chunks; nothing is collected.

    ``broadcast_queries`` is a LEVER, not a hard-coded hint (the q152
    PageRank lesson): True fits the serving shape (queries << corpus —
    the codes scan never moves); False drops the hint for a query side
    that outgrows executor broadcast memory, degrading to a partitioned
    cartesian — at that scale prefer ivfpq_topk_reranked, whose list
    join prunes the pair space instead.

    NULL-embedding query rows are DROPPED (same convention as
    pq_encode's corpus side and ivfpq_topk_reranked's query side): a
    NULL vector has no ADC score, so such a query contributes zero
    output rows rather than raising. Callers that require every input
    query to yield k ranked rows must pre-validate.
    """
    q = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    scored = codes.crossJoin(
        F.broadcast(q) if broadcast_queries else q
    ).select(
        "query_id",
        "neighbor_id",
        _adc_pair_score_udf(books)(F.col("_qv"), F.col("pq_code")).alias(
            "adc_score"
        ),
    )
    if score_round is not None:
        scored = scored.withColumn("adc_score", F.round("adc_score", score_round))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_score", "rank")
    )


def pq_topk_reranked(
    queries: DataFrame,
    corpus: DataFrame,
    codes: DataFrame,
    books: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    shortlist: int = 100,
) -> DataFrame:
    """The production PQ serving shape: ADC over the compressed codes
    selects a `shortlist` of candidates (compressed-domain scan — only
    the m-byte codes column is read), then the shortlist alone fetches
    full vectors for an exact cosine re-rank to the final top-k.

    At 100 TB this is the whole point of PQ: the expensive full-vector
    access is O(queries x shortlist), not O(queries x corpus); the
    corpus-wide scan touches 96 B/vector instead of 3 KB/vector. The
    re-rank join is a broadcast of the (query_id, neighbor_id)
    shortlist against the corpus — no corpus shuffle.

    Returns (query_id, neighbor_id, cosine, rank), exact scores on the
    ADC-selected candidates.
    """
    from klio_spark.functions.vectors import cosine_sim

    short = pq_adc_topk(
        queries, codes, books, vec_col=vec_col, id_col=id_col, k=shortlist
    ).select("query_id", "neighbor_id")
    rer = (
        short.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("_qv"), F.col("_nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _adc_pair_score_udf(books: np.ndarray):
    """pandas UDF for (query vector, candidate code) PAIRS: score =
    sum_j <q_sub_j, codeword(c_j)>, the codewords gathered from the
    codebook that rides the UDF closure (tiny: m x k_sub x D/m floats
    — same broadcast-derivation trick as srp_signatures'
    hyperplanes, similarity.py).

    Building the LUT executor-side per Arrow batch instead of
    driver-side per collected query is what lets the query side be a
    DataFrame of ANY size: in pq_adc_topk every (query, candidate)
    pair flows through here after a broadcast join; in IVF-PQ only
    candidates inside a probed list do, so the scored-pair count is
    O(queries x probed fraction of corpus), not O(queries x corpus).
    Per-subspace partials accumulate in the same j order the LUT
    formulation used, so scores are reproducible run to run."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, k_sub, sub = books.shape

    def _score(qv: "pd.Series", codes: "pd.Series") -> "pd.Series":
        if len(qv) == 0:
            # np.stack raises on an empty batch; skewed/empty partitions
            # after the broadcast join legitimately produce one
            return pd.Series([], dtype="float64")
        qm = np.stack(qv.to_numpy()).astype(np.float64)  # (n, D)
        cm = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
        # batches repeat each query across its candidates — build the
        # LUT once per UNIQUE query in the batch (u << n), then score
        # is m table lookups per row instead of D multiplies
        uq, uidx = np.unique(qm, axis=0, return_inverse=True)
        s = np.zeros(len(qm))
        for j in range(m):
            lut_j = uq[:, j * sub : (j + 1) * sub] @ books[j].T  # (u, k)
            s += lut_j[uidx, cm[:, j]]
        return pd.Series(s)

    _score.__annotations__ = {
        "qv": pd.Series, "codes": pd.Series, "return": pd.Series,
    }
    return pandas_udf(_score, "double")


def ivfpq_topk_reranked(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    shortlist: int = 100,
    n_lists: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_sub: int = 16,
    sample: int = 2048,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-PQ: the composed billion-scale serving shape (Jegou et al.
    TPAMI 2011 §V; what faiss calls IVFx,PQy).

    Three prunes multiply:
      1. IVF — each query probes only `n_probe`/`n_lists` of the corpus
         (the list id is a partition column at rest, so this is
         partition PRUNING, bytes never read);
      2. PQ/ADC — probed candidates are scored from their m-byte codes
         only (32x less data than the vectors) via the pair-wise
         codebook-gather UDF
         sum, selecting a `shortlist`;
      3. exact re-rank — full vectors are fetched for O(queries x
         shortlist) rows only.

    Exactness dial: ``n_probe == n_lists`` + ``shortlist >= |corpus|``
    degenerates to brute force exactly (every candidate probed, ADC only
    ORDERS the shortlist which then contains everything, re-rank is
    exact cosine) — the oracle-checkable configuration tests assert.

    Trains both quantizers on the same deterministic ordered sample;
    fully deterministic for fixed (sample, seed).
    """
    samp = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in samp])
    cents = _kmeans_centroids(mat, n_lists, seed=seed)
    # both quantizers train on the SAME deterministic sample — pass the
    # already-collected matrix so the sample job runs once, not twice
    books = pq_train(
        corpus, vec_col=vec_col, id_col=id_col, m=m, k_sub=k_sub,
        sample=sample, seed=seed, train_mat=mat,
    )

    # one corpus pass: list assignment + PQ code, both from the vector
    coded = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"),
        _assign_udf(cents)(F.col(vec_col)).alias("_list"),
        _encode_udf(books)(F.col(vec_col)).alias("pq_code"),
    )

    # the query side stays a DataFrame end to end: probes explode it to
    # (query_id, _qv, _list) and the list-join meets the coded corpus;
    # ADC scores come from the codebook-closure gather UDF. Nothing
    # funnels through the driver, so the query set can be arbitrarily
    # large — broadcast_queries=False drops the hint and the same plan
    # runs as a shuffle join on _list.
    qdf = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        )
        .withColumn(
            "_list", F.explode(_probes_udf(cents, n_probe)(F.col("_qv")))
        )
    )
    if broadcast_queries:
        qdf = F.broadcast(qdf)

    scored = qdf.join(coded, "_list").withColumn(
        "adc_score",
        F.round(
            _adc_pair_score_udf(books)(F.col("_qv"), F.col("pq_code")), 6
        ),
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("neighbor_id")
    )
    short = (
        scored.withColumn("_r", F.row_number().over(ws))
        .filter(F.col("_r") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    from klio_spark.functions.vectors import cosine_sim

    rer = (
        short.join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("_qv"), F.col("_nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
