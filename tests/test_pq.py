"""Product quantization: encode/score correctness and recall quality."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from klio_spark.functions.pq import pq_adc_topk, pq_encode, pq_train
from klio_spark.functions.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_when_corpus_is_codebook(spark):
    """Vectors that ARE codebook entries reconstruct losslessly, so ADC
    score == exact dot product — the algebraic sanity anchor."""
    rng = np.random.default_rng(7)
    dim, m, k_sub = 8, 2, 4
    books = rng.normal(size=(m, k_sub, dim // m))
    # corpus = every cross-product codeword combination
    rows = []
    i = 0
    for a in range(k_sub):
        for b in range(k_sub):
            v = np.concatenate([books[0, a], books[1, b]])
            rows.append((100 + i, [float(x) for x in v]))
            i += 1
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = np.array([1.0, -0.5, 0.25, 2.0, -1.0, 0.5, 0.75, -0.25])
    queries = spark.createDataFrame(
        [(1, [float(x) for x in q])], "vec_id bigint, embedding array<float>"
    )
    codes = pq_encode(corpus, books)
    got = pq_adc_topk(queries, codes, books, k=3, score_round=None).collect()
    # exact: float32 storage rounds the corpus vectors, so compare with
    # tolerance against the float64 dot of the ROUNDED vectors
    stored = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}
    exact = sorted(
        ((q @ v, vid) for vid, v in stored.items()), reverse=True
    )[:3]
    for r, (score, vid) in zip(sorted(got, key=lambda r: r["rank"]), exact):
        assert r["neighbor_id"] == vid
        assert abs(r["adc_score"] - score) < 1e-4


def test_codes_shape(emb):
    books = pq_train(emb, m=4, k_sub=16, sample=512)
    assert books.shape[0] == 4 and books.shape[1] == 16
    codes = pq_encode(emb.limit(50), books)
    row = codes.first()
    assert len(row["pq_code"]) == 4
    assert all(0 <= c < 16 for c in row["pq_code"])


def test_recall_vs_bruteforce(emb):
    """PQ@m=8 top-10 must retrieve neighbors whose average TRUE cosine
    is within 0.2 of the exact top-10's — the same similarity-regret
    metric q107 uses for LSH/IVF (set recall is noise on near-random
    embeddings)."""
    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    books = pq_train(corpus, m=8, k_sub=32, sample=1024)
    codes = pq_encode(corpus, books)
    pq_top = pq_adc_topk(queries, codes, books, k=10)

    exact = brute_force_topk(queries, corpus, k=10)
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()
    }
    exact_avg = {}
    for (qid, _), cos in truth.items():
        exact_avg.setdefault(qid, []).append(cos)

    # true cosine of the PQ-chosen neighbors
    from klio_spark.functions.vectors import cosine_sim

    qv = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q"))
    cv = corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_c"))
    got = (
        pq_top.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", cosine_sim(F.col("_q"), F.col("_c")).alias("cos"))
        .groupBy("query_id")
        .agg(F.avg("cos").alias("avg_cos"))
        .collect()
    )
    assert got
    for r in got:
        exact_mean = sum(exact_avg[r["query_id"]]) / len(exact_avg[r["query_id"]])
        assert exact_mean - r["avg_cos"] <= 0.2, (
            r["query_id"],
            exact_mean,
            r["avg_cos"],
        )


def test_rerank_equals_bruteforce_when_shortlist_covers(emb):
    """shortlist >= |corpus| makes ADC selection a no-op, so the exact
    re-rank IS brute force — provable equivalence, checked row-for-row
    (same tie-break: desc cosine, asc neighbor_id)."""
    from klio_spark.functions.pq import pq_topk_reranked

    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3).limit(80)
    books = pq_train(corpus, m=4, k_sub=8, sample=128)
    codes = pq_encode(corpus, books)
    got = pq_topk_reranked(
        queries, corpus, codes, books, k=5, shortlist=200
    ).collect()
    want = brute_force_topk(queries, corpus, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert len(got_s) == len(want_s) > 0
    for g, w in zip(got_s, want_s):
        assert g["neighbor_id"] == w["neighbor_id"], (g, w)
        assert abs(g["cosine"] - w["cosine"]) < 1e-6


def test_ivfpq_pruned_recall_and_determinism(emb):
    """The PRUNED IVF-PQ config (n_probe < n_lists, small shortlist):
    similarity regret vs brute force stays inside the q107-style bound,
    and two runs return identical rows (seeded quantizers, argmin/argmax
    tie-breaks, rounded rank keys)."""
    from klio_spark.functions.pq import ivfpq_topk_reranked
    from klio_spark.functions.vectors import cosine_sim

    queries = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 5)
    kw = dict(k=5, shortlist=50, n_lists=8, n_probe=3, m=8, k_sub=16,
              sample=1024)
    got = ivfpq_topk_reranked(queries, corpus, **kw).collect()
    again = ivfpq_topk_reranked(queries, corpus, **kw).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(got, key=key) == sorted(again, key=key)

    exact = brute_force_topk(queries, corpus, k=5).collect()
    exact_avg = {}
    for r in exact:
        exact_avg.setdefault(r["query_id"], []).append(r["cosine"])
    got_avg = {}
    for r in got:
        got_avg.setdefault(r["query_id"], []).append(r["cosine"])
    assert set(got_avg) == set(exact_avg)
    for qid, cos in exact_avg.items():
        regret = sum(cos) / len(cos) - sum(got_avg[qid]) / len(got_avg[qid])
        assert regret <= 0.2, (qid, regret)


def test_ivfpq_exact_dial_equals_bruteforce(emb):
    """n_probe == n_lists + shortlist > |corpus| degenerates to brute
    force row-for-row — the q168 registry parameterization."""
    from klio_spark.functions.pq import ivfpq_topk_reranked

    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3).limit(80)
    got = ivfpq_topk_reranked(
        queries, corpus, k=5, shortlist=1000, n_lists=4, n_probe=4,
        m=4, k_sub=8, sample=128,
    ).collect()
    want = brute_force_topk(queries, corpus, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert len(got_s) == len(want_s) > 0
    for g, w in zip(got_s, want_s):
        assert g["neighbor_id"] == w["neighbor_id"], (g, w)
        assert abs(g["cosine"] - w["cosine"]) < 1e-6


def test_adc_query_side_is_distributed(spark):
    """The ADC query side must scale past a driver-comfortable collect:
    a 2,000-query DataFrame streams through the broadcast join +
    codebook-gather UDF (functions/pq.py _adc_pair_score_udf) without
    any driver-side query materialization. Asserts (a) every query gets
    exactly k ranked rows, (b) sampled queries' ADC top-1 equals the
    numpy referee on the reconstructed corpus — the lossless-codebook
    corpus makes the referee exact."""
    rng = np.random.default_rng(11)
    dim, m, k_sub = 8, 2, 4
    books = rng.normal(size=(m, k_sub, dim // m))
    rows = []
    i = 0
    for a in range(k_sub):
        for b in range(k_sub):
            v = np.concatenate([books[0, a], books[1, b]])
            rows.append((100 + i, [float(x) for x in v]))
            i += 1
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    nq = 2000
    qmat = rng.normal(size=(nq, dim))
    queries = spark.createDataFrame(
        [(int(i), [float(x) for x in qmat[i]]) for i in range(nq)],
        "vec_id bigint, embedding array<float>",
    )
    codes = pq_encode(corpus, books)
    got = pq_adc_topk(queries, codes, books, k=3, score_round=None)
    per_q = {
        r["query_id"]: r["neighbor_id"]
        for r in got.filter(F.col("rank") == 1).collect()
    }
    assert len(per_q) == nq
    assert got.count() == nq * 3
    stored = {r["vec_id"]: np.array(r["embedding"]) for r in corpus.collect()}
    ids = sorted(stored)
    cm = np.stack([stored[i] for i in ids])
    for qi in (0, 499, 999, 1499, 1999):
        scores = cm @ qmat[qi]
        best = ids[int(np.argmax(scores))]
        assert per_q[qi] == best, (qi, per_q[qi], best)


def test_ivfpq_broadcast_lever_shuffle_fallback_identical(emb):
    """broadcast_queries=False must run the list join as a shuffle join
    (no broadcast of the query side) and return identical rows — the
    same lever discipline as pagerank_topk's broadcast_scores."""
    from klio_spark.functions.pq import ivfpq_topk_reranked

    queries = emb.filter(F.col("vec_id") < 3)
    corpus = emb.filter(F.col("vec_id") >= 3).limit(100)
    kw = dict(k=3, shortlist=500, n_lists=4, n_probe=4, m=4, k_sub=8)
    spark = emb.sparkSession
    # at test sizes Catalyst auto-broadcasts from size stats regardless
    # of the hint; disable the threshold so the plans show the HINT's
    # effect — exactly the regime the lever exists for (a query side
    # too big for Catalyst to broadcast on its own)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = ivfpq_topk_reranked(queries, corpus, **kw)
        shuffled = ivfpq_topk_reranked(
            queries, corpus, broadcast_queries=False, **kw
        )
        p_hint = hinted._jdf.queryExecution().executedPlan().toString()
        p_shuf = shuffled._jdf.queryExecution().executedPlan().toString()
        assert p_hint.count("BroadcastHashJoin") > p_shuf.count(
            "BroadcastHashJoin"
        )
        key = lambda r: (r["query_id"], r["rank"])
        got_h = sorted(hinted.collect(), key=key)
        got_s = sorted(shuffled.collect(), key=key)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert [(r["query_id"], r["neighbor_id"]) for r in got_h] == [
        (r["query_id"], r["neighbor_id"]) for r in got_s
    ] and len(got_h) == 9
