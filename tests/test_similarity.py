import numpy as np
import pytest
from pyspark.sql import functions as F

from klio_spark.functions import similarity as sim
from klio_spark.functions.vectors import cosine_sim, dot, l2_norm, normalized


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(32).tolist()) for i in range(100)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_vector_ops_match_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        l2_norm(F.col("a")).alias("na"),
        cosine_sim(F.col("a"), F.col("b")).alias("c"),
        normalized(F.col("a")).alias("an"),
    ).collect()[0]
    assert row.d == np.dot(a, b)
    assert abs(row.na - np.linalg.norm(a)) < 1e-12
    expected_c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(row.c - expected_c) < 1e-12
    np.testing.assert_allclose(row.an, np.array(a) / np.linalg.norm(a))


def test_cosine_zero_vector_is_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()[0].c == 0.0


def test_brute_force_topk_matches_numpy(spark, vec_df):
    rows = vec_df.collect()
    m = np.stack([np.array(r.embedding) for r in rows])
    ids = np.array([r.vec_id for r in rows])
    queries = vec_df.filter(F.col("vec_id") < 3)
    corpus = vec_df.filter(F.col("vec_id") >= 3)
    out = sim.brute_force_topk(queries, corpus, vec_col="embedding", id_col="vec_id", k=4)
    got = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}

    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in range(3):
        sims = mn[ids >= 3] @ mn[q]
        cids = ids[ids >= 3]
        order = sorted(zip(sims, -cids), key=lambda t: (-t[0], t[1]))
        for rank in range(1, 5):
            expect = -order[rank - 1][1]
            assert got[(q, rank)] == expect


def test_lsh_topk_recall_against_exact(spark, vec_df):
    queries = vec_df.filter(F.col("vec_id") < 5)
    corpus = vec_df.filter(F.col("vec_id") >= 5)
    exact = sim.brute_force_topk(queries, corpus, k=3)
    # random gaussian corpus -> top neighbors sit near cos~0.4, so per-bit
    # collision p≈0.63; keep signatures short and tables many for recall
    approx = sim.lsh_topk(queries, corpus, k=3, bits=4, tables=16)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_topk_recall_against_exact(spark, vec_df):
    queries = vec_df.filter(F.col("vec_id") < 5)
    corpus = vec_df.filter(F.col("vec_id") >= 5)
    exact = sim.brute_force_topk(queries, corpus, k=3)
    approx = sim.ivf_topk(queries, corpus, k=3, n_lists=8, n_probe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # probing ALL lists makes IVF exact
    full = sim.ivf_topk(queries, corpus, k=3, n_lists=8, n_probe=8)
    f = {(r.query_id, r.neighbor_id) for r in full.collect()}
    assert f == e


def test_lsh_deterministic(spark, vec_df):
    q = vec_df.filter(F.col("vec_id") < 2)
    c = vec_df.filter(F.col("vec_id") >= 2)
    r1 = sorted(map(tuple, sim.lsh_topk(q, c, k=3).collect()))
    r2 = sorted(map(tuple, sim.lsh_topk(q, c, k=3).collect()))
    assert r1 == r2


def test_exact_pairs_grouped_matches_blocked(spark, vec_df):
    """The distributed triangle join (no driver collect, no broadcast)
    must produce exactly the broadcast twin's pairs and cosines."""
    blocked = {
        (r.id_a, r.id_b): r.cosine
        for r in sim.exact_pairs_blocked(
            vec_df, "embedding", "vec_id", threshold=0.3
        ).collect()
    }
    for n_blocks in (1, 3, 8):
        grouped = {
            (r.id_a, r.id_b): r.cosine
            for r in sim.exact_pairs_grouped(
                vec_df, "embedding", "vec_id", threshold=0.3, n_blocks=n_blocks
            ).collect()
        }
        assert grouped.keys() == blocked.keys(), f"n_blocks={n_blocks}"
        for k in grouped:
            assert abs(grouped[k] - blocked[k]) < 1e-9


def test_exact_pairs_blocked_matches_bruteforce(spark, vec_df):
    out = sim.exact_pairs_blocked(
        vec_df, "embedding", "vec_id", threshold=0.3
    ).collect()
    rows = vec_df.collect()
    m = np.stack([np.array(r.embedding) for r in rows])
    ids = np.array([r.vec_id for r in rows])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(mn @ mn.T, 6)
    expect = {
        (int(ids[i]), int(ids[j])): sims[i, j]
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 0.3
    }
    got = {(r.id_a, r.id_b): r.cosine for r in out}
    assert got.keys() == expect.keys()
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9


def test_ivf_index_build_query_matches_adhoc(spark, vec_df, tmp_path):
    """build-once/query-many path returns exactly what the ad-hoc path
    does for equal (sample, seed, n_lists) — same centroids, same probes."""
    queries = vec_df.filter(F.col("vec_id") < 5)
    corpus = vec_df.filter(F.col("vec_id") >= 5)
    idx = str(tmp_path / "ivf_index")
    sim.build_ivf_index(corpus, idx, n_lists=8)
    indexed = sim.ivf_topk_indexed(queries, idx, k=3, n_probe=4)
    adhoc = sim.ivf_topk(queries, corpus, k=3, n_lists=8, n_probe=4)
    assert sorted(map(tuple, indexed.collect())) == sorted(
        map(tuple, adhoc.collect())
    )


def test_ivf_index_is_partitioned_by_list(spark, vec_df, tmp_path):
    """the at-rest layout IS the inverted file: one partition dir per
    list, so probing reads n_probe/n_lists of the bytes."""
    import pathlib

    corpus = vec_df.filter(F.col("vec_id") >= 5)
    idx = str(tmp_path / "ivf_index2")
    sim.build_ivf_index(corpus, idx, n_lists=8)
    part_dirs = {p.name for p in pathlib.Path(idx).iterdir() if p.name.startswith("_list=")}
    assert len(part_dirs) >= 2  # corpus actually spread over lists
    # and the probed-list set is a STATIC partition filter on the scan:
    # executors open only the probed directories
    out = sim.ivf_topk_indexed(vec_df.limit(2), idx, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in line and "_list" in line and " IN (" in line
        for line in plan.splitlines()
    ), plan[:2000]


def test_accuracy_claim_queries_hold(spark, sf_dir):
    """q106/q107 booleans (LSH recall, ANN similarity regret) must be
    true at the test sf — these are the driver-checkable upgrades of the
    rows-only approximate queries."""
    from klio_spark.queries import all_queries

    q = all_queries()
    r = q["q106_minhash_lsh_recall"].fn(spark, sf_dir).collect()[0]
    assert r.lsh_recall_ge_90 and r.exact_pairs > 0, r
    rows = q["q107_ann_quality"].fn(spark, sf_dir).collect()
    assert {x.method for x in rows} == {"lsh", "ivf"}
    assert all(x.regret_le_015 and x.n_queries == 10 for x in rows), rows
