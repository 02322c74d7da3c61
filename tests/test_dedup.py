import pytest
from pyspark.sql import functions as F

from klio_spark.functions import dedup as dd

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river shore"),  # near dup of 1
    (4, "completely different content about spark query engines and shuffles"),
    (5, "spark query engines and shuffles are completely different content about"),  # shuffled 4
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = dd.exact_dedup(docs, "text", "doc_id")
    counts = {r.doc_id: r.dup_count for r in out.collect()}
    # docs 1+2 share a hash; only the min-id representative survives
    assert counts[1] == 2 and 2 not in counts
    assert counts[3] == 1 and counts[4] == 1


def test_shingles_short_docs(spark):
    df = spark.createDataFrame([("one two",), ("a",), ("",)], "text string")
    rows = df.select(dd.shingles(F.col("text"), 3).alias("s")).collect()
    assert rows[0].s == ["one two"]
    assert rows[1].s == ["a"]
    assert rows[2].s == [""]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dd.minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always caught
    assert (1, 3) in got or (2, 3) in got  # near dup (1 token differs)
    # unrelated docs never pass verification
    assert not any({a, b} == {1, 4} for a, b in got)


def test_minhash_jaccard_estimates_match_exact(spark, docs):
    lsh = dd.minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.1)
    exact = dd.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.1)
    lsh_pairs = {(r.id_a, r.id_b): r.jaccard for r in lsh.collect()}
    exact_pairs = {(r.id_a, r.id_b): r.jaccard for r in exact.collect()}
    # verification step computes EXACT jaccard, so values agree where found
    for k in set(lsh_pairs) & set(exact_pairs):
        assert abs(lsh_pairs[k] - exact_pairs[k]) < 1e-9


def test_simhash_deterministic_and_near(spark, docs):
    h1 = dd.simhash(docs, "text").select("doc_id", "simhash").collect()
    h2 = dd.simhash(docs, "text").select("doc_id", "simhash").collect()
    assert {r.doc_id: r.simhash for r in h1} == {r.doc_id: r.simhash for r in h2}
    sh = {r.doc_id: r.simhash for r in h1}
    assert sh[1] == sh[2]  # identical text -> identical simhash


def test_simhash_near_dups(spark, docs):
    pairs = dd.simhash_near_dups(docs, "text", "doc_id", max_hamming=10)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((1, 2)) == 0


def test_md5_token_hash_portable(spark):
    """Spark's conv(substr(md5)) must equal DuckDB's hex cast — the
    invariant the q132 cross-engine simhash oracle rests on."""
    import duckdb
    from pyspark.sql import functions as F

    toks = ["hello", "Wörld", "123", "a", "the quick brown fox"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r.tok: r.h
        for r in df.select(
            "tok", dd.md5_token_hash(F.col("tok")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    for t in toks:
        (want,) = con.execute(
            "SELECT CAST('0x' || substr(md5(?), 1, 15) AS BIGINT)", [t]
        ).fetchone()
        assert got[t] == want, t
    assert all(0 <= v < (1 << 60) for v in got.values())


def test_simhash_portable_blocked_equals_bruteforce(spark, docs):
    """Pigeonhole blocking over the 60-bit portable simhash must find
    exactly the pairs an all-pairs hamming scan finds."""
    from pyspark.sql import functions as F

    sh = dd.simhash(
        docs, "text", n_bits=60, token_hash=dd.md5_token_hash
    ).select("doc_id", "simhash")
    a = sh.toDF("id_a", "sa")
    b = sh.toDF("id_b", "sb")
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
        )
        .filter(F.col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
    )
    blocked = dd.simhash_near_dups(
        docs, "text", "doc_id", max_hamming=8,
        n_bits=60, token_hash=dd.md5_token_hash,
    )
    assert sorted(map(tuple, brute.collect())) == sorted(
        map(tuple, blocked.collect())
    )


def test_ngram_jaccard_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r.jaccard for r in
           dd.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.0).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) not in out  # no shared shingles -> not even a candidate


def test_ngram_jaccard_max_df_cut(spark, docs):
    full = dd.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.1)
    # generous cap: nothing exceeds it -> identical results
    capped = dd.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.1, max_df=100)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, capped.collect()))
    # aggressive cap drops common shingles -> jaccard only ever shrinks
    tight = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.0, max_df=1
        ).collect()
    }
    base = {
        (r.id_a, r.id_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.0).collect()
    }
    for k, v in tight.items():
        assert v <= base[k] + 1e-12


def test_minhash_bucketed_table_path(spark, docs, tmp_path):
    """The 100 TB materialization path: the shingle intermediate is a
    bucketed+sorted table, same results as the persist path, and in the
    sort-merge regime the bucketed plan drops the corpus-side exchanges
    of the verify joins."""
    persist_out = sorted(
        map(tuple, dd.minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.3).collect())
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bucketed = dd.minhash_lsh_dedup(
            docs, "text", "doc_id", threshold=0.3,
            bucket_table="mh_bucket_test", n_buckets=4,
        )
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") >= 2  # both verify-join reads
        unbucketed = dd.minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.3)
        plan2 = unbucketed._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") < plan2.count("Exchange")
        assert sorted(map(tuple, bucketed.collect())) == persist_out
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS mh_bucket_test")


def test_minhash_bucket_table_db_qualified(spark, docs):
    """db.table bucket names must drop/recreate the RIGHT table (per-part
    quoting — quoting the whole dotted string would target a default-db
    table literally named 'db.tbl') and survive a rerun (orphan-dir
    recovery under <warehouse>/<db>.db/)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS mh_testdb")
    try:
        for _ in range(2):  # second run exercises the drop/overwrite path
            out = sorted(
                map(
                    tuple,
                    dd.minhash_lsh_dedup(
                        docs, "text", "doc_id", threshold=0.3,
                        bucket_table="mh_testdb.buckets", n_buckets=2,
                    ).collect(),
                )
            )
        plain = sorted(
            map(
                tuple,
                dd.minhash_lsh_dedup(
                    docs, "text", "doc_id", threshold=0.3
                ).collect(),
            )
        )
        assert out == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_testdb.buckets")
        spark.sql("DROP DATABASE IF EXISTS mh_testdb")


def test_shingle_strings_matches_hof_shingles(spark, docs):
    a = docs.select(
        "doc_id", F.array_sort(dd.shingles(F.col("text"), 2)).alias("s")
    ).collect()
    b = docs.select(
        "doc_id", F.array_sort(dd.shingle_strings(F.col("text"), 2)).alias("s")
    ).collect()
    assert {r.doc_id: r.s for r in a} == {r.doc_id: r.s for r in b}


def test_embedding_near_dups_exact_vs_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    vecs = [
        (1, (base + 0.01 * rng.standard_normal(16)).tolist()),
        (2, (base + 0.01 * rng.standard_normal(16)).tolist()),
        (3, rng.standard_normal(16).tolist()),
        (4, (-base).tolist()),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    exact = dd.embedding_near_dups(df, "embedding", "vec_id", 0.9, use_lsh=False)
    got = {(r.id_a, r.id_b) for r in exact.collect()}
    assert got == {(1, 2)}
    lsh = dd.embedding_near_dups(df, "embedding", "vec_id", 0.9, use_lsh=True)
    assert {(r.id_a, r.id_b) for r in lsh.collect()} == {(1, 2)}


def test_minhash_bucket_cap_lossless(spark, docs):
    # cap-on (forced absurdly low so EVERY multi-bucket routes through
    # the streamed wide-join branch) must equal cap-off exactly — the
    # split is a physical-plan change, never a result change
    base = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dd.minhash_lsh_dedup(
            docs, "text", "doc_id", threshold=0.3, bucket_cap=None
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dd.minhash_lsh_dedup(
            docs, "text", "doc_id", threshold=0.3, bucket_cap=1
        ).collect()
    }
    assert capped == base and len(base) >= 2


def test_minhash_boilerplate_corpus_bounded(spark):
    # adversarial corpus: one boilerplate cluster where every doc shares
    # every band bucket — the collect_list row would hold all n ids in a
    # single aggregation buffer; the capped path streams it. Result must
    # still be the complete n*(n-1)/2 pair set at jaccard 1.0, plus the
    # distinct singletons contributing nothing.
    n = 300
    rows = [(i, "terms of service apply to all users of this site always") for i in range(n)]
    rows += [(1000 + i, f"unique document number {i} with its own distinct words {i * 7}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dd.minhash_lsh_dedup(
        df, "text", "doc_id", threshold=0.9, bucket_cap=32
    ).collect()
    got = {(r.id_a, r.id_b) for r in out}
    want = {(a, b) for a in range(n) for b in range(a + 1, n)}
    assert got == want
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in out)


def test_minhash_cap_strategies_identical(spark, docs):
    """'window' (default) and 'rejoin' are two physical strategies for
    the SAME width split — results must be set-identical at a cap low
    enough that both narrow and wide branches carry rows."""
    got = {}
    for strat in ("window", "rejoin"):
        got[strat] = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dd.minhash_lsh_dedup(
                docs, "text", "doc_id", threshold=0.3,
                bucket_cap=2, cap_strategy=strat,
            ).collect()
        }
        spark.catalog.clearCache()
    assert got["window"] == got["rejoin"] and len(got["window"]) >= 2
