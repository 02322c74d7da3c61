from pyspark.sql import functions as F

from klio_spark.functions import text as tx


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_token_count(spark):
    assert _one(spark, "a b  c", tx.token_count(F.col("text"))) == 3
    assert _one(spark, "  leading and trailing  ", tx.token_count(F.col("text"))) == 3
    assert _one(spark, "", tx.token_count(F.col("text"))) == 0


def test_bpe_token_count(spark):
    # "don't stop-me 123x" → don | ' | t | stop | - | me | 123 | x = 8
    assert _one(spark, "don't stop-me 123x", tx.bpe_token_count(F.col("text"))) == 8
    # whitespace tokenizer sees only 3 — the BPE-ish count tracks real
    # tokenizer behavior on punctuation-heavy text
    assert _one(spark, "don't stop-me 123x", tx.token_count(F.col("text"))) == 3
    assert _one(spark, "", tx.bpe_token_count(F.col("text"))) == 0


def test_tokens_drops_empties(spark):
    toks = _one(spark, "  x  y ", tx.tokens(F.col("text")))
    assert toks == ["x", "y"]


def test_lang_id_markers(spark):
    assert _one(spark, "der hund und die katze", tx.lang_id(F.col("text"))) == "de"
    assert _one(spark, "le chat et les chiens des", tx.lang_id(F.col("text"))) == "fr"
    assert _one(spark, "the value of the table", tx.lang_id(F.col("text"))) == "en"
    # no markers at all -> 'en' default
    assert _one(spark, "xyzzy qwerty", tx.lang_id(F.col("text"))) == "en"


def test_quality_features_ratios(spark):
    f = tx.quality_features(F.col("text"))
    text = "the cat!! 123"
    n_chars = _one(spark, text, f["n_chars"])
    assert n_chars == len(text)
    assert _one(spark, text, f["n_tokens"]) == 3
    assert abs(_one(spark, text, f["punct_ratio"]) - 2 / len(text)) < 1e-12
    assert abs(_one(spark, text, f["digit_ratio"]) - 3 / len(text)) < 1e-12
    # 'the' is 1 of 3 tokens
    assert abs(_one(spark, text, f["stopword_ratio"]) - 1 / 3) < 1e-12


def test_quality_score_bounds(spark):
    s_good = _one(spark, "the quick brown fox is in the yard", tx.quality_score(F.col("text")))
    s_bad = _one(spark, "!!! ### 111 222 @@@", tx.quality_score(F.col("text")))
    assert 0.0 <= s_bad <= s_good <= 1.0


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", tx.fingerprint(F.col("text")))
    b = _one(spark, "gamma alpha beta, alpha!", tx.fingerprint(F.col("text")))
    c = _one(spark, "alpha beta delta", tx.fingerprint(F.col("text")))
    assert a == b  # same token set (punct stripped, dups dropped)
    assert a != c


def test_redact_pii_all_classes(spark):
    text = (
        "mail bob.smith+x@corp.example.org or 192.168.1.17, "
        "ssn 123-45-6789, phone 415-555-0199 done"
    )
    red = _one(spark, text, tx.redact_pii(F.col("text")))
    assert red == "mail <EMAIL> or <IP>, ssn <SSN>, phone <PHONE> done"


def test_redact_pii_order_ssn_before_phone(spark):
    # ddd-dd-dddd must land as SSN, not be half-eaten by the phone pattern
    assert _one(spark, "id 321-54-9876.", tx.redact_pii(F.col("text"))) == "id <SSN>."
    assert (
        _one(spark, "call 800-555-1234 now", tx.redact_pii(F.col("text")))
        == "call <PHONE> now"
    )


def test_redact_pii_noop_on_clean_text(spark):
    clean = "the quick brown fox jumps at 5 pm on street 12"
    assert _one(spark, clean, tx.redact_pii(F.col("text"))) == clean


def test_pii_counts(spark):
    text = "a@b.io c@d.io 1.2.3.4 999-88-7777"
    c = tx.pii_counts(F.col("text"))
    assert _one(spark, text, c["email"]) == 2
    assert _one(spark, text, c["ipv4"]) == 1
    assert _one(spark, text, c["ssn"]) == 1
    assert _one(spark, text, c["phone"]) == 0


def test_sql_surface_matches_column_api(spark, sf_dir):
    """Every registered SQL function must agree with its Column twin on
    real documents plus adversarial edge strings."""
    from pyspark.sql import functions as F

    from klio_spark.functions import text as T
    from klio_spark.functions.sql_surface import register_sql

    names = register_sql(spark)
    assert {
        "token_count", "bpe_token_count", "lang_id", "quality_score",
        "fingerprint", "redact_pii", "pii_count_email",
    } <= set(names)

    edge = spark.createDataFrame(
        [
            ("",),
            ("   ",),
            ("!!! ??? ... 123 456",),
            ("der hund und die katze nicht hier",),
            ("mail me at a.b+c@example.org or 555-12-3456 x 10.0.0.1",),
            ("the of and a to in is it " * 5,),
        ],
        ["text"],
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").limit(50)
    sample = edge.unionByName(docs)
    sample.createOrReplaceTempView("_sqlsurf")

    col = sample.select(
        T.token_count(F.col("text")).alias("tc"),
        T.bpe_token_count(F.col("text")).alias("bc"),
        T.lang_id(F.col("text")).alias("li"),
        F.round(T.quality_score(F.col("text")), 9).alias("qs"),
        T.fingerprint(F.col("text")).alias("fp"),
        T.redact_pii(F.col("text")).alias("rp"),
        T.pii_counts(F.col("text"))["email"].alias("pe"),
    ).collect()
    sql = spark.sql(
        """
        SELECT token_count(text) tc, bpe_token_count(text) bc,
               lang_id(text) li, round(quality_score(text), 9) qs,
               fingerprint(text) fp, redact_pii(text) rp,
               pii_count_email(text) pe
        FROM _sqlsurf
        """
    ).collect()
    assert [tuple(r) for r in col] == [tuple(r) for r in sql]


def test_sql_surface_functions_inline_into_codegen(spark):
    """SQL UDFs are macros: a quality_score filter must stay JVM-side
    (no Python eval) and remain a plain Filter over the scan."""
    from klio_spark.functions.sql_surface import register_sql

    register_sql(spark)
    spark.range(1).selectExpr("'x' AS text").createOrReplaceTempView("_one")
    df = spark.sql("SELECT text FROM _one WHERE quality_score(text) > 0.5")
    from klio_spark import plans

    assert "EvalPython" not in plans.plan_str(df)
