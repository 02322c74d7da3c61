"""Corpus-curation operators: PII redaction, quality-filter chains,
sliding-window chunking, LM rarity scoring, TF-IDF salient terms.

The document-level stages a pretraining pipeline runs between raw crawl
and tokenization: scrub PII, drop junk docs with an auditable reason,
cut long docs into model-window chunks, score rarity against a corpus
language model (the CCNet trick, with a unigram stand-in), and surface
each source's distinctive vocabulary. All pure Catalyst expressions —
the only Python is plan construction.

Cross-engine determinism (see klio_spark.queries module doc): ratio
thresholds are integer cross-multiplications (50*n_stop < n_tokens, not
n_stop/n_tokens < 0.02); log weights are integerized per DISTINCT token
(floor at 1e6) before any per-doc multiply/sum, so every aggregate is
exact integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.functions import text as tx
from klio_spark.queries import load, register, scoped_persist

# Deterministic pseudo-PII injection: the synthetic corpus is PII-free
# word salad, so a redaction query over raw text would verify nothing
# but zeros. Both engines append the same markers to the same docs
# (keyed on doc_id), so every count and redacted-length below is a real
# differential check of the regex machinery.
_EMAIL_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'"
)
_PHONE_SQL = "' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"


@register(
    "q93_pii_redaction",
    f"""
    WITH aug AS (
      SELECT source,
             text || CASE WHEN doc_id % 5 = 0 THEN {_EMAIL_SQL} ELSE '' END
                  || CASE WHEN doc_id % 7 = 0 THEN {_PHONE_SQL} ELSE '' END
               AS t
      FROM documents
    ),
    red AS (
      SELECT source,
             LEN(regexp_extract_all(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
             LEN(regexp_extract_all(t, '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS n_phone,
             LENGTH(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(t,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                       '<EMAIL>', 'g'),
                     '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
                     '<IP>', 'g'),
                   '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
                 '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g')) AS red_len
      FROM aug
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(red_len) AS BIGINT) AS sum_redacted_chars
    FROM red GROUP BY source
    """,
    doc="PII redaction (functions/text.redact_pii: email/IP/SSN/phone "
    "class tags, fixed pattern order): per-source counts of scrubbed "
    "items plus redacted-text length as the differential signal. The "
    "corpus is synthetic word salad, so deterministic pseudo-PII markers "
    "are injected keyed on doc_id — identically on both engines — to "
    "exercise every pattern. All JVM regexp in one codegen stage; the "
    "single shuffle is the per-source agg of four integers.",
)
def q93_pii_redaction(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" call 555-867-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    t = d.select("source", aug.alias("t"))
    counts = tx.pii_counts(F.col("t"))
    red = t.select(
        "source",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        F.length(tx.redact_pii(F.col("t"))).alias("red_len"),
    )
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_emails"),
        F.sum("n_phone").cast("bigint").alias("n_phones"),
        F.sum("red_len").cast("bigint").alias("sum_redacted_chars"),
    )


@register(
    "q94_quality_filter",
    """
    WITH t AS (
      SELECT source,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '')) AS nt,
             len(list_distinct(list_filter(string_split_regex(lower(text),
                             '\\s+'), x -> x != ''))) AS nd,
             LEN(list_filter(regexp_extract_all(lower(text), '\\S+'),
                 t -> list_contains(['the','a','an','of','and','or','to',
                                     'in','is','it'], t))) AS n_stop
      FROM documents
    ),
    v AS (
      SELECT source, nt,
             CASE WHEN nt < 30 THEN 'too_short'
                  WHEN nt > 85 THEN 'too_long'
                  WHEN 50 * n_stop < nt THEN 'no_stopwords'
                  WHEN 100 * nd < 35 * nt THEN 'repetitive'
                  ELSE 'kept' END AS verdict
      FROM t
    )
    SELECT source, verdict, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS sum_tokens
    FROM v GROUP BY source, verdict
    """,
    doc="C4/Gopher-style quality-filter chain with auditable drop "
    "reasons: length bounds, stopword floor, distinct-token repetition "
    "cut — first failing rule wins, so every doc lands in exactly one "
    "verdict bucket and the per-source kept/dropped ledger is "
    "reconstructible. Thresholds are integer cross-multiplications "
    "(50*n_stop < nt, 100*nd < 35*nt), never float ratios. One codegen "
    "scan + one agg shuffle of integers.",
)
def q94_quality_filter(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    t = d.select(
        "source",
        F.size(toks).alias("nt"),
        F.size(F.array_distinct(toks)).alias("nd"),
        F.size(
            F.filter(toks, lambda x: x.isin(*tx.EN_STOPWORDS))
        ).alias("n_stop"),
    )
    verdict = (
        F.when(F.col("nt") < 30, "too_short")
        .when(F.col("nt") > 85, "too_long")
        .when(50 * F.col("n_stop") < F.col("nt"), "no_stopwords")
        .when(100 * F.col("nd") < 35 * F.col("nt"), "repetitive")
        .otherwise("kept")
    )
    return (
        t.select("source", "nt", verdict.alias("verdict"))
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("sum_tokens"),
        )
    )


@register(
    "q95_doc_chunking",
    """
    WITH t AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '')) AS nt
      FROM documents
    ),
    ch AS (
      SELECT doc_id, source, nt, unnest(range(1, nt + 1, 16)) AS start
      FROM t WHERE nt > 0
    )
    SELECT doc_id, source, CAST(MIN(nt) AS BIGINT) AS nt,
           COUNT(*) AS n_chunks,
           CAST(SUM(LEAST(32, nt - start + 1)) AS BIGINT) AS sum_chunk_tokens,
           CAST(SUM(CASE WHEN nt - start + 1 >= 32 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_full
    FROM ch GROUP BY doc_id, source
    """,
    doc="sliding-window chunking (window 32 tokens, stride 16 — the "
    "context-window carve-up step before tokenization): chunk starts are "
    "generated with sequence()+explode and each chunk reports its clipped "
    "length, so downstream token budgets are exact. The explode fans out "
    "~nt/stride small integer rows per doc — never the text itself — and "
    "collapses in the same stage's hash agg keyed by doc_id.",
)
def q95_doc_chunking(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(tx.tokens(F.lower(F.col("text")))).alias("nt")
    ).filter(F.col("nt") > 0)
    ch = t.select(
        "doc_id",
        "source",
        "nt",
        F.explode(F.sequence(F.lit(1), F.col("nt"), F.lit(16))).alias("start"),
    )
    clen = F.least(F.lit(32), F.col("nt") - F.col("start") + 1)
    return ch.groupBy("doc_id", "source").agg(
        F.min("nt").cast("bigint").alias("nt"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(clen).cast("bigint").alias("sum_chunk_tokens"),
        F.sum((F.col("nt") - F.col("start") + 1 >= 32).cast("int"))
        .cast("bigint")
        .alias("n_full"),
    )


@register(
    "q96_lm_rarity_score",
    """
    WITH t AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    dc AS (SELECT source, doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
    vocab AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cnt FROM dc GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    w AS (
      SELECT tok,
             CAST(FLOOR(1000000.0 *
                  ln(CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE))) AS BIGINT)
               AS iw
      FROM vocab CROSS JOIN tot
    ),
    per AS (
      SELECT dc.source, dc.doc_id,
             CAST(SUM(dc.c * w.iw) AS BIGINT) AS s,
             CAST(SUM(dc.c) AS BIGINT) AS nt
      FROM dc JOIN w USING (tok)
      GROUP BY 1, 2
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(s) AS BIGINT) AS sum_ilogp,
           CAST(SUM(s // nt) AS BIGINT) AS sum_avg_ilogp
    FROM per GROUP BY source
    """,
    doc="LM rarity scoring (CCNet-style quality signal, unigram LM "
    "stand-in): every token's -ln p under the corpus unigram model, "
    "integerized at 1e6 per DISTINCT vocab entry — so per-doc sums are "
    "exact integer arithmetic regardless of token order or partition "
    "count. The vocab+weight table is tiny at any corpus size (it grows "
    "with the lexicon, not the corpus) and joins back as a BROADCAST; "
    "the corpus-side plan is explode → two hash aggs with map-side "
    "partial combine.",
)
def q96_lm_rarity_score(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok"),
    )
    dc = t.groupBy("source", "doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = dc.groupBy("tok").agg(F.sum("c").cast("bigint").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").cast("bigint").alias("total"))
    w = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            F.lit(1000000.0)
            * F.log(F.col("total").cast("double") / F.col("cnt").cast("double"))
        )
        .cast("bigint")
        .alias("iw"),
    )
    per = (
        dc.join(F.broadcast(w), "tok")
        .groupBy("source", "doc_id")
        .agg(
            F.sum(F.col("c") * F.col("iw")).cast("bigint").alias("s"),
            F.sum("c").cast("bigint").alias("nt"),
        )
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("s").cast("bigint").alias("sum_ilogp"),
        F.sum(F.expr("s div nt")).cast("bigint").alias("sum_avg_ilogp"),
    )


@register(
    "q97_tfidf_top_terms",
    """
    WITH t AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    c AS (SELECT source, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(*) AS df FROM c GROUP BY tok),
    ns AS (SELECT COUNT(DISTINCT source) AS n_src FROM c),
    w AS (
      SELECT tok,
             CAST(FLOOR(1000000.0 * ln((1.0 + n_src) / (1.0 + df)))
                  AS BIGINT) + 1000000 AS iw
      FROM df CROSS JOIN ns
    ),
    scored AS (
      SELECT c.source, c.tok, CAST(c.tf * w.iw AS BIGINT) AS score,
             ROW_NUMBER() OVER (PARTITION BY c.source
                                ORDER BY c.tf * w.iw DESC, c.tok ASC) AS rank
      FROM c JOIN w USING (tok)
    )
    SELECT source, CAST(rank AS BIGINT) AS rank, tok, score
    FROM scored WHERE rank <= 3
    """,
    doc="TF-IDF salient terms per source (source-level documents): tf × "
    "smoothed-idf with the idf weight integerized per DISTINCT token "
    "before the multiply, ranked count-desc/token-asc. The df/idf table "
    "is lexicon-sized → broadcast; the top-3 window runs as "
    "WindowGroupLimit over the (source, tok) agg — the same shape as "
    "q89 but keyed on a corpus-statistics join rather than raw counts.",
)
def q97_tfidf_top_terms(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "source", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    c = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = c.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ns = c.agg(F.countDistinct("source").alias("n_src"))
    w = df.crossJoin(F.broadcast(ns)).select(
        "tok",
        (
            F.floor(
                F.lit(1000000.0)
                * F.log((1.0 + F.col("n_src")) / (1.0 + F.col("df")))
            ).cast("bigint")
            + 1000000
        ).alias("iw"),
    )
    scored = c.join(F.broadcast(w), "tok").select(
        "source", "tok", (F.col("tf") * F.col("iw")).cast("bigint").alias("score")
    )
    win = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("source", "rank", "tok", "score")
    )


# BM25 constants as exact rationals: k1 = 6/5, b = 3/4. The tf-saturation
# term tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) becomes, after multiplying
# through by 20*1e3 and substituting the integerized length norm
# ndl = (1e6*dl) div (tt div n)  (avgdl floored to an integer — the same
# deterministic-in-both-engines rounding as every other integerized
# weight here):
#   s = (44*tf*1e9) div (20000*tf + 6000 + (18*ndl) div 1000)  [scale 1e6]
# so every per-doc quantity is exact int64 arithmetic in both engines;
# only the per-TERM idf touches a float (ln), integerized once per
# distinct term exactly like q96/q97 weights. Intermediates are bounded
# by construction: tf clamps at 2^20 (the saturation curve is within
# 1e-5 of its k1+1 limit there) and ndl at 1e12 (a doc a million times
# longer than average — the length penalty is saturated), so nothing
# can overflow int64 at any corpus size — without the clamps a
# degenerate 200k-repetition doc would overflow, raising in DuckDB but
# silently wrapping in non-ANSI Spark.
_BM25_TERMS = ("value", "data", "system", "random")


@register(
    "q135_bm25_topk",
    f"""
    WITH t AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
    corp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM t
      WHERE tok IN {str(tuple(_BM25_TERMS))} GROUP BY doc_id, tok
    ),
    idf AS (
      SELECT tok,
             CAST(FLOOR(1000000.0 * ln(1.0 +
                  (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))) AS BIGINT)
               AS iw
      FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok)
           CROSS JOIN corp
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(iw *
                  ((44 * tfc * 1000000000)
                   // (20000 * tfc + 6000 + (18 * ndl) // 1000)))
                  AS BIGINT) AS score
      FROM (
        SELECT tf.doc_id, idf.iw,
               LEAST(tf.tf, 1048576) AS tfc,
               LEAST((1000000 * dl.dl) // GREATEST(corp.tt // corp.n, 1),
                     1000000000000) AS ndl
        FROM tf
        JOIN dl USING (doc_id)
        JOIN idf USING (tok)
        CROSS JOIN corp
      )
      GROUP BY doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, score
    FROM scored
    ORDER BY rank LIMIT 10
    """,
    doc="BM25 top-10 retrieval for a fixed query-term set (k1=1.2, "
    "b=0.75): the classic probabilistic ranking function, computed with "
    "exact integer arithmetic — idf integerized per DISTINCT term (the "
    "q96/q97 trick), avgdl floored to an integer, and the "
    "tf-saturation/length-normalization fraction evaluated with clamped "
    "int64-bounded intermediates (nothing per-doc ever touches a "
    "float), so ranks are bit-identical across engines, partitionings, "
    "and corpus sizes — no overflow at any scale. Plan: one tokenize "
    "pass feeds both the doc-length agg and the term-filtered tf agg; "
    "corpus stats and the idf table are single-row/term-count "
    "broadcasts; the top-10 is a window limit over the per-doc agg.",
)
def q135_bm25_topk(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    dl = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corp = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("tt"),
    )
    tf = (
        t.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(corp))
        .select(
            "tok",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    1.0
                    + (F.col("n").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
            )
            .cast("bigint")
            .alias("iw"),
        )
    )
    ndl = F.expr(
        "least((1000000 * dl) div greatest(tt div n, 1), 1000000000000)"
    )
    sat = F.expr(
        "(44 * least(tf, 1048576) * 1000000000) div "
        "(20000 * least(tf, 1048576) + 6000 + (18 * _ndl) div 1000)"
    )
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .withColumn("_ndl", ndl)
        .join(F.broadcast(idf), "tok")
        .withColumn("_s", sat)
        .groupBy("doc_id")
        .agg(F.sum(F.col("iw") * F.col("_s")).cast("bigint").alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("rank", "doc_id", "score")
    )


@register(
    "q138_vocab_coverage",
    """
    WITH t AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
    vocab AS (SELECT tok FROM cnt ORDER BY c DESC, tok LIMIT 1000)
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           CAST((10000 * SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS oov_bp
    FROM t LEFT JOIN vocab v USING (tok)
    GROUP BY t.source
    """,
    doc="tokenizer-fit metric: fix the vocabulary at the corpus top-1000 "
    "tokens (count desc, token asc — fully deterministic ties) and "
    "report each source's out-of-vocabulary token rate in integer basis "
    "points. The vocab is vocabulary-sized, never corpus-sized, so it "
    "rides a TakeOrdered + broadcast left join; the corpus side is one "
    "explode + hash agg with map-side combine. The production question "
    "it answers: which source will blow up token counts under a "
    "tokenizer fit on the overall mix.",
)
def q138_vocab_coverage(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "source", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    cnt = t.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        cnt.orderBy(F.desc("c"), F.asc("tok"))
        .limit(1000)
        .select("tok", F.lit(1).alias("_iv"))
    )
    return (
        t.join(F.broadcast(vocab), "tok", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
            F.sum(F.col("_iv").isNull().cast("int"))
            .cast("bigint")
            .alias("oov_tokens"),
            F.expr("(10000 * sum(cast(_iv is null as int))) div count(1)")
            .cast("bigint")
            .alias("oov_bp"),
        )
    )


@register(
    "q141_bigram_lm_score",
    r"""
    WITH tk AS (
      SELECT source, doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    t AS (
      SELECT source, doc_id,
             unnest([toks[i] || ' ' || toks[i+1]
                     FOR i IN range(1, len(toks))]) AS bg
      FROM tk
    ),
    dc AS (SELECT source, doc_id, bg, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
    bgc AS (SELECT bg, CAST(SUM(c) AS BIGINT) AS cnt FROM dc GROUP BY bg),
    m AS (SELECT split_part(bg, ' ', 1) AS w1,
                 CAST(SUM(cnt) AS BIGINT) AS tot1
          FROM bgc GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT split_part(bg, ' ', 2)) AS vsz FROM bgc),
    w AS (
      SELECT bg,
             CAST(FLOOR(1000000.0 * ln(
                  (CAST(tot1 AS DOUBLE) + vsz) / (CAST(cnt AS DOUBLE) + 1.0)))
                  AS BIGINT) AS iw
      FROM bgc JOIN m ON split_part(bgc.bg, ' ', 1) = m.w1 CROSS JOIN v
    ),
    per AS (
      SELECT dc.source, dc.doc_id,
             CAST(SUM(dc.c * w.iw) AS BIGINT) AS s,
             CAST(SUM(dc.c) AS BIGINT) AS nt
      FROM dc JOIN w USING (bg) GROUP BY 1, 2
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(s) AS BIGINT) AS sum_inll,
           CAST(SUM(s // nt) AS BIGINT) AS sum_avg_inll
    FROM per GROUP BY source
    """,
    doc="bigram-LM fluency scoring (the conditional upgrade of q96's "
    "unigram rarity — CCNet's quality signal with one token of context): "
    "every in-order bigram scores -ln P(w2|w1) under the corpus bigram "
    "model with add-one smoothing over the second-token vocabulary, "
    "P = (c(w1,w2)+1)/(c(w1,·)+V). The weight is integerized at 1e6 per "
    "DISTINCT bigram type, so per-doc sums are exact integer arithmetic "
    "in any partition/order; iw ≥ 0 by construction (c(w1,w2) ≤ c(w1,·), "
    "V ≥ 1), so Spark's truncating div and DuckDB's floor-div agree. The "
    "corpus-side plan is one ordered-bigram explode (zip of adjacent "
    "tokens — no self-join) + hash aggs; the weight table grows with the "
    "bigram LEXICON, not the corpus, and rejoins WITHOUT a broadcast hint "
    "— a web-scale bigram vocabulary outgrows broadcast, so AQE picks the "
    "strategy per run. Docs with <2 tokens carry no bigram evidence and "
    "drop out of the per-doc stage in both engines.",
)
def q141_bigram_lm_score(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = (
        d.select("source", "doc_id", "text")
        .withColumn("_toks", tx.tokens(F.lower(F.col("text"))))
        .select(
            "source",
            "doc_id",
            F.explode(
                F.when(
                    F.size("_toks") >= 2,
                    F.expr(
                        "transform(sequence(1, size(_toks) - 1), "
                        "i -> concat(_toks[i-1], ' ', _toks[i]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bg"),
        )
    )
    # measured (interleaved A/B at sf0.1): persisting dc/bgc here LOSES
    # ~0.3-0.5 s — the bigram branches are cheap enough that cache
    # write+read costs more than the recompute, unlike q266's wider
    # five-consumer trigram lexicon
    dc = t.groupBy("source", "doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    bgc = dc.groupBy("bg").agg(F.sum("c").cast("bigint").alias("cnt"))
    w1 = F.split(F.col("bg"), " ", 2)[0]
    # per-w1 totals as a map-side-combined marginal agg joined back, NOT
    # the q266 window lever: the window form exchanges+sorts the WHOLE
    # bigram table by w1, where this groupBy shrinks to distinct-w1 rows
    # map-side and joins back (broadcast under AQE at bench scale; the
    # join stays unhinted for web-scale vocabularies). Measured
    # (interleaved worktree
    # A/B at sf0.1, 4 alternating rounds): join form 1.43-1.70 s vs
    # window form 1.51-1.98 s — the join wins every round here, the
    # OPPOSITE of q266, whose cached five-consumer lexicon pays 4 join
    # waves and keeps the window form on the same measurement protocol.
    m = bgc.groupBy(w1.alias("w1")).agg(
        F.sum("cnt").cast("bigint").alias("tot1")
    )
    v = bgc.agg(
        F.countDistinct(F.split(F.col("bg"), " ", 2)[1]).alias("vsz")
    )
    w = (
        bgc.join(m, w1 == m["w1"])
        .crossJoin(F.broadcast(v))
        .select(
            "bg",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    (F.col("tot1").cast("double") + F.col("vsz"))
                    / (F.col("cnt").cast("double") + 1.0)
                )
            )
            .cast("bigint")
            .alias("iw"),
        )
    )
    per = (
        dc.join(w, "bg")
        .groupBy("source", "doc_id")
        .agg(
            F.sum(F.col("c") * F.col("iw")).cast("bigint").alias("s"),
            F.sum("c").cast("bigint").alias("nt"),
        )
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("s").cast("bigint").alias("sum_inll"),
        F.sum(F.expr("s div nt")).cast("bigint").alias("sum_avg_inll"),
    )


_Q144_TERMS = ("data", "value")  # co-occur at every test sf → non-empty top-10


@register(
    "q144_inverted_index_topk",
    rf"""
    WITH t AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    p AS (SELECT tok, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    q AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score,
             COUNT(DISTINCT tok) AS nt
      FROM p WHERE tok IN {_Q144_TERMS!r} GROUP BY doc_id
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank,
           doc_id, score
    FROM q WHERE nt = 2
    ORDER BY score DESC, doc_id LIMIT 10
    """,
    doc="build-once/query-many text retrieval (the q129/IVF "
    "materialization pattern applied to keyword search): the postings "
    "table (tok, doc_id, tf) is WRITTEN bucketed by token "
    "(plans.partitioning.overwrite_bucketed_table), and the conjunctive "
    "query ('data' AND 'value', tf-sum ranking, top-10) runs entirely "
    "against the index read-back — the documents table is scanned once "
    "at build, never at query time, and the IN-filter on the bucket "
    "column prunes the scan to the matching buckets. AND semantics = "
    "distinct-term count equals the query arity; ranking is exact "
    "integer tf sums with doc_id tie-break. The oracle recomputes the "
    "same answer from raw documents, so a hash match proves the "
    "persisted index loses nothing. BM25 weighting of the same postings "
    "is q135's claim; this row owns the index lifecycle.",
)
def q144_inverted_index_topk(spark: SparkSession, sf_dir: str):
    from klio_spark.plans.partitioning import (
        overwrite_bucketed_table,
        session_table_name,
    )

    (d,) = load(spark, sf_dir, "documents")
    postings = (
        d.select(
            "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # session-scoped name: concurrent sessions sharing a warehouse must
    # not DROP each other's index out from under a running query
    idx = overwrite_bucketed_table(
        postings, session_table_name(spark, "q144_inv_index"), "tok", buckets=8
    )
    hits = (
        idx.filter(F.col("tok").isin(*_Q144_TERMS))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("score"),
            F.countDistinct("tok").alias("_nt"),
        )
        .filter(F.col("_nt") == len(_Q144_TERMS))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("rank", "doc_id", "score")
    )


@register(
    "q153_weighted_sample",
    """
    WITH d AS (
      SELECT doc_id, source, n_chars FROM documents WHERE n_chars > 0
    ),
    w AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM d
    ),
    tot AS (SELECT source, SUM(n_chars) AS wtot FROM d GROUP BY source),
    picks AS (
      SELECT source, j, (j * wtot) // 5 AS p
      FROM tot CROSS JOIN (SELECT UNNEST([0, 1, 2, 3, 4]) AS j)
    )
    SELECT p.source, CAST(p.j AS BIGINT) AS slot, w.doc_id,
           CAST(w.n_chars AS BIGINT) AS n_chars
    FROM picks p JOIN w ON w.source = p.source
    WHERE p.p >= w.cum - w.n_chars AND p.p < w.cum
    """,
    doc="length-weighted systematic sample, 5 docs per source: positions "
    "j*W/5 (exact integer arithmetic) land in the per-source cumulative-"
    "weight ladder, selecting each doc with probability proportional to "
    "n_chars — the training-mixture sampler that needs NO random numbers "
    "and NO libm (exponential-key A-ES would hinge on cross-engine "
    "ln/pow ULP agreement; integer systematic sampling is bit-exact and "
    "replay-stable by construction). One window cumsum per source (the "
    "same source exchange the mixture queries reuse), a ≤5×|sources| "
    "pick table broadcast back, and the range test is a map-side filter "
    "— no fact-side shuffle beyond the cumsum at any corpus size. "
    "Selection is doc_id-order canonical, so corpus re-partitioning "
    "cannot change the sample.",
)
def q153_weighted_sample(spark: SparkSession, sf_dir: str):
    (doc,) = load(spark, sf_dir, "documents")
    d = doc.filter(F.col("n_chars") > 0).select("doc_id", "source", "n_chars")
    w = d.withColumn(
        "cum",
        F.sum("n_chars").over(
            Window.partitionBy("source").orderBy("doc_id")
        ),
    )
    tot = d.groupBy("source").agg(F.sum("n_chars").alias("wtot"))
    picks = tot.select(
        "source",
        F.explode(F.expr("sequence(0, 4)")).alias("j"),
        "wtot",
    ).select("source", "j", F.expr("(j * wtot) div 5").alias("p"))
    return (
        w.join(F.broadcast(picks), "source")
        .filter(
            (F.col("p") >= F.col("cum") - F.col("n_chars"))
            & (F.col("p") < F.col("cum"))
        )
        .select(
            "source",
            F.col("j").cast("bigint").alias("slot"),
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
        )
    )


@register(
    "q196_curriculum_phases",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '')) AS n_tokens
      FROM documents WHERE text IS NOT NULL
    ),
    p AS (
      SELECT doc_id, n_tokens,
             NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS phase
      FROM t
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM p GROUP BY 1
    """,
    doc="sequence-length curriculum phases — exact global NTILE(4) over "
    "(n_tokens, doc_id) WITHOUT a single-partition global sort. A plain "
    "Window.orderBy ntile funnels the whole corpus through ONE task "
    "(the classic 100 TB straggler); here the exact global rank "
    "decomposes into prefix + intra-value: (1) a histogram of distinct "
    "n_tokens VALUES (vocabulary-tiny vs the corpus) carries a running "
    "count, broadcast back; (2) each row's rank = its value's prefix + "
    "row_number within the value partition (ordered by doc_id — a "
    "PARALLEL window, one key per distinct length). Phase boundaries "
    "replay NTILE's first-(n mod k)-buckets-get-one-extra rule in "
    "integer arithmetic, so the result is cell-identical to the "
    "oracle's naive global NTILE — proven by the hash check. sum_ids "
    "pins the exact per-phase membership, not just the counts.",
)
def q196_curriculum_phases(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    k = 4
    t = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(tx.tokens(F.lower(F.col("text")))).alias("n_tokens")
    )
    # value histogram: one row per DISTINCT token count — tiny table
    hist = t.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("cnt"))
    wh = Window.orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefix = hist.select(
        "n_tokens",
        (F.sum("cnt").over(wh) - F.col("cnt")).alias("prefix"),
        F.sum("cnt").over(
            Window.orderBy("n_tokens").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_total"),
    )
    # per-row exact global rank: prefix(value) + intra-value row_number
    wv = Window.partitionBy("n_tokens").orderBy("doc_id")
    ranked = t.join(F.broadcast(prefix), "n_tokens").select(
        "doc_id", "n_tokens", "n_total",
        (F.col("prefix") + F.row_number().over(wv)).alias("rank"),
    )
    # NTILE(k): first (n mod k) phases hold (n div k)+1 rows each
    q_, r_ = f"(n_total div {k})", f"(n_total % {k})"
    phase = F.expr(
        f"CASE WHEN rank <= ({q_} + 1) * {r_}"
        f" THEN 1 + (rank - 1) div ({q_} + 1)"
        f" ELSE {r_} + 1 + (rank - 1 - ({q_} + 1) * {r_}) div {q_} END"
    )
    return (
        ranked.select("doc_id", "n_tokens", phase.alias("phase"))
        .groupBy(F.col("phase").cast("bigint").alias("phase"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("phase_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
    )


@register(
    "q205_dsir_selection",
    """
    WITH toks AS (
      SELECT d.doc_id, d.source, lower(t.w) AS w,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM documents d,
           unnest(string_split_regex(d.text, '\\s+')) AS t(w)
      WHERE d.text IS NOT NULL AND t.w <> ''
      GROUP BY 1, 2, 3
    ),
    vocab AS (
      SELECT w, SUM(k) AS cnt_b,
             SUM(CASE WHEN source = 'src0' THEN k ELSE 0 END) AS cnt_t
      FROM toks GROUP BY 1
    ),
    tot AS (
      SELECT SUM(cnt_b) AS n_b, SUM(cnt_t) AS n_t, COUNT(*) AS v
      FROM vocab
    ),
    r AS (
      SELECT w,
             CAST((CAST(cnt_t + 1 AS HUGEINT) * (n_b + v) * 1000000)
                  // (CAST(cnt_b + 1 AS HUGEINT) * (n_t + v))
                  AS BIGINT) AS r_ppm
      FROM vocab, tot
    )
    SELECT doc_id, n_tokens, score_ppm FROM (
      SELECT t.doc_id,
             CAST(SUM(t.k) AS BIGINT) AS n_tokens,
             CAST(SUM(t.k * r.r_ppm) // SUM(t.k) AS BIGINT) AS score_ppm
      FROM toks t JOIN r USING (w)
      GROUP BY 1
    )
    ORDER BY score_ppm DESC, doc_id
    LIMIT 20
    """,
    doc="importance-weighted data selection (the DSIR shape — Xie et "
    "al. 2023: rank raw-pool documents by how target-like their "
    "n-gram distribution is; the data-selection pass between crawl "
    "and training mix): per word, a Laplace-smoothed target/background "
    "likelihood ratio in exact integer ppm — (cnt_t+1)(N_b+V)·1e6 // "
    "(cnt_b+1)(N_t+V), target = source 'src0', background = the whole "
    "pool — and per doc the k-weighted mean ratio over its tokens; "
    "top-20 by (score desc, doc_id). The ratio numerator runs in "
    "decimal(38,0)/HUGEINT (the q190 trick: cnt·N·1e6 passes 2^63 once "
    "cnt_t·N_b > ~9e12 — real at 100 TB); the per-doc sum stays int64 "
    "(k·r_ppm ≤ ~1e11 per row at any realistic doc length). An EMPTY "
    "target (corpora without src0) degrades to a pure rarity score "
    "1e6//(cnt_b+1) — deterministic on both engines, exercised by the "
    "random differential corpus. Scale shape: one (doc, word) agg and "
    "one word agg (both map-side-combinable); the ratio table is "
    "vocabulary-sized and joins word-keyed (AQE broadcasts when "
    "small); totals ride an in-plan 1-row broadcast, never the driver.",
)
def q205_dsir_selection(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    toks = (
        d.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.explode(tx.tokens(F.lower(F.col("text")))).alias("w"),
        )
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    vocab = toks.groupBy("w").agg(
        F.sum("k").alias("cnt_b"),
        F.sum(F.when(F.col("source") == "src0", F.col("k")).otherwise(0)).alias(
            "cnt_t"
        ),
    )
    tot = vocab.agg(
        F.sum("cnt_b").alias("n_b"),
        F.sum("cnt_t").alias("n_t"),
        F.count(F.lit(1)).alias("v"),
    )
    r = (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "w",
            F.expr(
                "CAST((CAST(cnt_t + 1 AS DECIMAL(38,0)) * (n_b + v) * 1000000)"
                " div (CAST(cnt_b + 1 AS DECIMAL(38,0)) * (n_t + v))"
                " AS BIGINT)"
            ).alias("r_ppm"),
        )
    )
    return (
        toks.join(r, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.expr("CAST(SUM(k * r_ppm) div SUM(k) AS BIGINT)").alias(
                "score_ppm"
            ),
        )
        .orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "n_tokens", "score_ppm")
    )


# -- round 10: governance growth (VERDICT r9 item 2) -----------------------

# q264's extended class list: q93's four classes + credit-card numbers.
# Kept SEPARATE from text.PII_PATTERNS so q93's shipped semantics (and
# its inline oracle SQL) stay byte-stable. Applied in THIS order: email
# first (digit runs inside a local-part are consumed as email), card
# before ssn/phone (4-digit groups can never match the 3-digit-prefixed
# patterns, but the order makes the invariant structural, not
# incidental). Every pattern is RE2-safe — identical under Java regex
# (Spark codegen) and RE2 (DuckDB).
_AUDIT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("cc", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)

# Marker injection (the q93 convention, extended): the synthetic corpus
# is PII-free word salad, so both engines append identical markers to
# identical docs keyed on doc_id — every count and the redacted-text
# checksum below is a real differential check of the regex machinery.
_AUDIT_MARKS_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN ' call 555-867-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END || "
    "CASE WHEN doc_id % 11 = 0 THEN ' ssn "
    "' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END || "
    "CASE WHEN doc_id % 13 = 0 THEN ' from 10.'"
    " || CAST(doc_id % 250 AS VARCHAR) || '.'"
    " || CAST(doc_id % 241 AS VARCHAR) || '.'"
    " || CAST(doc_id % 233 AS VARCHAR) ELSE '' END || "
    "CASE WHEN doc_id % 17 = 0 THEN ' card '"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-'"
    " || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') || '-'"
    " || lpad(CAST((doc_id * 11) % 10000 AS VARCHAR), 4, '0') || '-'"
    " || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)

# DuckDB string literals are standard-SQL (no backslash escaping), so
# the regex source text embeds verbatim — the SAME pattern bytes Spark
# compiles.
_AUDIT_RED_SQL = "t"
for _name, _pat, _repl in _AUDIT_PATTERNS:
    _AUDIT_RED_SQL = (
        f"regexp_replace({_AUDIT_RED_SQL}, '{_pat}', '{_repl}', 'g')"
    )
_AUDIT_CNT_SQL = ", ".join(
    f"len(regexp_extract_all(t, '{p}')) AS n_{n}"
    for n, p, _ in _AUDIT_PATTERNS
)


@register(
    "q264_pii_audit",
    f"""
    WITH aug AS (
      SELECT source, text || {_AUDIT_MARKS_SQL} AS t FROM documents
    ),
    per AS (
      SELECT source, {_AUDIT_CNT_SQL},
             CAST(('0x' || substring(md5({_AUDIT_RED_SQL}), 1, 8)) AS BIGINT)
               AS csum
      FROM aug
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS n_email,
           CAST(SUM(n_ip) AS BIGINT) AS n_ip,
           CAST(SUM(n_cc) AS BIGINT) AS n_cc,
           CAST(SUM(n_ssn) AS BIGINT) AS n_ssn,
           CAST(SUM(n_phone) AS BIGINT) AS n_phone,
           CAST(SUM(CASE WHEN n_email + n_ip + n_cc + n_ssn + n_phone > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
           CAST(SUM(csum) AS BIGINT) AS redact_checksum
    FROM per GROUP BY source
    """,
    doc="PII detection/redaction AUDIT (the governance gap VERDICT r9 "
    "named): q93 reports counts and redacted length; auditors need "
    "proof the redacted BYTES are what the policy says. Five classes "
    "(q93's four + credit-card), per-source per-class counts, "
    "docs-with-any-PII, and a redacted-text checksum — the 32-bit md5 "
    "prefix of every redacted doc summed per source (the q86 "
    "'0x'-cast protocol; 2^32 max per doc so int64 holds to ~2.1e9 "
    "docs/source). Engines agree on the checksum only if redaction is "
    "byte-identical, so this is an md5 oracle over the ENTIRE "
    "redaction pipeline, not just match counts. All JVM regexp in one "
    "codegen stage; the single shuffle is the per-source agg of eight "
    "integers. Deterministic markers injected keyed on doc_id "
    "(q93's convention) exercise every class on both engines. "
    "Reference parity: the audit-log/governance family "
    "(lib/src/klio/transforms/helpers.py audit steps).",
)
def q264_pii_audit(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def _mark(mod: int, *parts):
        return F.when(did % mod == 0, F.concat(*parts)).otherwise(F.lit(""))

    def _pad(expr, n: int):
        return F.lpad(expr.cast("string"), n, "0")

    aug = F.concat(
        F.col("text"),
        _mark(
            5,
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@example.com now"),
        ),
        _mark(7, F.lit(" call 555-867-"), _pad(did % 10000, 4)),
        _mark(
            11,
            F.lit(" ssn "),
            _pad(did % 1000, 3),
            F.lit("-"),
            _pad(did % 100, 2),
            F.lit("-"),
            _pad(did % 10000, 4),
        ),
        _mark(
            13,
            F.lit(" from 10."),
            (did % 250).cast("string"),
            F.lit("."),
            (did % 241).cast("string"),
            F.lit("."),
            (did % 233).cast("string"),
        ),
        _mark(
            17,
            F.lit(" card "),
            _pad(did % 10000, 4),
            F.lit("-"),
            _pad((did * 7) % 10000, 4),
            F.lit("-"),
            _pad((did * 11) % 10000, 4),
            F.lit("-"),
            _pad((did * 13) % 10000, 4),
        ),
    )
    red = F.col("t")
    for _, pat, repl in _AUDIT_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    per = d.select("source", aug.alias("t")).select(
        "source",
        *[
            F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
            for name, pat, _ in _AUDIT_PATTERNS
        ],
        F.conv(F.substring(F.md5(red), 1, 8), 16, 10)
        .cast("bigint")
        .alias("csum"),
    )
    any_pii = (
        F.col("n_email") + F.col("n_ip") + F.col("n_cc")
        + F.col("n_ssn") + F.col("n_phone")
        > 0
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("n_email"),
        F.sum("n_ip").cast("bigint").alias("n_ip"),
        F.sum("n_cc").cast("bigint").alias("n_cc"),
        F.sum("n_ssn").cast("bigint").alias("n_ssn"),
        F.sum("n_phone").cast("bigint").alias("n_phone"),
        F.sum(any_pii.cast("long")).cast("bigint").alias("n_docs_with_pii"),
        F.sum("csum").cast("bigint").alias("redact_checksum"),
    )


# The JM interpolated-probability expression, in ONE shared textual form
# (q257's identical-Horner discipline): both engines parse this exact
# arithmetic, so the IEEE result is bit-identical before the floor.
_Q266_P_SQL = (
    "0.6 * CAST(c123 AS DOUBLE) / CAST(c12 AS DOUBLE)"
    " + 0.3 * CAST(c23 AS DOUBLE) / CAST(c2 AS DOUBLE)"
    " + 0.1 * CAST(c3 AS DOUBLE) / CAST(nn AS DOUBLE)"
)


@register(
    "q266_trigram_lm",
    rf"""
    WITH tk AS (
      SELECT source, doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    t AS (
      SELECT source, doc_id,
             unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     FOR i IN range(1, len(toks) - 1)]) AS tg
      FROM tk
    ),
    dc AS (SELECT source, doc_id, tg, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
    tgc AS (
      SELECT tg, split_part(tg, ' ', 1) AS w1, split_part(tg, ' ', 2) AS w2,
             split_part(tg, ' ', 3) AS w3, CAST(SUM(c) AS BIGINT) AS c123
      FROM dc GROUP BY 1, 2, 3, 4
    ),
    a12 AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12
            FROM tgc GROUP BY 1, 2),
    a23 AS (SELECT w2, w3, CAST(SUM(c123) AS BIGINT) AS c23
            FROM tgc GROUP BY 1, 2),
    a2 AS (SELECT w2, CAST(SUM(c123) AS BIGINT) AS c2 FROM tgc GROUP BY 1),
    a3 AS (SELECT w3, CAST(SUM(c123) AS BIGINT) AS c3 FROM tgc GROUP BY 1),
    nt AS (SELECT CAST(SUM(c123) AS BIGINT) AS nn FROM tgc),
    w AS (
      SELECT tg,
             CAST(FLOOR(-1000000.0 * ln({_Q266_P_SQL})) AS BIGINT) AS iw
      FROM tgc JOIN a12 USING (w1, w2) JOIN a23 USING (w2, w3)
               JOIN a2 USING (w2) JOIN a3 USING (w3) CROSS JOIN nt
    ),
    per AS (
      SELECT dc.source, dc.doc_id,
             CAST(SUM(dc.c * w.iw) AS BIGINT) AS s,
             CAST(SUM(dc.c) AS BIGINT) AS ntg
      FROM dc JOIN w USING (tg) GROUP BY 1, 2
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(s) AS BIGINT) AS sum_inll,
           CAST(SUM(s // ntg) AS BIGINT) AS sum_avg_inll
    FROM per GROUP BY source
    """,
    doc="interpolated trigram LM scoring (VERDICT r9's named gap: "
    "q141's bigram -> Jelinek-Mercer with two tokens of context — the "
    "standard perplexity-filter shape): every trigram instance scores "
    "-ln P_JM(w3|w1,w2) with P_JM = 0.6*c123/c12 + 0.3*c23/c2 + "
    "0.1*c3/N, all counts conditioned on TRIGRAM POSITIONS (prefix/"
    "suffix/third-word marginals of one trigram table — "
    "self-consistent, one explode feeds the whole model; every scored "
    "trigram is observed, so P > 0 without out-of-vocab smoothing). "
    "The weight integerizes at 1e6 per DISTINCT trigram type via the "
    "shared-textual-form IEEE expression (q257's identical-Horner "
    "discipline), so per-doc sums are exact integers in any partition "
    "order; iw >= 0 since P <= 1 by convexity. Plan: one adjacent-zip "
    "explode (no self-join) + hash aggs; the model tables grow with "
    "the trigram LEXICON, not the corpus, and rejoin without broadcast "
    "hints (web-scale trigram vocabularies outgrow broadcast — AQE "
    "picks per run). Docs with <3 tokens carry no trigram and drop on "
    "both engines. int64 envelope: sum_inll needs per-source trigram "
    "instances x max iw < 9.2e18 — with iw <= 1e6*ln(10N) ~ 3.5e7 at "
    "N = 1e15 that is ~2.6e11 trigrams/source; past that, swap the two "
    "outer sums to DECIMAL(38,0)/HUGEINT (the q190 rule).",
)
def q266_trigram_lm(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = (
        d.select("source", "doc_id", "text")
        .withColumn("_toks", tx.tokens(F.lower(F.col("text"))))
        .select(
            "source",
            "doc_id",
            F.explode(
                F.when(
                    F.size("_toks") >= 3,
                    F.expr(
                        "transform(sequence(1, size(_toks) - 2), "
                        "i -> concat(_toks[i-1], ' ', _toks[i], ' ',"
                        " _toks[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("tg"),
        )
    )
    # dc feeds the lexicon agg AND the per-doc rejoin — persist so the
    # corpus tokenize+explode runs once, not once per consumer
    dc = scoped_persist(
        t.groupBy("source", "doc_id", "tg").agg(F.count(F.lit(1)).alias("c")),
        eager=True,
    )
    parts = F.split(F.col("tg"), " ")
    # five marginal consumers (a12/a23/a2/a3/nn) read the trigram
    # lexicon table — persist it once or each re-derives the corpus
    # explode (the q255 scoped-cache lever); lexicon-scale, compact
    tgc = scoped_persist(
        dc.groupBy("tg")
        .agg(F.sum("c").cast("bigint").alias("c123"))
        .select(
            "tg",
            parts[0].alias("w1"),
            parts[1].alias("w2"),
            parts[2].alias("w3"),
            "c123",
        ),
        eager=True,
    )
    # the four marginals are whole-partition window sums, not separate
    # agg tables: each groupBy+join pair re-scanned the cached lexicon
    # and launched its own stage wave (profiled: 4 marginal stages =
    # ~53 s cumulative task time for an ~800 KB table — pure per-task
    # overhead), where a chained unordered window attaches the same
    # exact integer sum on the lexicon stream itself — identical
    # values, no join, half the stages; at scale it also drops the
    # duplicate marginal tables from the shuffle
    nt = tgc.agg(F.sum("c123").cast("bigint").alias("nn"))
    w = (
        tgc.withColumn(
            "c12",
            F.sum("c123").over(Window.partitionBy("w1", "w2")).cast("bigint"),
        )
        .withColumn(
            "c23",
            F.sum("c123").over(Window.partitionBy("w2", "w3")).cast("bigint"),
        )
        .withColumn(
            "c2", F.sum("c123").over(Window.partitionBy("w2")).cast("bigint")
        )
        .withColumn(
            "c3", F.sum("c123").over(Window.partitionBy("w3")).cast("bigint")
        )
        .crossJoin(F.broadcast(nt))
        .select(
            "tg",
            F.floor(F.lit(-1000000.0) * F.expr(f"ln({_Q266_P_SQL})"))
            .cast("bigint")
            .alias("iw"),
        )
    )
    per = (
        dc.join(w, "tg")
        .groupBy("source", "doc_id")
        .agg(
            F.sum(F.col("c") * F.col("iw")).cast("bigint").alias("s"),
            F.sum("c").cast("bigint").alias("ntg"),
        )
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("s").cast("bigint").alias("sum_inll"),
        F.sum(F.expr("s div ntg")).cast("bigint").alias("sum_avg_inll"),
    )


# q271 secret/credential classes — RE2-safe (no lookaround/backrefs),
# identical under Java regex and RE2. hex32 is the generic "raw secret
# material" class (md5/sha fragments, hex API keys); the assignment
# class is how gitleaks-style scanners catch `password=...` config
# spills regardless of the value's shape.
_SECRET_PATTERNS: tuple[tuple[str, str], ...] = (
    ("akia", r"\bAKIA[0-9A-Z]{16}\b"),
    ("hex32", r"\b[0-9a-f]{32,}\b"),
    ("assign", r"(password|secret|api_key|token)=[^\s]+"),
)

_SECRET_MARKS_SQL = (
    "CASE WHEN doc_id % 19 = 0 THEN ' key AKIA'"
    " || upper(substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))"
    " ELSE '' END || "
    "CASE WHEN doc_id % 23 = 0 THEN ' secret='"
    " || md5(CAST(doc_id AS VARCHAR) || ':s') ELSE '' END"
)


@register(
    "q271_secret_scan",
    f"""
    WITH aug AS (
      SELECT source, text || {_SECRET_MARKS_SQL} AS t FROM documents
    ),
    per AS (
      SELECT source,
             len(regexp_extract_all(t, '\\bAKIA[0-9A-Z]{{16}}\\b'))
               AS n_akia,
             len(regexp_extract_all(t, '\\b[0-9a-f]{{32,}}\\b')) AS n_hex32,
             len(regexp_extract_all(t,
                 '(password|secret|api_key|token)=[^\\s]+')) AS n_assign,
             len(list_filter(
                 list_filter(string_split_regex(t, '\\s+'), x -> x != ''),
                 x -> length(x) >= 20
                      AND len(list_distinct(string_split(x, ''))) >= 12))
               AS n_highdiv
      FROM aug
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_akia) AS BIGINT) AS n_akia,
           CAST(SUM(n_hex32) AS BIGINT) AS n_hex32,
           CAST(SUM(n_assign) AS BIGINT) AS n_assign,
           CAST(SUM(n_highdiv) AS BIGINT) AS n_highdiv,
           CAST(SUM(CASE WHEN n_akia + n_hex32 + n_assign + n_highdiv > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged
    FROM per GROUP BY source
    """,
    doc="secret/credential scan — the governance sibling of q264's PII "
    "audit (training corpora leak API keys and passwords, not just "
    "emails; scrubbing them is a compliance gate before any release): "
    "three regex classes (AWS-style AKIA keys, >=32-char lowercase hex "
    "runs = raw key material, password/secret/api_key/token=VALUE "
    "assignments) plus a CHARSET-DIVERSITY screen — whitespace tokens "
    ">= 20 chars with >= 12 distinct characters, the portable proxy "
    "for the Shannon-entropy test gitleaks runs (true entropy needs "
    "ln per char class; the distinct-char count is exact integer "
    "arithmetic on both engines and catches the same base64/hex "
    "blobs). Classes overlap by design (an injected secret= hex32 "
    "value counts in both — documented, deterministic). Markers "
    "keyed on doc_id (q93/q264 convention) exercise every class "
    "identically on both engines; md5-derived marker text means the "
    "scan verifies real high-diversity strings. All JVM regexp + "
    "higher-order array ops in one codegen stage; one per-source agg "
    "of six integers.",
)
def q271_secret_scan(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 19 == 0,
            F.concat(
                F.lit(" key AKIA"),
                F.upper(F.substring(F.md5(did.cast("string")), 1, 16)),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 23 == 0,
            F.concat(
                F.lit(" secret="),
                F.md5(F.concat(did.cast("string"), F.lit(":s"))),
            ),
        ).otherwise(F.lit("")),
    )
    t = d.select("source", aug.alias("t"))
    toks = F.filter(F.split(F.col("t"), r"\s+"), lambda x: x != "")
    highdiv = F.size(
        F.filter(
            toks,
            lambda x: (F.length(x) >= 20)
            & (F.size(F.array_distinct(F.split(x, ""))) >= 12),
        )
    )
    per = t.select(
        "source",
        *[
            F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0))).alias(
                f"n_{name}"
            )
            for name, pat in _SECRET_PATTERNS
        ],
        highdiv.alias("n_highdiv"),
    )
    flagged = (
        F.col("n_akia") + F.col("n_hex32") + F.col("n_assign")
        + F.col("n_highdiv")
        > 0
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_akia").cast("bigint").alias("n_akia"),
        F.sum("n_hex32").cast("bigint").alias("n_hex32"),
        F.sum("n_assign").cast("bigint").alias("n_assign"),
        F.sum("n_highdiv").cast("bigint").alias("n_highdiv"),
        F.sum(flagged.cast("long")).cast("bigint").alias("n_docs_flagged"),
    )
