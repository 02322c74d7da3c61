"""Training-data-pipeline operators beyond the reference (SURVEY §2.9
extensions): dedup clustering, deterministic dataset splits, repetition
quality filters, time-series gap-fill, embedding quantization,
benchmark-contamination detection, stratified sampling, per-source heavy
hitters, sequence packing, passage-level dedup, domain mixture weights.

These are the ops a 100 TB pretraining corpus pipeline runs after the
per-document stages: turn near-dup PAIRS into duplicate GROUPS, carve
stable train/val/test splits, score repetition (Gopher-style quality
signals), regularize event time series, and compress embeddings for ANN
serving. Cross-engine determinism follows the package rules (see
klio_spark.queries module doc): integer outputs wherever possible,
floor-integerized sums for doubles, identical IEEE expression order on
both engines.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.functions import dedup as dd
from klio_spark.functions import text as tx
from klio_spark.queries import load, register, scoped_persist
from klio_spark.queries._fragments import SHINGLE_PAIRS_CTE, shingle_cte


def _md5_bucket(col, mod: int):
    """Deterministic hash bucket 0..mod-1 from the first 4 md5 hex chars —
    the split/sample/resample gating protocol shared by q86/q88/q118 (and
    their DuckDB oracles, which spell the same expression in SQL). Change
    the protocol here and in all three oracles together."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint")
        % mod
    )


@register(
    "q57_gap_fill",
    """
    WITH b AS (
      SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS h0,
             date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS h1
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             event_type, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT s.hour, t.event_type, CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN agg a ON a.hour = s.hour AND a.event_type = t.event_type
    """,
    doc="time-series gap-fill: dense hourly spine (sequence+explode — the "
    "generate_series equivalent) × event types, zero-filled where no "
    "events landed. The spine and type dims are tiny at any corpus size "
    "(hours × cardinality), so both joins broadcast; the only shuffle is "
    "the hourly pre-aggregation.",
)
def q57_gap_fill(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "events")
    agg = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour")
    )
    types = e.select("event_type").distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(F.broadcast(agg), ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@register(
    "q78_embedding_quantize",
    """
    WITH m AS (
      SELECT MAX(list_max(list_transform(embedding,
                                         x -> abs(CAST(x AS DOUBLE))))) AS ma
      FROM embeddings
    ),
    q AS (
      SELECT label,
             list_sum(list_transform(embedding,
               x -> CAST(FLOOR((CAST(x AS DOUBLE) * 127.0) / m.ma) AS BIGINT)
             )) AS qsum
      FROM embeddings CROSS JOIN m
    )
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(qsum) AS BIGINT) AS sum_q,
           CAST(MIN(qsum) AS BIGINT) AS min_q,
           CAST(MAX(qsum) AS BIGINT) AS max_q
    FROM q GROUP BY label
    """,
    doc="int8 scalar quantization (the ANN-serving compression step): one "
    "corpus pass finds the global max|x| scale, a second quantizes each "
    "component to floor(x*127/scale). The scale scalar rides along as a "
    "broadcast cross join — never a driver collect — and all outputs are "
    "exact integers (floor of identical IEEE doubles on both engines).",
)
def q78_embedding_quantize(spark: SparkSession, sf_dir: str):
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    (emb,) = load(spark, sf_dir, "embeddings")
    ma = emb.select(
        F.max(
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        ).alias("ma")
    )

    def _qsum(vecs, mas):
        out = []
        for v, m in zip(vecs, mas):
            a = np.asarray(v, dtype=np.float64)
            out.append(int(np.floor((a * 127.0) / m).sum()))
        return pd.Series(out)

    _qsum.__annotations__ = {"vecs": pd.Series, "mas": pd.Series, "return": pd.Series}
    qsum = pandas_udf(_qsum, "long")

    return (
        emb.crossJoin(F.broadcast(ma))
        .select("label", qsum(F.col("embedding"), F.col("ma")).alias("qsum"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("qsum").alias("sum_q"),
            F.min("qsum").alias("min_q"),
            F.max("qsum").alias("max_q"),
        )
    )


@register(
    "q79_repetition_quality",
    """
    WITH t AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    per AS (SELECT source, doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
    doc AS (
      SELECT source, doc_id, SUM(c) AS n, COUNT(*) AS nd, MAX(c) AS top
      FROM per GROUP BY 1, 2
    ),
    m AS (
      SELECT source,
             1.0 - CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) AS dup_frac,
             CAST(top AS DOUBLE) / CAST(n AS DOUBLE) AS top_frac
      FROM doc
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(FLOOR(dup_frac * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS sum_dup_frac,
           CAST(SUM(CAST(FLOOR(top_frac * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS sum_top_frac
    FROM m GROUP BY source
    """,
    doc="Gopher-style repetition signals (Rae et al. '21 §A1.1): per-doc "
    "duplicate-token fraction and most-common-token fraction, aggregated "
    "per source. explode→two-level groupBy keeps everything in codegen; "
    "the shuffle carries (source, doc_id, tok-hash-sized) rows with "
    "map-side partial counts.",
)
def q79_repetition_quality(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", "doc_id", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    per = toks.groupBy("source", "doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    doc = per.groupBy("source", "doc_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nd"),
        F.max("c").alias("top"),
    )
    m = doc.select(
        "source",
        (F.lit(1.0) - F.col("nd").cast("double") / F.col("n").cast("double")).alias(
            "dup_frac"
        ),
        (F.col("top").cast("double") / F.col("n").cast("double")).alias("top_frac"),
    )

    def _fsum(col):
        return F.sum(F.floor(col * 1000000.0)).cast("double") / 1000000.0

    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _fsum(F.col("dup_frac")).alias("sum_dup_frac"),
        _fsum(F.col("top_frac")).alias("sum_top_frac"),
    )


# q65's oracle pair pipeline (the ONE shared shingler definition in
# queries/_fragments.py), extended with the ≥0.3 edge cut for clustering
_JACCARD_EDGES_CTE = f"""
    {SHINGLE_PAIRS_CTE},
    e AS (
      SELECT id_a, id_b FROM pairs
      WHERE inter > 0 AND CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.3
    )
"""


@register(
    "q85_dedup_clusters",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTE},
    ed AS (SELECT id_a AS a, id_b AS b FROM e
           UNION SELECT id_b, id_a FROM e),
    reach(a, b) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.a, e2.b FROM reach r JOIN ed e2 ON r.b = e2.a
    )
    SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
    FROM reach GROUP BY a
    """,
    doc="near-dup pairs → duplicate clusters via distributed connected "
    "components (min-label propagation, functions/graph.py — the "
    "hash-to-min scheme). The oracle is a recursive-CTE transitive "
    "closure over the same Jaccard edge set as q65; Spark's iterative "
    "fixpoint gets the identical grouping, hash-verified. cluster_id = "
    "min doc_id in the component (the canonical 'keep' representative).",
)
def q85_dedup_clusters(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.graph import connected_components

    (d,) = load(spark, sf_dir, "documents")
    edges = dd.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.3)
    comp = connected_components(edges, "id_a", "id_b")
    return comp.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


@register(
    "q133_dedup_survivors",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTE},
    ed AS (SELECT id_a AS a, id_b AS b FROM e
           UNION SELECT id_b, id_a FROM e),
    reach(a, b) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.a, e2.b FROM reach r JOIN ed e2 ON r.b = e2.a
    ),
    comp AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    every AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             d.n_chars
      FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           (ROW_NUMBER() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id) = 1) AS kept
    FROM every
    """,
    doc="the step after q85 in a dedup pipeline: pick ONE survivor per "
    "duplicate cluster by an explicit quality policy (longest doc wins, "
    "doc_id breaks ties — integer keys only, so the ordering is "
    "engine-exact) and emit the keep/drop verdict for EVERY corpus doc, "
    "singletons included. Spark: q85's label-propagation components + a "
    "left join back to the corpus + one row_number window per cluster; "
    "clusters are tiny relative to the corpus so the window never sees "
    "a hot partition. Oracle: the recursive-CTE closure + the same "
    "window in DuckDB.",
)
def q133_dedup_survivors(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.graph import connected_components

    (d,) = load(spark, sf_dir, "documents")
    edges = dd.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.3)
    comp = connected_components(edges, "id_a", "id_b").withColumnRenamed(
        "id", "doc_id"
    )
    every = (
        d.select("doc_id", "n_chars")
        .join(comp, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("comp", "doc_id"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return every.select(
        "doc_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("kept"),
    )


# shared DuckDB CTE: per-doc distinct 3-gram shingle lists (q65's oracle
# shingler — proven to match shingle_hashes counts)
# the shared shingler rule (_fragments.shingle_cte), carrying source
_SHINGLE_CTE = f"""
    {shingle_cte(", source")}
"""


@register(
    "q87_contamination",
    f"""
    WITH {_SHINGLE_CTE},
    ev AS (SELECT list(DISTINCT s) AS evs
           FROM (SELECT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0)),
    per AS (
      SELECT source, len(shingles) AS n_sh,
             len(list_filter(shingles, x -> list_contains(evs, x))) AS n_hit
      FROM sh CROSS JOIN ev WHERE doc_id % 97 != 0
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN 2 * n_hit >= n_sh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(n_hit) AS BIGINT) AS sum_hits
    FROM per GROUP BY source
    """,
    doc="benchmark-contamination detection: the eval set (doc_id % 97 = 0 "
    "stands in for a held-out benchmark) contributes a distinct-shingle "
    "set; every training doc is scored by how many of its 3-gram shingles "
    "appear in it (contaminated at ≥50% overlap). The eval shingle set is "
    "tiny relative to any corpus — benchmarks are KBs, corpora are TBs — "
    "so it BROADCASTS and the corpus-side probe is a map-side hash join "
    "on 8-byte shingle hashes — no self-join, no shuffle of document "
    "text. The shingle UDF is evaluated once per consuming branch (size "
    "pass + probe pass) rather than persisted: measured at sf0.1, "
    "recomputing the cheap hash UDF beats materializing the shingle "
    "arrays to cache 2.5x.",
)
def q87_contamination(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", "source", dd.shingle_hashes(F.col("text"), 3).alias("_sh")
    )
    ev = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("_sh").alias("_s"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    docs = corpus.select("doc_id", "source", F.size("_sh").alias("n_sh"))
    hits = (
        corpus.select("doc_id", F.explode("_sh").alias("_s"))
        .join(F.broadcast(ev), "_s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    per = docs.join(hits, "doc_id", "left").withColumn(
        "n_hit", F.coalesce(F.col("n_hit"), F.lit(0))
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(2 * F.col("n_hit") >= F.col("n_sh"), 1).otherwise(0)
        ).cast("bigint").alias("n_contaminated"),
        F.sum("n_hit").cast("bigint").alias("sum_hits"),
    )


@register(
    "q88_stratified_sample",
    """
    WITH b AS (
      SELECT source, doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 100 AS bucket,
             25 + (CAST(substring(source, 4) AS BIGINT) * 7) % 71 AS rate_pct
      FROM documents
    )
    SELECT source, CAST(MIN(rate_pct) AS BIGINT) AS rate_pct,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN bucket < rate_pct THEN doc_id ELSE 0 END) AS BIGINT)
             AS sum_kept_ids
    FROM b GROUP BY source
    """,
    doc="stratified per-source downsampling with deterministic hash "
    "gating: each source gets its own keep-rate (derived here from the "
    "source id; in production a dimension table) and a doc is kept iff "
    "md5(doc_id)-bucket < rate — the q86 split trick, so membership is "
    "stable under reshuffles and corpus growth. Pure codegen row "
    "expressions + one agg shuffle; at 100 TB the rates dim joins as a "
    "broadcast.",
)
def q88_stratified_sample(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    bucket = _md5_bucket(F.col("doc_id"), 100)
    rate = (
        F.lit(25) + (F.substring("source", 4, 10).cast("bigint") * 7) % 71
    ).cast("bigint")
    b = d.select(
        "source", "doc_id", bucket.alias("bucket"), rate.alias("rate_pct")
    )
    kept = F.col("bucket") < F.col("rate_pct")
    return b.groupBy("source").agg(
        F.min("rate_pct").alias("rate_pct"),
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id")).otherwise(0))
        .cast("bigint")
        .alias("sum_kept_ids"),
    )


@register(
    "q89_heavy_hitters",
    """
    WITH t AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    c AS (SELECT source, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
    r AS (SELECT source, tok, cnt,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY cnt DESC, tok ASC) AS rank
          FROM c)
    SELECT source, CAST(rank AS BIGINT) AS rank, tok, CAST(cnt AS BIGINT) AS cnt
    FROM r WHERE rank <= 5
    """,
    doc="per-source heavy hitters (top-5 tokens, count-desc/token-asc "
    "deterministic tie-break): explode → two-level hash agg (map-side "
    "partial combine does the heavy lifting — the shuffle carries one row "
    "per (source, distinct token), not per occurrence) → per-source "
    "row_number window, which Spark executes as WindowGroupLimit: the "
    "top-k is pre-filtered before the window sort shuffle.",
)
def q89_heavy_hitters(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    (d,) = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(tx.tokens(F.lower(F.col("text")))).alias("tok")
    )
    c = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        c.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("source", "rank", "tok", "cnt")
    )


@register(
    "q90_sequence_packing",
    """
    WITH t AS (
      SELECT source, doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x != ''))
               AS nt
      FROM documents
    ),
    w AS (
      SELECT source, doc_id, nt,
             SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM t
    )
    SELECT source, CAST((cum - nt) // 512 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS pack_tokens
    FROM w GROUP BY 1, 2
    """,
    doc="sequence packing (the pre-tokenization sharding step: fill "
    "512-token packs with whole documents in deterministic doc_id order): "
    "a per-source running token sum assigns pack_id = tokens-before // "
    "budget — greedy first-fit in one window pass, no iteration. The "
    "window sorts WITHIN each source partition only; at 100 TB packing "
    "is per-shard by construction, so the sort never sees the whole "
    "corpus and the plan is one shuffle (partitionBy source) + one agg.",
)
def q90_sequence_packing(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", F.size(tx.tokens(F.col("text"))).alias("nt")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn("cum", F.sum("nt").over(w)).withColumn(
        "pack_id", F.expr("(cum - nt) div 512").cast("bigint")
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("pack_tokens"),
    )


@register(
    "q91_passage_dedup",
    """
    WITH t AS (
      SELECT source, doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')
               AS toks
      FROM documents
    ),
    ch AS (
      SELECT source, doc_id,
             unnest([array_to_string(toks[(i-1)*8+1 : (i-1)*8+8], ' ')
                     FOR i IN range(1, len(toks) // 8 + 1)]) AS chunk
      FROM t
    ),
    g AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM ch GROUP BY chunk)
    SELECT ch.source, COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN g.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks
    FROM ch JOIN g USING (chunk)
    GROUP BY ch.source
    """,
    doc="passage-level exact dedup (sub-document granularity — the level "
    "where boilerplate and quoted passages recur even when whole docs "
    "differ): docs are cut into non-overlapping 8-token chunks, each "
    "hashed to 8 bytes JVM-side (xxhash64 — the shuffle carries hashes, "
    "never passage text), and a chunk occurring in ≥2 distinct docs "
    "corpus-wide counts as a duplicated passage. Two hash-agg shuffles "
    "on 8-byte keys; both get map-side partial aggregation.",
)
def q91_passage_dedup(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.lower(F.col("text")))
    nch = F.expr("size(_toks) div 8")
    chunks = F.when(
        nch >= 1,
        F.transform(
            F.sequence(F.lit(1), nch),
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice(F.col("_toks"), (i - 1) * 8 + 1, 8))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ch = (
        d.select("source", "doc_id", toks.alias("_toks"))
        .select("source", "doc_id", F.explode(chunks).alias("chash"))
    )
    g = ch.groupBy("chash").agg(F.countDistinct("doc_id").alias("ndocs"))
    return (
        ch.join(g, "chash")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_chunks"),
        )
    )


@register(
    "q92_domain_mixture",
    """
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x != ''))) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total,
                 COUNT(*) AS n_src FROM s)
    SELECT source, n_docs, src_tokens,
           CAST(total AS DOUBLE) / CAST(n_src * src_tokens AS DOUBLE)
             AS mix_weight
    FROM s CROSS JOIN t
    """,
    doc="domain-mixture reweighting: per-source sampling weight that "
    "equalizes token share (weight = uniform-target-share / actual-share "
    "= total/(n_sources·src_tokens)) — the knob pretraining recipes turn "
    "to up/down-weight web vs books vs code. One corpus agg; the totals "
    "row rides along as a broadcast cross join; the single IEEE division "
    "on identical integer operands is bit-stable across engines.",
)
def q92_domain_mixture(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tx.tokens(F.col("text")))).cast("bigint").alias("src_tokens"),
    )
    t = s.agg(
        F.sum("src_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_src"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "src_tokens",
        (
            F.col("total").cast("double")
            / (F.col("n_src") * F.col("src_tokens")).cast("double")
        ).alias("mix_weight"),
    )


@register(
    "q86_hash_split",
    """
    WITH b AS (
      SELECT doc_id, n_chars,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'validation'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM b GROUP BY 1
    """,
    doc="deterministic 80/10/10 train/val/test split: bucket = "
    "md5(id)[:4] mod 100 — stable under reshuffles, re-runs, and corpus "
    "growth (a doc's split never changes when other docs arrive), the "
    "property random() splits lack. Pure codegen expression, no shuffle "
    "beyond the final 3-group agg.",
)
def q86_hash_split(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    bucket = _md5_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum("doc_id").cast("bigint").alias("sum_ids"),
    )


@register(
    "q118_mixture_resample",
    """
    WITH t AS (
      SELECT source, doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x != '')) AS nt,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 10000 AS bucket
      FROM documents
    ),
    s AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS src_tokens
          FROM t GROUP BY source),
    tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total,
                   COUNT(*) AS n_src FROM s),
    r AS (
      SELECT source,
             LEAST(10000, (total // n_src) * 10000 // src_tokens) AS rate_bp
      FROM s CROSS JOIN tot
    )
    SELECT t.source, CAST(MIN(r.rate_bp) AS BIGINT) AS rate_bp,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN t.bucket < r.rate_bp THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN t.bucket < r.rate_bp THEN t.nt ELSE 0 END)
                AS BIGINT) AS kept_tokens
    FROM t JOIN r USING (source)
    GROUP BY t.source
    """,
    doc="mixture resampling — q92's token-share-equalizing weights "
    "APPLIED: per-source keep-rate in basis points = equal token target "
    "over actual source tokens (capped at 1), gated per doc by the "
    "md5-bucket trick (q86/q88) so membership is deterministic, "
    "reshuffle-stable, and growth-stable. The rates table is "
    "sources-sized → broadcast; the corpus side is one scan + the gate "
    "expression + one agg. Integer arithmetic throughout (basis points, "
    "floor division).",
)
def q118_mixture_resample(spark: SparkSession, sf_dir: str):

    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(tx.tokens(F.lower(F.col("text")))).alias("nt"),
        _md5_bucket(F.col("doc_id"), 10000).alias("bucket"),
    )
    s = t.groupBy("source").agg(F.sum("nt").cast("bigint").alias("src_tokens"))
    tot = s.agg(
        F.sum("src_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).alias("n_src"),
    )
    r = s.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(10000).cast("bigint"),
            F.expr("(total div n_src) * 10000 div src_tokens"),
        ).alias("rate_bp"),
    )
    kept = F.col("bucket") < F.col("rate_bp")
    return (
        t.join(F.broadcast(r), "source")
        .groupBy("source")
        .agg(
            F.min("rate_bp").cast("bigint").alias("rate_bp"),
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


@register(
    "q137_span_corruption",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t != '') AS tk
      FROM documents
    ),
    t AS (
      SELECT doc_id, i AS pos
      FROM toks, LATERAL unnest(range(1, len(tk) + 1)) AS u(i)
      WHERE len(tk) >= 1
    ),
    s AS (
      SELECT doc_id, pos,
             CASE WHEN CAST(('0x' || substring(md5(doc_id || ':' || pos), 1, 4))
                       AS BIGINT) % 100 < 5 THEN 1 ELSE 0 END AS st
      FROM t
    ),
    m AS (
      SELECT doc_id, pos,
             MAX(st) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mk
      FROM s
    ),
    x AS (
      SELECT doc_id, mk,
             CASE WHEN mk = 1 AND COALESCE(LAG(mk) OVER
                  (PARTITION BY doc_id ORDER BY pos), 0) = 0
                  THEN 1 ELSE 0 END AS ns
      FROM m
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(mk) AS BIGINT) AS n_masked,
           CAST(SUM(ns) AS BIGINT) AS n_spans,
           CAST((10000 * SUM(mk)) // COUNT(*) AS BIGINT) AS masked_bp
    FROM x GROUP BY doc_id
    """,
    doc="T5-style span corruption, replayable: a position STARTS a "
    "3-token mask span iff its md5 bucket (the q86/q88 gating protocol, "
    "keyed 'doc_id:pos') lands under 5% — so the mask layout is a pure "
    "function of (doc_id, pos), reproducible across runs, engines, and "
    "partitionings, with no RNG state to ship. Span membership is ONE "
    "rows-between-2-preceding window max (overlapping spans merge for "
    "free), span count a lag transition sum — both on the same "
    "per-doc sort. Emits per-doc token/mask/span counts and the masked "
    "rate in integer basis points.",
)
def q137_span_corruption(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.posexplode(tx.tokens(F.lower(F.col("text")))).alias("_p0", "_tok"),
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"))
    st = t.withColumn(
        "st",
        (
            _md5_bucket(
                F.concat_ws(":", F.col("doc_id"), F.col("pos")), 100
            )
            < 5
        ).cast("int"),
    )
    wm = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-2, Window.currentRow)
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    x = (
        st.withColumn("mk", F.max("st").over(wm))
        .withColumn(
            "ns",
            (
                (F.col("mk") == 1)
                & (F.coalesce(F.lag("mk").over(wl), F.lit(0)) == 0)
            ).cast("int"),
        )
    )
    return x.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("mk").cast("bigint").alias("n_masked"),
        F.sum("ns").cast("bigint").alias("n_spans"),
        F.expr("(10000 * sum(mk)) div count(1)")
        .cast("bigint")
        .alias("masked_bp"),
    )


@register(
    "q185_cluster_safe_split",
    f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTE},
    ed AS (SELECT id_a AS a, id_b AS b FROM e
           UNION SELECT id_b, id_a FROM e),
    reach(a, b) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.a, e2.b FROM reach r JOIN ed e2 ON r.b = e2.a
    ),
    comp AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
      FROM reach GROUP BY a
    ),
    assign AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             CASE
               WHEN CAST('0x' || substr(md5(CAST(
                      COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 15)
                    AS BIGINT) % 10 < 8 THEN 'train'
               WHEN CAST('0x' || substr(md5(CAST(
                      COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 15)
                    AS BIGINT) % 10 = 8 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    leak AS (
      SELECT COUNT(*) AS n
      FROM e
      JOIN assign x ON e.id_a = x.doc_id
      JOIN assign y ON e.id_b = y.doc_id
      WHERE x.split <> y.split
    )
    SELECT a.split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT a.cluster_id) AS BIGINT) AS n_clusters,
           CAST(l.n AS BIGINT) AS straddling_pairs
    FROM assign a CROSS JOIN leak l
    GROUP BY a.split, l.n
    """,
    doc="cluster-safe train/val/test split — the leakage-proof variant "
    "of q86's per-doc hash split: the split is assigned to each doc's "
    "NEAR-DUP CLUSTER representative (q85's connected components over "
    "the 0.3-Jaccard edge set; singletons represent themselves), so "
    "two near-duplicate documents can never straddle train and eval — "
    "the contamination mode a per-doc split invites and dedup-aware "
    "LLM training requires closing. Split = portable md5 of the "
    "representative id, 8/1/1. Emits per-split doc and cluster counts "
    "PLUS the construction's own audit: straddling_pairs counts "
    "near-dup edges whose endpoints landed in different splits — "
    "provably zero, and the DuckDB oracle (recursive-CTE transitive "
    "closure + the same audit join) hash-proves it. Scale shape: "
    "components via label propagation (O(log d) rounds); the audit is "
    "two id-keyed joins of the edge list against the assignment — "
    "edges persist once for pair-gen and audit; everything else is "
    "the tiny cluster/assignment table.",
)
def q185_cluster_safe_split(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.dedup import md5_token_hash
    from klio_spark.functions.graph import connected_components

    (d,) = load(spark, sf_dir, "documents")
    edges = scoped_persist(
        dd.ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.3)
    )
    comp = connected_components(edges, "id_a", "id_b")
    # assign feeds THREE consumers (both sides of the leak audit join +
    # the per-split agg). With comp arriving as a tiny known-size local
    # table its join broadcasts, so there is no shuffle exchange for AQE
    # to reuse across the consumers — without a persist each one re-runs
    # the docs⋈comp join AND the md5 pandas-UDF pass (measured: warm
    # wall 3x). Eager: the leak branch is broadcast, and concurrent
    # broadcast jobs racing a lazy cache each recompute (see
    # scoped_persist).
    assign = scoped_persist(
        d.select("doc_id")
        .join(
            comp.select(
                F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
            ),
            "doc_id",
            "left",
        )
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        )
        .withColumn(
            "_b", md5_token_hash(F.col("cluster_id").cast("string")) % 10
        )
        .withColumn(
            "split",
            F.when(F.col("_b") < 8, F.lit("train"))
            .when(F.col("_b") == 8, F.lit("val"))
            .otherwise(F.lit("test")),
        ),
        eager=True,
    )
    leak = (
        edges.join(
            assign.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("_sa")
            ),
            "id_a",
        )
        .join(
            assign.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("_sb")
            ),
            "id_b",
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .select(
            "split", "n_docs", "n_clusters",
            F.col("n").cast("bigint").alias("straddling_pairs"),
        )
    )


@register(
    "q195_mixture_temperature",
    """
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x != ''))) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, src_tokens,
             CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w_scaled
      FROM s
    ),
    t AS (SELECT CAST(SUM(w_scaled) AS BIGINT) AS tot FROM w),
    q AS (
      SELECT source, n_docs, src_tokens,
             CAST(w_scaled * 1000000 // tot AS BIGINT) AS weight_ppm,
             CAST(1000000 * w_scaled // tot AS BIGINT) AS base_quota,
             CAST((1000000 * w_scaled) % tot AS BIGINT) AS rem
      FROM w CROSS JOIN t
    ),
    r AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
             CAST(1000000 - SUM(base_quota) OVER () AS BIGINT) AS leftover
      FROM q
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, src_tokens, weight_ppm,
           CAST(base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS epoch_docs
    FROM r
    """,
    doc="temperature-scaled mixture sampling (the alpha=0.5 sampling "
    "rule of XLM/Gopher-style multi-source pretraining, the smooth "
    "knob between q92's proportional and uniform extremes): per-source "
    "weight ~ src_tokens^alpha, realized integer-exactly as "
    "floor(sqrt(tokens)*1e6) — sqrt of an identical integer-valued "
    "double is bit-identical IEEE on both engines, and from there "
    "everything is int64 (bounded: the widest product is "
    "1e6 * w_scaled with w_scaled = floor(sqrt(tokens)*1e6), and "
    "1e6 * w_scaled < 2^63 holds up to ~8.5e13 tokens/source — "
    "comfortably above the 100 TB design point; beyond that, move the "
    "quota arithmetic to decimal(38,0) as q190 does). A 1M-doc epoch "
    "budget apportions by the "
    "LARGEST-REMAINDER method (Hamilton): base_quota = B*w div tot, "
    "then the B - sum(base_quota) leftover docs go to the largest "
    "remainders (source-asc tie-break) — quotas sum to B exactly, no "
    "float drift ever. Shape: ONE map-side-combinable corpus agg; the "
    "ranking windows run on the per-source table (cardinality = "
    "#sources, trivially broadcast-sized).",
)
def q195_mixture_temperature(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    budget = 1_000_000
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tx.tokens(F.col("text"))))
        .cast("bigint")
        .alias("src_tokens"),
    )
    w = s.withColumn(
        "w_scaled",
        F.floor(F.sqrt(F.col("src_tokens").cast("double")) * 1_000_000)
        .cast("bigint"),
    )
    t = w.agg(F.sum("w_scaled").cast("bigint").alias("tot"))
    q = w.crossJoin(F.broadcast(t)).select(
        "source", "n_docs", "src_tokens",
        F.expr("w_scaled * 1000000 div tot").cast("bigint").alias("weight_ppm"),
        F.expr(f"{budget} * w_scaled div tot").cast("bigint").alias("base_quota"),
        F.expr(f"({budget} * w_scaled) % tot").cast("bigint").alias("rem"),
    )
    wr = Window.orderBy(F.desc("rem"), F.asc("source"))
    wall = Window.partitionBy()
    r = q.select(
        "*",
        F.row_number().over(wr).alias("rk"),
        (F.lit(budget) - F.sum("base_quota").over(wall))
        .cast("bigint")
        .alias("leftover"),
    )
    return r.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "src_tokens",
        "weight_ppm",
        (
            F.col("base_quota")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("epoch_docs"),
    )


@register(
    "q207_budget_mixture",
    """
    WITH s AS (
      SELECT source,
             CAST(COUNT(t.w) AS BIGINT) AS src_tokens,
             CAST(COUNT(DISTINCT t.w) AS BIGINT) AS n_types
      FROM documents d
           LEFT JOIN LATERAL unnest(
             list_filter(string_split_regex(lower(d.text), '\\s+'),
                         x -> x != '')) AS t(w) ON TRUE
      GROUP BY source
    ),
    q AS (
      SELECT source, src_tokens,
             CASE WHEN src_tokens = 0 THEN 0
                  ELSE n_types * 1000000 // src_tokens END AS ttr_ppm
      FROM s
    ),
    b AS (SELECT SUM(src_tokens) * 2 // 5 AS budget FROM q),
    r AS (
      SELECT source, src_tokens, ttr_ppm,
             COALESCE(SUM(src_tokens) OVER (
               ORDER BY ttr_ppm DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM q
    )
    SELECT source, ttr_ppm, src_tokens,
           CAST(GREATEST(0, LEAST(src_tokens, budget - cum_prev))
                AS BIGINT) AS taken_tokens
    FROM r CROSS JOIN b
    """,
    doc="token-budget-capped quality mixture — the data-mixing decision "
    "run when the training budget is smaller than the pool: rank "
    "sources by a deterministic quality proxy (type-token ratio in "
    "integer ppm — boilerplate-heavy sources score low), then take "
    "sources greedily in rank order until a RELATIVE budget (40% of "
    "pool tokens — scale-stable, the q201 relative-threshold lesson) "
    "is exhausted, the boundary source contributing exactly the "
    "remainder. Output per source: quality, size, and taken_tokens "
    "(0 = excluded); takes sum to min(budget, pool) exactly — all "
    "integer arithmetic, ties (ttr, source) pinned. Scale shape: one "
    "corpus-scan agg to the #sources-row table (distinct-word count "
    "via map-side-combinable partial aggs), every window on that tiny "
    "table; the budget scalar rides a 1-row broadcast.",
)
def q207_budget_mixture(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode_outer(tx.tokens(F.lower(F.col("text")))).alias("w")
    )
    s = toks.groupBy("source").agg(
        F.sum(F.when(F.col("w").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("src_tokens"),
        F.count_distinct(F.col("w")).cast("bigint").alias("n_types"),
    )
    q = s.select(
        "source",
        "src_tokens",
        F.when(F.col("src_tokens") == 0, F.lit(0))
        .otherwise(F.expr("n_types * 1000000 div src_tokens"))
        .cast("bigint")
        .alias("ttr_ppm"),
    )
    b = q.agg(F.expr("SUM(src_tokens) * 2 div 5").alias("budget"))
    w = Window.orderBy(F.desc("ttr_ppm"), F.asc("source")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = q.select(
        "source",
        "src_tokens",
        "ttr_ppm",
        F.coalesce(F.sum("src_tokens").over(w), F.lit(0)).alias("cum_prev"),
    )
    return r.crossJoin(F.broadcast(b)).select(
        "source",
        "ttr_ppm",
        "src_tokens",
        F.greatest(
            F.lit(0),
            F.least(F.col("src_tokens"), F.col("budget") - F.col("cum_prev")),
        )
        .cast("bigint")
        .alias("taken_tokens"),
    )


@register(
    "q209_repeat_epochs",
    """
    WITH s AS (
      SELECT source,
             CAST(COUNT(t.w) AS BIGINT) AS src_tokens
      FROM documents d
           LEFT JOIN LATERAL unnest(
             list_filter(string_split_regex(lower(d.text), '\\s+'),
                         x -> x != '')) AS t(w) ON TRUE
      GROUP BY source
    ),
    b AS (SELECT SUM(src_tokens) * 3 // 2 AS budget FROM s),
    e AS (
      SELECT source, src_tokens, epoch
      FROM s CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS epoch)
    ),
    r AS (
      SELECT source, src_tokens, epoch,
             COALESCE(SUM(src_tokens) OVER (
               ORDER BY epoch, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM e
    )
    SELECT source, CAST(epoch AS BIGINT) AS epoch, src_tokens,
           CAST(GREATEST(0, LEAST(src_tokens, budget - cum_prev))
                AS BIGINT) AS taken_tokens,
           CAST(GREATEST(0, LEAST(src_tokens, budget - cum_prev))
                // (1 << (epoch - 1)) AS BIGINT) AS eff_tokens
    FROM r CROSS JOIN b
    """,
    doc="data-constrained repeat-epoch allocation (Muennighoff 2023, "
    "'Scaling Data-Constrained Language Models'): when the training "
    "budget EXCEEDS the unique pool (here budget = 150% of pool "
    "tokens), the mixer repeats sources over multiple epochs, and each "
    "repeat epoch is worth less than fresh data — modeled as a "
    "utility halving per epoch. Greedy allocation by marginal utility "
    "= all epoch-1 data first, then epoch-2, ... (epoch asc, source "
    "asc pins ties); the boundary epoch takes exactly the remainder. "
    "eff_tokens = taken >> (epoch-1) is the decay-discounted mass — a "
    "power-of-two SHIFT, not a ppm multiply, so it is overflow-free at "
    "any corpus size (taken * 1e6 would overflow BIGINT past ~9e12 "
    "tokens; the q190 lesson applied by construction instead of by "
    "decimal(38,0)). Output: one row per (source, epoch) with "
    "taken_tokens (0 = never reached). Shape: one corpus-scan agg to "
    "the #sources table, a 4-row literal explode, windows only on the "
    "#sources*4 table, the budget scalar a 1-row broadcast.",
)
def q209_repeat_epochs(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode_outer(tx.tokens(F.lower(F.col("text")))).alias("w")
    )
    s = toks.groupBy("source").agg(
        F.sum(F.when(F.col("w").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("src_tokens")
    )
    b = s.agg(F.expr("SUM(src_tokens) * 3 div 2").alias("budget"))
    e = s.select(
        "source",
        "src_tokens",
        F.explode(F.array(*[F.lit(i) for i in (1, 2, 3, 4)])).alias("epoch"),
    )
    w = Window.orderBy("epoch", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = e.select(
        "source",
        "src_tokens",
        "epoch",
        F.coalesce(F.sum("src_tokens").over(w), F.lit(0)).alias("cum_prev"),
    )
    taken = F.greatest(
        F.lit(0),
        F.least(F.col("src_tokens"), F.col("budget") - F.col("cum_prev")),
    )
    return (
        r.crossJoin(F.broadcast(b))
        .select(
            "source",
            F.col("epoch").cast("bigint").alias("epoch"),
            "src_tokens",
            taken.cast("bigint").alias("taken_tokens"),
        )
        .withColumn(
            "eff_tokens",
            F.expr("taken_tokens div CAST(1 << (epoch - 1) AS BIGINT)").cast(
                "bigint"
            ),
        )
    )


@register(
    "q219_padding_waste",
    """
    WITH t AS (
      SELECT doc_id,
             LEAST(LEN(regexp_extract_all(text, '\\S+')), 512) AS tok
      FROM documents WHERE text IS NOT NULL
    ),
    a AS (
      SELECT doc_id // 32 AS batch, tok, MAX(tok) OVER
               (PARTITION BY doc_id // 32) AS mx
      FROM t
    ),
    s0 AS (
      SELECT tok,
             ROW_NUMBER() OVER (ORDER BY tok, doc_id) AS rnk
      FROM t
    ),
    s AS (
      SELECT (rnk - 1) // 32 AS batch, tok,
             MAX(tok) OVER (PARTITION BY (rnk - 1) // 32) AS mx
      FROM s0
    ),
    wa AS (SELECT CAST(SUM(mx - tok) AS BIGINT) AS waste FROM a),
    ws AS (SELECT CAST(SUM(mx - tok) AS BIGINT) AS waste FROM s)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n_docs,
           (SELECT CAST(SUM(tok) AS BIGINT) FROM t) AS total_tokens,
           wa.waste AS waste_arrival,
           ws.waste AS waste_sorted,
           CASE WHEN wa.waste > 0
                THEN CAST((wa.waste - ws.waste) * 10000 // wa.waste
                          AS BIGINT) END AS saving_bp
    FROM wa CROSS JOIN ws
    """,
    doc="padding-waste audit — quantifies what length-sorted batching "
    "saves over arrival-order batching (the 'sorted batching / "
    "bucketing' every training and inference stack applies: pad-to-"
    "longest wastes compute proportional to intra-batch length "
    "spread): sequence length = whitespace tokens clipped at 512; "
    "arrival batches key on ingest-id blocks (doc_id div 32 — id gaps "
    "make short batches, which only UNDERSTATES arrival waste, so the "
    "reported saving is conservative); sorted batches use the EXACT "
    "global length rank computed by q196's histogram-prefix kernel — "
    "the clip makes the value histogram <= 513 rows by construction, "
    "so the 'global sort' is a broadcast prefix + a parallel "
    "intra-value row_number, never a single-partition sort (the "
    "oracle runs the naive ROW_NUMBER global sort instead, proving "
    "the distributed rank replays it exactly). Waste = sum over "
    "batches of (batch max - each member) — pure integer. Output: one "
    "row with both arms and the saving in bp. Scale shape: one scan, "
    "one tiny broadcast, two bounded windows; nothing corpus-wide "
    "ever sorts.",
)
def q219_padding_waste(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.least(tx.token_count(F.col("text")), F.lit(512)).alias("tok"),
    )
    t = scoped_persist(t)
    # arrival arm: ingest-id blocks; pad-to-longest within each block
    wa_w = Window.partitionBy(F.expr("doc_id div 32"))
    a = t.select("tok", F.max("tok").over(wa_w).alias("mx"))
    wa = a.agg(F.sum(F.col("mx") - F.col("tok")).cast("bigint").alias("waste"))
    # sorted arm: exact global rank without a global sort (q196 kernel —
    # the LEAST(…, 512) clip bounds the histogram at 513 rows)
    hist = t.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    wh = Window.orderBy("tok").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefix = hist.select(
        "tok", (F.sum("cnt").over(wh) - F.col("cnt")).alias("prefix")
    )
    wv = Window.partitionBy("tok").orderBy("doc_id")
    ranked = t.join(F.broadcast(prefix), "tok").select(
        "tok", (F.col("prefix") + F.row_number().over(wv)).alias("rnk")
    )
    ws_w = Window.partitionBy(F.expr("(rnk - 1) div 32"))
    s = ranked.select("tok", F.max("tok").over(ws_w).alias("mx"))
    ws = s.agg(F.sum(F.col("mx") - F.col("tok")).cast("bigint").alias("waste"))
    tot = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("total_tokens"),
    )
    return (
        tot.crossJoin(wa.select(F.col("waste").alias("waste_arrival")))
        .crossJoin(ws.select(F.col("waste").alias("waste_sorted")))
        .select(
            "n_docs",
            "total_tokens",
            "waste_arrival",
            "waste_sorted",
            F.when(
                F.col("waste_arrival") > 0,
                F.expr(
                    "CAST((waste_arrival - waste_sorted) * 10000"
                    " div waste_arrival AS BIGINT)"
                ),
            ).alias("saving_bp"),
        )
    )


@register(
    "q238_mixture_ess",
    """
    WITH s AS (
      SELECT source,
             CAST(FLOOR(SQRT(CAST(COUNT(t.w) AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w_scaled
      FROM documents d
           LEFT JOIN LATERAL unnest(
             list_filter(string_split_regex(lower(d.text), '\\s+'),
                         x -> x != '')) AS t(w) ON TRUE
      GROUP BY source
    ),
    m AS (
      SELECT COUNT(*) AS n_sources,
             SUM(CAST(w_scaled AS HUGEINT)) AS s1,
             SUM(CAST(w_scaled AS HUGEINT) * w_scaled) AS s2
      FROM s
    )
    SELECT CAST(n_sources AS BIGINT) AS n_sources,
           CASE WHEN s2 > 0 THEN CAST(s1 * s1 // s2 AS BIGINT)
           END AS ess_x,
           CASE WHEN s2 > 0
                THEN CAST(s1 * s1 * 1000000 // (s2 * n_sources) AS BIGINT)
           END AS ess_ppm_of_n
    FROM m
    """,
    doc="Effective sample size of the temperature-mixture weights — the "
    "one-number diagnostic for 'is this mixture actually diverse or is "
    "one source 90% of the draw' (Kish 1965 ESS = (SUM w)^2 / SUM w^2; "
    "importance-sampling practice reads ESS/n): computed over q195's "
    "exact per-source weights (FLOOR(sqrt(src_tokens)*1e6) — IEEE sqrt "
    "is correctly rounded, the q233 rule, so weights are bit-identical "
    "cross-engine); both quadratic sums run in HUGEINT/decimal(38,0) "
    "(w^2 reaches ~9e24 at the 100 TB token ceiling — int64 is not "
    "enough, which is WHY the q190 rule exists), and ESS lands as two "
    "exact integer divisions. All-empty corpora emit NULL on both "
    "engines. Shape: the q195 source agg (one token-counting scan) "
    "folded to ONE row map-side; the diagnostic is free next to the "
    "mixture it audits.",
)
def q238_mixture_ess(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.floor(
            F.sqrt(
                F.sum(F.size(tx.tokens(F.lower(F.col("text")))))
                .cast("double")
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("w_scaled")
    )
    m = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum(F.col("w_scaled").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            F.col("w_scaled").cast("decimal(38,0)") * F.col("w_scaled")
        ).alias("s2"),
    )
    return m.select(
        "n_sources",
        F.when(
            F.col("s2") > 0, F.expr("CAST(s1 * s1 div s2 AS BIGINT)")
        ).alias("ess_x"),
        F.when(
            F.col("s2") > 0,
            F.expr("CAST(s1 * s1 * 1000000 div (s2 * n_sources) AS BIGINT)"),
        ).alias("ess_ppm_of_n"),
    )


@register(
    "q254_stratified_min_sample",
    """
    WITH h AS (
      SELECT source, doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS hkey
      FROM documents
    ),
    r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY hkey, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM h
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(GREATEST(15, MAX(n) // 10) AS BIGINT) AS n_target,
           CAST(SUM(CASE WHEN rn <= GREATEST(15, n // 10)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= GREATEST(15, n // 10)
                         THEN doc_id ELSE 0 END) AS BIGINT) AS sum_kept_ids
    FROM r GROUP BY source
    """,
    doc="stratified sampling with EXACT per-stratum counts and a "
    "minimum-allocation floor — the q88 gap (q88's bernoulli hash gate "
    "gives each source a keep-RATE, so a rare stratum can keep near "
    "zero docs; eval sets and per-domain probes need max(min_n, "
    "floor(rate*n)) EXACTLY). Mechanism: rank docs within each source "
    "by (md5(doc_id), doc_id) — a deterministic permutation, stable "
    "under reshuffles and appends in expectation — and keep rank <= "
    "target. The rank <= k filter is Spark's WindowGroupLimit "
    "pre-filter when k is a literal; with a data-dependent target it "
    "stays one window over one source exchange, and the per-source "
    "COUNT rides the same window. Small strata (n < min) keep "
    "everything — n_kept = least(target, n) proves the floor on both "
    "engines. doc_id tiebreak makes the permutation total (md5 "
    "collisions). SURVEY §2.9 sampling family (q88/q118/q153/q233).",
)
def q254_stratified_min_sample(spark: SparkSession, sf_dir: str):
    from pyspark.sql import Window

    (d,) = load(spark, sf_dir, "documents")
    h = d.select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
    )
    w = Window.partitionBy("source").orderBy("hkey", "doc_id")
    wp = Window.partitionBy("source")
    r = h.select(
        "source",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    target = F.greatest(F.lit(15), (F.col("n") / 10).cast("bigint"))
    kept = F.col("rn") <= target
    return r.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.greatest(F.lit(15), (F.max("n") / 10).cast("bigint"))
        .cast("bigint")
        .alias("n_target"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id")).otherwise(0))
        .cast("bigint")
        .alias("sum_kept_ids"),
    )


@register(
    "q265_packing_planner",
    r"""
    WITH t AS (
      SELECT source,
             len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
               AS nt
      FROM documents
    ),
    c AS (
      SELECT source, nt,
             CAST(CASE WHEN nt > 512 THEN 0 ELSE 512 // nt END AS BIGINT)
               AS fit_class
      FROM t WHERE nt >= 1
    ),
    g AS (
      SELECT source, fit_class, COUNT(*) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS sum_tokens,
             CAST(SUM((nt + 511) // 512) AS BIGINT) AS over_bins
      FROM c GROUP BY 1, 2
    )
    SELECT source, fit_class, n_docs,
           CAST(CASE WHEN fit_class = 0 THEN over_bins
                ELSE (n_docs + fit_class - 1) // fit_class END AS BIGINT)
             AS n_bins,
           sum_tokens,
           CAST((CASE WHEN fit_class = 0 THEN over_bins
                 ELSE (n_docs + fit_class - 1) // fit_class END) * 512
                - sum_tokens AS BIGINT) AS slack_tokens
    FROM g
    """,
    doc="sequence-packing PLANNER (the capacity-planning op VERDICT r9 "
    "named — q90's arrival-order packer answers 'assign docs to packs "
    "deterministically'; this answers 'how many 512-token bins does "
    "each source need, and where is the padding waste'): Harmonic-fit "
    "bin packing (Lee & Lee 1985, 1.691-competitive) — docs classify "
    "by fit_class k = 512 div nt (exactly k docs of this class fit one "
    "bin, since nt <= 512/k), bins per (source, class) = ceil(n/k), "
    "slack = bins*512 - tokens. Oversize docs (nt > 512, class 0) "
    "span ceil(nt/512) bins each. First-fit-decreasing packs ~7% "
    "tighter but is inherently sequential (every placement depends on "
    "all prior bins); Harmonic's class partition makes the plan ONE "
    "scan + ONE hash agg — no window, no sort, no sequential state — "
    "so the planner itself scales to any corpus embarrassingly "
    "parallel, and the published bound quantifies the trade. Empty "
    "docs carry nothing to pack and drop on both engines.",
)
def q265_packing_planner(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    t = d.select(
        "source", F.size(tx.tokens(F.col("text"))).alias("nt")
    ).filter(F.col("nt") >= 1)
    c = t.withColumn(
        "fit_class",
        F.when(F.col("nt") > 512, F.lit(0))
        .otherwise(F.expr("512 div nt"))
        .cast("bigint"),
    )
    g = c.groupBy("source", "fit_class").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("sum_tokens"),
        F.sum(F.expr("(nt + 511) div 512")).cast("bigint").alias("over_bins"),
    )
    n_bins = F.when(F.col("fit_class") == 0, F.col("over_bins")).otherwise(
        F.expr("(n_docs + fit_class - 1) div fit_class")
    )
    return g.select(
        "source",
        "fit_class",
        "n_docs",
        n_bins.cast("bigint").alias("n_bins"),
        "sum_tokens",
        (n_bins * 512 - F.col("sum_tokens"))
        .cast("bigint")
        .alias("slack_tokens"),
    )
