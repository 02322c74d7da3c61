"""Third tranche of declared queries: cube, range-frame windows, string
aggregation, correlation/covariance, bigram document frequencies, and
per-dimension embedding centroids.

Determinism rules as in queries/__init__ — floor-integer sums for
anything summed across rows, ROUND(6) only for genuinely iterative math
(corr/covar), BIGINT casts in oracle SQL wherever DuckDB would emit
HUGEINT/double for integral results.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from klio_spark.queries import load, register


def _dsum(col, scale: float = 10000.0):
    return F.sum(F.floor(col * scale)).cast("double") / scale


@register(
    "q32_cube",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="full cube over two dims — like q05's rollup, Spark Expand feeds a "
    "single hash aggregate: 4 grouping sets in one scan, no re-reads.",
)
def q32_cube(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dsum(F.col("l_quantity")).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "total_qty",
        )
    )


@register(
    "q34_window_range_frame",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT) AS p4
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           CAST(SUM(p4) OVER (
                 PARTITION BY o_custkey ORDER BY d
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 10000.0 AS rev_30d
    FROM o
    """,
    doc="RANGE window frame (trailing 30 days of revenue per customer): "
    "value-based frames are order-of-equal-rows insensitive, so the "
    "result is deterministic even with same-day ties — unlike ROWS "
    "frames, which q21 covers.",
)
def q34_window_range_frame(spark: SparkSession, sf_dir: str):
    (o,) = load(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days.alias("d"))
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        (
            F.sum(F.floor(F.col("o_totalprice") * 10000.0).cast("long")).over(w)
            .cast("double") / 10000.0
        ).alias("rev_30d"),
    )


@register(
    "q35_salted_join",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="skew-resilient salted join, oracle-verified equal to the plain "
    "join: the fact side gets a deterministic row-hash salt, the dim side "
    "explodes ×salts, and the shuffle key becomes (key, salt) so one hot "
    "customer spreads across 8 reducers — the lever for the single-hot-key "
    "case AQE's skew split can't fix (one key > executor memory).",
)
def q35_salted_join(spark: SparkSession, sf_dir: str):
    from klio_spark.plans.partitioning import salted_join

    c, o = load(spark, sf_dir, "customer", "orders")
    dim = c.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    joined = salted_join(o, dim, "o_custkey", salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("revenue"),
    )


@register(
    "q48_string_agg",
    """
    SELECT r_name,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           COUNT(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="string aggregation (listagg shape): sorted pipe-joined member "
    "names per group — sorted before joining so the string is "
    "deterministic under any shuffle order.",
)
def q48_string_agg(spark: SparkSession, sf_dir: str):
    n, r = load(spark, sf_dir, "nation", "region")
    return (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@register(
    "q49_corr_covar",
    """
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="statistical aggregates: Pearson correlation + sample covariance "
    "(iterative double accumulation → rounded at 6, the standard "
    "treatment for engine-order-dependent math).",
)
def q49_corr_covar(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_covar"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q69_top_bigrams",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+1], ' ')
                            FOR i IN range(1, GREATEST(len(toks) - 1, 1) + 1)]) AS shingles
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
            FROM documents)
    )
    SELECT gram, df FROM (
      SELECT gram, COUNT(*) AS df
      FROM (SELECT unnest(shingles) AS gram FROM sh)
      GROUP BY gram
    )
    ORDER BY df DESC, gram
    LIMIT 20
    """,
    doc="corpus bigram document frequencies, top 20 — the df table behind "
    "max_df-style cuts (q68) and n-gram LM features; distinct-per-doc "
    "explode → count, ties broken by gram for a total order.",
)
def q69_top_bigrams(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.dedup import shingle_strings

    (d,) = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(shingle_strings(F.col("text"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("gram"))
        .limit(20)
    )


@register(
    "q76_binary_meta",
    """
    WITH b AS (
      SELECT source,
             octet_length(CAST(text AS BLOB)) AS n_bytes,
             sha256(text) AS digest
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
           COUNT(DISTINCT digest) AS n_distinct
    FROM b
    GROUP BY source
    """,
    doc="multimodal-column metadata pass: treat content as an opaque BLOB "
    "and aggregate typed metadata (byte sizes, distinct digests) per "
    "source — the schema/partitioning pattern for image/audio/video "
    "columns where only metadata, never bytes, enters the shuffle "
    "(functions/multimodal.py is the decode-side twin).",
)
def q76_binary_meta(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.length(F.col("text").cast("binary")).alias("n_bytes"),
        F.sha2(F.col("text").cast("binary"), 256).alias("digest"),
    )
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.count_distinct("digest").alias("n_distinct"),
    )


@register(
    "q77_bpe_token_count",
    """
    SELECT lang,
           CAST(SUM(LEN(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(LEN(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_ws_tokens,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang
    """,
    doc="BPE-ish pre-token counting (letters/digits/punct split — the "
    "units a byte-pair tokenizer merges from) next to the whitespace "
    "count: the budget metric for token-count-based corpus slicing; "
    "identical RE2-safe pattern on both engines, all codegen.",
)
def q77_bpe_token_count(spark: SparkSession, sf_dir: str):
    from klio_spark.functions.text import bpe_token_count, token_count

    (d,) = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(bpe_token_count(F.col("text"))).alias("total_bpe_tokens"),
        F.sum(token_count(F.col("text"))).alias("total_ws_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@register(
    "q75_embedding_centroids",
    """
    WITH ex AS (
      SELECT label,
             unnest(generate_series(1, len(embedding))) AS i,
             embedding
      FROM embeddings
    )
    SELECT label,
           CAST(i - 1 AS INT) AS pos,
           CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*) AS centroid_val,
           COUNT(*) AS n_vecs
    FROM ex
    GROUP BY 1, 2
    """,
    doc="per-label embedding centroids, one row per (label, dimension): "
    "posexplode → hash agg on (label, pos). Emitting per-dimension rows "
    "instead of re-assembled arrays keeps the sum floor-integer "
    "deterministic AND the shuffle payload scalar — the array never "
    "travels. The training-data use: class prototypes / centroid init.",
)
def q75_embedding_centroids(spark: SparkSession, sf_dir: str):
    (e,) = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "_v"))
        .withColumn("_vd", F.col("_v").cast("double"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("_vd") * 1000000.0).cast("long")).cast("double")
                / 1000000.0
                / F.count(F.lit(1))
            ).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@register(
    "q177_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(CAST(l_linestatus AS VARCHAR), 'ALL') AS linestatus,
           COALESCE(CAST(YEAR(CAST(l_shipdate AS DATE)) AS VARCHAR), 'ALL')
             AS ship_year,
           CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                + GROUPING(YEAR(CAST(l_shipdate AS DATE))) AS BIGINT)
             AS gid,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT))
                AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS (
      (l_returnflag, l_linestatus),
      (l_returnflag, YEAR(CAST(l_shipdate AS DATE))),
      (l_linestatus),
      ()
    )
    """,
    doc="arbitrary GROUPING SETS (the general form behind q05's rollup "
    "and q32's cube): four hand-picked grouping combinations — "
    "(flag, mode), (flag, year), (mode), grand total — computed in ONE "
    "scan via a single Expand node feeding one hash aggregate, with "
    "GROUPING() bits composed into the grouping_id that disambiguates "
    "a real NULL dimension value from an 'ALL' rollup line. This is "
    "the cheapest way to serve a dashboard's fixed set of pivot views "
    "at 100 TB: one fact pass, map-side partials per set, versus one "
    "scan per view. Both engines share the SQL text verbatim "
    "(spark.sql), so the check covers Spark's SQL-surface parsing of "
    "grouping sets as well as the values.",
)
def q177_grouping_sets(spark: SparkSession, sf_dir: str):
    (l,) = load(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("q177_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(CAST(l_linestatus AS STRING), 'ALL') AS linestatus,
               COALESCE(CAST(YEAR(CAST(l_shipdate AS DATE)) AS STRING),
                        'ALL') AS ship_year,
               CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                    + GROUPING(YEAR(CAST(l_shipdate AS DATE))) AS BIGINT)
                 AS gid,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0) AS BIGINT))
                    AS DOUBLE) / 10000.0 AS revenue
        FROM q177_lineitem
        GROUP BY GROUPING SETS (
          (l_returnflag, l_linestatus),
          (l_returnflag, YEAR(CAST(l_shipdate AS DATE))),
          (l_linestatus),
          ()
        )
        """
    )


@register(
    "q249_revenue_waterfall",
    """
    WITH li AS (
      SELECT CAST(FLOOR(COALESCE(l_discount, 0) * 100) AS BIGINT)
               AS disc_pct,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS gross_c,
             CAST(FLOOR(l_extendedprice * l_discount * 100) AS BIGINT)
               AS disc_c
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    band AS (
      SELECT disc_pct,
             COUNT(*) AS n_lines,
             SUM(gross_c) AS gross_cents,
             SUM(disc_c) AS discount_cents,
             SUM(gross_c - disc_c) AS net_cents
      FROM li GROUP BY disc_pct
    )
    SELECT CAST(disc_pct AS BIGINT) AS disc_pct,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(gross_cents AS BIGINT) AS gross_cents,
           CAST(discount_cents AS BIGINT) AS discount_cents,
           CAST(net_cents AS BIGINT) AS net_cents,
           CAST(SUM(discount_cents) OVER (ORDER BY disc_pct) AS BIGINT)
             AS cum_discount_cents,
           CAST(CAST(discount_cents AS HUGEINT) * 10000
                // SUM(gross_cents) OVER () AS BIGINT)
             AS discount_share_bp
    FROM band
    """,
    doc="Revenue waterfall by discount band — the BI bridge from gross "
    "to net revenue (which discount tiers cost how much — the margin "
    "review's first table): per integer discount percent, line count, "
    "gross, discount given, net, the cumulative discount bridge, and "
    "each band's discount as bp of total gross. Every money figure is "
    "exact FLOOR(x*100) integer cents — including the discount amount, "
    "floored per LINE so the gross/discount/net identity holds row-"
    "wise by construction on both engines (summing first and "
    "discounting after would round differently). Shape: one scan, a "
    "map-side agg bounded by the <= 101 discount bands, band-bounded "
    "windows.",
)
def q249_revenue_waterfall(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    base = li.filter(F.col("l_extendedprice").isNotNull()).select(
        F.floor(F.coalesce(F.col("l_discount"), F.lit(0.0)) * 100)
        .cast("bigint")
        .alias("disc_pct"),
        F.floor(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("gross_c"),
        F.floor(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("bigint")
        .alias("disc_c"),
    )
    band = base.groupBy("disc_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("gross_c").alias("gross_cents"),
        F.sum("disc_c").alias("discount_cents"),
        F.sum(F.col("gross_c") - F.col("disc_c")).alias("net_cents"),
    )
    # band-bounded windows (<= 101 discount-percent rows)
    w_cum = Window.orderBy("disc_pct").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return (
        band.withColumn("_tot", F.sum("gross_cents").over(w_all))
        .select(
            F.col("disc_pct").cast("bigint"),
            F.col("n_lines").cast("bigint"),
            F.col("gross_cents").cast("bigint"),
            F.col("discount_cents").cast("bigint"),
            F.col("net_cents").cast("bigint"),
            F.sum("discount_cents")
            .over(w_cum)
            .cast("bigint")
            .alias("cum_discount_cents"),
            F.expr(
                "CAST(CAST(discount_cents AS DECIMAL(38,0)) * 10000"
                " div _tot AS BIGINT)"
            ).alias("discount_share_bp"),
        )
    )


@register(
    "q250_basket_dispersion",
    """
    WITH b AS (
      SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY l_orderkey
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(k AS HUGEINT)) AS s1,
             SUM(CAST(k AS HUGEINT) * k) AS s2,
             MIN(k) AS k_min, MAX(k) AS k_max
      FROM b
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(s1 AS BIGINT) AS n_lines,
           CAST(s1 * 1000000 // n AS BIGINT) AS mean_k_ppm,
           CAST(k_min AS BIGINT) AS k_min, CAST(k_max AS BIGINT) AS k_max,
           CASE WHEN n > 1 AND s1 > 0
                THEN CAST((n * s2 - s1 * s1) * 1000000
                          // ((n - 1) * s1) AS BIGINT)
           END AS dispersion_ppm
    FROM m
    """,
    doc="Basket-size overdispersion — the variance-to-mean (Fisher "
    "dispersion) index of order line counts: 1e6 = Poisson-like, above "
    "= clumped (bulk orders / bot baskets), below = regular — the "
    "count-data companion to q241's inter-arrival burstiness and the "
    "modeling gate between Poisson and negative-binomial demand "
    "models. Sample variance over mean = (n*S2 - S1^2)/((n-1)*S1), "
    "computed as ONE exact integer expression in HUGEINT/decimal(38,0) "
    "(no intermediate variance materialized, nothing rounded until the "
    "final ppm floor). Degenerate corpora (n<=1 or no lines) emit NULL "
    "on both engines. Shape: one orderkey groupBy (the shuffle every "
    "basket op shares), one map-side moment fold to one row.",
)
def q250_basket_dispersion(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    kd = F.col("k").cast("decimal(38,0)")
    m = b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(kd).alias("s1"),
        F.sum(kd * F.col("k")).alias("s2"),
        F.min("k").cast("bigint").alias("k_min"),
        F.max("k").cast("bigint").alias("k_max"),
    )
    return m.select(
        F.col("n").alias("n_orders"),
        F.col("s1").cast("bigint").alias("n_lines"),
        F.expr("CAST(s1 * 1000000 div n AS BIGINT)").alias("mean_k_ppm"),
        "k_min",
        "k_max",
        F.when(
            (F.col("n") > 1) & (F.col("s1") > 0),
            F.expr(
                "CAST((n * s2 - s1 * s1) * 1000000"
                " div ((n - 1) * s1) AS BIGINT)"
            ),
        ).alias("dispersion_ppm"),
    )


@register(
    "q251_supplier_hhi",
    """
    WITH s AS (
      SELECT l_suppkey,
             SUM(CAST(FLOOR(l_extendedprice * 100) AS HUGEINT))
               AS rev_cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL
      GROUP BY l_suppkey
    ),
    t AS (SELECT SUM(rev_cents) AS tot, COUNT(*) AS n_supp FROM s),
    sh AS (
      SELECT CAST(rev_cents * 1000000 // tot AS BIGINT) AS share_ppm
      FROM s, t WHERE tot > 0
    )
    SELECT CAST(MAX(t.n_supp) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(share_ppm AS HUGEINT) * share_ppm) // 1000000
                AS BIGINT) AS hhi_ppm,
           CAST(MAX(share_ppm) AS BIGINT) AS top_share_ppm,
           CAST(1000000 // MAX(t.n_supp) AS BIGINT) AS uniform_hhi_ppm
    FROM sh, t
    GROUP BY ()
    """,
    doc="Supplier revenue concentration via the Herfindahl-Hirschman "
    "index — the market-concentration number (antitrust's screen; a "
    "supply-chain's single-point-of-failure gauge): HHI = sum of "
    "squared revenue shares, in ppm of 1e6 (10000 ppm = the classic "
    "'0.01' unconcentrated read; 1e6 = monopoly), alongside the top "
    "supplier's share and the uniform-market floor 1/n. Shares floor "
    "to integer ppm FIRST and the squared sum runs in HUGEINT/"
    "decimal(38,0), so HHI is exact integer arithmetic end-to-end — "
    "the floor-then-square convention is stated (±1ppm-per-share "
    "quantization, identical on both engines). Shape: one supplier "
    "groupBy (dimension-bounded), a broadcast 1-row total, a map-side "
    "squared-share fold to one row.",
)
def q251_supplier_hhi(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    s = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("rev_cents")
        )
    )
    t = s.agg(
        F.sum("rev_cents").alias("tot"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    sh = (
        s.crossJoin(F.broadcast(t))
        .filter(F.col("tot") > 0)
        .select(
            F.expr("CAST(rev_cents * 1000000 div tot AS BIGINT)").alias(
                "share_ppm"
            ),
            "n_supp",
        )
    )
    return sh.agg(
        F.max("n_supp").cast("bigint").alias("n_suppliers"),
        F.expr(
            "CAST(SUM(CAST(share_ppm AS DECIMAL(38,0)) * share_ppm)"
            " div 1000000 AS BIGINT)"
        ).alias("hhi_ppm"),
        F.max("share_ppm").cast("bigint").alias("top_share_ppm"),
        F.expr("CAST(1000000 div MAX(n_supp) AS BIGINT)").alias(
            "uniform_hhi_ppm"
        ),
    )


@register(
    "q252_lorenz_deciles",
    """
    WITH s AS (
      SELECT l_suppkey,
             SUM(CAST(FLOOR(l_extendedprice * 100) AS HUGEINT))
               AS rev_cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL
      GROUP BY l_suppkey
    ),
    r AS (
      SELECT rev_cents,
             ROW_NUMBER() OVER (ORDER BY rev_cents, l_suppkey) AS rn,
             COUNT(*) OVER () AS n,
             SUM(rev_cents) OVER () AS tot
      FROM s
    ),
    d AS (
      SELECT (rn - 1) * 10 // n AS decile,
             COUNT(*) AS n_supp,
             SUM(rev_cents) AS rev_cents,
             MAX(n) AS n, MAX(tot) AS tot
      FROM r GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_supp AS BIGINT) AS n_supp,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(rev_cents * 10000 // tot AS BIGINT) AS share_bp,
           CAST(SUM(rev_cents) OVER (ORDER BY decile) * 10000
                // MAX(tot) OVER () AS BIGINT) AS cum_share_bp
    FROM d
    """,
    doc="Lorenz curve deciles of supplier revenue — the inequality "
    "table behind 'the top decile books X% of revenue' (q251's HHI "
    "summarizes it to one number; q190's Gini is its text-domain "
    "sibling): suppliers ranked ascending by exact integer revenue "
    "cents (ties pinned on suppkey), bucketed into ranks-based "
    "deciles (rn-1)*10//n — the exact-NTILE convention, no "
    "interpolation — with per-decile and cumulative shares in bp. "
    "The global rank window runs over the SUPPLIER dimension "
    "(orders below the fact count at every scale — stated; facts are "
    "reduced by the groupBy first), and the decile windows over 10 "
    "rows. Cents sums in HUGEINT/decimal(38,0).",
)
def q252_lorenz_deciles(spark: SparkSession, sf_dir: str):
    (li,) = load(spark, sf_dir, "lineitem")
    s = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast(
                    "decimal(38,0)"
                )
            ).alias("rev_cents")
        )
    )
    # rank window over the supplier DIMENSION (reduced by the groupBy),
    # not the fact table
    wr = Window.orderBy("rev_cents", "l_suppkey")
    wall = Window.partitionBy()
    r = s.select(
        "rev_cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rev_cents").over(wall).alias("tot"),
    )
    d = r.groupBy(F.expr("(rn - 1) * 10 div n").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("rev_cents").alias("rev_cents"),
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
    )
    wd = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.withColumn("_cum", F.sum("rev_cents").over(wd))
        .select(
            F.col("decile").cast("bigint"),
            F.col("n_supp").cast("bigint"),
            F.col("rev_cents").cast("bigint").alias("rev_cents"),
            F.expr("CAST(rev_cents * 10000 div tot AS BIGINT)").alias(
                "share_bp"
            ),
            # exact decimal floor division — a double division here
            # would lose integer precision past 2^53 cents
            F.expr("CAST(_cum * 10000 div tot AS BIGINT)").alias(
                "cum_share_bp"
            ),
        )
    )
