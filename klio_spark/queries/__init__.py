"""Declared query registry — the SURVEY §2 operator inventory as runnable
(spark_fn, oracle_sql) pairs.

Each QuerySpec is one operator/capability claim: `fn(spark, sf_dir)` runs
the Spark-first implementation; `sql` is the ANSI equivalent DuckDB runs on
the same parquet (None → non-SQL-expressible, rows-only check).

Cross-engine numeric determinism rules (applied on BOTH sides):
  * per-row arithmetic stays in DOUBLE — IEEE ops on identical operands are
    bit-identical across engines;
  * every SUM of doubles is integerized per row first — FLOOR(x * 10^s) as
    BIGINT — then summed exactly and divided back. Plain double sums are
    order-dependent, and double→DECIMAL casts disagree between engines
    near scale-digit ties (Spark: exact BigDecimal expansion + HALF_UP;
    DuckDB: scale-multiply-then-round), but FLOOR of an identical double
    is identical everywhere;
  * AVG = (CAST(int_sum AS DOUBLE)/10^s)/count — IEEE divisions;
  * only genuinely iterative math (percentile interpolation, stddev sqrt,
    cosine) is rounded, at 6 digits.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclasses.dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, doc=doc)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, *tables: str) -> list[DataFrame]:
    from pyspark.sql import functions as F

    out = []
    for t in tables:
        if t == "events":
            # events.parquet carries TIMESTAMP(NANOS) columns, which Spark
            # refuses to read (PARQUET_TYPE_ILLEGAL) unless this legacy flag
            # is on. session.py sets it at build time, but the correctness
            # driver constructs its own vanilla session — a runtime
            # spark.conf.set works on an existing session, so set it here,
            # immediately before the read resolves the schema.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            # events.parquet carries TIMESTAMP(NANOS) which Spark reads as
            # nanos-long under spark.sql.legacy.parquet.nanosAsLong (set in
            # session.py); truncate to micros (integer div — a double div
            # would lose precision above 2^53 ns).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out.append(df)
    return out


# The external correctness driver iterates the registry dict in order and
# truncates after ~50 entries (time budget). Ordering is therefore a
# verification-scheduling decision: front-load the entries with the LEAST
# official evidence.
#
#   1. _VERIFY_FIRST — going into round 5 the cumulative r1-r4 records
#      cover all 164 pre-round-5 entries green, so the debt is exactly
#      what round 5 touched: the NEW q181, then every query whose Spark
#      side or oracle CHANGED this round (ADC/PQ executor-side LUT
#      rework: q167/q168; q180's NULL n_chars guard on both engines;
#      q152's pagerank_topk broadcast_scores refactor; the LSH cap
#      strategy refactor around q66/q106/q129) — all replica-green
#      locally, but the driver record is what counts.
#   2. Everything else in import order — this is where NEW queries land
#      automatically (they are neither in the prefix nor in _DRIVER_GREEN).
#   3. _DRIVER_GREEN — entries already hash-verified by a driver round
#      (r1-r4 cumulative) and untouched since; a repeat truncation costs
#      the least information here.
_VERIFY_FIRST = [
    # new in round 5
    "q181_misra_gries_heavy_hitters", "q182_vocab_growth",
    "q183_shingle_novelty", "q184_source_overlap_matrix",
    "q185_cluster_safe_split", "q186_bpe_train_rounds",
    "q187_pmi_collocations", "q188_winnowing_pairs",
    "q189_textrank_keywords", "q190_lexical_gini",
    "q191_event_paths", "q192_association_rules",
    "q193_conversion_lifetable", "q194_mmr_diverse_topk",
    # changed in round 5 — re-verify
    "q167_pq_adc_quality", "q168_ivfpq_topk", "q180_mad_outliers",
    "q152_pagerank",
    "q66_minhash_lsh_dedup", "q106_minhash_lsh_recall",
    "q129_minhash_bucket_table",
    # oracles zero-guarded in round 5 (cosine-of-zero convention)
    "q70_ann_bruteforce_topk", "q71_ann_lsh_topk", "q74_ann_ivf_topk",
    "q72_embedding_near_dups", "q134_semantic_dedup",
    "q121_centroid_similarity",
    # q169's Spark side refactored into khop_bfs (same plan)
    "q169_bfs_khop",
]

_DRIVER_GREEN = [
    # rotated in after round 4 verified them (CORRECTNESS_r04.json)
    "q153_weighted_sample", "q154_time_weighted_avg",
    "q155_winsorize", "q156_token_entropy", "q157_int8_ann_topk",
    "q67_simhash_dedup", "q158_compaction_plan", "q159_zonemap_pruning",
    "q160_triangle_count", "q161_incremental_join_view", "q162_ks_drift",
    "q163_cusum_changepoint", "q130_interval_join_batch", "q139_psi_drift",
    "q144_inverted_index_topk", "q145_scd2_intervals",
    "q146_rolling_distinct_hll", "q108_event_funnel", "q150_length_outliers",
    "q176_pit_scd2_join", "q179_ewma_features", "q170_gram_matrix",
    "q171_power_iteration", "q172_lloyd_kmeans", "q165_countmin_freq",
    "q166_countmin_merge", "q175_cm_filtered_heavy_keys",
    "q177_grouping_sets", "q173_bpe_merge_scores", "q174_text_normalize",
    "q178_phrase_search", "q164_zorder_cells",
    "q142_time_decay_score", "q147_incremental_rollup",
    "q148_transition_matrix", "q149_dau_mau", 
    "q140_kmeans_assign", "q133_dedup_survivors",
    "q137_span_corruption", "q135_bm25_topk", "q138_vocab_coverage", "q141_bigram_lm_score",
    "q143_skew_profile", "q32_cube", "q34_window_range_frame", "q35_salted_join",
    "q48_string_agg", "q49_corr_covar", "q69_top_bigrams", "q76_binary_meta",
    "q77_bpe_token_count", "q75_embedding_centroids", "q60_token_stats",
    "q61_quality_features", "q62_lang_id", "q63_fingerprint", "q64_exact_dedup",
    "q65_ngram_jaccard_pairs", "q68_jaccard_capped_df", "q132_simhash_portable",
    "q136_substring_dedup", "q151_shingle_containment", "q44_string_funcs2",
    "q45_array_agg", "q46_calendar_funcs", "q09_arg_min_max", "q47_regexp_filter",
    "q08_grouped_pandas_udaf", "q80_prologue_routing", "q81_recipients_routing",
    "q82_audit_log", "q84_udf_quarantine", "q83_payload_roundtrip", "q14_nonequi_self_join",
    "q15_asof_join", "q24_ntile_percent_rank", "q43_null_scalars", "q53_tumbling_window_batch",
    "q56_time_rollup_multigrain", "q54_pivot", "q102_unpivot", "q55_above_group_avg",
    "q131_trigger_upstream_batch", "q01_pricing_summary",
    "q02_revenue_by_nation", "q03_group_stats", "q04_conditional_agg", "q05_rollup",
    "q06_count_distinct", "q07_median_percentile", "q10_semi_join", "q11_anti_join",
    "q12_outer_join_coalesce", "q13_cogroup_counts", "q20_window_topn_per_group",
    "q21_window_running_sum", "q22_window_lag_lead", "q23_top_items_global",
    "q30_union_distinct_intersect_except", "q31_drop_duplicates", "q40_string_funcs",
    "q41_date_funcs", "q42_math_funcs", "q50_events_hourly", "q51_sessionization",
    "q52_events_json_props", "q109_retention_cohorts", "q110_activity_runs",
    "q111_cdc_merge", "q113_keep_latest", "q114_interval_overlap_join", "q112_negative_sampling",
    "q116_latency_histogram", "q117_ab_experiment", "q119_growth_accounting",
    "q120_sliding_window_counts", "q122_anomalous_hours", "q123_revenue_share_bp",
    "q124_funnel_windowed", "q125_copurchase_pairs", "q126_bounce_rate",
    "q127_hierarchy_depth", "q128_weighted_median", 
    "q107_ann_quality", "q73_vector_norms_by_label",
    "q57_gap_fill", "q78_embedding_quantize",
    "q79_repetition_quality", "q85_dedup_clusters", "q87_contamination",
    "q88_stratified_sample", "q89_heavy_hitters", "q90_sequence_packing",
    "q91_passage_dedup", "q92_domain_mixture", "q86_hash_split", "q118_mixture_resample",
    "q93_pii_redaction", "q94_quality_filter", "q95_doc_chunking", "q96_lm_rarity_score",
    "q97_tfidf_top_terms", "q98_hll_distinct_rollup", "q101_theta_set_ops",
    "q100_bloom_semi_join", "q99_kll_quantile_ranks", "q103_quality_constraints",
    "q105_fuzzy_name_match", "q104_snapshot_diff", "q115_table_profile",
]


def all_queries() -> dict[str, QuerySpec]:
    from klio_spark.queries import (  # noqa: F401
        behavior,
        vector_ops,
        training,
        curation,
        sketches,
        dataqual,
        extra,
        textops,
        scalars2,
        envelope_ops,
        advanced,
        relational,
        maintenance,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _VERIFY_FIRST:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    r2 = set(_DRIVER_GREEN)
    for name, spec in _REGISTRY.items():
        if name not in ordered and name not in r2:
            ordered[name] = spec
    for name in _DRIVER_GREEN:
        if name in _REGISTRY and name not in ordered:
            ordered[name] = _REGISTRY[name]
    return ordered
