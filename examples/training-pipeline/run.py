"""End-to-end pretraining-corpus pipeline: quality-filter → near-dup
cluster → keep one doc per cluster → deterministic split assignment.

The full §2.9 training-data story as one job: Gopher-style repetition
gates drop low-quality docs, n-gram-Jaccard pairs + connected components
collapse near-duplicate groups to their min-id representative, and every
survivor gets a stable md5-bucket train/validation/test split. Output
lines are "element<TAB>split".
"""

from pyspark.sql import functions as F

from klio_spark.functions.dedup import ngram_jaccard_pairs
from klio_spark.functions.graph import connected_components
from klio_spark.functions.text import tokens


def run(df, config):
    max_dup = float(config.user.get("max_dup_token_frac", 0.6))
    max_top = float(config.user.get("max_top_token_frac", 0.4))
    threshold = float(config.user.get("dedup_threshold", 0.5))
    train_b = int(config.user.get("train_buckets", 80))
    val_b = int(config.user.get("val_buckets", 90))

    # 1. quality gates: per-doc duplicate-token and top-token fractions
    per_tok = (
        df.select("element", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("element", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_tok.groupBy("element").agg(
        (F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")).alias("dup_frac"),
        (F.max("c") / F.sum("c")).alias("top_frac"),
    )
    kept = df.join(
        stats.filter(
            (F.col("dup_frac") <= max_dup) & (F.col("top_frac") <= max_top)
        ).select("element"),
        "element",
    )

    # 2. near-dup clustering: pairs -> components -> keep min-id per group
    pairs = ngram_jaccard_pairs(kept, "text", "element", threshold=threshold)
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("element")
    )
    survivors = kept.join(losers, "element", "left_anti")

    # 3. stable split: a doc's split never changes as the corpus grows
    bucket = (
        F.conv(F.substring(F.md5(F.col("element")), 1, 4), 16, 10).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < train_b, "train")
        .when(bucket < val_b, "validation")
        .otherwise("test")
    )
    return survivors.withColumn(
        "element", F.concat_ws("\t", F.col("element"), split)
    )
