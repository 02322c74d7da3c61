"""LLM-data dedup job: parquet docs in, survivors out.

Exact dedup (content hash) then MinHash-LSH near-dup removal at the
configured threshold — the standard two-stage pretraining-corpus
pipeline, on the envelope contract (element = doc id, text rides along).
"""

from pyspark.sql import functions as F

from klio_spark.functions.dedup import exact_dedup, minhash_lsh_dedup


def run(df, config):
    threshold = float(config.user.get("dedup_threshold", 0.7))
    uniq = exact_dedup(df, "text", "element")
    near = minhash_lsh_dedup(uniq, "text", "element", threshold=threshold)
    # drop the higher id of each near-dup pair (keep-first policy)
    losers = near.select(F.col("id_b").alias("element")).distinct()
    return uniq.join(losers, "element", "left_anti")
