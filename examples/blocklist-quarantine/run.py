"""Blocklist filtering via a reusable bloom bitmap.

The production shape: a contamination blocklist (benchmark fingerprints,
opted-out ids, known-bad hashes) is compiled ONCE into a fixed-size
bloom bitmap and applied map-side in every pipeline — k broadcast joins,
no shuffle of the corpus, with an exact verify join so the output equals
a plain anti-join.  Works identically on batch and streaming inputs
(stream-static joins).
"""

import os

from pyspark.sql import functions as F

from klio_spark.functions.bloom import bloom_semi_join


def run(df, config):
    spark = df.sparkSession
    path = os.path.join(config.job_dir, config.user["blocklist"])
    blocked = spark.read.text(path).select(F.col("value").alias("blocked"))
    bad = bloom_semi_join(df, "element", blocked, "blocked")
    return df.join(
        bad.select("element").dropDuplicates(), "element", "left_anti"
    )
