"""SparkSession factory with scale-oriented defaults.

Defaults chosen for a large cluster (AQE, skew handling, Arrow) but sized
down automatically in local mode. Every knob can be overridden by the
job config (config.py) or by passing ``conf`` overrides.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine-wide defaults. These matter at 100 TB:
#  - AQE re-plans shuffles at runtime (coalesce small partitions, skew-split
#    large ones, demote/promote broadcast joins based on observed sizes).
#  - Arrow makes every pandas_udf/mapInPandas exchange columnar batches.
#  - maxRecordsPerBatch is deliberately modest: klio-style payloads can be
#    multi-MB binary blobs, and a 10k-row Arrow batch of those would OOM a
#    Python worker. 512 rows * ~2 MB ≈ 1 GB worst case; tune per job.
_DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    "spark.sql.session.timeZone": "UTC",
    # read TIMESTAMP(NANOS) parquet columns as nanos-longs instead of
    # erroring (converted to micros in klio_spark.queries.load)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Shuffle compression + spill settings are Spark defaults; we pin
    # shuffle partition count only in local mode (below) and otherwise
    # leave it to AQE's coalescing.
    "spark.sql.shuffle.partitions": "200",
}


def get_spark(
    app_name: str = "klio-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` when no
    cluster master is configured in the environment.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    merged = dict(_DEFAULT_CONF)
    if master and master.startswith("local"):
        # local mode: one JVM, no point in 200 shuffle partitions
        merged["spark.sql.shuffle.partitions"] = "32"
        merged["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEM", "8g")
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
