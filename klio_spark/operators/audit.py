"""Audit-log append: provenance of jobs a message traversed.

Reference: KlioUpdateAuditLog (helpers.py:433-474) appends
{timestamp, job} to metadata.job_audit_log and logs the traversed DAG.
Order-preserving array concat keeps the append-only contract
(klio.proto:35, 109-115).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def update_audit_log(df: DataFrame, job_name: str, project: str) -> DataFrame:
    item = F.struct(
        F.current_timestamp().alias("ts"),
        F.lit(job_name).alias("job_name"),
        F.lit(project).alias("project"),
    )
    return df.withColumn(
        "job_audit_log",
        F.concat(F.coalesce(F.col("job_audit_log"), F.array()), F.array(item)),
    )
