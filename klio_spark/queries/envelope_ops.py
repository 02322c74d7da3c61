"""Envelope / klio-semantics queries — the reference's routing operators
(ping/force/exists/recipients/audit/payload) exercised on the documents
table with deterministic flag derivations, so the DuckDB oracle can check
the exact routing decisions (SURVEY §2.3, §2.4).

The flags derive from doc_id arithmetic ONLY so both engines agree:
  ping   = doc_id % 10 == 0        force      = doc_id % 7 == 0
  output_exists = doc_id % 3 == 0  input_exists = doc_id % 2 == 0
(file-listing-based existence splits are covered by tests/test_operators.py
against real directories; here the split logic itself is oracle-checked.)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark.operators.audit import update_audit_log
from klio_spark.operators.filters import check_recipients, filter_force, filter_ping
from klio_spark.queries import load, register


def _doc_envelope(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    return (
        env.with_envelope(d.select("doc_id"), F.col("doc_id").cast("string"))
        .withColumn("ping", F.col("doc_id") % 10 == 0)
        .withColumn("force", F.col("doc_id") % 7 == 0)
    )


@register(
    "q80_prologue_routing",
    """
    SELECT CAST(doc_id AS VARCHAR) AS element,
           CASE WHEN doc_id % 10 = 0 THEN 'pass_thru_ping'
                WHEN doc_id % 3 = 0 AND doc_id % 7 != 0 THEN 'pass_thru_existing'
                WHEN doc_id % 2 != 0 THEN 'dropped_not_found'
                ELSE 'process' END AS branch
    FROM documents
    """,
    doc="the canonical prologue's routing decision per element: ping → "
    "pass-thru; existing output unforced → pass-thru; missing input → "
    "drop; else process (exec run.py:320-402 semantics).",
)
def q80_prologue_routing(spark: SparkSession, sf_dir: str):
    df = _doc_envelope(spark, sf_dir)
    ping = filter_ping(df)
    # output-exists split on the non-ping branch
    out_exists = ping.process.filter(F.col("doc_id") % 3 == 0)
    out_missing = ping.process.filter(F.col("doc_id") % 3 != 0)
    forced = filter_force(out_exists)
    to_check = out_missing.unionByName(forced.process)
    # input-exists split
    found = to_check.filter(F.col("doc_id") % 2 == 0)
    not_found = to_check.filter(F.col("doc_id") % 2 != 0)

    tag = lambda d, b: d.select(
        F.col("element"), F.lit(b).alias("branch")
    )
    return (
        tag(ping.pass_thru, "pass_thru_ping")
        .unionByName(tag(forced.pass_thru, "pass_thru_existing"))
        .unionByName(tag(not_found, "dropped_not_found"))
        .unionByName(tag(found, "process"))
    )


@register(
    "q81_recipients_routing",
    """
    SELECT CAST(doc_id AS VARCHAR) AS element,
           CASE WHEN doc_id % 4 IN (0) THEN 'anyone'
                WHEN doc_id % 4 = 3 THEN 'anyone'   -- flipped by trigger_children_of
                ELSE 'limited' END AS recipients_mode
    FROM documents
    WHERE doc_id % 4 IN (0, 1, 3)   -- %4=2 not addressed to this job -> dropped
    """,
    doc="DAG-of-jobs routing: anyone kept; limited kept iff self ∈ "
    "recipients; limited+trigger_children_of==self flips to anyone "
    "(bottom-up resuming top-down, helpers.py:354-430).",
)
def q81_recipients_routing(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    me = env.job_lit("jobA", "proj")
    other = env.job_lit("jobB", "proj")
    m = F.col("doc_id") % 4
    df = (
        env.with_envelope(d.select("doc_id"), F.col("doc_id").cast("string"))
        .withColumn(
            "recipients_mode",
            F.when(m == 0, F.lit(env.ANYONE)).otherwise(F.lit(env.LIMITED)),
        )
        .withColumn(
            "recipients",
            F.when(m == 1, F.array(me, other))
            .when(m == 2, F.array(other))
            .when(m == 3, F.array(me))
            .otherwise(F.lit(None).cast(f"array<struct<job_name:string,project:string>>")),
        )
        .withColumn(
            "trigger_children_of",
            F.when(m == 3, me).otherwise(
                F.lit(None).cast("struct<job_name:string,project:string>")
            ),
        )
    )
    return check_recipients(df, "jobA", "proj").select("element", "recipients_mode")


@register(
    "q82_audit_log",
    """
    SELECT CAST(doc_id AS VARCHAR) AS element,
           2 AS audit_len,
           'jobA,jobB' AS jobs
    FROM documents WHERE doc_id < 50
    """,
    doc="append-only audit trail: two job hops append two ordered entries "
    "(KlioUpdateAuditLog, helpers.py:433-474).",
)
def q82_audit_log(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    df = env.with_envelope(
        d.filter(F.col("doc_id") < 50).select("doc_id"),
        F.col("doc_id").cast("string"),
    )
    df = update_audit_log(df, "jobA", "proj")
    df = update_audit_log(df, "jobB", "proj")
    return df.select(
        "element",
        F.size("job_audit_log").alias("audit_len"),
        F.concat_ws(",", F.transform("job_audit_log", lambda x: x["job_name"])).alias(
            "jobs"
        ),
    )


@register(
    "q84_udf_quarantine",
    """
    SELECT CAST(doc_id AS VARCHAR) AS element,
           CASE WHEN doc_id % 97 = 0 THEN 'error' ELSE 'ok' END AS status,
           CASE WHEN doc_id % 97 = 0 THEN NULL
                ELSE LEN(regexp_extract_all(text, '\\S+')) END AS n_tokens
    FROM documents
    """,
    doc="drop-don't-fail through the handle_klio UDF adapter: a "
    "deterministically-poisoned element lands in the quarantine branch "
    "with its error recorded; healthy elements flow through "
    "(decorators.py:226-337 semantics, oracle-checked).",
)
def q84_udf_quarantine(spark: SparkSession, sf_dir: str):
    from klio_spark.udf import handle_klio, split_errors

    (d,) = load(spark, sf_dir, "documents")
    df = env.with_envelope(
        d.select("doc_id", "text"), F.col("doc_id").cast("string")
    )

    @handle_klio("element string, n_tokens int")
    def tokenize(element, payload, text=None, **_):
        import re

        if int(element) % 97 == 0:
            raise ValueError(f"poisoned element {element}")
        # ASCII-\s token rule — matches the oracle's RE2 \s+ split on
        # every codepoint (Python's bare split() would also break on
        # NBSP and other Unicode whitespace; see dedup._ws_tokens)
        return {
            "element": element,
            "n_tokens": len(re.findall(r"\S+", text, re.ASCII)),
        }

    ok, quarantine = split_errors(tokenize(df))
    return ok.withColumn("status", F.lit("ok")).unionByName(
        quarantine.select(
            "element",
            F.lit(None).cast("int").alias("n_tokens"),
            F.lit("error").alias("status"),
        )
    ).select("element", "status", "n_tokens")


@register(
    "q83_payload_roundtrip",
    """
    SELECT CAST(doc_id AS VARCHAR) AS element, n_chars, lang
    FROM documents WHERE doc_id % 2 = 0
    """,
    doc="intra-pipeline state via the opaque payload channel: pack columns "
    "→ JSON bytes → unpack (serializer payload contract, SURVEY §1.1).",
)
def q83_payload_roundtrip(spark: SparkSession, sf_dir: str):
    (d,) = load(spark, sf_dir, "documents")
    df = env.with_envelope(
        d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars", "lang"),
        F.col("doc_id").cast("string"),
    )
    packed = env.pack_payload(df, "n_chars", "lang").drop("n_chars", "lang")
    out = env.unpack_payload(packed, "n_chars bigint, lang string")
    return out.select("element", "n_chars", "lang")
