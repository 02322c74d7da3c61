"""KlioMessage envelope as first-class DataFrame columns.

Reference data model: core/src/klio_core/proto/klio.proto (KlioMessage:
metadata{force, ping, intended_recipients, job_audit_log}, data{element,
payload}, version) and the serializer compat rules in
lib/src/klio/message/serializer.py:23-108.

Design rule (SURVEY §7): the envelope is *columns*, not a serialized blob.
Every routing decision (ping/force/recipients) becomes a Catalyst-visible
boolean predicate, so filters are pushed down, pruned, and codegen'd.
The protobuf wire format is only needed at external edges (to_proto_bytes /
from_proto_bytes below are deliberately tiny and optional).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# -- recipient routing modes (klio.proto:41-75) ------------------------------
ANYONE = "anyone"
LIMITED = "limited"

# KlioJob identity = (job_name, gcp_project)  (klio.proto:93-107)
JOB_SCHEMA = T.StructType(
    [
        T.StructField("job_name", T.StringType()),
        T.StructField("project", T.StringType()),
    ]
)

AUDIT_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("job_name", T.StringType()),
        T.StructField("project", T.StringType()),
    ]
)

# Full envelope column set. `element` is logically the key; kept as STRING
# (the reference stores bytes but every observed use is a utf-8 id —
# lib/src/klio/transforms/io.py:156-167 reads text lines).
ENVELOPE_FIELDS = [
    T.StructField("element", T.StringType(), nullable=False),
    T.StructField("payload", T.BinaryType(), nullable=True),
    T.StructField("version", T.IntegerType(), nullable=False),
    T.StructField("force", T.BooleanType(), nullable=False),
    T.StructField("ping", T.BooleanType(), nullable=False),
    # 'anyone' | 'limited'; null → message dropped (helpers.py:375-384)
    T.StructField("recipients_mode", T.StringType(), nullable=True),
    T.StructField("recipients", T.ArrayType(JOB_SCHEMA), nullable=True),
    T.StructField("trigger_children_of", JOB_SCHEMA, nullable=True),
    T.StructField("job_audit_log", T.ArrayType(AUDIT_ITEM_SCHEMA), nullable=False),
]

ENVELOPE_SCHEMA = T.StructType(ENVELOPE_FIELDS)

ENVELOPE_COLS = [f.name for f in ENVELOPE_FIELDS]


def envelope_columns(
    element: Column | str,
    *,
    payload: Column | None = None,
    version: int = 2,
    force: bool = False,
    ping: bool = False,
    recipients_mode: str = ANYONE,
) -> dict[str, Column]:
    """Column expressions for a fresh V2 envelope around ``element``.

    Mirrors _KlioReadFromTextSource building a new V2 message per line with
    recipients=anyone (lib/src/klio/transforms/io.py:156-167).
    """
    el = F.col(element) if isinstance(element, str) else element
    return {
        "element": el.cast("string"),
        "payload": (payload if payload is not None else F.lit(None)).cast("binary"),
        "version": F.lit(version).cast("int"),
        "force": F.lit(force),
        "ping": F.lit(ping),
        "recipients_mode": F.lit(recipients_mode),
        "recipients": F.lit(None).cast(T.ArrayType(JOB_SCHEMA)),
        "trigger_children_of": F.lit(None).cast(JOB_SCHEMA),
        "job_audit_log": F.array().cast(T.ArrayType(AUDIT_ITEM_SCHEMA)),
    }


def with_envelope(df: DataFrame, element: Column | str, **kw) -> DataFrame:
    """Wrap ``df`` rows in a fresh envelope keyed by ``element``.

    Non-envelope columns of ``df`` are preserved (they ride along like an
    un-opaque payload; use ``pack_payload`` to fold them into `payload`).
    """
    cols = envelope_columns(element, **kw)
    out = df
    for name, col in cols.items():
        out = out.withColumn(name, col)
    return out


def from_elements(
    spark: SparkSession, elements: Iterable[str], **kw
) -> DataFrame:
    """Envelope DataFrame from a list of element ids (test/publish helper).

    Mirrors `klio message publish` constructing messages from CLI ids
    (cli/src/klio_cli/commands/message/publish.py:54-72).
    """
    df = spark.createDataFrame([(e,) for e in elements], "element_in string")
    return with_envelope(df, "element_in").drop("element_in")


def pack_payload(df: DataFrame, *cols: str) -> DataFrame:
    """Fold ``cols`` into the opaque `payload` channel as JSON bytes.

    The reference passes intra-pipeline state between transforms in
    `data.payload` (klio.proto:81, docs/userguide/pipeline/state.rst).
    JSON-in-binary keeps that contract while remaining introspectable.
    """
    return df.withColumn(
        "payload", F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary")
    )


def unpack_payload(df: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Inverse of pack_payload: parse `payload` JSON into columns."""
    parsed = F.from_json(F.col("payload").cast("string"), schema)
    out = df.withColumn("_p", parsed)
    names = (
        schema.fieldNames() if isinstance(schema, T.StructType)
        else out.select("_p.*").columns
    )
    for n in names:
        out = out.withColumn(n, F.col(f"_p.{n}"))
    return out.drop("_p")


def clear_payload_if_unchanged(df: DataFrame, prev_payload: Column) -> DataFrame:
    """Anti-recursion rule: a payload equal to the incoming one is cleared.

    Mirrors serializer.py:111-134 — returning a payload equal to the
    incoming `data` (or None) clears it so state doesn't snowball.
    """
    return df.withColumn(
        "payload",
        F.when(F.col("payload").eqNullSafe(prev_payload), F.lit(None).cast("binary"))
        .otherwise(F.col("payload")),
    )


def coerce_v1(df: DataFrame) -> DataFrame:
    """V1→V2 coercion: entity_id-style key becomes `element`, version→2.

    Mirrors serializer.py:23-53 (`entity_id` copied into `element`).
    In column form the key is already `element`; we normalize version and
    fold v1 `downstream` routing into recipients=anyone.
    """
    return df.withColumn("version", F.lit(2).cast("int")).withColumn(
        "recipients_mode",
        F.coalesce(F.col("recipients_mode"), F.lit(ANYONE)),
    )


def job_lit(job_name: str, project: str) -> Column:
    """A KlioJob struct literal."""
    return F.struct(
        F.lit(job_name).alias("job_name"), F.lit(project).alias("project")
    )
