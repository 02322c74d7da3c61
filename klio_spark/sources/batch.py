"""Batch event sources (text / avro / parquet / BigQuery-style).

Reference: lib/src/klio/transforms/io.py
  - KlioReadFromText     (:148-189) each line → fresh V2 message
  - KlioReadFromAvro     (:428-535) element field, else JSON of record
  - KlioReadFromBigQuery (:256-352) single column, else JSON of selected cols

Each returns an envelope DataFrame (see klio_spark.envelope). Reads are
plain spark.read calls so Catalyst gets pushdown/pruning on every format
that supports it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from klio_spark.config import EventIOConfig
from klio_spark.envelope import with_envelope


def read_text(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """Newline-delimited element ids → envelope (io.py:148-189).

    cfg.options["wire"] truthy → lines are JSON wire envelopes (what
    `klio message publish` and trigger_upstream write), parsed via
    envelope.from_wire so force/ping/recipients survive — same contract
    as the streaming reader (sources/stream.py). ``wire: proto`` selects
    the KlioMessage protobuf codec instead (interop with reference klio
    jobs; base64-per-line since the text source is line-oriented)."""
    opts = dict(cfg.options)
    wire = opts.pop("wire", False)
    allow_non_klio = bool(opts.pop("allow_non_klio", False))
    df = spark.read.options(**{k: str(v) for k, v in opts.items()}).text(
        cfg.location
    )
    if str(wire).lower() == "proto":
        from klio_spark.envelope import from_proto_wire

        return from_proto_wire(
            df.select(F.unbase64(F.col("value")).alias("value"))
        )
    if wire:
        from klio_spark.envelope import from_wire

        return from_wire(
            df.select(F.col("value").cast("binary").alias("value")),
            allow_non_klio=allow_non_klio,
        )
    return with_envelope(df, "value").drop("value")


def read_parquet(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """Parquet with an `element` column, else JSON-encode the row.

    Parquet is our native interchange format (not in the reference, which
    predates lakehouse column stores); same element-or-JSON convention as
    the Avro source.
    """
    df = spark.read.options(**{k: str(v) for k, v in cfg.options.items()}).parquet(
        cfg.location
    )
    return _element_or_json(df)


def read_avro(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """Avro records: element field if present else JSON (io.py:428-446).

    Uses the spark-avro DataSource when it's on the classpath (the scale
    path: splittable, pushdown-capable). Without it, falls back to a
    pure-Python container decode (klio_spark.avro_codec) over the
    binaryFile source — whole files ship to executors and decode inside
    mapInPandas, which is fine for klio-sized event manifests but should
    be swapped for the real DataSource on large inputs.
    """
    try:
        df = (
            spark.read.format("avro")
            .options(**{k: str(v) for k, v in cfg.options.items()})
            .load(cfg.location)
        )
        return _element_or_json(df)
    except Exception as e:  # noqa: BLE001 — only swallow "no such source"
        # only the missing-DataSource signature falls back — a substring
        # match on 'avro' would also swallow path/corruption errors whose
        # message merely mentions the word (e.g. '/data/events_avro')
        msg = str(e)
        if not (
            "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find data source" in msg
        ):
            raise
    return _element_or_json(read_avro_fallback(spark, cfg.location))


def read_avro_fallback(spark: SparkSession, location: str) -> DataFrame:
    """binaryFile + pure-Python Avro container decode (no spark-avro)."""
    import pandas as pd

    from klio_spark import avro_codec as ac

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(location)
        .select("content")
    )
    # schema sniff: only the container HEADER travels to the driver —
    # collecting a whole multi-GB file's content column for its first
    # few KB would be a driver-OOM hazard (1 MB covers any real header;
    # klio-style schemas are one-field records)
    head = files.select(F.substring("content", 1, 1 << 20)).limit(1).collect()
    if not head:
        raise FileNotFoundError(f"no .avro files under {location}")
    avro_schema = ac.read_schema(bytes(head[0][0]))
    spark_schema = ac.avro_to_spark_schema(avro_schema)
    names = [f.name for f in spark_schema.fields]

    def _decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                recs = list(ac.read_container(bytes(blob)))
                yield pd.DataFrame(recs, columns=names)

    return files.mapInPandas(_decode, schema=spark_schema)


def read_csv(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """CSV rows → element-or-JSON (header on by default; any Spark CSV
    option passes through cfg.options). Not in the reference (Beam had no
    first-class CSV source) but a day-one need for tabular manifests."""
    opts = {"header": "true", **{k: str(v) for k, v in cfg.options.items()}}
    df = spark.read.options(**opts).csv(cfg.location)
    return _element_or_json(df)


def read_json(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """JSON-lines records → element-or-JSON."""
    df = spark.read.options(
        **{k: str(v) for k, v in cfg.options.items()}
    ).json(cfg.location)
    return _element_or_json(df)


def read_bq_style(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """BigQuery-style rows → element = single column or JSON of columns.

    Mirrors _KlioReadFromBigQueryMapper (io.py:219-246): with one
    klio_message_column the element is that column's value; with several,
    a JSON object of them. On a real cluster the read would be
    spark.read.format("bigquery"); locally any tabular format stands in
    (cfg.options["format"], default parquet).
    """
    # copy before popping: cfg is shared, and mutating it would make a
    # second read with the same EventIOConfig silently fall back to
    # parquet/JSON-of-all-columns
    opts = dict(cfg.options)
    fmt = opts.pop("format", "parquet")
    cols = opts.pop("klio_message_columns", None)
    df = (
        spark.read.format(fmt)
        .options(**{k: str(v) for k, v in opts.items()})
        .load(cfg.location)
    )
    if cols:
        if not isinstance(cols, list):
            try:
                cols = json.loads(cols)
            except (ValueError, TypeError):
                # a plain column name (YAML `klio_message_columns:
                # entity_id`) is a one-element list, not JSON
                cols = [cols]
            if isinstance(cols, str):
                cols = [cols]
        if len(cols) == 1:
            el = F.col(cols[0]).cast("string")
        else:
            el = F.to_json(F.struct(*[F.col(c) for c in cols]))
    else:
        el = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return with_envelope(df.withColumn("_el", el), "_el").drop("_el")


def _element_or_json(df: DataFrame) -> DataFrame:
    if "element" in df.columns:
        other = [c for c in df.columns if c != "element"]
        el = F.coalesce(
            F.col("element").cast("string"),
            F.to_json(F.struct(*[F.col(c) for c in other])) if other else F.lit(None),
        )
    else:
        el = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return with_envelope(df.withColumn("_el", el), "_el").drop("_el")
