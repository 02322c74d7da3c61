"""Event sinks: envelope DataFrame → event output channel.

Reference: lib/src/klio/transforms/io.py
  - KlioWriteToText  (:386-424) writes data.element per line
  - KlioWriteToAvro  (:539-657) {"element": bytes} records
  - KlioWriteToBigQuery (:355-383) json payload → rows; write dispositions
    (config/_io.py:460-491) → Spark save modes
  - KlioWriteToEventOutput (helpers.py:214-260) composite dispatch

Registry keyed by config type, honoring skip_klio_write
(config/_io.py:157-175).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from klio_spark.config import EventIOConfig

# BigQuery write dispositions → Spark save modes (config/_io.py:460-491)
_DISPOSITIONS = {
    "WRITE_APPEND": "append",
    "WRITE_TRUNCATE": "overwrite",
    "WRITE_EMPTY": "errorifexists",
}


def write_text(df: DataFrame, cfg: EventIOConfig) -> None:
    """element per line (unwrap envelope, io.py:386-424)."""
    df.select(F.col("element").cast("string").alias("value")).write.mode(
        cfg.options.get("mode", "overwrite")
    ).text(cfg.location)


def write_parquet(df: DataFrame, cfg: EventIOConfig) -> None:
    df.write.mode(cfg.options.get("mode", "overwrite")).parquet(cfg.location)


def write_avro(df: DataFrame, cfg: EventIOConfig) -> None:
    """Fixed klio Avro schema {"element": bytes} (io.py:555-560)."""
    df.select(F.col("element").cast("binary").alias("element")).write.format(
        "avro"
    ).mode(cfg.options.get("mode", "overwrite")).save(cfg.location)


def write_bq_style(df: DataFrame, cfg: EventIOConfig) -> None:
    """payload JSON → typed rows (io.py:370-375). Locally parquet stands in
    for the bigquery connector; schema comes from cfg.options["schema"]."""
    schema = cfg.options.get("schema")
    if schema is None:
        raise ValueError("bq-style write needs options.schema (DDL string)")
    mode = _DISPOSITIONS.get(cfg.options.get("disposition", "WRITE_APPEND"), "append")
    fmt = cfg.options.get("format", "parquet")
    rows = df.select(
        F.from_json(F.col("payload").cast("string"), schema).alias("r")
    ).select("r.*")
    rows.write.format(fmt).mode(mode).save(cfg.location)


_WRITERS: dict[str, Callable[[DataFrame, EventIOConfig], None]] = {
    "file": write_text,
    "text": write_text,
    "parquet": write_parquet,
    "avro": write_avro,
    "bq": write_bq_style,
    "bigquery": write_bq_style,
}


def register_writer(type_name: str, fn) -> None:
    _WRITERS[type_name] = fn


def write_event_output(df: DataFrame, cfg: EventIOConfig) -> None:
    """Dispatch on type/format (KlioWriteToEventOutput, helpers.py:214-260)."""
    if cfg.skip_klio_write:
        return
    fmt = cfg.format if cfg.type in ("file", "text") else cfg.type
    writer = _WRITERS.get(fmt) or _WRITERS[cfg.type]
    writer(df, cfg)
