"""Streaming event sources (Pub/Sub stand-ins).

Reference: KlioReadFromPubSub (lib/src/klio/transforms/io.py:660-702).
No Pub/Sub connector exists for Spark; the idiomatic stand-ins are Kafka
(production) and the file source (tests/local). Both get checkpointed
exactly-once-per-sink semantics from Structured Streaming — which already
covers the reference's ack-deadline machinery
(lib/src/klio/message/pubsub_message_manager.py:47-314) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from klio_spark.config import EventIOConfig
from klio_spark.envelope import with_envelope


def read_stream(spark: SparkSession, cfg: EventIOConfig) -> DataFrame:
    """readStream → envelope DataFrame.

    cfg.topic set   → Kafka source (value bytes = element utf-8).
    cfg.location set→ file source watching a directory of text files
                      (one element per line), the local Pub/Sub stand-in.
    cfg.options["wire"] truthy → lines are JSON wire envelopes (what
    trigger_upstream publishes): parsed via envelope.from_wire so routing
    metadata (recipients, trigger_children_of) survives the hop between
    jobs. ``wire: proto`` selects the KlioMessage protobuf codec instead
    (raw bytes from Kafka values; base64-per-line from the text source) —
    interop with reference klio jobs publishing to the same topic.
    "allow_non_klio" option → unparseable lines become fresh V2
    messages instead of being dropped (serializer.py:90-98).
    Dedup-by-id (`id_label` in the reference) becomes dropDuplicates on
    element under a watermark (set by the job, not here, since the
    watermark column is event-time-specific).
    """
    opts = dict(cfg.options)
    wire = opts.pop("wire", False)
    allow_non_klio = bool(opts.pop("allow_non_klio", False))
    from_kafka = bool(cfg.topic)
    if from_kafka:
        raw = (
            spark.readStream.format("kafka")
            .option("subscribe", cfg.topic)
            .options(**{k: str(v) for k, v in opts.items()})
            .load()
        )
        # keep raw bytes for the proto codec: a string round-trip would
        # corrupt non-UTF-8 protobuf bytes
        if str(wire).lower() == "proto":
            from klio_spark.envelope import from_proto_wire

            return from_proto_wire(raw.select(F.col("value")))
        df = raw.select(F.col("value").cast("string").alias("_el"))
    elif cfg.location:
        df = (
            spark.readStream.format("text")
            .options(**{k: str(v) for k, v in opts.items()})
            .load(cfg.location)
            .select(F.col("value").alias("_el"))
        )
    else:
        raise ValueError("stream source needs topic (kafka) or location (file)")
    if str(wire).lower() == "proto":
        from klio_spark.envelope import from_proto_wire

        # text-source lines carry base64 (line-oriented source, binary wire)
        return from_proto_wire(df.select(F.unbase64(F.col("_el")).alias("value")))
    if wire:
        from klio_spark.envelope import from_wire

        return from_wire(
            df.select(F.col("_el").cast("binary").alias("value")),
            allow_non_klio=allow_non_klio,
        )
    return with_envelope(df, "_el").drop("_el")
