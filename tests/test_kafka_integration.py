"""Kafka wire round-trip — marker-gated integration test.

The sandbox ships no spark-sql-kafka package and no broker, so this
module SKIPS cleanly here; on a host with both (set
``KLIO_SPARK_KAFKA_BOOTSTRAP=host:9092`` and launch Spark with
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``)
it exercises the one path no file-source test can: real KlioMessage
protobuf bytes travelling through Kafka record values —
write_stream_kafka (proto wire out) → read_stream with
``topic``+``wire: proto`` (proto wire in) — asserting the full envelope
(element, payload bytes, routing metadata) survives the hop, per
envelope.py's codec contract (reference serializer.py:58-168).

Run explicitly with: pytest -m kafka tests/test_kafka_integration.py
"""

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KLIO_SPARK_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.kafka


def _kafka_source_available(spark) -> bool:
    """True when the spark-sql-kafka data source is on the classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@pytest.fixture()
def kafka_env(spark):
    if not BOOTSTRAP:
        pytest.skip("KLIO_SPARK_KAFKA_BOOTSTRAP not set — no broker")
    if not _kafka_source_available(spark):
        pytest.skip("spark-sql-kafka package not on the classpath")
    return BOOTSTRAP


def test_proto_wire_roundtrip_through_kafka(spark, kafka_env, tmp_path):
    from klio_spark import envelope as env
    from klio_spark import streaming as st
    from klio_spark.config import EventIOConfig
    from klio_spark.sources.stream import read_stream

    topic = f"klio-spark-it-{uuid.uuid4().hex[:8]}"

    # publish: elements with routing metadata and a binary payload
    out_df = env.from_elements(spark, ["e1", "e2"]).withColumn(
        "payload", env.F.lit(b"\x00\xffraw")
    )
    # a bounded stream over the static frame: write via the streaming
    # sink so the checkpointed exactly-once path is what's tested
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    (src_dir / "b.txt").write_text("e1\ne2\n")
    stream = read_stream(
        spark, EventIOConfig(type="stream", location=str(src_dir))
    ).withColumn("payload", env.F.lit(b"\x00\xffraw"))
    q = st.write_stream_kafka(
        stream,
        topic,
        kafka_env,
        str(tmp_path / "ckpt-out"),
        wire_format="proto",
    )
    q.awaitTermination(120)

    # consume: topic + wire: proto → envelope columns restored
    back = read_stream(
        spark,
        EventIOConfig(
            type="stream",
            topic=topic,
            options={
                "wire": "proto",
                "kafka.bootstrap.servers": kafka_env,
                "startingOffsets": "earliest",
            },
        ),
    )
    sink = tmp_path / "roundtrip"
    bq = (
        back.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt-in"))
        .trigger(availableNow=True)
        .start()
    )
    bq.awaitTermination(120)

    rows = sorted(
        spark.read.parquet(str(sink)).collect(), key=lambda r: r.element
    )
    assert [r.element for r in rows] == ["e1", "e2"]
    for r in rows:
        assert bytes(r.payload) == b"\x00\xffraw"
        assert r.recipients_mode is not None  # routing metadata survived
