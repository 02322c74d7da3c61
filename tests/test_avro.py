"""Avro event I/O without spark-avro: pure-Python container codec
(klio_spark.avro_codec, public Avro 1.11 spec) + the read_avro /
write_avro fallback paths (reference io.py:428-657 element-or-JSON and
{"element": bytes} conventions)."""

import io

import pytest

from klio_spark import avro_codec as ac


REC = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "element", "type": ["null", "bytes"]},
        {"name": "n", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "ok", "type": "boolean"},
    ],
}

ROWS = [
    {"element": b"a1", "n": -1, "score": 1.5, "tags": ["x", "y"],
     "props": {"k": 7}, "ok": True},
    {"element": None, "n": 2**40, "score": -0.0, "tags": [],
     "props": {}, "ok": False},
]


def test_varint_zigzag_edges():
    for n in [0, -1, 1, 63, -64, 2**31 - 1, -(2**31), 2**62, -(2**62)]:
        out = io.BytesIO()
        ac._write_long(out, n)
        assert ac._read_long(io.BytesIO(out.getvalue())) == n


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    blob = ac.write_container(REC, ROWS, codec=codec)
    assert blob[:4] == b"Obj\x01"
    back = list(ac.read_container(blob))
    assert back == ROWS
    assert ac.read_schema(blob)["name"] == "r"


def test_container_multi_block():
    rows = [{"element": str(i).encode(), "n": i, "score": 0.5, "tags": [],
             "props": {}, "ok": True} for i in range(10)]
    blob = ac.write_container(REC, rows, block_records=3)
    assert [r["n"] for r in ac.read_container(blob)] == list(range(10))


def test_union_branch_errors():
    with pytest.raises(ac.AvroError):
        out = io.BytesIO()
        ac.encode(out, ["null"], b"not-null")


def test_schema_mapping_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", 1, 2.0, True, b"p", ["t"])],
        "element string, n int, score double, ok boolean, payload binary, tags array<string>",
    )
    avro = ac.spark_to_avro_schema(df.schema)
    back = ac.avro_to_spark_schema(avro)
    assert [f.name for f in back.fields] == df.columns


def test_event_avro_roundtrip_fallback(spark, tmp_path):
    # sink → source through the registry, exercising the no-spark-avro path
    from klio_spark.config import EventIOConfig
    from klio_spark.sinks import write_event_output
    from klio_spark.sources import read_event_input
    from klio_spark.envelope import from_elements

    loc = str(tmp_path / "events_avro")
    df = from_elements(spark, ["e1", "e2", "e3"])
    write_event_output(df, EventIOConfig(type="avro", location=loc))
    files = list((tmp_path / "events_avro").glob("*.avro"))
    assert files, "fallback writer produced no .avro files"

    back = read_event_input(spark, EventIOConfig(type="avro", location=loc))
    els = sorted(r.element for r in back.collect())
    # {"element": bytes} records → element-or-JSON read convention
    assert els == ["e1", "e2", "e3"]
    assert set(back.columns) >= {"element", "payload", "version"}


def test_avro_fallback_preserves_types(spark, tmp_path):
    from klio_spark.sinks import write_avro_fallback
    from klio_spark.sources import batch as src

    loc = str(tmp_path / "typed")
    df = spark.createDataFrame(
        [("x", 5, 1.25, True), ("y", -7, float("inf"), False)],
        "s string, n long, d double, b boolean",
    )
    write_avro_fallback(df, loc)
    back = src.read_avro_fallback(spark, loc)
    rows = {r.s: r for r in back.collect()}
    assert rows["x"].n == 5 and rows["x"].d == 1.25 and rows["x"].b is True
    assert rows["y"].n == -7 and rows["y"].d == float("inf")
