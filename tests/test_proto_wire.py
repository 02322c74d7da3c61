"""KlioMessage protobuf wire codec (klio_spark.proto_wire) against
hand-derived proto3 wire bytes, plus DataFrame-level round-trips
(envelope.to_proto_wire / from_proto_wire).

Golden vectors are computed by hand from the public proto3 wire spec and
klio.proto's field numbers — they are what the reference's generated
KlioMessage class would serialize, so matching them IS the interop check
(the protobuf package itself is not in this container)."""

import datetime

from klio_spark import envelope as env
from klio_spark.proto_wire import decode_klio_message, encode_klio_message

UTC = datetime.timezone.utc


def test_golden_minimal_v2_anyone():
    # KlioMessage{metadata{intended_recipients{anyone{}}}, data{element="x1"}, version=V2}
    #   metadata  = field 1 LEN: recipients field 6 LEN -> anyone field 1 LEN(0)
    #   data      = field 2 LEN: element field 3 LEN "x1"
    #   version   = field 3 VARINT 2
    expected = bytes.fromhex("0a04" "3202" "0a00" "1204" "1a02" "7831" "1802")
    got = encode_klio_message(
        {"element": "x1", "version": 2, "recipients_mode": "anyone"}
    )
    assert got == expected
    back = decode_klio_message(expected)
    assert back["element"] == "x1"
    assert back["version"] == 2
    assert back["recipients_mode"] == "anyone"
    assert back["force"] is False and back["ping"] is False


def test_golden_flags_and_payload():
    # force=true (field 4), ping=true (field 5), payload=b"\x00\xff";
    # data = element(field 3, "e1") + payload(field 2)
    data = bytes.fromhex("1a02" "6531") + bytes.fromhex("1202" "00ff")
    expected = (
        bytes.fromhex("0a04" "2001" "2801")
        + bytes([0x12, len(data)]) + data
        + bytes.fromhex("1802")
    )
    got = encode_klio_message(
        {"element": "e1", "payload": b"\x00\xff", "version": 2,
         "force": True, "ping": True}
    )
    assert got == expected
    back = decode_klio_message(got)
    assert back["force"] and back["ping"] and back["payload"] == b"\x00\xff"


def test_limited_recipients_roundtrip():
    msg = {
        "element": "t9",
        "version": 2,
        "recipients_mode": "limited",
        "recipients": [
            {"job_name": "child", "project": "p1"},
            {"job_name": "parent", "project": "p1"},
        ],
        "trigger_children_of": {"job_name": "parent", "project": "p1"},
    }
    back = decode_klio_message(encode_klio_message(msg))
    assert back["recipients_mode"] == "limited"
    assert [j["job_name"] for j in back["recipients"]] == ["child", "parent"]
    assert back["trigger_children_of"]["job_name"] == "parent"


def test_audit_log_timestamps_survive():
    ts = datetime.datetime(2020, 6, 1, 12, 30, 45, 123456, tzinfo=UTC)
    msg = {
        "element": "a",
        "version": 2,
        "job_audit_log": [{"ts": ts, "job_name": "j1", "project": "p"}],
    }
    back = decode_klio_message(encode_klio_message(msg))
    assert back["job_audit_log"][0]["ts"] == ts
    assert back["job_audit_log"][0]["job_name"] == "j1"


def test_v1_entity_id_folds_to_element():
    # v1 writer: data.entity_id (field 1), version=V1
    blob = encode_klio_message({"element": "old-id", "version": 1})
    back = decode_klio_message(blob)
    assert back["element"] == "old-id"
    assert back["version"] == 1


def test_unknown_fields_skipped():
    base = encode_klio_message({"element": "x", "version": 2})
    # append an unknown field 15 (varint) and field 14 (LEN) — forward compat
    blob = base + bytes([15 << 3 | 0, 0x07]) + bytes([14 << 3 | 2, 0x02, 0xAA, 0xBB])
    assert decode_klio_message(blob)["element"] == "x"


def test_dataframe_proto_roundtrip(spark):
    from pyspark.sql import functions as F

    df = (
        env.from_elements(spark, ["p1", "p2"])
        .withColumn("payload", F.lit(b"\x01state"))
        .withColumn("force", F.col("element") == "p1")
        .withColumn("recipients_mode", F.lit(env.LIMITED))
        .withColumn("recipients", F.array(env.job_lit("j", "proj")))
    )
    from klio_spark.operators.audit import update_audit_log

    df = update_audit_log(df, "jobA", "projA")
    wire = env.to_proto_wire(df)
    assert wire.columns == ["value"]
    back = {r.element: r for r in env.from_proto_wire(wire).collect()}
    assert set(back) == {"p1", "p2"}
    assert bytes(back["p1"].payload) == b"\x01state"
    assert back["p1"].force and not back["p2"].force
    assert back["p1"].recipients[0].job_name == "j"
    assert back["p1"].job_audit_log[0].job_name == "jobA"
    assert back["p1"].job_audit_log[0].ts is not None


def test_read_text_wire_proto(spark, tmp_path):
    # batch file source with wire: proto — base64-encoded KlioMessage lines
    import base64

    from klio_spark.config import EventIOConfig
    from klio_spark.sources import read_event_input

    lines = [
        base64.b64encode(
            encode_klio_message(
                {"element": f"m{i}", "version": 2, "force": i == 0,
                 "recipients_mode": "anyone"}
            )
        ).decode()
        for i in range(2)
    ]
    (tmp_path / "in.txt").write_text("\n".join(lines) + "\n")
    cfg = EventIOConfig(type="file", location=str(tmp_path / "in.txt"),
                        options={"wire": "proto"})
    out = {r.element: r for r in read_event_input(spark, cfg).collect()}
    assert set(out) == {"m0", "m1"}
    assert out["m0"].force is True and out["m1"].force is False
    assert out["m0"].recipients_mode == "anyone"


def test_dataframe_proto_drops_garbage(spark):
    raw = spark.createDataFrame(
        [(b"\xff\xff\xff\xff",), (encode_klio_message({"element": "ok", "version": 2}),)],
        "value binary",
    )
    out = env.from_proto_wire(raw).collect()
    assert [r.element for r in out] == ["ok"]


def test_timestamp_roundtrip_pre_epoch():
    """Timestamp.seconds is int64: pre-1970 values must round-trip (the
    unsigned varint re-signs on decode) instead of crashing and dropping
    the message."""
    import datetime

    from klio_spark.proto_wire import _dec_timestamp, _enc_timestamp

    for ts in (
        datetime.datetime(1969, 12, 31, 23, 59, 59, tzinfo=datetime.timezone.utc),
        datetime.datetime(1950, 6, 1, tzinfo=datetime.timezone.utc),
    ):
        assert _dec_timestamp(_enc_timestamp(ts)) == ts
