"""DAG-of-jobs end-to-end: the flagship klio execution pattern.

child job finds inputs missing → trigger_upstream publishes bottom-up
envelopes to the parent's topic → parent (reading the wire format)
processes ONLY messages addressed to it, produces the missing blobs →
child rerun now finds its inputs and processes top-down.
(Reference semantics: helpers.py:536-753 + klio.proto:41-75.)
"""

import pytest
from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark import streaming as st
from klio_spark.config import DataIOConfig, EventIOConfig, KlioJobConfig
from klio_spark.operators import setup_prologue
from klio_spark.operators.filters import check_recipients
from klio_spark.sources import read_event_input


def test_bottom_up_dag(spark, tmp_path):
    blobs = tmp_path / "blobs"
    blobs.mkdir()
    (blobs / "e1.bin").write_bytes(b"x")  # e1 exists; e2,e3 missing

    child_cfg = KlioJobConfig(
        job_name="child",
        data_inputs=[DataIOConfig(location=str(blobs), file_suffix=".bin")],
    )

    # --- child pass 1: e2,e3 missing -> trigger upstream ---
    src = tmp_path / "child-in"
    src.mkdir()
    (src / "work.txt").write_text("e1\ne2\ne3\n")
    events = read_event_input(
        spark, EventIOConfig(type="stream", location=str(src))
    )
    res = setup_prologue(events, child_cfg, spark)
    topic = tmp_path / "parent-topic"
    q = st.trigger_upstream(
        res.not_found,
        str(topic),
        str(tmp_path / "ckpt-up"),
        upstream_job=("parent", "proj"),
        current_job=("child", "proj"),
    )
    q.awaitTermination(60)

    # --- parent: consumes its topic in WIRE format, only addressed msgs ---
    parent_in = read_event_input(
        spark,
        EventIOConfig(
            type="stream", location=f"{topic}/batch-*", options={"wire": True}
        ),
    )
    addressed = check_recipients(parent_in, "parent", "proj")
    # an unrelated job sees nothing on the same topic
    stranger = check_recipients(parent_in, "stranger", "proj")

    def parent_work(batch_df, batch_id):
        for r in batch_df.select("element").collect():
            (blobs / f"{r.element}.bin").write_bytes(b"made-by-parent")

    q = st.foreach_batch_sink(
        addressed, parent_work, str(tmp_path / "ckpt-parent")
    )
    q.awaitTermination(60)
    assert (blobs / "e2.bin").exists() and (blobs / "e3.bin").exists()

    q = st.foreach_batch_sink(
        stranger,
        lambda b, bid: (_ for _ in ()).throw(AssertionError("stranger got msgs"))
        if b.count() else None,
        str(tmp_path / "ckpt-stranger"),
    )
    q.awaitTermination(60)

    # --- child pass 2 (bottom-up resume): the SAME wire messages now hit
    # the child; trigger_children_of == child flips limited -> anyone, and
    # all inputs exist ---
    child_in = read_event_input(
        spark,
        EventIOConfig(
            type="stream", location=f"{topic}/batch-*", options={"wire": True}
        ),
    )
    child_addressed = check_recipients(child_in, "child", "proj")
    res2 = setup_prologue(child_addressed, child_cfg, spark)
    out = tmp_path / "child-out"
    q = st.write_stream_text(res2.process, str(out), str(tmp_path / "ckpt-c2"))
    q.awaitTermination(60)
    done = sorted(
        line for f in out.glob("part-*") for line in f.read_text().splitlines()
    )
    assert done == ["e2", "e3"]


def test_trigger_upstream_proto_wire(spark, tmp_path):
    """trigger_upstream with wire_format=proto publishes real KlioMessage
    bytes an unmodified reference job could consume; our proto reader
    round-trips the routing metadata."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "w.txt").write_text("m1\nm2\n")
    events = read_event_input(spark, EventIOConfig(type="stream", location=str(src)))
    topic = tmp_path / "topic-proto"
    q = st.trigger_upstream(
        events,
        str(topic),
        str(tmp_path / "ckpt-p"),
        upstream_job=("parent", "proj"),
        current_job=("child", "proj"),
        wire_format="proto",
    )
    q.awaitTermination(60)

    # the raw lines decode as KlioMessage protobuf with the rewrite applied
    import base64

    from klio_spark.proto_wire import decode_klio_message

    lines = [
        line
        for f in topic.glob("batch-*/part-*")
        for line in f.read_text().splitlines()
    ]
    msgs = {m["element"]: m for m in map(
        lambda l: decode_klio_message(base64.b64decode(l)), lines
    )}
    assert set(msgs) == {"m1", "m2"}
    assert msgs["m1"]["recipients_mode"] == "limited"
    assert [j["job_name"] for j in msgs["m1"]["recipients"]] == ["parent", "child"]
    assert msgs["m1"]["trigger_children_of"]["job_name"] == "child"

    # and the engine's own proto reader consumes the topic
    back = read_event_input(
        spark,
        EventIOConfig(
            type="stream", location=f"{topic}/batch-*", options={"wire": "proto"}
        ),
    )
    got = []
    q = st.foreach_batch_sink(
        back,
        lambda b, bid: got.extend(r.element for r in b.select("element").collect()),
        str(tmp_path / "ckpt-pr"),
    )
    q.awaitTermination(60)
    assert sorted(got) == ["m1", "m2"]
