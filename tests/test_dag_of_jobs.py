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
