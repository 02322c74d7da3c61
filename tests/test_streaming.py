"""Streaming tests: file-source Pub/Sub stand-in, availableNow triggers,
prologue-on-stream, windowed aggs, trigger-upstream."""

import json
import pathlib

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark import streaming as st
from klio_spark.config import DataIOConfig, EventIOConfig, KlioJobConfig
from klio_spark.operators import setup_prologue
from klio_spark.sources import read_event_input


@pytest.fixture()
def stream_in(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "batch1.txt").write_text("e1\ne2\ne3\n")
    (d / "batch2.txt").write_text("e3\ne4\n")
    return d


def _read_stream(spark, d):
    return read_event_input(
        spark, EventIOConfig(type="stream", location=str(d))
    )


def test_stream_source_to_text_sink(spark, stream_in, tmp_path):
    df = _read_stream(spark, stream_in)
    assert df.isStreaming
    q = st.write_stream_text(
        df, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    lines = sorted(
        line
        for f in (tmp_path / "out").glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert lines == ["e1", "e2", "e3", "e3", "e4"]


def test_streaming_prologue_with_existence(spark, stream_in, tmp_path):
    """The batch prologue operators work unchanged on a stream
    (stream-static join for the existence check)."""
    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    for e in ["e1", "e2", "e4"]:
        (blob_dir / f"{e}.ogg").write_bytes(b"x")

    df = _read_stream(spark, stream_in)
    cfg = KlioJobConfig(
        job_name="sjob",
        data_inputs=[DataIOConfig(location=str(blob_dir), file_suffix=".ogg")],
    )
    res = setup_prologue(df, cfg, spark)
    q = st.write_stream_text(
        res.process, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    lines = sorted(
        line
        for f in (tmp_path / "out").glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert lines == ["e1", "e2", "e4"]  # e3 input missing -> dropped


def test_trigger_upstream_publishes_rewritten_envelope(spark, stream_in, tmp_path):
    blob_dir = tmp_path / "blobs"
    blob_dir.mkdir()
    (blob_dir / "e1.ogg").write_bytes(b"x")

    df = _read_stream(spark, stream_in)
    cfg = KlioJobConfig(
        job_name="child",
        data_inputs=[DataIOConfig(location=str(blob_dir), file_suffix=".ogg")],
    )
    res = setup_prologue(df, cfg, spark)
    q = st.trigger_upstream(
        res.not_found,
        str(tmp_path / "upstream-topic"),
        str(tmp_path / "ckpt2"),
        upstream_job=("parent", "proj"),
        current_job=("child", "proj"),
    )
    q.awaitTermination(60)
    msgs = [
        json.loads(line)
        for f in pathlib.Path(tmp_path / "upstream-topic").rglob("part-*")
        for line in f.read_text().splitlines()
    ]
    elements = sorted(m["element"] for m in msgs)
    assert elements == ["e2", "e3", "e3", "e4"]
    m = msgs[0]
    assert m["recipients_mode"] == "limited"
    assert [r["job_name"] for r in m["recipients"]] == ["parent", "child"]
    assert m["trigger_children_of"]["job_name"] == "child"


def test_dedup_elements(spark, stream_in, tmp_path):
    df = _read_stream(spark, stream_in).withColumn("ts", F.current_timestamp())
    q = st.write_stream_text(
        st.dedup_elements(df, "ts"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(60)
    lines = sorted(
        line
        for f in (tmp_path / "out").glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert lines == ["e1", "e2", "e3", "e4"]  # e3 deduped


def test_sliding_windows_batch_semantics(spark, sf_dir):
    from klio_spark.queries import load

    (e,) = load(spark, sf_dir, "events")
    slid = st.sliding_counts(e, "ts", "1 hour", "30 minutes")
    # every event lands in exactly window/slide = 2 buckets
    total = slid.agg(F.sum("n_events")).collect()[0][0]
    assert total == e.count() * 2


def test_interval_join_stream_stream(spark, tmp_path):
    """errors joined to clicks of the same user within the prior 10 min."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    clicks_rows = [(1, t0), (1, t0 + dt.timedelta(minutes=30)), (2, t0)]
    errors_rows = [
        (1, t0 + dt.timedelta(minutes=5)),    # joins click@0 (5 min gap)
        (1, t0 + dt.timedelta(minutes=45)),   # joins click@30 (15 min gap)
        (2, t0 + dt.timedelta(minutes=25)),   # click@0 is 25 min old -> no match
    ]
    cdir, edir = tmp_path / "clicks", tmp_path / "errors"
    cdir.mkdir(), edir.mkdir()
    spark.createDataFrame(clicks_rows, "user_id long, cts timestamp").write.mode(
        "overwrite"
    ).parquet(str(cdir / "p"))
    spark.createDataFrame(errors_rows, "user_id long, ets timestamp").write.mode(
        "overwrite"
    ).parquet(str(edir / "p"))
    cstream = spark.readStream.schema("user_id long, cts timestamp").parquet(
        str(cdir / "p")
    )
    estream = spark.readStream.schema("user_id long, ets timestamp").parquet(
        str(edir / "p")
    )
    joined = st.interval_join(
        estream, cstream, "user_id", "ets", "cts",
        upper="interval 20 minutes",
    ).select(F.col("l.user_id").alias("user_id"), "ets", "cts")
    q = st.foreach_batch_sink(
        joined,
        lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/joined"),
        str(tmp_path / "ckpt-ij"),
    )
    q.awaitTermination(90)
    rows = spark.read.parquet(f"{tmp_path}/joined").collect()
    got = sorted((r.user_id, r.ets.minute, r.cts.minute) for r in rows)
    assert got == [(1, 5, 0), (1, 45, 30)]


def test_stateful_funnel_advances_in_order_across_batches(spark, tmp_path):
    """Streaming funnel twin of q108: strict stage order per user, state
    survives across micro-batches (user 1 completes over two batches;
    user 2's pre-signup view never counts, post-signup view does)."""
    import datetime as dt

    edir = tmp_path / "fin"
    (edir / "p").mkdir(parents=True)
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731

    b1 = spark.createDataFrame(
        [(1, "signup", t(0)), (1, "view", t(1)), (2, "view", t(0))],
        "user_id long, event_type string, ts timestamp",
    )
    b1.write.mode("append").parquet(str(edir / "p"))
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(str(edir / "p"))
    funnel = st.stateful_funnel(stream)
    q = st.foreach_batch_sink(
        funnel,
        lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/fout"),
        str(tmp_path / "ckpt-funnel"),
    )
    q.awaitTermination(60)

    # batch 2: user 1 finishes; user 2 signs up then views
    b2 = spark.createDataFrame(
        [(1, "click", t(2)), (1, "purchase", t(3)),
         (2, "signup", t(5)), (2, "view", t(6))],
        "user_id long, event_type string, ts timestamp",
    )
    b2.write.mode("append").parquet(str(edir / "p"))
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(str(edir / "p"))
    funnel = st.stateful_funnel(stream)
    q = st.foreach_batch_sink(
        funnel,
        lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/fout"),
        str(tmp_path / "ckpt-funnel"),
    )
    q.awaitTermination(60)

    rows = spark.read.parquet(f"{tmp_path}/fout").collect()
    reached = {}
    for r in rows:
        reached[r.user_id] = max(reached.get(r.user_id, 0), r.stage)
    assert reached == {1: 4, 2: 2}
    # user 2's batch-1 view emitted nothing (no signup yet)
    assert not [r for r in rows if r.user_id == 2 and r.stage_name == "view"
                and r.ts_micros < int(t(6).timestamp() * 1e6)]


def test_stateful_keep_latest_absorbs_out_of_order(spark, tmp_path):
    """Streaming changelog compactor: only newer-than-state rows emit;
    an out-of-order older value in a later batch is absorbed."""
    import datetime as dt

    edir = tmp_path / "kl"
    (edir / "p").mkdir(parents=True)
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731

    def run_batch(rows):
        spark.createDataFrame(
            rows, "element string, ts timestamp, value string"
        ).write.mode("append").parquet(str(edir / "p"))
        stream = spark.readStream.schema(
            "element string, ts timestamp, value string"
        ).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_keep_latest(stream),
            lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/klout"),
            str(tmp_path / "ckpt-kl"),
        )
        q.awaitTermination(60)

    run_batch([("k1", t(5), "v5"), ("k1", t(2), "v2"), ("k2", t(0), "w0")])
    # batch 2: k1 gets an OLDER row (absorbed) and k2 a newer one (emits)
    run_batch([("k1", t(3), "v3"), ("k2", t(9), "w9")])

    rows = spark.read.parquet(f"{tmp_path}/klout").collect()
    latest = {}
    for r in rows:
        if (r.element not in latest) or r.latest_ts_micros > latest[r.element][0]:
            latest[r.element] = (r.latest_ts_micros, r.latest_value)
    assert latest == {
        "k1": (int(t(5).timestamp() * 1e6), "v5"),
        "k2": (int(t(9).timestamp() * 1e6), "w9"),
    }
    # k1's batch-2 older row must NOT have produced an emission
    assert len([r for r in rows if r.element == "k1"]) == 1


def test_stateful_retention_emits_each_week_cell_once(spark, tmp_path):
    """Streaming retention twin of q109: one (user, cohort, offset) cell
    per newly-reached week; repeats in later batches are absorbed."""
    import datetime as dt

    edir = tmp_path / "ret"
    (edir / "p").mkdir(parents=True)
    day = lambda n, h=0: dt.datetime(2024, 1, 1 + n, h)  # noqa: E731

    def run_batch(rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).write.mode("append").parquet(str(edir / "p"))
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
            str(edir / "p")
        )
        q = st.foreach_batch_sink(
            st.stateful_retention(stream),
            lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/retout"),
            str(tmp_path / "ckpt-ret"),
        )
        q.awaitTermination(60)

    # user 1: days 0 and 15 (offsets 0, 2); user 2: day 7 (cohort wk 1)
    run_batch([(1, day(0)), (1, day(15)), (2, day(7))])
    # batch 2: user 1 day 16 (offset 2 again → absorbed), day 22 (offset 3)
    run_batch([(1, day(16)), (1, day(22))])

    rows = spark.read.parquet(f"{tmp_path}/retout").collect()
    cells = sorted((r.user_id, r.cohort_week, r.week_offset) for r in rows)
    assert cells == [(1, 0, 0), (1, 0, 2), (1, 0, 3), (2, 1, 0)]


def test_stateful_funnel_string_keys(spark, tmp_path):
    """The key column keeps its own type: a string-keyed stream funnels
    without a long cast (output schema derives from the input schema)."""
    import datetime as dt

    edir = tmp_path / "sfk"
    (edir / "p").mkdir(parents=True)
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    spark.createDataFrame(
        [("alice", "signup", t(0)), ("alice", "view", t(1))],
        "user_id string, event_type string, ts timestamp",
    ).write.mode("append").parquet(str(edir / "p"))
    stream = spark.readStream.schema(
        "user_id string, event_type string, ts timestamp"
    ).parquet(str(edir / "p"))
    q = st.foreach_batch_sink(
        st.stateful_funnel(stream),
        lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/sfkout"),
        str(tmp_path / "ckpt-sfk"),
    )
    q.awaitTermination(60)
    rows = spark.read.parquet(f"{tmp_path}/sfkout").collect()
    assert sorted((r.user_id, r.stage) for r in rows) == [
        ("alice", 1), ("alice", 2)
    ]
    assert dict(spark.read.parquet(f"{tmp_path}/sfkout").dtypes)[
        "user_id"
    ] == "string"


# slow-marked (VERDICT r10 item 1): idle-eviction/tombstone EDGE of
# keep_latest (~2 min); the op's batch-equivalence test (absorbs_out_
# of_order) stays in the default run.
@pytest.mark.slow
def test_stateful_keep_latest_idle_eviction_tombstones(spark, tmp_path):
    """State hygiene on unbounded keys: a key idle past the timeout is
    evicted and emits a tombstone (latest_ts_micros = -1)."""
    import datetime as dt
    import time as _time

    edir = tmp_path / "ev"
    (edir / "p").mkdir(parents=True)
    t0 = dt.datetime(2024, 1, 1)

    def run_batch(rows):
        spark.createDataFrame(
            rows, "element string, ts timestamp, value string"
        ).write.mode("append").parquet(str(edir / "p"))
        stream = spark.readStream.schema(
            "element string, ts timestamp, value string"
        ).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_keep_latest(stream, idle_timeout_ms=1),
            lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/evout"),
            str(tmp_path / "ckpt-ev"),
        )
        q.awaitTermination(60)

    run_batch([("k1", t0, "v")])
    _time.sleep(2)  # let the 1 ms idle timeout lapse between runs
    # k1 gets no data this batch → its timer fires → tombstone
    run_batch([("k2", t0, "w")])

    rows = spark.read.parquet(f"{tmp_path}/evout").collect()
    assert {"k1", "k2"} <= {r.element for r in rows}
    k1 = sorted(
        [r for r in rows if r.element == "k1"], key=lambda r: r.latest_ts_micros
    )
    assert k1[0].latest_ts_micros == -1 and k1[0].latest_value is None


def test_stateful_element_counts(spark, stream_in, tmp_path):
    """Custom stateful operator: totals accumulate across batches and
    survive a query restart via the checkpoint."""
    counted = st.stateful_element_counts(_read_stream(spark, stream_in))
    q = st.foreach_batch_sink(
        counted,
        lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/counts"),
        str(tmp_path / "ckpt-state"),
    )
    q.awaitTermination(60)
    rows = spark.read.parquet(f"{tmp_path}/counts").collect()
    totals = {}
    for r in rows:
        totals[r.element] = max(totals.get(r.element, 0), r.total_seen)
    assert totals == {"e1": 1, "e2": 1, "e3": 2, "e4": 1}

    # restart with new data: state restored from checkpoint, e3 -> 3
    (stream_in / "batch3.txt").write_text("e3\n")
    counted = st.stateful_element_counts(_read_stream(spark, stream_in))
    q = st.foreach_batch_sink(
        counted,
        lambda b, bid: b.write.mode("append").parquet(f"{tmp_path}/counts"),
        str(tmp_path / "ckpt-state"),
    )
    q.awaitTermination(60)
    rows = spark.read.parquet(f"{tmp_path}/counts").collect()
    assert max(r.total_seen for r in rows if r.element == "e3") == 3


def test_tumbling_and_session_windows_on_events(spark, sf_dir, tmp_path):
    """Batch-mode check of the streaming aggregation shapes (same code
    path; window()/session_window() work identically on static frames)."""
    from klio_spark.queries import load

    (e,) = load(spark, sf_dir, "events")
    tumb = st.tumbling_counts(e, "ts", "1 hour", "30 minutes", "event_type")
    assert tumb.filter(F.col("n_events") <= 0).count() == 0
    total = tumb.agg(F.sum("n_events")).collect()[0][0]
    assert total == e.count()

    sess = st.session_windows(e, "ts", "30 minutes", "30 minutes", "user_id")
    assert sess.agg(F.sum("n_events")).collect()[0][0] == e.count()
    # session semantics match the batch gaps-and-islands query (q51)
    from klio_spark.queries import all_queries

    q51 = all_queries()["q51_sessionization"].fn(spark, sf_dir)
    batch_sessions = {r.user_id: r.n_sessions for r in q51.collect()}
    stream_sessions = {
        r.user_id: r.n
        for r in sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert batch_sessions == stream_sessions


def test_bloom_blocklist_filters_stream_map_side(spark, stream_in, tmp_path):
    """The persisted-blocklist story end to end on a stream: a bloom
    bitmap built from a static blocklist quarantines blocked elements
    inside each microbatch via stream-static broadcast joins (bloom
    prefilter, then exact semi-join verify) — no stateful operator and
    no shuffle of the stream side."""
    from klio_spark.functions.bloom import bloom_semi_join

    blocked = spark.createDataFrame([("e2",), ("e4",), ("zz",)], ["blocked"])
    df = _read_stream(spark, stream_in)
    quarantined = bloom_semi_join(df, "element", blocked, "blocked")
    assert quarantined.isStreaming
    q = st.write_stream_text(
        quarantined, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)
    lines = sorted(
        line
        for f in (tmp_path / "out").glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert lines == ["e2", "e4"]


def test_stateful_sessionize_gap_close_and_watermark_timeout(spark, tmp_path):
    """Sessions close two ways: in-stream when a later event exceeds the
    gap (user 1), and by EVENT-TIME TIMEOUT when the watermark passes
    last+gap with no further events (user 2 — emitted in a later batch
    they never appear in). The open session (user 1's second) must NOT
    emit."""
    import datetime as dt

    edir = tmp_path / "sess"
    (edir / "p").mkdir(parents=True)
    schema = "user_id long, ts timestamp"
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_sessionize(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/sout"
            ),
            str(tmp_path / "ckpt-sess"),
        )
        q.awaitTermination(60)

    # b1: user 1 two close events (one open session), user 2 one event
    run([(1, t(0, 0)), (1, t(0, 1)), (2, t(0, 0))])
    # b2: user 1 at 2:00 — >30 min gap closes session 1 in-stream and
    # opens a second; watermark after this batch = 2:00 - 30m = 1:30
    run([(1, t(2, 0))])
    # b3: only user 3 — user 2's timeout (0:30) < watermark (1:30) fires
    run([(3, t(3, 0))])

    rows = spark.read.parquet(f"{tmp_path}/sout").collect()
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in rows
    }
    us = lambda d: int(d.timestamp() * 1_000_000)  # noqa: E731
    assert (1, us(t(0, 0)), us(t(0, 1)), 2) in got
    assert (2, us(t(0, 0)), us(t(0, 0)), 1) in got
    # user 1's 2:00 session and user 3's 3:00 session are still open
    assert not [r for r in rows if r.session_start_us >= us(t(2, 0))]
    assert len(got) == 2


# slow-marked: straggler-admission EDGE; sessionize's gap-close +
# watermark-timeout test stays in the default run.
@pytest.mark.slow
def test_stateful_sessionize_admitted_straggler_extends_start(
    spark, tmp_path
):
    """A cross-batch straggler ABOVE the watermark but BEFORE the carried
    session start must move the session start back (interval fold), not
    be swallowed with an unchanged start — the emitted record would
    otherwise claim n=2 while excluding the straggler's timestamp."""
    import datetime as dt

    edir = tmp_path / "sess2"
    (edir / "p").mkdir(parents=True)
    schema = "user_id long, ts timestamp"
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_sessionize(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/sout2"
            ),
            str(tmp_path / "ckpt-sess2"),
        )
        q.awaitTermination(60)

    # b1: user 1 at 1:00 -> watermark after b1 = 0:30
    run([(1, t(1, 0))])
    # b2: straggler at 0:45 (admitted: > 0:30) + 3:00 closes the session
    run([(1, t(0, 45)), (1, t(3, 0))])

    rows = spark.read.parquet(f"{tmp_path}/sout2").collect()
    us = lambda d: int(d.timestamp() * 1_000_000)  # noqa: E731
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in rows
    }
    assert got == {(1, us(t(0, 45)), us(t(1, 0)), 2)}


def test_stateful_transitions_matches_batch_matrix(spark, tmp_path):
    """stateful_transitions across two micro-batches (state carries the
    last event over the checkpoint boundary) must emit exactly the
    transitions q148's batch LAG window derives from the same events."""
    import datetime as dt

    edir = tmp_path / "trans"
    (edir / "p").mkdir(parents=True)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp"
    )
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    b1 = [(1, 1, "view", t(0)), (2, 1, "click", t(1)), (3, 2, "view", t(0))]
    b2 = [(4, 1, "purchase", t(2)), (5, 2, "click", t(3)), (6, 3, "view", t(4))]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_transitions(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/tout"
            ),
            str(tmp_path / "ckpt-trans"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)

    got = sorted(
        (r.user_id, r.prev_type, r.next_type)
        for r in spark.read.parquet(f"{tmp_path}/tout").collect()
    )
    # batch referee: LAG over the full event set
    full = spark.createDataFrame(b1 + b2, schema)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        (r.user_id, r.prev, r.event_type)
        for r in full.withColumn(
            "prev", F.lag("event_type").over(w)
        ).filter(F.col("prev").isNotNull()).collect()
    )
    assert got == want
    # user 1's cross-batch transition (click -> purchase) proves the
    # state survived the checkpoint boundary
    assert (1, "click", "purchase") in got


def test_stateful_transitions_null_event_type(spark, tmp_path):
    """NULL event_type must flow through as NULL, exactly like q148's
    batch LAG: X->NULL transitions emit (next_type NULL), NULL->Y
    transitions are suppressed (prev NULL), and the string 'None' never
    appears. The NULL crosses a micro-batch boundary via state."""
    import datetime as dt

    edir = tmp_path / "transnull"
    (edir / "p").mkdir(parents=True)
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp"
    )
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    b1 = [(1, 1, "view", t(0)), (2, 1, None, t(1))]
    b2 = [(3, 1, "click", t(2)), (4, 1, "purchase", t(3))]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_transitions(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/toutnull"
            ),
            str(tmp_path / "ckpt-transnull"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)

    got = sorted(
        (r.user_id, r.prev_type, r.next_type)
        for r in spark.read.parquet(f"{tmp_path}/toutnull").collect()
    )
    full = spark.createDataFrame(b1 + b2, schema)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want = sorted(
        (r.user_id, r.prev, r.event_type)
        for r in full.withColumn(
            "prev", F.lag("event_type").over(w)
        ).filter(F.col("prev").isNotNull()).collect()
    )
    assert got == want
    # the batch semantics concretely: view->NULL emitted, NULL->click
    # suppressed, click->purchase emitted, and no 'None' strings
    assert got == [(1, "click", "purchase"), (1, "view", None)]


def test_incremental_minhash_dedup_remembers_across_batches(
    spark, tmp_path
):
    """Ingestion dedup with persistent memory: batch 1 establishes the
    band table (within-batch near-dups collapse keep-first); batch 2's
    duplicate of a batch-1 doc is caught VIA THE STATE TABLE, not via
    anything in its own batch; a NEW stream seeded from the old state
    (seed_dir) still remembers everything; and a simulated crash-retry
    of a batch (same batch id, state already written) reproduces the
    same verdicts instead of quarantining its own docs."""
    docs1 = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different text about spark shuffles and parquet"),
    ]
    docs2 = [
        (4, "the quick brown fox jumps over the lazy dog again and again"),
        (5, "fresh novel content that matches nothing seen before here"),
    ]
    sdir = tmp_path / "in"
    (sdir / "p").mkdir(parents=True)
    schema = "doc_id long, text string"

    def dirset(name):
        return dict(
            state_dir=str(tmp_path / name / "state"),
            novel_dir=str(tmp_path / name / "novel"),
            dup_dir=str(tmp_path / name / "dup"),
        )

    def read_ids(d):
        return {
            r.doc_id
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(d)
            .collect()
        }

    def run(batch_rows, ckpt, dirs, **kw):
        if batch_rows:
            spark.createDataFrame(batch_rows, schema).write.mode(
                "append"
            ).parquet(str(sdir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(sdir / "p"))
        q = st.incremental_minhash_dedup(
            stream, checkpoint=str(tmp_path / ckpt), **dirs, **kw
        )
        q.awaitTermination(120)

    d1 = dirset("run1")
    run(docs1, "ck1", d1)
    assert read_ids(d1["novel_dir"]) == {1, 3}
    assert read_ids(d1["dup_dir"]) == {2}

    run(docs2, "ck1", d1)
    assert read_ids(d1["novel_dir"]) == {1, 3, 5}
    assert read_ids(d1["dup_dir"]) == {2, 4}

    # NEW stream (fresh checkpoint + fresh dirs) seeded from run1's
    # band table: the replayed corpus all hits seed bands -> everything
    # quarantines, nothing novel
    d2 = dirset("run2")
    run([], "ck2", d2, seed_dir=d1["state_dir"])
    assert read_ids(d2["dup_dir"]) == {1, 2, 3, 4, 5}
    assert spark.read.option("recursiveFileLookup", "true").parquet(
        d2["novel_dir"]
    ).count() == 0

    # crash-retry simulation on run1: batch 0's state subdir is already
    # on disk; replaying ids 1-3 as batch 0 must exclude that subdir
    # from its probe (path filter) and reproduce novel={1,3}, dup={2}
    import pathlib
    import shutil

    for d in (d1["novel_dir"], d1["dup_dir"]):
        shutil.rmtree(pathlib.Path(d) / "batch-0")
    # re-run batch 0 through a throwaway checkpoint so foreachBatch
    # assigns batch_id=0 again while run1's state (incl. its own
    # batch-0 bands AND batch-1 bands from docs2) is in place. Doc 5's
    # batch-1 bands must not disqualify docs 1-3 (no overlap), and
    # batch-0's own bands must be invisible to the probe.
    (sdir2 := tmp_path / "in2" / "p").mkdir(parents=True)
    spark.createDataFrame(docs1, schema).write.mode("append").parquet(
        str(sdir2)
    )
    stream = spark.readStream.schema(schema).parquet(str(sdir2))
    q = st.incremental_minhash_dedup(
        stream, checkpoint=str(tmp_path / "ck-retry"), **d1
    )
    q.awaitTermination(120)
    assert read_ids(d1["novel_dir"]) == {1, 3, 5}
    assert read_ids(d1["dup_dir"]) == {2, 4}


def test_compact_dedup_state_roundtrip(spark, tmp_path):
    """Compaction folds the per-batch state subdirs into one bucketed
    band table whose distinct bh set is unchanged — the probe side for
    the next lineage."""
    sdir = tmp_path / "state"
    for bid, vals in enumerate([[1, 2, 3], [3, 4]]):
        spark.createDataFrame(
            [(v, v * 100) for v in vals], "bh long, doc_id long"
        ).write.mode("overwrite").parquet(str(sdir / f"batch-{bid}"))
    try:
        compacted = st.compact_dedup_state(
            spark, str(sdir), "compact_seed_test", n_buckets=4
        )
        assert {r.bh for r in compacted.collect()} == {1, 2, 3, 4}
        # bucketed layout: re-read via the catalog, grouping on bh
        # needs no exchange
        plan = (
            spark.table("compact_seed_test")
            .groupBy("bh")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        # the table NAME is a valid seed: one batch through a gate
        # seeded by catalog name quarantines a doc whose bands are only
        # in the compacted table... (bh values here are synthetic, so
        # just assert the table-name branch resolves and probes)
        tdir = sdir.parent / "seedrun"
        (tdir / "in").mkdir(parents=True)
        import pyspark.sql.functions as SF  # noqa: N812

        spark.createDataFrame(
            [(9, "some text here")], "doc_id long, text string"
        ).write.mode("append").parquet(str(tdir / "in"))
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(tdir / "in")
        )
        q = st.incremental_minhash_dedup(
            stream,
            state_dir=str(tdir / "state"),
            novel_dir=str(tdir / "novel"),
            dup_dir=str(tdir / "dup"),
            checkpoint=str(tdir / "ck"),
            seed_dir="compact_seed_test",
        )
        q.awaitTermination(120)
        novel = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(str(tdir / "novel"))
            .collect()
        )
        assert {r.doc_id for r in novel} == {9}
    finally:
        spark.sql("DROP TABLE IF EXISTS compact_seed_test")


def test_streaming_psi_drift_matches_batch_kernel(spark, tmp_path):
    """streaming_psi_drift's finalize IS q139's oracle-verified kernel:
    the live monitor output must equal psi_from_counts applied batch-side
    to (reference ⟗ cumulative stream counts) — including after a
    checkpoint restart, which must resume the cumulative counts, and for
    a novel live-only category (enters totals; excluded rows floor to
    0 ppm on one side)."""
    import datetime as dt

    from klio_spark.functions.drift import psi_from_counts

    edir = tmp_path / "psi"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, event_type string, ts timestamp"
    t0 = dt.datetime(2024, 1, 1)
    ref = spark.createDataFrame(
        [("view", 600), ("click", 300), ("purchase", 100)],
        "event_type string, ca long",
    )
    b1 = [(i, "view", t0) for i in range(30)] + [
        (100 + i, "click", t0) for i in range(10)
    ]
    b2 = [(200 + i, "purchase", t0) for i in range(5)] + [
        (300 + i, "novel_type", t0) for i in range(55)
    ]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.streaming_psi_drift(
            stream,
            ref,
            lambda psi, bid: psi.write.mode("overwrite").parquet(
                f"{tmp_path}/psiout"
            ),
            str(tmp_path / "ckpt-psi"),
        )
        q.awaitTermination(60)

    def batch_referee(rows):
        live = (
            spark.createDataFrame(rows, schema)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
        )
        c = ref.join(live, "event_type", "full").select(
            "event_type",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
        )
        return {
            (r.event_type, r.ca, r.cb, r.pa_ppm, r.qb_ppm, r.psi_contrib)
            for r in psi_from_counts(c).collect()
        }

    run(b1)
    got1 = {
        tuple(r) for r in spark.read.parquet(f"{tmp_path}/psiout").collect()
    }
    assert got1 == batch_referee(b1)

    run(b2)  # restart: cumulative counts must include b1's
    got2 = {
        tuple(r) for r in spark.read.parquet(f"{tmp_path}/psiout").collect()
    }
    assert got2 == batch_referee(b1 + b2)
    # novel_type has ca=0 → pa_ppm floors to 0 → excluded row, but its
    # 55 events must have entered the comparison total (they shift every
    # qb_ppm); prove the exclusion actually happened
    assert not any(t[0] == "novel_type" for t in got2)


def test_rolling_distinct_sketch_closes_windows_exactly(spark, tmp_path):
    """rolling_distinct_sketch across a checkpoint restart: closed
    sliding windows must carry the same estimate the batch HLL rollup
    computes over the same membership (register state is an
    order-independent function of the element set), and windows only
    emit once the watermark passes their end."""
    import datetime as dt

    edir = tmp_path / "roll"
    (edir / "p").mkdir(parents=True)
    schema = "user_id long, ts timestamp"
    day = lambda d, u: (u, dt.datetime(2024, 1, d))  # noqa: E731
    b1 = [day(1, 1), day(1, 2), day(2, 2), day(2, 3)]
    b2 = [day(3, 3), day(3, 4), day(3, 5)]
    flush1 = [(999, dt.datetime(2024, 2, 1))]
    flush2 = [(998, dt.datetime(2024, 2, 10))]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.rolling_distinct_sketch(
                stream, "ts", "user_id", window="3 days", slide="1 day"
            ),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/rollout"
            ),
            str(tmp_path / "ckpt-roll"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)      # restart: day-1/2 sketch state must survive
    run(flush1)  # advances watermark past the data windows
    run(flush2)  # emission batch for windows flush1 unlocked

    out = spark.read.parquet(f"{tmp_path}/rollout").collect()
    got = {
        (r.window_start, r.window_end): r.approx_distinct for r in out
    }
    # every 3-day window overlapping days 1-3 has closed by now
    full = spark.createDataFrame(b1 + b2, schema)
    jan = dt.datetime(2024, 1, 1)
    want_windows = [
        (jan + dt.timedelta(days=o), jan + dt.timedelta(days=o + 3))
        for o in range(-2, 3)
    ]
    for ws, we in want_windows:
        referee = full.filter(
            (F.col("ts") >= ws) & (F.col("ts") < we)
        ).agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("bigint")
            .alias("n")
        ).collect()[0].n
        assert got[(ws, we)] == referee, (ws, we)
    # sanity on actual distinct membership: days 1-3 hold users 1-5
    assert got[(jan, jan + dt.timedelta(days=3))] == 5


def test_stateful_scd2_closed_versions_match_batch(spark, tmp_path):
    """stateful_scd2 across a checkpoint restart: the closed versions it
    emits must equal q145's batch LEAD-window history restricted to
    closed rows (valid_to NOT NULL) — same version numbers, intervals,
    and cent values — with the open version living in state (the
    documented append-mode relaxation)."""
    import datetime as dt

    edir = tmp_path / "scd2"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, user_id long, value double, ts timestamp"
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    b1 = [(1, 1, 10.01, t(0)), (2, 1, 20.02, t(5)), (3, 2, 5.5, t(1))]
    b2 = [(4, 1, 30.0, t(9)), (5, 2, None, t(7))]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_scd2(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/scdout"
            ),
            str(tmp_path / "ckpt-scd2"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)  # restart: user 1's open v2 and user 2's open v1 carry over

    got = sorted(
        (r.user_id, r.version, r.valid_from_s, r.valid_to_s,
         r.is_current, r.value_cents)
        for r in spark.read.parquet(f"{tmp_path}/scdout").collect()
    )
    # batch referee: the q145 window shape over the full changelog
    full = spark.createDataFrame(b1 + b2, schema)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ref = (
        full.select(
            "user_id",
            F.expr(
                "(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
                " + 62135596800000000) div 1000000 - 62135596800"
            ).alias("t_s"),
            F.floor(F.col("value") * 100.0).cast("bigint").alias("cents"),
            "event_id",
        )
        .select(
            "user_id",
            F.row_number().over(
                W.partitionBy("user_id").orderBy("t_s", "event_id")
            ).cast("long").alias("version"),
            F.col("t_s").alias("valid_from_s"),
            F.lead("t_s").over(
                W.partitionBy("user_id").orderBy("t_s", "event_id")
            ).alias("valid_to_s"),
            F.lead("t_s").over(
                W.partitionBy("user_id").orderBy("t_s", "event_id")
            ).isNull().alias("is_current"),
            "cents",
        )
    )
    want = sorted(
        (r.user_id, r.version, r.valid_from_s, r.valid_to_s,
         r.is_current, r.cents)
        for r in ref.filter(~F.col("is_current")).collect()
    )
    assert got == want
    # user 1 has two closed versions (10.01 then 20.02 cents), user 2 one
    assert [g[5] for g in got if g[0] == 1] == [1001, 2002]
    assert [g[5] for g in got if g[0] == 2] == [550]


def test_streaming_ks_drift_matches_batch_kernel(spark, tmp_path):
    """streaming_ks_drift's finalize IS q162's oracle-verified kernel:
    the live monitor must equal ks_from_counts applied batch-side to
    (reference ⟗ cumulative per-cent counts), cumulative across a
    checkpoint restart."""
    import datetime as dt

    from klio_spark.functions.drift import ks_from_counts

    edir = tmp_path / "ks"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, value double, ts timestamp"
    t0 = dt.datetime(2024, 1, 1)
    ref = spark.createDataFrame(
        [(1000, 50), (2000, 30), (3000, 20)], "cents long, ca long"
    )
    b1 = [(i, 10.0, t0) for i in range(20)] + [(100 + i, 20.0, t0) for i in range(10)]
    b2 = [(200 + i, 35.5, t0) for i in range(15)]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.streaming_ks_drift(
            stream,
            ref,
            lambda ks, bid: ks.write.mode("overwrite").parquet(
                f"{tmp_path}/ksout"
            ),
            str(tmp_path / "ckpt-ks"),
        )
        q.awaitTermination(60)

    def batch_referee(rows):
        live = (
            spark.createDataFrame(rows, schema)
            .groupBy(
                F.floor(F.col("value") * 100.0).cast("bigint").alias("cents")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
        )
        c = ref.join(live, "cents", "full").select(
            "cents",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
        )
        return [tuple(r) for r in ks_from_counts(c, "cents").collect()]

    run(b1)
    assert [
        tuple(r) for r in spark.read.parquet(f"{tmp_path}/ksout").collect()
    ] == batch_referee(b1)
    run(b2)  # restart resumes the per-cent counts
    assert [
        tuple(r) for r in spark.read.parquet(f"{tmp_path}/ksout").collect()
    ] == batch_referee(b1 + b2)


def test_stateful_cusum_alarms_match_replay(spark, tmp_path):
    """stateful_cusum across a checkpoint restart: alarm rows must equal
    a plain-python replay of Page's recurrences over the time-ordered
    events — including an alarm whose drift accumulates ACROSS the
    restart boundary — and in-control data raises no alarm."""
    import datetime as dt

    edir = tmp_path / "cusum"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, event_type string, value double, ts timestamp"
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    # target 10.00, slack 0.50, threshold 20.00
    # 'drift' runs at 15.00 (5.00-0.50=4.50 over target per event):
    # S_hi crosses 2000 cents on the 5th event — which lands in batch 2
    b1 = [(i, "drift", 15.0, t(i)) for i in range(3)] + [
        (100 + i, "ok", 10.0, t(i)) for i in range(6)
    ]
    b2 = [(3, "drift", 15.0, t(3)), (4, "drift", 15.0, t(4)),
          (106, "ok", 10.0, t(6))]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_cusum(
                stream,
                target_cents=1000,
                slack_cents=50,
                threshold_cents=2000,
            ),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/cusumout"
            ),
            str(tmp_path / "ckpt-cusum"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)

    rows = spark.read.parquet(f"{tmp_path}/cusumout").collect()
    got = sorted(
        (r.event_type, r.direction, r.statistic_cents, r.n_since_reset)
        for r in rows
    )
    # replay: per event +450 over slack-adjusted target; alarm at >2000
    # 450*5 = 2250 > 2000 on the 5th drift event
    assert got == [("drift", "up", 2250, 5)]
    us = int(dt.datetime(2024, 1, 1, 0, 4).timestamp() * 1_000_000)
    assert rows[0].ts_micros == us


def test_streaming_countmin_matches_batch_kernel(spark, tmp_path):
    """streaming_countmin across a checkpoint restart: the live counter
    table after each phase must equal build_countmin over the cumulative
    events cell-for-cell (the sketch is a cell-wise-additive function of
    the event multiset, so streaming accumulation == batch build), and
    its state stays bounded by depth*width."""
    from klio_spark.functions.countmin import build_countmin

    edir = tmp_path / "cm"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, user_id long"
    depth, width = 3, 8
    b1 = [(i, i % 5) for i in range(40)]
    b2 = [(100 + i, i % 17) for i in range(60)]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.streaming_countmin(
            stream,
            lambda c, bid: c.write.mode("overwrite").parquet(
                f"{tmp_path}/cmout"
            ),
            str(tmp_path / "ckpt-cm"),
            key_col="user_id",
            depth=depth,
            width=width,
        )
        q.awaitTermination(60)

    def batch_referee(rows):
        return {
            (r.cm_row, r.cm_bucket, r.cm_count)
            for r in build_countmin(
                spark.createDataFrame(rows, schema),
                "user_id",
                depth=depth,
                width=width,
            ).collect()
        }

    run(b1)
    got1 = {
        tuple(r) for r in spark.read.parquet(f"{tmp_path}/cmout").collect()
    }
    assert got1 == batch_referee(b1)
    assert len(got1) <= depth * width

    run(b2)  # restart: cumulative cells must include b1's
    got2 = {
        tuple(r) for r in spark.read.parquet(f"{tmp_path}/cmout").collect()
    }
    assert got2 == batch_referee(b1 + b2)
    assert len(got2) <= depth * width


def test_stateful_heavy_hitters_mg_guarantees(spark, tmp_path):
    """stateful_heavy_hitters across a checkpoint restart, against an
    exact batch referee: (1) every key whose true cumulative count
    exceeds its shard's err_bound is PRESENT; (2) each emitted estimate
    satisfies est <= true <= est + err_bound; (3) state stays bounded
    (<= capacity entries per shard); (4) restart resumes the summary,
    so a key that only becomes heavy ACROSS the boundary is found."""
    from collections import Counter

    from pyspark.sql import functions as F

    edir = tmp_path / "hh"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, user_id long"
    # phase 1: key 1 dominant, long distinct tail to force MG evictions
    b1 = [(i, 1) for i in range(60)] + [(1000 + i, 100 + i) for i in range(200)]
    # phase 2: key 2 becomes heavy only cumulatively (30 + 30), more tail
    b1 += [(5000 + i, 2) for i in range(30)]
    b2 = [(6000 + i, 2) for i in range(30)] + [
        (7000 + i, 400 + i) for i in range(150)
    ]
    n_shards, capacity = 4, 8

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_heavy_hitters(
                stream, "user_id", n_shards=n_shards, capacity=capacity
            ),
            lambda b, bid: b.withColumn("bid", F.lit(bid))
            .write.mode("append")
            .parquet(f"{tmp_path}/hhout"),
            str(tmp_path / "ckpt-hh"),
            output_mode="update",
        )
        q.awaitTermination(60)

    def check(seen_rows):
        # a shard only re-emits when it receives data, so its CURRENT
        # summary is its rows at its own latest batch id
        allrows = spark.read.parquet(f"{tmp_path}/hhout").collect()
        latest = {}
        for r in allrows:
            if r.shard not in latest or r.bid > latest[r.shard]:
                latest[r.shard] = r.bid
        rows = [r for r in allrows if r.bid == latest[r.shard]]
        true = Counter(str(u) for _, u in seen_rows)
        shard_of = {
            r.key: r.shard
            for r in spark.createDataFrame(
                [(k,) for k in true], "user_id string"
            )
            .select(
                F.col("user_id").alias("key"),
                F.pmod(F.xxhash64("user_id"), F.lit(n_shards))
                .cast("int")
                .alias("shard"),
            )
            .collect()
        }
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.shard, {})[r.key] = r
        for s, entries in by_shard.items():
            assert len(entries) <= capacity, (s, len(entries))
        emitted = {(r.shard, r.key) for r in rows}
        for k, t in true.items():
            s = shard_of[k]
            if s not in by_shard:
                continue  # summary wiped entirely (all-ties eviction)
            d = next(iter(by_shard[s].values())).err_bound
            if t > d:
                assert (s, k) in emitted, (k, t, d)
            if (s, k) in emitted:
                est = by_shard[s][k].est
                assert est <= t <= est + d, (k, est, t, d)
        return by_shard

    run(b1)
    check(b1)
    run(b2)
    by_shard = check(b1 + b2)
    # key 2 (30 + 30 = 60 occurrences) must be found post-restart
    s2 = [
        r for entries in by_shard.values() for r in entries.values()
        if r.key == "2"
    ]
    assert s2 and s2[0].est <= 60 <= s2[0].est + s2[0].err_bound


def test_streaming_quantile_sketch_rank_guarantee(spark, tmp_path):
    """streaming_quantile_sketch across a checkpoint restart: the live
    KLL table's median per group must satisfy the rank guarantee
    against the exact cumulative values (true normalized rank of the
    returned value within epsilon(k=200) ~ 1.65%, asserted with slack),
    and the restart must accumulate phase-1 values (a phase-2-only
    sketch would place phase-1's shifted median far off)."""
    from pyspark.sql import functions as F

    edir = tmp_path / "kll"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, event_type string, value double"
    # group 'a': phase 1 values 0..999, phase 2 values 5000..5499 —
    # cumulative median ~ 725 lives in phase-1 data
    b1 = [(i, "a", float(i)) for i in range(1000)]
    b2 = [(10_000 + i, "a", 5000.0 + i) for i in range(500)]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.streaming_quantile_sketch(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/kllout"
            ),
            str(tmp_path / "ckpt-kll"),
            group_col="event_type",
            value_col="value",
        )
        q.awaitTermination(60)

    def median_est():
        t = spark.read.parquet(f"{tmp_path}/kllout")
        return t.select(
            F.kll_sketch_get_quantile_double(
                F.col("kll_sketch"), F.lit(0.5)
            ).alias("m")
        ).collect()[0].m

    def true_rank(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    run(b1)
    vals1 = [v for _, _, v in b1]
    assert abs(true_rank(vals1, median_est()) - 0.5) <= 0.05

    run(b2)
    vals = vals1 + [v for _, _, v in b2]
    m = median_est()
    assert abs(true_rank(vals, m) - 0.5) <= 0.05
    # the cumulative median is in phase-1 territory (< 1000): proves the
    # restart resumed phase-1 sketch state rather than starting fresh
    assert m < 1000.0, m


# slow-marked: outer-emission EDGE; the stream-stream interval join
# itself stays covered in the default run.
@pytest.mark.slow
def test_interval_join_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: matched pairs emit like
    the inner join; a left row with no right match emits with NULLs
    only after the watermark proves no match can arrive. The final
    far-future batch advances the watermark past every left row's
    match window to flush the NULL-completed rows."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    cdir, edir = tmp_path / "clicks", tmp_path / "errors"
    (cdir / "p").mkdir(parents=True), (edir / "p").mkdir(parents=True)

    def write(d, rows, schema):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(d / "p")
        )

    # user 1's error has a click 5 min before (match); user 2's error
    # has no click at all (must emit with NULL cts)
    write(cdir, [(1, m(0))], "user_id long, cts timestamp")
    write(edir, [(1, m(5)), (2, m(6))], "user_id long, ets timestamp")

    def run():
        cstream = spark.readStream.schema(
            "user_id long, cts timestamp"
        ).parquet(str(cdir / "p"))
        estream = spark.readStream.schema(
            "user_id long, ets timestamp"
        ).parquet(str(edir / "p"))
        joined = st.interval_join_outer(
            estream, cstream, "user_id", "ets", "cts",
            upper="interval 20 minutes", watermark="10 minutes",
        ).select(F.col("l.user_id").alias("user_id"), "ets", "cts")
        q = st.foreach_batch_sink(
            joined,
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/joined"
            ),
            str(tmp_path / "ckpt-ijo"),
        )
        q.awaitTermination(120)

    run()
    # watermark-advancing batches on BOTH streams (hours later), then a
    # second pass so the state-store eviction emits the NULL row
    write(cdir, [(99, m(600))], "user_id long, cts timestamp")
    write(edir, [(99, m(600))], "user_id long, ets timestamp")
    run()
    write(cdir, [(98, m(1200))], "user_id long, cts timestamp")
    write(edir, [(98, m(1200))], "user_id long, ets timestamp")
    run()

    rows = spark.read.parquet(f"{tmp_path}/joined").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.ets.minute if r.ets else None,
             r.cts.minute if r.cts else None)
        )
    assert (5, 0) in by_user[1]
    assert (6, None) in by_user[2], by_user


def test_stateful_ewma_matches_python_replay(spark, tmp_path):
    """stateful_ewma across a checkpoint restart equals a plain-Python
    replay of the exact integer recurrence over the time-ordered
    cumulative events — including values straddling the restart
    boundary — and the first event seeds y = x * 2^20."""
    import datetime as dt
    import math

    edir = tmp_path / "ewma"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, user_id long, value double, ts timestamp"
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    b1 = [(1, 7, 10.0, t(0)), (2, 7, 14.5, t(1)), (3, 8, 3.25, t(0))]
    b2 = [(4, 7, 2.0, t(2)), (5, 8, 9.0, t(1))]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_ewma(stream, "user_id", "ts", "value", "event_id"),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/ewmaout"
            ),
            str(tmp_path / "ckpt-ewma"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)

    def replay(rows):
        out = {}
        state = {}
        for eid, uid, val, ts in sorted(rows, key=lambda r: (r[3], r[0])):
            x = int(math.floor(val * 100.0))
            y, n = state.get(uid, (0, 0))
            if n == 0:
                y = x << 20
            else:
                num = (x << 20) + y
                q = abs(num) // 2
                y = q if num >= 0 else -q
            state[uid] = (y, n + 1)
            out[eid] = y
        return out

    want = replay(b1 + b2)
    rows = spark.read.parquet(f"{tmp_path}/ewmaout").collect()
    got = {r.event_id: r.ewma_scaled for r in rows}
    assert got == want
    assert got[1] == int(math.floor(10.0 * 100.0)) << 20


def test_streaming_vocab_growth_matches_batch_across_restart(
    spark, tmp_path
):
    """streaming_vocab_growth emits each distinct word exactly once
    across the WHOLE stream, checkpoint restart included: batch 2 must
    emit only words absent from batch 1 (even though its docs repeat
    them), and the union of emissions equals the batch distinct
    vocabulary of the cumulative corpus — q182's first-occurrence
    semantics, word-for-word."""
    ddir = tmp_path / "vg"
    (ddir / "p").mkdir(parents=True)
    schema = "doc_id long, text string"
    b1 = [(1, "alpha beta gamma"), (2, "beta delta")]
    b2 = [(3, "gamma delta epsilon"), (4, "ALPHA zeta")]

    def run(batch_rows, out):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_vocab_growth(
            stream,
            "text",
            str(tmp_path / "ckpt-vg"),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/{out}"
            ),
        )
        q.awaitTermination(60)

    run(b1, "vgout1")
    got1 = {r.w for r in spark.read.parquet(f"{tmp_path}/vgout1").collect()}
    assert got1 == {"alpha", "beta", "gamma", "delta"}

    run(b2, "vgout2")
    got2 = {r.w for r in spark.read.parquet(f"{tmp_path}/vgout2").collect()}
    # only genuinely new words — restarts don't re-emit, lowercasing
    # folds ALPHA into the already-seen alpha
    assert got2 == {"epsilon", "zeta"}
    assert got1 | got2 == {
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    }


def test_stateful_attribution_matches_batch_twin(spark, tmp_path):
    """stateful_attribution across a checkpoint restart: per-channel
    attributed revenue equals q199's batch answer over the cumulative
    events — including a purchase whose crediting touch arrived in the
    PREVIOUS batch (state carries the touchpoint over), a lookback
    expiry ('direct'), and a same-second touch→purchase tie."""
    import datetime as dt

    edir = tmp_path / "attr"
    (edir / "p").mkdir(parents=True)
    t = lambda d, h=0, m=0: dt.datetime(2024, 1, 1 + d, h, m)  # noqa: E731

    schema = (
        "event_id long, user_id long, event_type string,"
        " value double, ts timestamp"
    )

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(edir / "p")
        )
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_attribution(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/attrout"
            ),
            str(tmp_path / "ckpt-attr"),
        )
        q.awaitTermination(60)

    # b1: user 1 clicks then buys (same second, tie by id); user 2 views
    run(
        [
            (1, 1, "click", None, t(0, 10)),
            (2, 1, "purchase", 10.0, t(0, 10)),
            (3, 2, "view", None, t(0)),
        ]
    )
    # b2: user 2 buys (credits the b1 view — state crossed the restart);
    # user 1 buys 9 days after its click -> lookback expired -> direct;
    # a refund must neither convert nor become a touch; a NULL-user
    # purchase must emit NOTHING (q199 filters user_id IS NOT NULL —
    # without the matching stream-side filter the null key would form
    # its own state group and emit a 'direct' row the twin never has)
    run(
        [
            (4, 2, "purchase", 5.5, t(1)),
            (5, 1, "purchase", 2.0, t(9)),
            (6, 2, "refund", None, t(9, 1)),
            (7, 2, "purchase", 1.0, t(9, 2)),
            (8, None, "purchase", 99.0, t(9, 3)),
        ]
    )

    rows = spark.read.parquet(f"{tmp_path}/attrout").collect()
    assert all(r.user_id is not None for r in rows)
    got = {}
    for r in rows:
        c, n = got.get(r.channel, (0, 0))
        got[r.channel] = (c + r.value_cents, n + 1)
    from klio_spark.queries import all_queries as _aq

    # batch twin over the SAME cumulative events: write them as an
    # events.parquet dir q199 can load
    tdir = tmp_path / "twin"
    tdir.mkdir()
    spark.read.parquet(str(edir / "p")).withColumn(
        "props", F.lit("{}")
    ).write.parquet(str(tdir / "events.parquet"))
    twin = {
        r.channel: (r.revenue_cents, r.n_purchases)
        for r in _aq()["q199_attribution_last_touch"]
        .fn(spark, str(tdir))
        .collect()
    }
    assert got == twin, (got, twin)
    # the tie case: user 1's first purchase credits the same-second,
    # lower-id click
    assert ("click", (1000, 1)) in twin.items() or twin["click"] == (1000, 1)
    assert twin["direct"] == (300, 2)  # expired lookback + post-refund buy


def test_streaming_char_coverage_matches_batch_kernel(spark, tmp_path):
    """streaming_char_coverage across a checkpoint restart: the live
    (lang, char) table after each phase equals the batch count over the
    cumulative stream character-for-character (cell-wise additivity,
    exactly the streaming_countmin argument), and state stays bounded
    by the union alphabet."""
    ddir = tmp_path / "scc"
    (ddir / "p").mkdir(parents=True)
    schema = "doc_id long, lang string, text string"
    b1 = [(1, "en", "abc abc"), (2, "de", "über straße"), (3, "en", None)]
    b2 = [(4, "en", "a b😀"), (5, "de", "ẞß"), (6, "zh", "漢漢字")]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_char_coverage(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/sccout"
            ),
            str(tmp_path / "ckpt-scc"),
        )
        q.awaitTermination(60)

    def live():
        return {
            (r.lang, r.c, r.cnt)
            for r in spark.read.parquet(f"{tmp_path}/sccout").collect()
        }

    def batch_kernel(rows):
        got = {}
        for _id, lang, text in rows:
            for ch in text or "":
                if ch in (" ", "\t", "\n", "\r", "\x0b", "\x0c"):
                    continue
                got[(lang, ch)] = got.get((lang, ch), 0) + 1
        return {(lg, ch, n) for (lg, ch), n in got.items()}

    run(b1)
    assert live() == batch_kernel(b1)
    run(b2)  # restart: cumulative counts must include b1's
    got = live()
    assert got == batch_kernel(b1 + b2)
    # NBSP stays inside a token stream as a real char; astral emoji is
    # one codepoint-level cell; alphabet-bounded state
    assert ("en", " ", 1) in got and ("en", "😀", 1) in got
    assert ("zh", "漢", 2) in got


def test_stateful_interval_coverage_matches_batch_twin(spark, tmp_path):
    """stateful_interval_coverage across a checkpoint restart: emitted
    closed islands reconcile exactly with q198's batch coverage over
    the cumulative REAL events — including an island closed by an
    event from a LATER batch (state crossed the restart), a merging
    overlap, a touching interval (s == max_end merges, the batch
    `s > prev_end` rule), and a wholly-past straggler that emits as
    its own closed island."""
    import datetime as dt

    edir = tmp_path / "cov"
    (edir / "p").mkdir(parents=True)
    t = lambda h, m=0: dt.datetime(2024, 3, 1, 0, 0) + dt.timedelta(  # noqa: E731
        hours=h, minutes=m
    )

    schema = "event_id long, user_id long, ts timestamp"

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(edir / "p")
        )
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_interval_coverage(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/covout"
            ),
            str(tmp_path / "ckpt-cov"),
        )
        q.awaitTermination(60)

    # b1: user 1 two overlapping intervals (merge), user 2 one
    run(
        [
            (1, 1, t(10, 0)),
            (2, 1, t(10, 20)),
            (3, 2, t(10, 0)),
        ]
    )
    # b2 (after restart): user 1 TOUCHING interval (10:50 == max_end
    # 10:20+30m -> merges, does not close); then a far event closing the
    # island; user 2: straggler 3h BEFORE its open island -> emits as its
    # own closed island immediately
    run(
        [
            (4, 1, t(10, 50)),
            (5, 1, t(20, 0)),
            (6, 2, t(7, 0)),
        ]
    )
    # b3: sentinel far-future events close every open REAL island; the
    # sentinel islands themselves stay in state and never emit
    run([(98, 1, t(9000)), (99, 2, t(9000))])

    got = {}
    for r in spark.read.parquet(f"{tmp_path}/covout").collect():
        n_int, secs, n_ev = got.get(r.user_id, (0, 0, 0))
        got[r.user_id] = (
            n_int + 1, secs + r.covered_secs, n_ev + r.n_events
        )

    # batch twin over the SAME cumulative events minus the sentinels
    from klio_spark.queries import all_queries as _aq

    tdir = tmp_path / "twin"
    tdir.mkdir()
    spark.read.parquet(str(edir / "p")).filter(
        F.col("event_id") < 90
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(str(tdir / "events.parquet"))
    twin = {
        r.user_id: (r.n_intervals, r.covered_secs)
        for r in _aq()["q198_interval_coverage"].fn(spark, str(tdir)).collect()
    }
    assert {u: (a, b) for u, (a, b, _) in got.items()} == twin, (got, twin)
    # user 1: one island spanning 10:00 -> 11:20 (merge + touch) plus the
    # 20:00 island; 3 + 1 real events emitted across them
    assert got[1] == (2, 80 * 60 + 30 * 60, 4)
    # user 2: the straggler island (07:00) + the 10:00 island
    assert got[2] == (2, 2 * 30 * 60, 2)


def test_streaming_script_mix_matches_batch_kernel(spark, tmp_path):
    """streaming_script_mix across a checkpoint restart: the live
    (lang, source) table equals q216's batch kernel over the cumulative
    stream cell-for-cell — a Cyrillic-в-in-latin doc flips to mixed, a
    pure doc doesn't, NULL text drops, and the b1 state survives the
    restart."""
    ddir = tmp_path / "smx"
    (ddir / "p").mkdir(parents=True)
    schema = "doc_id long, lang string, source string, text string"
    b1 = [
        (1, "en", "web", "plain latin text"),
        (2, "en", "web", "pаyрal login"),  # Cyrillic а/р homoglyphs
        (3, "en", "book", None),
    ]
    b2 = [
        (4, "ru", "web", "пример текста"),
        (5, "ru", "web", "пример with latin"),  # mixed
        (6, "zh", "web", "漢字"),
    ]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_script_mix(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/smxout"
            ),
            str(tmp_path / "ckpt-smx"),
        )
        q.awaitTermination(60)

    def live():
        return {
            (r.lang, r.source): (
                r.n_docs, r.n_mixed, r.latin_chars, r.cyr_chars,
                r.greek_chars, r.cjk_chars,
            )
            for r in spark.read.parquet(f"{tmp_path}/smxout").collect()
        }

    run(b1)
    got = live()
    # doc 2: latin + 2 Cyrillic homoglyphs (а, р) -> mixed
    assert got[("en", "web")] == (2, 1, 14 + 9, 2, 0, 0)
    assert ("en", "book") not in got  # NULL text dropped entirely
    run(b2)  # restart: cumulative
    got = live()
    assert got[("en", "web")] == (2, 1, 23, 2, 0, 0)  # b1 state survived
    assert got[("ru", "web")] == (2, 1, 9, 12 + 6, 0, 0)
    assert got[("zh", "web")] == (1, 0, 0, 0, 0, 2)


def test_streaming_calibration_matches_batch_kernel(spark, tmp_path):
    """streaming_calibration across a checkpoint restart: the live bin
    table equals q222's bins stage over the cumulative stream cell-for-
    cell — NULL n_chars land in bin 0 at conf 0, the clip pins long docs
    to bin 9, the Knuth-hash labels bit-agree with the batch query, and
    the b1 state survives the restart."""
    ddir = tmp_path / "cal"
    (ddir / "p").mkdir(parents=True)
    schema = "doc_id long, n_chars long"
    b1 = [(1, 40), (2, 2500), (3, None), (4, 950)]
    b2 = [(5, 951), (6, 120), (7, 2000), (8, 0)]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_calibration(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/calout"
            ),
            str(tmp_path / "ckpt-cal"),
        )
        q.awaitTermination(60)

    def live():
        return {
            r.bin_id: (r.n, r.sum_conf, r.n_pos)
            for r in spark.read.parquet(f"{tmp_path}/calout").collect()
        }

    def batch_bins(rows):
        # q222's bins stage on the cumulative prefix (the batch kernel)
        from klio_spark.queries.dataqual import _conf_label

        df = _conf_label(spark.createDataFrame(rows, schema))
        got = (
            df.groupBy(
                F.least(F.expr("conf_ppm div 100000"), F.lit(9)).alias(
                    "bin_id"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("conf_ppm").alias("sum_conf"),
                F.sum("label").alias("n_pos"),
            )
            .collect()
        )
        return {r.bin_id: (r.n, r.sum_conf, r.n_pos) for r in got}

    run(b1)
    got = live()
    assert got == batch_bins(b1)
    # the explicit shapes: NULL -> bin 0 conf 0; 2500 clips to bin 9
    assert got[0][0] >= 1 and 9 in got
    run(b2)  # restart: cumulative across the checkpoint
    assert live() == batch_bins(b1 + b2)


def test_streaming_benford_matches_batch_kernel(spark, tmp_path):
    """streaming_benford across a checkpoint restart: the live digit
    histogram equals q228's digit extraction over the cumulative stream
    — NULL and non-positive amounts drop, sub-1.00 amounts take their
    digit from the cents integer, and the b1 state survives restart."""
    ddir = tmp_path / "ben"
    (ddir / "p").mkdir(parents=True)
    schema = "l_extendedprice double"
    b1 = [(901.82,), (104997.88,), (None,), (0.0,), (-5.0,), (0.07,)]
    # 0.005 floors to 0 cents — outside Benford's 1..9 domain, must
    # drop via the c >= 1 guard (ADVICE r7) instead of crashing the
    # consumer's element_at(benford_arr, d) stage
    b2 = [(19.99,), (200.0,), (901.82,), (3.5,), (0.005,)]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_benford(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/benout"
            ),
            str(tmp_path / "ckpt-ben"),
        )
        q.awaitTermination(60)

    def live():
        return {
            r.d: r.n_obs
            for r in spark.read.parquet(f"{tmp_path}/benout").collect()
        }

    def replay(rows):
        out = {}
        for (x,) in rows:
            if x is None or x <= 0:
                continue
            c = int(x * 100 // 1)
            if c < 1:  # sub-cent: outside the first-digit domain
                continue
            d = int(str(c)[0])
            out[d] = out.get(d, 0) + 1
        return out

    run(b1)
    got = live()
    # 901.82 -> 9; 104997.88 -> 1; 0.07 -> 7 cents -> digit 7;
    # NULL / 0.0 / -5.0 drop
    assert got == {9: 1, 1: 1, 7: 1} == replay(b1)
    run(b2)  # restart: cumulative across the checkpoint
    assert live() == replay(b1 + b2)


def test_streaming_seasonality_matches_batch_kernel(spark, tmp_path):
    """streaming_seasonality across a checkpoint restart: the live
    168-cell histogram equals q243's integer calendar bucketing over
    the cumulative stream — including a pre-epoch timestamp (the
    week-aligned shift's reason to exist) and NULL drops."""
    import datetime as dt

    ddir = tmp_path / "sea"
    (ddir / "p").mkdir(parents=True)
    schema = "event_id long, ts timestamp"
    utc = dt.timezone.utc

    def mk(*args):
        return dt.datetime(*args, tzinfo=utc).replace(tzinfo=None)

    b1 = [
        (1, mk(2024, 1, 4, 10, 30)),   # Thursday -> dow 4
        (2, mk(2024, 1, 7, 0, 5)),     # Sunday -> dow 0
        (3, None),
        (4, dt.datetime(1969, 12, 31, 23, 0)),  # pre-epoch Wednesday
    ]
    b2 = [
        (5, mk(2024, 1, 4, 10, 59)),   # same cell as event 1
        (6, mk(2024, 1, 8, 23, 0)),    # Monday -> dow 1
    ]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_seasonality(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/seaout"
            ),
            str(tmp_path / "ckpt-sea"),
        )
        q.awaitTermination(60)

    def live():
        return {
            (r.dow, r.hod): r.n
            for r in spark.read.parquet(f"{tmp_path}/seaout").collect()
        }

    run(b1)
    got = live()
    # Thu 10h, Sun 0h, pre-epoch Wed 23h (1969-12-31 -> dow 3)
    assert got == {(4, 10): 1, (0, 0): 1, (3, 23): 1}
    run(b2)
    assert live() == {(4, 10): 2, (0, 0): 1, (3, 23): 1, (1, 23): 1}


def test_streaming_quantile_hist_matches_batch_kernel(spark, tmp_path):
    """streaming_quantile_hist across a checkpoint restart: the live
    (source, conf_ppm) table equals q232's h stage over the cumulative
    stream cell-for-cell — NULL n_chars scores 0, the clip pins long
    docs to 1,000,000 ppm, a NULL source keeps its own group, and the
    b1 state survives the restart. The global histogram the inverse-CDF
    mapping needs is the same table summed over sources (a projection,
    not more state), so h-equality pins the whole q232 derivation."""
    ddir = tmp_path / "qh"
    (ddir / "p").mkdir(parents=True)
    schema = "doc_id long, source string, n_chars long"
    b1 = [
        (1, "web", 40),
        (2, "web", 2500),
        (3, "book", None),
        (4, "book", 40),
    ]
    b2 = [
        (5, "web", 40),
        (6, None, 120),
        (7, "book", 2000),
        (8, "web", 0),
    ]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(ddir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(ddir / "p"))
        q = st.streaming_quantile_hist(
            stream,
            lambda b, bid: b.write.mode("overwrite").parquet(
                f"{tmp_path}/qhout"
            ),
            str(tmp_path / "ckpt-qh"),
        )
        q.awaitTermination(60)

    def live():
        return {
            (r.source, r.conf_ppm): r.cnt
            for r in spark.read.parquet(f"{tmp_path}/qhout").collect()
        }

    def batch_h(rows):
        # q232's h stage on the cumulative prefix (the batch kernel)
        df = spark.createDataFrame(rows, schema).select(
            "source",
            (
                F.least(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(2000))
                * 500
            )
            .cast("bigint")
            .alias("conf_ppm"),
        )
        got = (
            df.groupBy("source", "conf_ppm")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        return {(r.source, r.conf_ppm): r.cnt for r in got}

    run(b1)
    got = live()
    assert got == batch_h(b1)
    # explicit shapes: 2500 clips to 1e6 ppm; NULL n_chars scores 0
    assert got[("web", 1000000)] == 1 and got[("book", 0)] == 1
    run(b2)  # restart: cumulative across the checkpoint
    got = live()
    assert got == batch_h(b1 + b2)
    assert got[("web", 20000)] == 2  # b1 state survived and accumulated
    assert (None, 60000) in got  # NULL source keeps its own group


def test_stateful_page_hinkley_matches_batch_kernel(spark, tmp_path):
    """stateful_page_hinkley across a checkpoint restart: the live
    first-alarm rows must equal q263's batch kernel over the cumulative
    events — including an alarm whose drift accumulates ACROSS the
    restart boundary — and a stable key raises none. The live op and
    the batch query share one integer construction (floor(1000*s/n)
    running mean, dev accumulation, prefix-min), so (key, t_s) of the
    first crossing must agree exactly."""
    import datetime as dt

    from klio_spark.queries import all_queries

    edir = tmp_path / "ph"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, event_type string, value double, ts timestamp"
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    # 'drift': 4 calm events then a big sustained shift; the PH sum
    # crosses lambda (1000 cents) in batch 2. 'ok' stays at the mean.
    b1 = [(i, "drift", 10.0, t(i)) for i in range(4)] + [
        (100 + i, "ok", 10.0, t(i)) for i in range(8)
    ]
    b2 = [(10 + i, "drift", 60.0, t(10 + i)) for i in range(6)] + [
        (108 + i, "ok", 10.0, t(8 + i)) for i in range(4)
    ]

    def run(batch_rows):
        spark.createDataFrame(batch_rows, schema).write.mode(
            "append"
        ).parquet(str(edir / "p"))
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_page_hinkley(stream),
            lambda b, bid: b.write.mode("append").parquet(
                f"{tmp_path}/phout"
            ),
            str(tmp_path / "ckpt-ph"),
        )
        q.awaitTermination(60)

    run(b1)
    run(b2)
    live = {
        r.event_type: (r.t_s, r.n_at_alarm)
        for r in spark.read.parquet(f"{tmp_path}/phout").collect()
    }

    # batch kernel over the cumulative events
    kdir = tmp_path / "kernel"
    spark.createDataFrame(b1 + b2, schema).write.parquet(
        str(kdir / "events.parquet")
    )
    batch = {
        r.event_type: r.first_alarm_t_s
        for r in all_queries()["q263_page_hinkley"]
        .fn(spark, str(kdir))
        .collect()
    }
    assert set(batch) == {"drift", "ok"}
    assert batch["ok"] is None and "ok" not in live
    assert batch["drift"] is not None
    assert live["drift"][0] == batch["drift"]
    # the alarm event sits in batch 2: state crossed the restart
    alarm_ids = [e for e in b2 if e[1] == "drift"]
    assert live["drift"][0] >= int(alarm_ids[0][3].timestamp())


def test_stateful_rolling_distinct_matches_batch_kernel(spark, tmp_path):
    """stateful_rolling_distinct across a checkpoint restart: the
    latest live row per day must equal q259's batch kernel
    (n_active_7d) over the cumulative events — including windows whose
    membership accumulates ACROSS the restart — and duplicate
    (user, day) events must not inflate any count."""
    import datetime as dt

    from klio_spark.queries import all_queries

    edir = tmp_path / "rd"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, user_id long, ts timestamp"
    t = lambda d, hh=3: dt.datetime(2024, 1, 1 + d, hh)  # noqa: E731
    b1 = [
        (1, 10, t(0)),
        (2, 10, t(0, 9)),  # duplicate (user, day): must not inflate
        (3, 11, t(0)),
        (4, 12, t(2)),
        (5, None, t(1)),  # NULL user skipped
    ]
    b2 = [
        (6, 13, t(1)),  # joins day-0..1 windows across the restart
        (7, 10, t(8)),  # far day: new windows
        (8, 12, t(2, 9)),  # duplicate again, post-restart
    ]

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(edir / "p")
        )
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_rolling_distinct(stream),
            lambda b, bid: b.withColumn("_bid", F.lit(bid))
            .write.mode("append")
            .parquet(f"{tmp_path}/rdout"),
            str(tmp_path / "ckpt-rd"),
        )
        q.awaitTermination(60)

    def live_latest():
        rows = spark.read.parquet(f"{tmp_path}/rdout").collect()
        latest = {}
        for r in rows:
            k = r.day_epoch
            if k not in latest or r._bid > latest[k][0]:
                latest[k] = (r._bid, r.n_active_7d)
        return {k: v[1] for k, v in latest.items()}

    def batch(rows):
        kdir = tmp_path / f"kernel{len(rows)}"
        spark.createDataFrame(rows, schema).withColumn(
            "event_type", F.lit("view")
        ).withColumn("value", F.lit(1.0)).withColumn(
            "props", F.lit("{}")
        ).write.mode("overwrite").parquet(str(kdir / "events.parquet"))
        out = (
            all_queries()["q259_rolling_exact_distinct"]
            .fn(spark, str(kdir))
            .collect()
        )
        return {r.day_epoch: r.n_active_7d for r in out}

    run(b1)
    assert live_latest() == batch(b1)
    run(b2)
    got = live_latest()
    assert got == batch(b1 + b2)
    # the window is BACKWARD: target Jan 2 counts activity Dec 27-Jan 2
    # = users 10, 11 (Jan 1) + 13 (Jan 2); target Jan 3 adds 12 (Jan 3)
    jan2 = (dt.date(2024, 1, 2) - dt.date(1970, 1, 1)).days
    assert got[jan2] == 3 and got[jan2 + 1] == 4


def test_stateful_kaplan_meier_matches_batch_kernel(spark, tmp_path):
    """stateful_kaplan_meier across a checkpoint restart: the latest
    live (t0, te) snapshot per user, folded through q258's OWN oracle
    tail (risk sets -> floor(1e12*ln(1-d/n)) prefix sums) at the
    cumulative corpus's censor time, must equal the batch kernel row
    for row — including a te that tightens ACROSS the restart and a
    signup/purchase pair arriving in separate batches."""
    import datetime as dt

    import duckdb

    from klio_spark.queries import all_queries

    edir = tmp_path / "km"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    t = lambda d, hh=3: dt.datetime(2024, 1, 1 + d, hh)  # noqa: E731
    b1 = [
        (1, 10, "signup", t(0)),
        (2, 10, "purchase", t(2)),  # observed at day 2
        (3, 11, "signup", t(0)),  # censored (no purchase ever)
        (4, 12, "signup", t(1)),  # purchase arrives in b2
        (5, 12, "view", t(1, 9)),  # filtered event type
        (6, None, "signup", t(1)),  # NULL user skipped
        (7, 13, "purchase", t(0)),  # pre-signup purchase: never eligible
    ]
    b2 = [
        (8, 12, "purchase", t(4)),  # pairs with the b1 signup
        (9, 10, "purchase", t(1)),  # EARLIER eligible purchase: te tightens
        (10, 13, "signup", t(3)),  # censored from day 3
        (11, 14, "signup", t(5, 23)),  # censored same-day (t_day 0)
    ]

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(edir / "p")
        )
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_kaplan_meier(stream),
            lambda b, bid: b.withColumn("_bid", F.lit(bid))
            .write.mode("append")
            .parquet(f"{tmp_path}/kmout"),
            str(tmp_path / "ckpt-km"),
        )
        q.awaitTermination(60)

    def live_curve(cumulative):
        rows = spark.read.parquet(f"{tmp_path}/kmout").collect()
        latest = {}
        for r in rows:
            if r.user_id not in latest or r._bid > latest[r.user_id][0]:
                latest[r.user_id] = (r._bid, r.arm, r.t0, r.te)
        # the consumer's censor time: corpus max over ALL events with
        # (ts, user) present — q258's mx, chosen at fold time, not
        # baked into op state
        import pandas as _pd

        tmax = max(
            int(_pd.Timestamp(r[3]).value // 1_000_000_000)
            for r in cumulative
            if r[1] is not None and r[3] is not None
        )
        u = [
            {
                "arm": arm,
                "t_day": (te - t0) // 86400
                if te is not None
                else (tmax - t0) // 86400,
                "obs": 1 if te is not None else 0,
            }
            for (_bid, arm, t0, te) in latest.values()
        ]
        import pandas as pd

        con = duckdb.connect()
        con.register("u", pd.DataFrame(u))
        # q258's oracle tail, verbatim from the g-table down
        out = con.execute(
            """
            WITH g AS (
              SELECT arm, t_day, CAST(SUM(obs) AS BIGINT) AS d,
                     CAST(SUM(1 - obs) AS BIGINT) AS c
              FROM u GROUP BY arm, t_day
            ),
            r AS (
              SELECT arm, t_day, d, c,
                     CAST(SUM(d + c) OVER (PARTITION BY arm) AS BIGINT)
                     - CAST(COALESCE(SUM(d + c) OVER (
                         PARTITION BY arm ORDER BY t_day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS BIGINT) AS n_risk
              FROM g
            ),
            li AS (
              SELECT arm, t_day, d, c, n_risk,
                     CASE WHEN d = 0 THEN 0
                          WHEN d < n_risk THEN CAST(FLOOR(
                            1000000000000.0
                            * LN(1.0 - CAST(d AS DOUBLE) / n_risk))
                            AS BIGINT)
                     END AS lt,
                     CASE WHEN d >= n_risk AND d > 0 THEN 1 ELSE 0 END
                       AS dead
              FROM r
            ),
            cum AS (
              SELECT arm, t_day, d, c, n_risk,
                     CAST(SUM(lt) OVER w AS BIGINT) AS cl,
                     MAX(dead) OVER w AS cd
              FROM li
              WINDOW w AS (PARTITION BY arm ORDER BY t_day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            )
            SELECT CAST(arm AS BIGINT), CAST(t_day AS BIGINT), n_risk,
                   d, c,
                   CASE WHEN cd = 1 THEN 0.0
                        ELSE ROUND(EXP(CAST(cl AS DOUBLE)
                                       / 1000000000000.0), 6) END
            FROM cum
            """
        ).fetchall()
        return {(r[0], r[1]): r[2:] for r in out}

    def batch_curve(rows):
        kdir = tmp_path / f"km-kernel{len(rows)}"
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(kdir / "events.parquet")
        )
        out = all_queries()["q258_kaplan_meier"].fn(spark, str(kdir)).collect()
        return {
            (r.arm, r.t_day): (r.n_risk, r.n_event, r.n_censor, r.surv_r6)
            for r in out
        }

    run(b1)
    assert live_curve(b1) == batch_curve(b1)
    run(b2)
    got = live_curve(b1 + b2)
    assert got == batch_curve(b1 + b2)
    # user 10's te TIGHTENED across the restart (day 2 -> day 1): the
    # even arm must show its death at day 1, and user 14 censors at
    # day 0 (same-day signup vs corpus max)
    assert got[(0, 1)][1] == 1


def test_stateful_groupwise_ols_matches_batch_moments(spark, tmp_path):
    """stateful_groupwise_ols across a checkpoint restart: the latest
    live moment snapshot per key must equal q262's batch m-table
    (exact int64 moments, the kernel's own x/y integerization) on the
    cumulative corpus — including a key updated in both batches, a
    negative value (IEEE floor parity), NULL ts/value skips, and a
    NULL key riding as its own group."""
    import datetime as dt

    edir = tmp_path / "ols"
    (edir / "p").mkdir(parents=True)
    schema = "event_id long, event_type string, ts timestamp, value double"
    t = lambda h: dt.datetime(2024, 1, 1, 0) + dt.timedelta(hours=h)  # noqa
    b1 = [
        (1, "purchase", t(0), 10.25),
        (2, "purchase", t(3), -3.21),  # negative: floor(-320.99..) = -321
        (3, "view", t(1), 2.0),
        (4, "view", None, 99.0),  # NULL ts skipped
        (5, "view", t(2), None),  # NULL value skipped
        (6, None, t(4), 1.5),  # NULL key = its own group
    ]
    b2 = [
        (7, "purchase", t(50), 7.77),  # same key, second batch
        (8, "signup", t(6), 0.0),
        (9, None, t(5), -1.5),
    ]

    def run(rows):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(edir / "p")
        )
        stream = spark.readStream.schema(schema).parquet(str(edir / "p"))
        q = st.foreach_batch_sink(
            st.stateful_groupwise_ols(stream),
            lambda b, bid: b.withColumn("_bid", F.lit(bid))
            .write.mode("append")
            .parquet(f"{tmp_path}/olsout"),
            str(tmp_path / "ckpt-ols"),
        )
        q.awaitTermination(60)

    def batch_moments(rows):
        df = spark.createDataFrame(rows, schema)
        m = (
            df.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
            .select(
                "event_type",
                F.expr(
                    "((CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS BIGINT)"
                    " + 62135596800000000) div 1000000 div 3600)"
                    " - 17733240"
                ).alias("x"),
                F.floor(F.col("value") * 100.0).cast("bigint").alias("y"),
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum("x").cast("bigint").alias("sx"),
                F.sum("y").cast("bigint").alias("sy"),
                F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
                F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
                F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            )
        )
        return {
            r.event_type: (r.n, r.sx, r.sy, r.sxx, r.sxy, r.syy)
            for r in m.collect()
        }

    def live_moments():
        rows = spark.read.parquet(f"{tmp_path}/olsout").collect()
        latest = {}
        for r in rows:
            if r.event_type not in latest or r._bid > latest[r.event_type][0]:
                latest[r.event_type] = (
                    r._bid, r.n, r.sx, r.sy, r.sxx, r.sxy, r.syy,
                )
        return {k: v[1:] for k, v in latest.items()}

    run(b1)  # first stream run ends (checkpoint persists)
    assert live_moments() == batch_moments(b1)
    run(b2)  # RESTART from the checkpoint, folds only b2
    got = live_moments()
    assert got == batch_moments(b1 + b2)
    # the purchase key accumulated ACROSS the restart: n=3 spans both
    # batches, and the negative value's floor must read -321 cents
    assert got["purchase"][0] == 3
    assert batch_moments(b1)["purchase"][2] == 1025 - 321
