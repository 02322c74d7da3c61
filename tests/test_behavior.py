"""Behavior-analytics queries (q108–q112): semantic invariants on real
data plus the plan properties the 100 TB story depends on."""

import pytest
from pyspark.sql import functions as F

from klio_spark import plans
from klio_spark.queries import all_queries


@pytest.fixture(scope="module")
def specs():
    return all_queries()


# ---------------------------------------------------------------- semantics


def test_funnel_is_monotone_and_lags_nonnegative(spark, sf_dir, specs):
    rows = specs["q108_event_funnel"].fn(spark, sf_dir).orderBy("step").collect()
    assert [r.step for r in rows] == ["1_signup", "2_view", "3_click", "4_purchase"]
    counts = [r.n_users for r in rows]
    # each stage requires the previous one strictly earlier → non-increasing
    assert counts == sorted(counts, reverse=True)
    assert all(r.sum_lag_secs >= 0 for r in rows)
    # the qualifying event must FOLLOW the prior stage: a user's stage-2
    # count can never exceed users who signed up at all
    assert counts[0] > 0


def test_funnel_strict_ordering_on_synthetic_frame(spark, specs, tmp_path):
    # user 1: signup→view→click→purchase in order (reaches stage 4)
    # user 2: view BEFORE signup, nothing after → stops at stage 1
    # user 3: never signs up → appears nowhere
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "signup"), (2, t(1), 1, "view"),
        (3, t(2), 1, "click"), (4, t(3), 1, "purchase"),
        (5, t(5), 2, "view"), (6, t(6), 2, "signup"),
        (7, t(0), 3, "view"), (8, t(1), 3, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    d = tmp_path / "sf"
    df.write.parquet(str(d / "events.parquet"))
    out = {
        r.step: r.n_users
        for r in specs["q108_event_funnel"].fn(spark, str(d)).collect()
    }
    assert out == {"1_signup": 2, "2_view": 1, "3_click": 1, "4_purchase": 1}


def test_retention_cohort_zero_offset_covers_every_user(spark, sf_dir, specs):
    df = specs["q109_retention_cohorts"].fn(spark, sf_dir)
    rows = df.collect()
    assert all(r.week_offset >= 0 for r in rows)
    # every user is active in their own first week, so the offset-0 cells
    # must sum to the total distinct-user count
    from klio_spark.queries import load

    (e,) = load(spark, sf_dir, "events")
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows if r.week_offset == 0) == n_users


def test_activity_runs_partition_events_exactly(spark, sf_dir, specs):
    df = specs["q110_activity_runs"].fn(spark, sf_dir)
    total = df.agg(F.sum("n_events")).collect()[0][0]
    from klio_spark.queries import load

    (e,) = load(spark, sf_dir, "events")
    assert total == e.count()  # runs partition the event log: no loss, no dup
    bad = df.filter(F.col("longest_run") > F.col("n_events")).count()
    assert bad == 0


def test_cdc_merge_row_accounting(spark, sf_dir, specs):
    from klio_spark.queries import load

    (c,) = load(spark, sf_dir, "customer")
    n_base = c.count()
    n_del = c.filter(F.col("c_custkey") % 17 == 0).count()
    n_ins = c.filter(F.col("c_custkey") % 23 == 0).count()
    out = specs["q111_cdc_merge"].fn(spark, sf_dir)
    n_merged = out.agg(F.sum("n_rows")).collect()[0][0]
    assert n_merged == n_base - n_del + n_ins
    segs = {r.seg for r in out.collect()}
    assert "NEW" in segs  # inserts surface with no base match


def test_negative_sampling_is_deterministic_and_self_free(spark, sf_dir, specs):
    a = specs["q112_negative_sampling"].fn(spark, sf_dir).collect()
    b = specs["q112_negative_sampling"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # replayable
    from klio_spark.queries import load

    (d,) = load(spark, sf_dir, "documents")
    n_docs = d.count()
    total_pairs = sum(r.n_pairs for r in a)
    # k=4 per anchor minus the filtered accidental self-pairs
    assert n_docs * 3 <= total_pairs <= n_docs * 4


def test_interval_overlap_bounds_and_banding(spark, sf_dir, specs):
    rows = specs["q114_interval_overlap_join"].fn(spark, sf_dir).collect()
    # two 8-day-inclusive windows overlap by 1..8 days, never more
    assert rows and all(1 <= r.overlap_days <= 8 for r in rows)
    # the banded plan must stay an equi join: no nested-loop fallback
    df = specs["q114_interval_overlap_join"].fn(spark, sf_dir)
    s = plans.plan_str(df)
    assert "CartesianProduct" not in s and "NestedLoop" not in s, s[:2000]


# ------------------------------------------------------------------- plans


def test_funnel_pushes_stage_filters_to_scan(spark, sf_dir, specs):
    df = specs["q108_event_funnel"].fn(spark, sf_dir)
    pf = " ".join(plans.pushed_filters(df))
    for etype in ("signup", "view", "click", "purchase"):
        assert etype in pf, pf  # each stage scans only its event type


def test_activity_runs_single_shuffle(spark, sf_dir, specs):
    # both windows and both aggs key on user_id → ONE exchange total; the
    # run agg and per-user agg are satisfied by the window's partitioning
    df = specs["q110_activity_runs"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) == 1, plans.plan_str(df)[:2000]


def test_cdc_merge_shuffle_budget(spark, sf_dir, specs):
    # full-outer join (2 exchanges on the merge key) + final agg = 3 max;
    # a bucketed-by-key base table would drop the join exchanges entirely
    df = specs["q111_cdc_merge"].fn(spark, sf_dir)
    assert plans.num_shuffles(df) <= 3, plans.plan_str(df)[:2000]


def test_keep_latest_uses_window_group_limit(spark, sf_dir, specs):
    # rn=1 must compact BEFORE the exchange: one row per key per partition
    df = specs["q113_keep_latest"].fn(spark, sf_dir)
    s = plans.plan_str(df)
    assert "WindowGroupLimit" in s, s[:2000]


def test_keep_latest_one_row_per_live_key(spark, sf_dir, specs):
    from klio_spark.queries import load

    df = specs["q113_keep_latest"].fn(spark, sf_dir)
    (e,) = load(spark, sf_dir, "events")
    n_keys = e.select("user_id", "event_type").distinct().count()
    assert df.count() == n_keys
    assert df.select("user_id", "event_type").distinct().count() == n_keys


def test_negative_sampling_corpus_count_is_broadcast(spark, sf_dir, specs):
    df = specs["q112_negative_sampling"].fn(spark, sf_dir)
    assert plans.broadcast_join_count(df) >= 1  # the COUNT(*) scalar
    assert plans.num_shuffles(df) <= 3, plans.plan_str(df)[:2000]


# ------------------------------------------- q199 segmented-window lever


def test_last_touch_segmented_equals_monolithic(spark, sf_dir):
    """The entity-window skew lever (VERDICT r6 item 3): segment_s
    splits each user's ordered window into per-(user, time-chunk)
    intra-chunk windows + a carry fold over the (user, chunk) summary
    table. Result must be HASH-IDENTICAL to the monolithic window —
    including carry-ins crossing chunk boundaries and the lookback
    expiring INSIDE a chunk."""
    from klio_spark.queries.behavior import last_touch_attribution

    from klio_spark.queries import load

    (e,) = load(spark, sf_dir, "events")
    mono = sorted(
        map(tuple, last_touch_attribution(e).collect())
    )
    # one-day chunks: lookback (7 d) spans many chunks, so most credits
    # resolve via the carry fold, not the intra-chunk window
    seg = sorted(
        map(tuple, last_touch_attribution(e, segment_s=86400).collect())
    )
    assert mono == seg
    # a chunk wider than the data collapses to one chunk/user — the
    # intra-chunk path must then reproduce the answer alone
    seg1 = sorted(
        map(
            tuple,
            last_touch_attribution(e, segment_s=2**40).collect(),
        )
    )
    assert mono == seg1


def test_last_touch_segmented_on_synthetic_edge_cases(spark):
    """Boundary semantics the random corpus may not pin: a touch as the
    LAST event of chunk k crediting a purchase FIRST in chunk k+1; an
    empty-touch chunk between touch and purchase (carry must skip it);
    same-second touch→purchase tie INSIDE one chunk; lookback expiry
    where the only candidate is a carry-in."""
    import datetime as dt

    from klio_spark.queries.behavior import last_touch_attribution

    t = lambda d, s=0: dt.datetime(2024, 1, 1 + d, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: click last-of-day-0, purchase first-of-day-1
        (1, 1, "click", None, t(0, 86399 % 60)),
        (2, 1, "purchase", 10.0, t(1, 0)),
        # user 2: view day 0, silent day 1-2, purchase day 3 (carry
        # crosses two empty chunks)
        (3, 2, "view", None, t(0)),
        (4, 2, "purchase", 5.0, t(3)),
        # user 3: touch day 0, purchase day 9 → lookback EXPIRED on a
        # carry-in → direct
        (5, 3, "click", None, t(0)),
        (6, 3, "purchase", 2.0, t(9)),
        # user 4: same-second tie in one chunk — lower event_id touch
        # credits
        (7, 4, "view", None, t(5)),
        (8, 4, "purchase", 1.0, t(5)),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string,"
        " value double, ts timestamp",
    )
    want = {
        ("click", 1, 1000),
        ("view", 2, 600),
        ("direct", 1, 200),
    }
    for seg in (None, 86400, 3600):
        got = {
            (r.channel, r.n_purchases, r.revenue_cents)
            for r in last_touch_attribution(e, segment_s=seg).collect()
        }
        assert got == want, f"segment_s={seg}: {got}"


def test_last_touch_segmented_window_is_chunk_partitioned(spark, sf_dir):
    """The plan property the lever exists for: with segment_s set, the
    event-level window partitions by (user_id, seg) — task width is
    bounded by the chunk, not the user — and NO window in the plan
    runs user-partitioned over raw events (only the carry fold over
    the per-chunk summary table does, whose per-user row count is
    #chunks)."""
    import re

    from klio_spark.queries import load
    from klio_spark.queries.behavior import last_touch_attribution

    (e,) = load(spark, sf_dir, "events")
    txt = plans.plan_str(
        last_touch_attribution(e, segment_s=86400), mode="simple"
    )
    win_specs = re.findall(
        r"Window \[[^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", txt
    )
    assert win_specs, txt
    chunked = [
        (p, o) for p, o in win_specs if "seg" in p and "user_id" in p
    ]
    assert chunked, f"no (user_id, seg)-partitioned window: {win_specs}"
    # windows partitioned by user_id ALONE must only be the carry fold:
    # ordered by seg, i.e. running over the per-chunk summary table
    # (rows per user = #chunks), never over raw events
    for p, o in win_specs:
        if "seg" not in p:
            assert o.strip().startswith("seg"), (
                f"event-level window not chunk-bounded: [{p}], [{o}]"
            )


# ------------------- generalized segmented-window lever (VERDICT r7 item 3)


def test_segmented_kernels_equal_monolithic(spark, sf_dir):
    """keep_latest / ewma_features / interval_coverage adopt the
    segmented_carry lever: with segment_s set, each must reproduce the
    monolithic window EXACTLY — one-day chunks (most state crosses
    chunks via the carry), one-hour chunks (many tiny chunks, empty
    chunks everywhere), and a chunk wider than the data (degenerates to
    the intra-chunk path alone)."""
    from klio_spark.queries import load
    from klio_spark.queries.behavior import (
        ewma_features,
        interval_coverage,
        keep_latest,
    )
    from klio_spark.queries.dataqual import page_hinkley

    (e,) = load(spark, sf_dir, "events")
    for fn in (keep_latest, ewma_features, interval_coverage,
               page_hinkley):
        mono = sorted(map(tuple, fn(e).collect()))
        for seg in (86400, 3600, 2**40):
            got = sorted(map(tuple, fn(e, segment_s=seg).collect()))
            assert got == mono, f"{fn.__name__} segment_s={seg}"


def test_keep_latest_segmented_edge_cases(spark):
    """Boundary semantics: NULL-ts rows (chunk to seg NULL, lose to any
    timestamped row, win by event_id among themselves), a same-second
    tie inside one chunk (event_id DESC breaks it), and a key whose
    events span chunks (the later chunk's winner must prevail)."""
    import datetime as dt

    from klio_spark.queries.behavior import keep_latest

    t = lambda d, s=0: dt.datetime(2024, 1, 1 + d, 0, 0, s)  # noqa: E731
    rows = [
        # user 1: two chunks; day-1 event wins
        (1, 1, "view", 1.0, t(0)),
        (2, 1, "view", 2.0, t(1)),
        # user 2: same-second tie; higher event_id wins
        (3, 2, "click", 3.0, t(0, 30)),
        (4, 2, "click", 4.0, t(0, 30)),
        # user 3: all-NULL ts; higher event_id wins
        (5, 3, "view", 5.0, None),
        (6, 3, "view", 6.0, None),
        # user 4: NULL ts loses to any timestamped event
        (7, 4, "view", 7.0, None),
        (8, 4, "view", 8.0, t(0)),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string,"
        " value double, ts timestamp",
    )
    want = sorted(map(tuple, keep_latest(e).collect()))
    assert [r[2] for r in want] == [2, 4, 6, 8]  # winners by event_id
    for seg in (86400, 3600):
        got = sorted(map(tuple, keep_latest(e, segment_s=seg).collect()))
        assert got == want, f"segment_s={seg}"


def test_ewma_segmented_edge_cases(spark):
    """Boundary semantics: lags reaching back across MULTIPLE chunks
    (1 event/day for 10 days — every lag >= 1 is a carry fill), a chunk
    with more than K-1 events (the per-chunk tail truncates, yet
    in-chunk lags still see all K-1), empty chunks between events, and
    the warmup mask (first rows' missing lags shorten the denominator
    identically on both paths)."""
    import datetime as dt

    from klio_spark.queries.behavior import ewma_features

    t = lambda d, s=0: dt.datetime(2024, 1, 1 + d, 0, 0, s)  # noqa: E731
    rows = []
    eid = 0
    # user 1: one event per day, days 0..9 (carry chains across chunks)
    for d in range(10):
        eid += 1
        rows.append((eid, 1, "view", float(d + 1), t(d)))
    # user 2: 12 same-day events (single chunk > K-1 events), then one
    # event 3 days later (its lags hit the truncated tail)
    for s in range(12):
        eid += 1
        rows.append((eid, 2, "view", float(s + 1), t(0, s)))
    eid += 1
    rows.append((eid, 2, "view", 99.0, t(3)))
    # NULL user_id rows: the monolithic window keeps them as their own
    # partition (only ts/value are filtered), so the segmented carry
    # join must be null-safe or they'd vanish (ADVICE r8)
    for d in range(4):
        eid += 1
        rows.append((eid, None, "view", float(10 * d + 1), t(d)))
    e = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string,"
        " value double, ts timestamp",
    )
    nkey = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    mono = sorted(map(tuple, ewma_features(e).collect()), key=nkey)
    assert any(r[0] is None for r in mono), "NULL-user rows must survive"
    for seg in (86400, 3600):
        got = sorted(
            map(tuple, ewma_features(e, segment_s=seg).collect()),
            key=nkey,
        )
        assert got == mono, f"segment_s={seg}"


def test_interval_coverage_segmented_edge_cases(spark):
    """Boundary semantics: an interval crossing the chunk edge (first
    island of the next chunk must merge via the carry), an island
    chain spanning THREE chunks (consecutive merges telescope), an
    empty chunk between islands (no merge), same-second ties, and a
    gap exactly at the 30-min boundary (s == prev_end merges — strict
    > starts a new island)."""
    import datetime as dt

    from klio_spark.queries.behavior import interval_coverage

    t = lambda h, m=0, s=0: dt.datetime(2024, 1, 1, h, m, s)  # noqa: E731
    rows = [
        # user 1: events at 00:50 and 01:10 — the 00:50 interval ends
        # 01:20, crossing the 01:00 hour-chunk edge; one merged island
        (1, 1, "view", None, t(0, 50)),
        (2, 1, "view", None, t(1, 10)),
        # user 2: chain 01:50 → 02:15 → 02:45 → 03:10 (each within 30
        # min of the previous end) — ONE island across three hour-chunks
        (3, 2, "view", None, t(1, 50)),
        (4, 2, "view", None, t(2, 15)),
        (5, 2, "view", None, t(2, 45)),
        (6, 2, "view", None, t(3, 10)),
        # user 3: islands at 05:00 and 08:00 with empty chunks between
        (7, 3, "view", None, t(5)),
        (8, 3, "view", None, t(8)),
        # user 4: second event EXACTLY at prev_end (10:00 + 30 min):
        # s == prev_end is NOT s > prev_end → same island
        (9, 4, "view", None, t(10, 0)),
        (10, 4, "view", None, t(10, 30)),
        # user 5: same-second tie
        (11, 5, "view", None, t(12, 0, 5)),
        (12, 5, "view", None, t(12, 0, 5)),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string,"
        " value double, ts timestamp",
    )
    mono = {
        (r.user_id, r.n_intervals, r.covered_secs)
        for r in interval_coverage(e).collect()
    }
    assert mono == {
        (1, 1, 3000),  # 00:50 → 01:40
        (2, 1, 6600),  # 01:50 → 03:40
        (3, 2, 3600),
        (4, 1, 3600),  # touching at the boundary merges
        (5, 1, 1800),
    }
    for seg in (3600, 86400, 900):
        got = {
            (r.user_id, r.n_intervals, r.covered_secs)
            for r in interval_coverage(e, segment_s=seg).collect()
        }
        assert got == mono, f"segment_s={seg}: {got}"


@pytest.mark.parametrize(
    "kernel", ["keep_latest", "ewma_features", "interval_coverage"]
)
def test_segmented_kernels_window_is_chunk_partitioned(
    spark, sf_dir, kernel
):
    """The plan property the lever exists for (same as q199's): with
    segment_s set, the pass over RAW EVENTS partitions by seg too —
    task width bounded by the chunk — and any coarser-keyed window runs
    only over a chunk-bounded table: the seg-ORDERED carry fold over
    the per-chunk summary (ewma/coverage), or keep_latest's second
    argmax pass over the per-chunk WINNERS (it sits strictly ABOVE the
    seg-partitioned chunk compaction, so its input has one row per
    (key, chunk))."""
    from klio_spark.queries import behavior, load

    (e,) = load(spark, sf_dir, "events")
    txt = plans.plan_str(
        getattr(behavior, kernel)(e, segment_s=86400), mode="simple"
    )
    lines = [
        (i, ln)
        for i, ln in enumerate(txt.splitlines())
        if "Window" in ln
    ]
    assert lines, txt
    # in a printed plan, children render BELOW their parent, so a larger
    # line index = deeper = closer to the raw scan
    seg_lines = [i for i, ln in lines if "seg" in ln]
    assert seg_lines, f"no seg-partitioned window pass:\n{txt[:2000]}"
    deepest_seg = max(seg_lines)
    for i, ln in lines:
        if "seg" not in ln:
            assert i < deepest_seg, (
                "a non-chunked window runs below the chunk compaction "
                f"(raw events):\n{ln}"
            )


def test_page_hinkley_segmented_edge_cases(spark):
    """Boundary semantics for the double-carry PH lever: the running
    MIN living in an earlier chunk than the alarm crossing (fold 2's
    prefix-min carry), the mean still warming up across a chunk edge
    (fold 1's count/sum carry), NULL event_type rows keeping their own
    partition through the null-safe joins, and timestamp ties ordered
    by event_id across the boundary."""
    import datetime as dt

    from klio_spark.queries.dataqual import page_hinkley

    t = lambda d, s=0: dt.datetime(2024, 1, 1 + d, 0, 0, s)  # noqa: E731
    rows = []
    eid = 0
    # 'dip-then-spike': day 0 runs LOW (m digs a deep min), day 2+
    # spikes — PH measures against day 0's min across two chunk edges
    for s in range(6):
        eid += 1
        rows.append((eid, "dipspike", 1.0, t(0, s)))
    for d in (2, 3, 4):
        for s in range(4):
            eid += 1
            rows.append((eid, "dipspike", 900.0, t(d, s)))
    # ties at the same second, order decided by event_id
    eid += 1
    rows.append((eid, "dipspike", 5.0, t(2, 0)))
    # NULL key series: must survive the segmented path identically
    for d in range(4):
        eid += 1
        rows.append((eid, None, float(100 * d), t(d)))
    e = spark.createDataFrame(
        rows,
        "event_id long, event_type string, value double, ts timestamp",
    )
    nkey = lambda r: tuple((x is None, x) for x in r)  # noqa: E731
    mono = sorted(map(tuple, page_hinkley(e).collect()), key=nkey)
    assert any(r[0] is None for r in mono), "NULL-key series must survive"
    # the spike must actually alarm, else the test proves nothing
    byk = {r[0]: r for r in mono}
    assert byk["dipspike"][3] is not None, "expected an alarm"
    for seg in (86400, 3600, 7200):
        got = sorted(
            map(tuple, page_hinkley(e, segment_s=seg).collect()), key=nkey
        )
        assert got == mono, f"segment_s={seg}"
