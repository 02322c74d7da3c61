"""Crash-MID-batch fuzz for the state-heaviest streaming ops.

The checkpoint-restart tests in test_streaming stop queries CLEANLY
between micro-batches; none kill one mid-trigger. This harness does:
a seeded batch N suffers a TORN failure — the foreachBatch writer has
already performed side effects (a partial or full output write) when
the "process dies" before the offset commit. Structured Streaming then
replays batch N from the checkpoint on restart. Exactly-once is the
claim that the final output equals a clean run's byte for byte — the
idempotent overwrite-by-batch_id sink discipline (documented on
foreach_batch_sink) plus deterministic stateful kernels make the
replayed attempt overwrite its own torn debris.

Covered (the 5 state-heaviest ops per VERDICT r5): stateful_keep_latest,
stateful_sessionize, stateful_scd2, stateful_heavy_hitters, and
incremental_minhash_dedup (whose internal sink is wrapped to die after
its three writes land but before the commit — the worst torn point:
all side effects visible, nothing committed).
"""

import datetime as dt
import os
import random

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pa_pq
import pytest
from pyspark.errors import StreamingQueryException
from pyspark.sql import functions as F

import klio_spark.streaming as st

_T0 = dt.datetime(2024, 1, 1)


def _write_batch_files(indir: str, pdfs: list[pd.DataFrame]) -> None:
    """One deterministic-named parquet file per micro-batch (the file
    source orders by mod-time; sequential writes keep batch order
    identical between the crash and clean runs). Timestamps coerce to
    micros — Spark refuses parquet TIMESTAMP(NANOS)."""
    os.makedirs(indir, exist_ok=True)
    for k, pdf in enumerate(pdfs):
        pa_pq.write_table(
            pa.Table.from_pandas(pdf),
            os.path.join(indir, f"b{k:03d}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )


def _run_to_end(start_query, expect_crash: bool):
    """Start the query; on the injected failure, restart once from the
    same checkpoint (the crash flag is single-shot)."""
    q = start_query()
    if expect_crash:
        with pytest.raises(StreamingQueryException) as ei:
            q.awaitTermination(300)
        assert "injected-crash" in str(ei.value), str(ei.value)[:500]
        q = start_query()
    q.awaitTermination(300)


def _canon_rows(spark, outdir: str):
    df = spark.read.option("recursiveFileLookup", "true").parquet(outdir)
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    return sorted(map(tuple, pdf.astype(str).itertuples(index=False)))


def _fuzz_op(spark, tmp_path, *, name, seed, build_op, schema, pdfs,
             output_mode=None):
    """Run `build_op(stream)` twice over the same 1-file micro-batches —
    once with a torn failure injected at a seeded batch, once clean —
    and assert the recursive outputs (including batch ids) are equal."""
    indir = str(tmp_path / f"{name}-in")
    _write_batch_files(indir, pdfs)
    crash_bid = random.Random(seed).randrange(1, len(pdfs) - 1)
    outs = {}
    for variant in ("crash", "clean"):
        outdir = str(tmp_path / f"{name}-out-{variant}")
        ckpt = str(tmp_path / f"{name}-ck-{variant}")
        crashed = [False]

        def writer(b, bid):
            out = b.withColumn("_bid", F.lit(bid))
            path = f"{outdir}/batch-{bid}"
            if variant == "crash" and bid == crash_bid and not crashed[0]:
                crashed[0] = True
                # torn write: one row lands, then the process "dies"
                # before the offset commit — replay must overwrite it
                out.limit(1).write.mode("overwrite").parquet(path)
                raise RuntimeError("injected-crash")
            out.write.mode("overwrite").parquet(path)

        def start():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(indir)
            )
            return st.foreach_batch_sink(
                build_op(stream), writer, ckpt, output_mode=output_mode
            )

        _run_to_end(start, expect_crash=(variant == "crash"))
        outs[variant] = _canon_rows(spark, outdir)
    assert outs["crash"], f"{name}: no output rows at all"
    assert outs["crash"] == outs["clean"], (
        f"{name}: crash-replayed output diverged from the clean run "
        f"(crash batch {crash_bid})"
    )
    return outs["clean"]


def _ts(minutes: float) -> dt.datetime:
    return _T0 + dt.timedelta(minutes=minutes)


def test_keep_latest_crash_fuzz(spark, tmp_path):
    rng = random.Random(101)
    pdfs = []
    for b in range(6):
        rows = [
            {
                "element": f"e{rng.randrange(6)}",
                # ties on purpose: same minute for different rows
                "ts": _ts(b * 10 + rng.randrange(10)),
                "value": f"v{rng.randrange(100)}",
            }
            for _ in range(rng.randrange(4, 12))
        ]
        pdfs.append(pd.DataFrame(rows))
    rows = _fuzz_op(
        spark, tmp_path, name="kl", seed=1,
        build_op=st.stateful_keep_latest,
        schema="element string, ts timestamp, value string",
        pdfs=pdfs,
    )
    # semantic spot-check vs a Python replay in batch-arrival order:
    # the newest emission per element carries the true latest value
    replay = {}
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            us = int(r.ts.timestamp() * 1e6) if pd.notna(r.ts) else None
            if r.element not in replay or us > replay[r.element][0]:
                replay[r.element] = (us, r.value)
    cols = ["_bid", "element", "latest_ts_micros", "latest_value"]
    got = {}
    for t in rows:  # tuples sorted by column-name order
        d = dict(zip(sorted(cols), t))
        k, us = d["element"], int(d["latest_ts_micros"])
        if k not in got or us > got[k][0]:
            got[k] = (us, d["latest_value"])
    assert got == replay


def test_sessionize_crash_fuzz(spark, tmp_path):
    rng = random.Random(202)
    pdfs = []
    for b in range(6):
        rows = [
            {
                "user_id": rng.randrange(1, 5),
                # each batch advances ~an hour so the 30-min gap closes
                # sessions in-stream and via watermark timeouts
                "ts": _ts(b * 60 + rng.randrange(25)),
            }
            for _ in range(rng.randrange(4, 10))
        ]
        pdfs.append(pd.DataFrame(rows))
    _fuzz_op(
        spark, tmp_path, name="sess", seed=2,
        build_op=st.stateful_sessionize,
        schema="user_id long, ts timestamp",
        pdfs=pdfs,
    )


def test_scd2_crash_fuzz(spark, tmp_path):
    rng = random.Random(303)
    pdfs, eid = [], 0
    for b in range(6):
        rows = []
        for _ in range(rng.randrange(4, 10)):
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "user_id": rng.randrange(1, 4),
                    "ts": _ts(b * 30 + rng.randrange(3) * 10),  # dense ties
                    "value": round(rng.uniform(0, 50), 2),
                }
            )
        pdfs.append(pd.DataFrame(rows))
    _fuzz_op(
        spark, tmp_path, name="scd2", seed=3,
        build_op=st.stateful_scd2,
        schema="event_id long, user_id long, ts timestamp, value double",
        pdfs=pdfs,
    )


def test_heavy_hitters_crash_fuzz(spark, tmp_path):
    rng = random.Random(404)
    pdfs, eid = [], 0
    for b in range(6):
        rows = []
        for _ in range(rng.randrange(30, 60)):
            eid += 1
            # zipf-ish: key 1 hot, long distinct tail forces evictions
            key = 1 if rng.randrange(3) == 0 else rng.randrange(1000)
            rows.append({"event_id": eid, "user_id": key})
        pdfs.append(pd.DataFrame(rows))
    _fuzz_op(
        spark, tmp_path, name="hh", seed=4,
        build_op=lambda s: st.stateful_heavy_hitters(
            s, "user_id", n_shards=4, capacity=8
        ),
        schema="event_id long, user_id long",
        pdfs=pdfs,
        output_mode="update",
    )


def test_incremental_minhash_dedup_crash_fuzz(spark, tmp_path):
    """The dedup stream's own sink dies AFTER its novel/dup/state writes
    land but BEFORE the commit — the replayed batch must exclude its own
    prior state write from the probe (or it would classify its own docs
    as duplicates) and reproduce the clean run's verdicts exactly."""
    rng = random.Random(505)
    pool = [
        " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "rho", "tau"])
            for _ in range(12)
        )
        for _ in range(8)
    ]
    pdfs, did = [], 0
    for b in range(5):
        rows = []
        for _ in range(rng.randrange(3, 7)):
            did += 1
            # half the docs repeat an earlier text: cross-batch dups
            rows.append(
                {"doc_id": did, "text": rng.choice(pool)}
            )
        pdfs.append(pd.DataFrame(rows))
    indir = str(tmp_path / "mh-in")
    _write_batch_files(indir, pdfs)
    crash_bid = random.Random(5).randrange(1, len(pdfs) - 1)

    orig_sink = st.foreach_batch_sink
    results = {}
    try:
        for variant in ("crash", "clean"):
            d = {
                k: str(tmp_path / f"mh-{k}-{variant}")
                for k in ("state_dir", "novel_dir", "dup_dir", "checkpoint")
            }
            crashed = [False]

            def wrap_sink(df, batch_fn, checkpoint, **kw):
                def wrapped(b, bid):
                    batch_fn(b, bid)  # all three writes happen first
                    if (
                        variant == "crash"
                        and bid == crash_bid
                        and not crashed[0]
                    ):
                        crashed[0] = True
                        raise RuntimeError("injected-crash")

                return orig_sink(df, wrapped, checkpoint, **kw)

            st.foreach_batch_sink = wrap_sink

            def start():
                stream = (
                    spark.readStream.schema("doc_id long, text string")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(indir)
                )
                return st.incremental_minhash_dedup(stream, **d)

            _run_to_end(start, expect_crash=(variant == "crash"))
            read = lambda p: {  # noqa: E731
                r.doc_id
                for r in spark.read.option("recursiveFileLookup", "true")
                .parquet(p)
                .select("doc_id")
                .collect()
            }
            results[variant] = (read(d["novel_dir"]), read(d["dup_dir"]))
    finally:
        st.foreach_batch_sink = orig_sink

    assert results["crash"] == results["clean"], (
        f"dedup verdicts diverged after crash at batch {crash_bid}"
    )
    novel, dup = results["clean"]
    assert novel and dup and not (novel & dup)
    assert novel | dup == set(range(1, did + 1))


def test_attribution_crash_fuzz(spark, tmp_path):
    rng = random.Random(606)
    pdfs, eid = [], 0
    for b in range(6):
        rows = []
        for _ in range(rng.randrange(6, 14)):
            eid += 1
            rows.append(
                {
                    "event_id": eid,
                    "user_id": rng.randrange(1, 5),
                    "event_type": rng.choice(
                        ["view"] * 4 + ["click"] * 3 + ["purchase"] * 2
                        + ["refund"]
                    ),
                    "value": round(rng.uniform(0, 40), 2),
                    "ts": _ts(b * 20 + rng.randrange(3) * 7),  # ties
                }
            )
        pdfs.append(pd.DataFrame(rows))
    _fuzz_op(
        spark, tmp_path, name="attr", seed=6,
        build_op=st.stateful_attribution,
        schema=(
            "event_id long, user_id long, event_type string,"
            " value double, ts timestamp"
        ),
        pdfs=pdfs,
    )
