from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark.metrics import CollectingRelay, LoggerRelay, MetricsRegistry


def test_observe_and_flush(spark):
    relay = CollectingRelay()
    reg = MetricsRegistry("job-x", relays=[relay])
    df = env.from_elements(spark, ["a", "b", "c"])
    observed = reg.observe(df.filter(F.col("element") != "b"), "kept")
    with reg.timer("work"):
        assert observed.count() == 2
    reg.incr("custom", 5)
    out = reg.flush()
    assert out["kept.count"] == 2
    assert out["custom"] == 5
    assert out["work_sec"] >= 0
    assert relay.records[0][0] == "job-x"
    # registry resets after flush
    assert reg.flush() == {}


def test_multi_agg_observation(spark):
    relay = CollectingRelay()
    reg = MetricsRegistry("job-y", relays=[relay])
    df = env.from_elements(spark, ["aa", "bbb", "c"])
    observed = reg.observe(
        df, "sizes", F.count(F.lit(1)).alias("n"),
        F.sum(F.length("element")).alias("chars"),
    )
    observed.collect()
    out = reg.flush()
    assert out["sizes.n"] == 3 and out["sizes.chars"] == 6


def test_logger_relay_smoke(spark, caplog):
    import logging

    reg = MetricsRegistry("job-z", relays=[LoggerRelay()])
    reg.incr("hits", 2)
    with caplog.at_level(logging.INFO, logger="klio_spark.metrics"):
        reg.flush()
    assert any("hits=2" in r.message for r in caplog.records)
