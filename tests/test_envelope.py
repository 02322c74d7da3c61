from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark.operators import filters


def test_from_elements_schema(spark):
    df = env.from_elements(spark, ["a", "b", "c"])
    assert set(env.ENVELOPE_COLS) <= set(df.columns)
    rows = df.collect()
    assert sorted(r.element for r in rows) == ["a", "b", "c"]
    assert all(r.version == 2 and not r.force and not r.ping for r in rows)
    assert all(r.recipients_mode == env.ANYONE for r in rows)


def test_pack_unpack_payload(spark):
    df = env.from_elements(spark, ["x"]).withColumn("n", F.lit(7))
    packed = env.pack_payload(df, "n")
    out = env.unpack_payload(packed.drop("n"), "n int").collect()[0]
    assert out.n == 7


def test_clear_payload_if_unchanged(spark):
    df = env.from_elements(spark, ["x"])
    df = df.withColumn("payload", F.lit(b"same"))
    cleared = env.clear_payload_if_unchanged(df, F.lit(b"same"))
    assert cleared.collect()[0].payload is None
    kept = env.clear_payload_if_unchanged(df, F.lit(b"other"))
    assert bytes(kept.collect()[0].payload) == b"same"


def test_ping_filter(spark):
    df = env.from_elements(spark, ["a", "b"]).withColumn(
        "ping", F.col("element") == "a"
    )
    split = filters.filter_ping(df)
    assert [r.element for r in split.process.collect()] == ["b"]
    assert [r.element for r in split.pass_thru.collect()] == ["a"]


def test_force_filter(spark):
    df = env.from_elements(spark, ["a", "b"]).withColumn(
        "force", F.col("element") == "a"
    )
    split = filters.filter_force(df)
    assert [r.element for r in split.process.collect()] == ["a"]
    # config-level force overrides
    split_all = filters.filter_force(df, data_output_force=True)
    assert split_all.process.count() == 2


def test_recipients_anyone_and_limited(spark):
    df = env.from_elements(spark, ["any", "mine", "other"])
    df = df.withColumn(
        "recipients_mode",
        F.when(F.col("element") == "any", F.lit(env.ANYONE)).otherwise(
            F.lit(env.LIMITED)
        ),
    ).withColumn(
        "recipients",
        F.when(
            F.col("element") == "mine",
            F.array(env.job_lit("job1", "proj")),
        ).otherwise(F.array(env.job_lit("job2", "proj"))),
    )
    kept = filters.check_recipients(df, "job1", "proj")
    assert sorted(r.element for r in kept.collect()) == ["any", "mine"]


def test_recipients_bottom_up_flip(spark):
    df = env.from_elements(spark, ["m"]).withColumn(
        "recipients_mode", F.lit(env.LIMITED)
    ).withColumn(
        "recipients", F.array(env.job_lit("job1", "proj"))
    ).withColumn(
        "trigger_children_of", env.job_lit("job1", "proj")
    )
    out = filters.check_recipients(df, "job1", "proj").collect()[0]
    assert out.recipients_mode == env.ANYONE
    assert out.recipients is None and out.trigger_children_of is None


def test_version_tag_and_coerce(spark):
    df = env.from_elements(spark, ["v1", "v2"]).withColumn(
        "version", F.when(F.col("element") == "v1", 1).otherwise(2)
    )
    split = filters.tag_message_version(df)
    assert [r.element for r in split.process.collect()] == ["v2"]
    coerced = env.coerce_v1(split.pass_thru).collect()[0]
    assert coerced.version == 2


def test_wire_roundtrip(spark):
    df = (
        env.from_elements(spark, ["w1", "w2"])
        .withColumn("payload", F.lit(b"\x00state\xff"))
        .withColumn("force", F.col("element") == "w1")
        .withColumn("recipients_mode", F.lit(env.LIMITED))
        .withColumn("recipients", F.array(env.job_lit("j", "p")))
    )
    wire = env.to_wire(df)
    assert wire.columns == ["value"]
    back = {r.element: r for r in env.from_wire(wire).collect()}
    assert set(back) == {"w1", "w2"}
    assert bytes(back["w1"].payload) == b"\x00state\xff"
    assert back["w1"].force and not back["w2"].force
    assert back["w1"].recipients[0].job_name == "j"
    assert back["w1"].job_audit_log == []


def test_wire_carries_audit_log(spark):
    # provenance must survive external hops (reference serializes full
    # KlioMessage metadata incl. job_audit_log)
    from klio_spark.operators.audit import update_audit_log

    df = env.from_elements(spark, ["a1"])
    df = update_audit_log(df, "jobA", "projA")
    df = update_audit_log(df, "jobB", "projB")
    back = env.from_wire(env.to_wire(df)).collect()[0]
    assert [(e.job_name, e.project) for e in back.job_audit_log] == [
        ("jobA", "projA"),
        ("jobB", "projB"),
    ]
    assert all(e.ts is not None for e in back.job_audit_log)


def test_from_wire_non_klio_messages(spark):
    raw = spark.createDataFrame(
        [(b'{"element": "good", "version": 2}',), (b"not json at all",)],
        "value binary",
    )
    strict = env.from_wire(raw)
    assert [r.element for r in strict.collect()] == ["good"]
    lenient = env.from_wire(raw, allow_non_klio=True)
    els = sorted(r.element for r in lenient.collect())
    # unparseable bytes become a fresh V2 message (serializer.py:90-98)
    assert els == ["good", "not json at all"]
    assert all(r.recipients_mode == env.ANYONE for r in lenient.collect() if r.element != "good")


def test_audit_log_append(spark):
    from klio_spark.operators.audit import update_audit_log

    df = env.from_elements(spark, ["a"])
    df = update_audit_log(df, "job1", "proj")
    df = update_audit_log(df, "job2", "proj")
    log = df.collect()[0].job_audit_log
    assert [i.job_name for i in log] == ["job1", "job2"]
