import pathlib

import pytest
from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark.config import DataIOConfig, EventIOConfig, KlioJobConfig
from klio_spark.operators import (
    check_input_exists,
    check_output_exists,
    run_pipeline,
    setup_prologue,
)
from klio_spark.sinks import write_event_output
from klio_spark.sources import read_event_input


@pytest.fixture()
def blob_dirs(tmp_path):
    """F5-style blob store: input .ogg for 4 of 6 elements, output .png for 2."""
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    out_dir.mkdir()
    for e in ["e1", "e2", "e3", "e4"]:
        (in_dir / f"{e}.ogg").write_bytes(b"\x00audio")
    for e in ["e1", "e2"]:
        (out_dir / f"{e}.png").write_bytes(b"\x89PNG")
    return str(in_dir), str(out_dir)


ELEMENTS = ["e1", "e2", "e3", "e4", "e5", "e6"]


def test_input_existence_anti_join(spark, blob_dirs):
    in_dir, _ = blob_dirs
    df = env.from_elements(spark, ELEMENTS)
    cfg = DataIOConfig(location=in_dir, file_suffix=".ogg")
    split = check_input_exists(df, cfg, spark)
    assert sorted(r.element for r in split.found.collect()) == ["e1", "e2", "e3", "e4"]
    assert sorted(r.element for r in split.not_found.collect()) == ["e5", "e6"]
    # skip flag short-circuits
    skip = check_input_exists(
        df, DataIOConfig(location=in_dir, skip_klio_existence_check=True), spark
    )
    assert skip.found.count() == 6


def test_output_existence(spark, blob_dirs):
    _, out_dir = blob_dirs
    df = env.from_elements(spark, ELEMENTS)
    cfg = DataIOConfig(location=out_dir, file_suffix=".png")
    split = check_output_exists(df, cfg, spark)
    assert sorted(r.element for r in split.found.collect()) == ["e1", "e2"]


def test_prologue_full_matrix(spark, blob_dirs):
    """exec run.py:320-402 wiring: ping/output-exists/force/input-exists.

    inputs exist: e1-e4; outputs exist: e1,e2. e1=force, e3=ping.
      e1: output exists but forced  -> process
      e2: output exists, not forced -> pass_thru
      e3: ping                      -> pass_thru
      e4: normal                    -> process
      e5,e6: input missing          -> not_found (dropped)
    """
    in_dir, out_dir = blob_dirs
    df = (
        env.from_elements(spark, ELEMENTS)
        .withColumn("force", F.col("element") == "e1")
        .withColumn("ping", F.col("element") == "e3")
    )
    config = KlioJobConfig(
        job_name="job1",
        data_inputs=[DataIOConfig(location=in_dir, file_suffix=".ogg")],
        data_outputs=[DataIOConfig(location=out_dir, file_suffix=".png")],
    )
    res = setup_prologue(df, config, spark)
    assert sorted(r.element for r in res.process.collect()) == ["e1", "e4"]
    assert sorted(r.element for r in res.pass_thru.collect()) == ["e2", "e3"]
    assert sorted(r.element for r in res.not_found.collect()) == ["e5", "e6"]
    # audit log was appended on all surviving branches
    assert all(
        len(r.job_audit_log) == 1 for r in res.process.collect()
    )


def test_run_pipeline_end_to_end(spark, blob_dirs, tmp_path):
    """M1 slice: text elements → prologue → user transform → text out,
    golden-output style (integration/read-file-write-file)."""
    in_dir, out_dir = blob_dirs
    src = tmp_path / "elements.txt"
    src.write_text("".join(f"{e}\n" for e in ELEMENTS))
    sink = tmp_path / "sink"

    config = KlioJobConfig(
        job_name="job1",
        event_inputs=[EventIOConfig(type="file", location=str(src))],
        event_outputs=[EventIOConfig(type="file", location=str(sink))],
        data_inputs=[DataIOConfig(location=in_dir, file_suffix=".ogg")],
        data_outputs=[DataIOConfig(location=out_dir, file_suffix=".png")],
    )

    def user_run(df, cfg):
        # mark processed elements (payload state, SURVEY §1.1)
        return df.withColumn(
            "payload", F.concat(F.lit("done:"), F.col("element")).cast("binary")
        )

    events = read_event_input(spark, config.event_inputs[0])
    out = run_pipeline(events, config, user_run, spark)
    write_event_output(out, config.event_outputs[0])

    written = sorted(
        line
        for f in pathlib.Path(sink).glob("part-*")
        for line in f.read_text().splitlines()
    )
    # process (e4) + forced (e1) + pass_thrus (e2 ping-skip, e3) survive
    assert written == ["e1", "e2", "e3", "e4"]


def test_bq_style_source_roundtrip(spark, tmp_path):
    """element = JSON of selected columns (io.py:219-246)."""
    p = str(tmp_path / "bq")
    spark.createDataFrame(
        [("id1", "v1", "x"), ("id2", "v2", "y")], "entity_id string, value string, extra string"
    ).write.parquet(p)
    cfg = EventIOConfig(
        type="bq", location=p, options={"klio_message_columns": ["entity_id"]}
    )
    df = read_event_input(spark, cfg)
    assert sorted(r.element for r in df.collect()) == ["id1", "id2"]
