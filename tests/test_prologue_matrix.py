"""Exhaustive routing matrix (FIXTURES.md F5 coverage target): all 2^4
combinations of (force, ping, exists_in, exists_out) against a reference
model of exec run.py:320-402, plus the multi-input prologue."""

import itertools

import pytest
from pyspark.sql import functions as F

from klio_spark import envelope as env
from klio_spark.config import DataIOConfig, KlioJobConfig
from klio_spark.operators import setup_prologue
from klio_spark.operators.prologue import setup_prologue_multi


def reference_route(force: bool, ping: bool, ein: bool, eout: bool) -> str:
    """The reference semantics, straight from the survey:
    ping → pass_thru; output exists & !force → pass_thru;
    input missing → dropped; else process."""
    if ping:
        return "pass_thru"
    if eout and not force:
        return "pass_thru"
    if not ein:
        return "not_found"
    return "process"


@pytest.fixture(scope="module")
def matrix_env(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("matrix")
    in_dir, out_dir = tmp / "in", tmp / "out"
    in_dir.mkdir(), out_dir.mkdir()
    elements = []
    for i, (force, ping, ein, eout) in enumerate(
        itertools.product([False, True], repeat=4)
    ):
        el = f"m{i:02d}-f{int(force)}p{int(ping)}i{int(ein)}o{int(eout)}"
        elements.append((el, force, ping))
        if ein:
            (in_dir / f"{el}.ogg").write_bytes(b"x")
        if eout:
            (out_dir / f"{el}.png").write_bytes(b"y")
    df = spark.createDataFrame(
        elements, "element_in string, force_in boolean, ping_in boolean"
    )
    df = (
        env.with_envelope(df, "element_in")
        .withColumn("force", F.col("force_in"))
        .withColumn("ping", F.col("ping_in"))
        .drop("element_in", "force_in", "ping_in")
    )
    config = KlioJobConfig(
        job_name="matrix",
        data_inputs=[DataIOConfig(location=str(in_dir), file_suffix=".ogg")],
        data_outputs=[DataIOConfig(location=str(out_dir), file_suffix=".png")],
    )
    return df, config


def test_all_16_flag_combinations(spark, matrix_env):
    df, config = matrix_env
    res = setup_prologue(df, config, spark)
    got = {}
    for branch, d in [
        ("process", res.process),
        ("pass_thru", res.pass_thru),
        ("not_found", res.not_found),
    ]:
        for r in d.collect():
            assert r.element not in got, f"{r.element} routed twice"
            got[r.element] = branch

    for el in got:
        f, p, i, o = (el[5] == "1", el[7] == "1", el[9] == "1", el[11] == "1")
        assert got[el] == reference_route(f, p, i, o), el
    assert len(got) == 16  # nothing silently vanished


def test_multi_input_prologue(spark, matrix_env, tmp_path):
    df, config = matrix_env
    a = df.filter(F.col("element") < "m08")
    b = df.filter(F.col("element") >= "m08")
    processed, pass_thru, not_found = setup_prologue_multi(
        {"a": a, "b": b}, config, spark
    )
    assert set(processed) == {"a", "b"}
    total = (
        processed["a"].count()
        + processed["b"].count()
        + (pass_thru.count() if pass_thru is not None else 0)
        + (not_found.count() if not_found is not None else 0)
    )
    assert total == 16
