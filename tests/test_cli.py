"""CLI tests: a real job dir (klio-job.yaml + run.py), driven end-to-end
through `job run`, `job profile`, `job config`, `message publish` —
mirrors integration/read-file-write-file's golden-output check."""

import json
import pathlib

import pytest

from klio_spark import cli


@pytest.fixture()
def job_dir(tmp_path):
    d = tmp_path / "myjob"
    d.mkdir()
    (d / "elements.txt").write_text("a1\na2\na3\n")
    blob = d / "blobs"
    blob.mkdir()
    for e in ["a1", "a2"]:
        (blob / f"{e}.bin").write_bytes(b"x")
    (d / "klio-job.yaml").write_text(
        f"""
job_name: myjob
project: testproj
pipeline_options:
  spark.sql.shuffle.partitions: "8"
job_config:
  events:
    inputs:
      - type: file
        location: {d}/elements.txt
    outputs:
      - type: file
        location: {d}/out
  data:
    inputs:
      - type: file
        location: {blob}
        file_suffix: .bin
  my_custom_key: custom_value
"""
    )
    (d / "run.py").write_text(
        "from pyspark.sql import functions as F\n"
        "def run(df, config):\n"
        "    assert config.user['my_custom_key'] == 'custom_value'\n"
        "    return df.withColumn('payload', F.upper('element').cast('binary'))\n"
    )
    return d


def test_job_run_end_to_end(spark, job_dir):
    rc = cli.main(["job", "run", "--config", str(job_dir / "klio-job.yaml")])
    assert rc == 0
    lines = sorted(
        line
        for f in (job_dir / "out").glob("part-*")
        for line in f.read_text().splitlines()
    )
    assert lines == ["a1", "a2"]  # a3 input missing -> dropped


def test_job_plan_lints_clean_and_writes_nothing(spark, job_dir, capsys):
    rc = cli.main(["job", "plan", "--config", str(job_dir / "klio-job.yaml")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "lint:" in out and "0 error(s)" in out
    assert not (job_dir / "out").exists()  # dry-run: no sink write


def test_job_config_show(job_dir, capsys):
    rc = cli.main(["job", "config", "--config", str(job_dir / "klio-job.yaml")])
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["job_name"] == "myjob"
    assert cfg["user"] == {"my_custom_key": "custom_value"}
    assert cfg["data_inputs"][0]["file_suffix"] == ".bin"


def test_job_profile(spark, job_dir, capsys):
    rc = cli.main(
        ["job", "profile", "--config", str(job_dir / "klio-job.yaml"), "x1", "x2"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["elements"] == 2 and payload["output_rows"] == 2
    assert "cumulative" in out  # cProfile table printed


def test_job_profile_line_mode(spark, job_dir, capsys):
    """--what line: per-line wall table of the driver-side run() — lines
    attributed to the user's run.py, hit counts >= 1, and the JSON
    report carries the same rows the table prints."""
    rc = cli.main(
        ["job", "profile", "--config", str(job_dir / "klio-job.yaml"),
         "--what", "line", "x1", "x2"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["what"] == "line" and payload["output_rows"] == 2
    assert payload["file"].endswith("run.py")
    assert payload["lines"], "at least one traced line"
    assert all(l["hits"] >= 1 and l["time_ms"] >= 0 for l in payload["lines"])
    assert "Per-line wall time" in out


def test_message_publish(job_dir, tmp_path):
    # point the event input at a directory (stream-style) for publishing
    cfg = (job_dir / "klio-job.yaml").read_text().replace(
        f"location: {job_dir}/elements.txt", f"location: {tmp_path}/topic"
    )
    (job_dir / "klio-job.yaml").write_text(cfg)
    rc = cli.main(
        ["message", "publish", "--config", str(job_dir / "klio-job.yaml"),
         "--bottom-up", "--force", "t1", "t2"]
    )
    assert rc == 0
    published = [
        json.loads(line)
        for f in pathlib.Path(f"{tmp_path}/topic").glob("publish-*.txt")
        for line in f.read_text().splitlines()
    ]
    # flags travel IN the wire message, not just in the CLI banner
    assert sorted(m["element"] for m in published) == ["t1", "t2"]
    me = {"job_name": "myjob", "project": "testproj"}
    for m in published:
        assert m["force"] is True and m["ping"] is False
        assert m["recipients_mode"] == "limited"
        assert m["recipients"] == [me]
        assert m["trigger_children_of"] == me


def test_publish_resolves_topic_against_job_dir(tmp_path, monkeypatch):
    """message publish must write into the job dir's topic, not CWD's —
    the same resolution rule job run applies when reading."""
    job = tmp_path / "job"
    (job / "topic").mkdir(parents=True)
    (job / "klio-job.yaml").write_text(
        "job_name: pubres\nproject: t\njob_config:\n  events:\n"
        "    inputs:  [{type: file, location: topic, wire: true}]\n"
        "    outputs: [{type: file, location: out}]\n"
    )
    elsewhere = tmp_path / "elsewhere"
    elsewhere.mkdir()
    monkeypatch.chdir(elsewhere)
    assert cli.main(
        ["message", "publish", "--config", str(job / "klio-job.yaml"), "e1"]
    ) == 0
    files = list((job / "topic").glob("publish-*.txt"))
    assert files and not list(elsewhere.glob("**/publish-*.txt"))
