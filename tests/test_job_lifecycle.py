"""`job create` / `job verify` / `job audit` lifecycle commands
(reference: cli/src/klio_cli/commands/job/create.py, verify.py;
exec/src/klio_exec/commands/audit.py + audit_steps/)."""

import os

import pytest

from klio_spark import cli
from klio_spark.audit import run_audit


@pytest.fixture()
def created_job(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = cli.main(["job", "create", "scaffjob", "--project", "p1"])
    assert rc == 0
    return tmp_path / "scaffjob"


def test_create_scaffolds_runnable_dir(created_job):
    assert (created_job / "klio-job.yaml").exists()
    assert (created_job / "run.py").exists()
    assert (created_job / "test_run.py").exists()
    assert "job_name: scaffjob" in (created_job / "klio-job.yaml").read_text()


def test_create_refuses_overwrite(created_job, capsys):
    with pytest.raises(SystemExit):
        cli.main(["job", "create", "scaffjob"])
    # --force-create allows it
    assert cli.main(["job", "create", "scaffjob", "--force-create"]) == 0


def test_verify_reports_and_creates(created_job, capsys):
    cfg = str(created_job / "klio-job.yaml")
    rc = cli.main(["job", "verify", "--config", cfg])
    out = capsys.readouterr().out
    assert rc == 0  # warnings (missing output_data) are not fatal
    assert "[WRN]" in out and "output_data" in out
    rc = cli.main(["job", "verify", "--config", cfg, "--create"])
    out = capsys.readouterr().out
    assert rc == 0 and "created data location" in out
    assert (created_job / "output_data").exists()


def test_verify_fails_on_missing_run_py(created_job, capsys):
    os.remove(created_job / "run.py")
    rc = cli.main(["job", "verify", "--config", str(created_job / "klio-job.yaml")])
    assert rc == 1
    assert "run.py" in capsys.readouterr().out


def test_audit_flags_driver_collect(created_job, capsys):
    (created_job / "run.py").write_text(
        "def run(df, config):\n    rows = df.collect()\n    return df\n"
    )
    rc = cli.main(
        ["job", "audit", "--config", str(created_job / "klio-job.yaml"),
         "--skip-tests"]
    )
    out = capsys.readouterr().out
    assert rc == 0  # warning, not error
    assert "driver_collect" in out and "collect()" in out


def test_audit_tempfile_step(tmp_path):
    import tempfile

    (tmp_path / "run.py").write_text("def run(df, config):\n    return df\n")
    # simulate user code calling TemporaryFile during the test phase
    from klio_spark.audit import TempfileStep, StepResult

    step = TempfileStep()
    step.before()
    with tempfile.TemporaryFile() as f:
        f.write(b"x")
    res = StepResult(name="tempfile")
    step.after(res)
    assert res.errors and "NamedTemporaryFile" in res.errors[0]
    # hook restored
    assert tempfile.TemporaryFile.__name__ != "tracked"


def test_run_audit_aggregates(tmp_path):
    (tmp_path / "run.py").write_text("def run(df, config):\n    return df\n")
    results = run_audit(str(tmp_path), config=None, run_pytest=False)
    names = [r.name for r in results]
    assert names == ["tempfile", "numpy_blas", "threaded_tf", "driver_collect"]
    assert all(not r.errors for r in results)
