"""`klio job audit` — run the job's tests with pitfall detectors active.

Reference: exec/src/klio_exec/commands/audit.py:29-110 + audit_steps/
(tempfile_usage, numpy_broken_blas, multithreaded_tf). Each step hooks
before the job's pytest run and reports after it. The Spark build keeps
the reference's three checks (they are about Python-worker threading,
which applies identically inside Spark executors) and adds one
Spark-specific step: driver-side collect() in the job's hot path.

Steps:
  * tempfile      — `tempfile.TemporaryFile` leaks fds under long-lived
                    workers; NamedTemporaryFile is the safe spelling.
  * numpy_blas    — numpy < 1.16.3 links an OpenBLAS whose dgemv is
                    non-reentrant; executors run many task threads.
  * threaded_tf   — TensorFlow inside multi-threaded executors needs
                    spark.task.cpus tuned; warn when TF is loaded and
                    spark.task.cpus is unset/1.
  * driver_collect— .collect()/.toPandas() inside run.py's run()
                    funnels the dataset through the driver; flag it.
"""

from __future__ import annotations

import dataclasses
import re
import tempfile
import traceback


@dataclasses.dataclass
class StepResult:
    name: str
    errors: list[str] = dataclasses.field(default_factory=list)
    warnings: list[str] = dataclasses.field(default_factory=list)


class TempfileStep:
    """Flag tempfile.TemporaryFile use during the test run."""

    name = "tempfile"
    IGNORE = ("_pytest",)

    def __init__(self):
        self._used: list[str] = []
        self._real = None

    def before(self):
        self._real = tempfile.TemporaryFile
        real, used, ignore = self._real, self._used, self.IGNORE

        def tracked(*a, **kw):
            stack = traceback.extract_stack()[:-1]
            caller = stack[-1]
            if not any(f"/{ig}/" in caller.filename for ig in ignore):
                used.append(f"{caller.filename}:{caller.lineno}")
            return real(*a, **kw)

        tempfile.TemporaryFile = tracked

    def after(self, result: StepResult):
        tempfile.TemporaryFile = self._real
        if self._used:
            result.errors.append(
                "tempfile.TemporaryFile was used (leaks file descriptors in "
                "long-lived executors) — use NamedTemporaryFile instead. "
                f"First call site: {self._used[0]}"
            )


class NumpyBlasStep:
    """numpy < 1.16.3 has a non-reentrant OpenBLAS dgemv."""

    name = "numpy_blas"
    MINIMUM = (1, 16, 3)

    def before(self):
        pass

    def after(self, result: StepResult):
        try:
            import numpy
        except ImportError:
            return
        ver = tuple(int(x) for x in numpy.__version__.split(".")[:3])
        if ver < self.MINIMUM:
            result.errors.append(
                f"numpy {numpy.__version__} < 1.16.3: OpenBLAS dgemv is "
                "non-reentrant; Spark executors run many task threads."
            )


class ThreadedTFStep:
    """TensorFlow + multi-threaded executors without spark.task.cpus."""

    name = "threaded_tf"

    def __init__(self, config=None):
        self.config = config

    def before(self):
        pass

    def after(self, result: StepResult):
        import sys

        if not any("tensorflow" in m for m in sys.modules):
            return
        task_cpus = "1"
        if self.config is not None:
            task_cpus = str(
                self.config.pipeline_options.get("spark.task.cpus", "1")
            )
        if task_cpus == "1":
            result.warnings.append(
                "TensorFlow is loaded but spark.task.cpus is 1 (default): "
                "each executor runs spark.executor.cores concurrent tasks, "
                "and TF sessions are not thread-safe by default. Set "
                "spark.task.cpus (or intra-op threads) deliberately."
            )


class DriverCollectStep:
    """Static scan of run.py for driver-side materialization in run()."""

    name = "driver_collect"
    PATTERN = re.compile(r"\.\s*(collect|toPandas|toLocalIterator)\s*\(")

    def __init__(self, job_dir: str):
        self.job_dir = job_dir

    def before(self):
        pass

    def after(self, result: StepResult):
        import os

        path = os.path.join(self.job_dir, "run.py")
        if not os.path.exists(path):
            return
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                if line.lstrip().startswith("#"):
                    continue
                if self.PATTERN.search(line):
                    result.warnings.append(
                        f"run.py:{lineno} calls {self.PATTERN.search(line).group(1)}() — "
                        "this funnels data through the driver; at scale "
                        "return the DataFrame and let the sink write it."
                    )


def run_audit(job_dir: str, config=None, *, run_pytest: bool = True) -> list[StepResult]:
    """Execute the audit: hook steps, run the job's tests, report."""
    steps = [
        TempfileStep(),
        NumpyBlasStep(),
        ThreadedTFStep(config),
        DriverCollectStep(job_dir),
    ]
    for s in steps:
        s.before()
    pytest_failed = False
    if run_pytest:
        import pytest

        pytest_failed = pytest.main(["-qq", job_dir]) not in (0, 5)  # 5 = no tests
    results = []
    for s in steps:
        r = StepResult(name=s.name)
        s.after(r)
        results.append(r)
    if pytest_failed:
        results.insert(0, StepResult(name="pytest", errors=["job tests failed"]))
    return results
