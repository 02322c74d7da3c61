"""The UDF adapter: klio's @handle_klio decorator family, vectorized.

Reference: lib/src/klio/transforms/decorators.py
  - @handle_klio (:805-908, impl :538-614): de/serialize envelope, metrics,
    tagged `drop` output on any exception (drop-don't-fail)
  - @retry (:967-1047; engine _retry.py:33-121)
  - @timeout (:912-964; engine _timeout.py:33-145): kill-on-deadline in a
    separate process
  - ThreadLimiter (:163-210): bound concurrency per transform

Spark-first re-design (SURVEY §2.6, §7 rule 3):
  * User code runs over Arrow batches (mapInPandas), not per-row pickling —
    the envelope never round-trips through protobuf inside the engine.
  * drop-don't-fail is structural: every wrapped stage yields the original
    columns plus `_klio_error` (null on success). `split_errors` turns that
    into (ok, quarantine) DataFrames. One poisoned element never kills a
    100 TB job, and the quarantine is a real DataFrame you can write/inspect.
  * retry is a per-element loop inside the worker (bounded, with delay);
    Spark task retries (spark.task.maxFailures) remain the coarse layer.
  * timeout runs the user fn in a worker-side process pool with
    kill-on-deadline — the only way to bound a single element's runtime
    (thread-based timeouts can't interrupt C extensions like librosa/BLAS).
  * thread limiting is delegated to Spark (executor cores / spark.task.cpus);
    a semaphore only makes sense for external-API rate limits, for which
    `max_concurrency` gates within-worker parallelism.
"""

from __future__ import annotations

import functools
import time
import traceback
from collections.abc import Iterator
from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ERROR_COL = "_klio_error"

# process-local registry of max_concurrency semaphores (see _with_limiter);
# lives at module level so it is never captured by pickled task closures
import threading as _threading  # noqa: E402

_LIMITERS: dict[tuple[str, int], Any] = {}
_LIMITERS_LOCK = _threading.Lock()


# ---------------------------------------------------------------------------
# element-level execution wrappers (run inside executors)
# ---------------------------------------------------------------------------

def _with_retry(
    fn: Callable, tries: int, delay: float, retry_on: type[BaseException]
) -> Callable:
    """Bounded retry with delay (decorators.py:967-1047). tries<=0 → infinite
    is NOT supported here (a hung element would stall a task forever);
    mirror the reference's bounded mode only."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        remaining = max(1, tries)
        while True:
            try:
                return fn(*a, **kw)
            except retry_on:
                remaining -= 1
                if remaining <= 0:
                    raise
                if delay:
                    time.sleep(delay)

    return wrapper


class _ProcPool:
    """Lazy per-python-worker process pool for kill-on-deadline timeouts
    (_timeout.py:82-96 spawns a process per call; a pool amortizes that)."""

    _pool = None

    @classmethod
    def get(cls):
        if cls._pool is None:
            import concurrent.futures as cf

            cls._pool = cf.ProcessPoolExecutor(max_workers=1)
        return cls._pool

    @classmethod
    def reset(cls):
        if cls._pool is not None:
            cls._pool.shutdown(wait=False, cancel_futures=True)
            cls._pool = None


def _run_cloudpickled(blob: bytes, a: tuple, kw: dict):
    """Top-level trampoline: stdlib pickle can't move closures to the pool
    process, cloudpickle can."""
    import cloudpickle

    return cloudpickle.loads(blob)(*a, **kw)


def _with_limiter(fn: Callable, max_concurrency: int) -> Callable:
    """Semaphore gate bounding in-flight invocations of ``fn`` within one
    worker process (reference ThreadLimiter, decorators.py:163-210).

    Spark already bounds task parallelism via executor cores, so this is
    NOT for CPU throttling — it is the external-API rate-limit lever: a
    user fn that fans out its own threads (async fetches, librosa worker
    pools) or runs under a thread-reusing harness gets at most
    ``max_concurrency`` concurrent entries per worker process. Cluster-
    wide in-flight ceiling = max_concurrency × python workers, the same
    per-worker semantics the reference offers.

    The semaphore itself is process-local and created lazily through the
    module registry (semaphores/locks can't ride the pickled task
    closure); keyed by (module, qualname, code location, limit) so every
    pickled copy of the same transform shares one gate per worker
    process. Module splits same-named fns in different files; the code
    object's (filename, first line) — which cloudpickle preserves —
    splits two lambdas at the same qualname, since neither name alone
    distinguishes them."""
    code = getattr(fn, "__code__", None)
    key = (
        getattr(fn, "__module__", ""),
        getattr(fn, "__qualname__", repr(fn)),
        (code.co_filename, code.co_firstlineno) if code is not None else None,
        max_concurrency,
    )

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        import klio_spark.udf as _m

        with _m._LIMITERS_LOCK:
            sem = _m._LIMITERS.get(key)
            if sem is None:
                import threading

                sem = _m._LIMITERS[key] = threading.BoundedSemaphore(
                    max_concurrency
                )
        with sem:
            return fn(*a, **kw)

    return wrapper


def _with_timeout(fn: Callable, seconds: float) -> Callable:
    import cloudpickle

    blob = cloudpickle.dumps(fn)

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        import concurrent.futures as cf

        pool = _ProcPool.get()
        fut = pool.submit(_run_cloudpickled, blob, a, kw)
        try:
            return fut.result(timeout=seconds)
        except cf.TimeoutError:
            # kill the worker process so the hung call actually dies
            for p in getattr(pool, "_processes", {}).values():
                p.terminate()
            _ProcPool.reset()
            raise TimeoutError(
                f"element exceeded {seconds}s (KlioTimeoutError equivalent)"
            )

    return wrapper


# ---------------------------------------------------------------------------
# the decorator
# ---------------------------------------------------------------------------

def handle_klio(
    output_schema: T.StructType | str,
    *,
    tries: int = 1,
    retry_delay: float = 0.0,
    retry_on: type[BaseException] = Exception,
    timeout: float | None = None,
    batch_size: int | None = None,
    max_concurrency: int | None = None,
):
    """Wrap an element-level fn into a DataFrame transform with error routing.

    The user fn has the reference's shape — ``fn(element, payload, **row)``
    returning a dict of output columns, None to drop silently, or a
    list/generator of dicts for flatMap semantics (the reference's
    generator DoFns, decorators.py:257-337) — and the wrapper handles
    vectorization, retries, timeouts, and drop-don't-fail.

    Returns a function ``(DataFrame) -> DataFrame`` whose output has the
    input columns replaced by ``output_schema``'s fields plus ``ERROR_COL``
    (null for successful rows). Use ``split_errors`` downstream.

    Usage::

        @handle_klio("element string, n_tokens int", tries=3, timeout=30)
        def tokenize(element, payload, text=None, **_):
            return {"element": element, "n_tokens": len(text.split())}

        ok, quarantine = split_errors(tokenize(df))
    """
    if isinstance(output_schema, str):
        out_struct = T.StructType.fromDDL(output_schema)
    else:
        out_struct = output_schema
    full_schema = T.StructType(
        list(out_struct.fields) + [T.StructField(ERROR_COL, T.StringType())]
    )
    out_names = [f.name for f in out_struct.fields]

    def decorate(fn: Callable[..., dict[str, Any] | None]):
        call = fn
        if timeout:
            call = _with_timeout(call, timeout)
        if tries > 1:
            call = _with_retry(call, tries, retry_delay, retry_on)
        if max_concurrency:
            # outermost: the semaphore bounds the whole retry/timeout
            # envelope, so a retrying element still holds one slot
            call = _with_limiter(call, max_concurrency)

        def transform(df: DataFrame) -> DataFrame:
            def chunked(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                # bound peak memory per user-fn invocation wave: re-slice
                # the Arrow batches Spark hands us into batch_size-row
                # chunks (klio payloads can be multi-MB blobs; the session
                # Arrow batch size is a global knob, this is the per-
                # transform one)
                if not batch_size:
                    yield from batches
                    return
                for pdf in batches:
                    for start in range(0, len(pdf), batch_size):
                        yield pdf.iloc[start : start + batch_size]

            def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in chunked(batches):
                    rows = pdf.to_dict("records")
                    out_rows = []
                    for row in rows:
                        element = row.get("element")
                        payload = row.get("payload")
                        extra = {
                            k: v
                            for k, v in row.items()
                            if k not in ("element", "payload")
                        }
                        try:
                            res = call(element, payload, **extra)
                            if res is None:
                                continue  # silent drop (generator-skip parity)
                            if isinstance(res, dict):
                                res = [res]
                            for r in res:  # list/generator -> flatMap
                                r = dict(r)
                                r[ERROR_COL] = None
                                out_rows.append(r)
                        except Exception:
                            # drop-don't-fail: route the element + traceback
                            # to the quarantine branch (decorators.py:226-337)
                            res = {n: None for n in out_names}
                            if "element" in res:
                                res["element"] = element
                            res[ERROR_COL] = traceback.format_exc(limit=8)
                            out_rows.append(res)
                    yield pd.DataFrame(
                        out_rows, columns=out_names + [ERROR_COL]
                    )

            return df.mapInPandas(run_batches, schema=full_schema)

        transform.__name__ = getattr(fn, "__name__", "handle_klio")
        transform.fn = fn
        # the fully-wrapped element call (timeout→retry→limiter), for
        # harnesses that drive elements outside mapInPandas
        transform.call = call
        return transform

    return decorate


ACTIVE_PROFILER = None  # set by `job profile` (decorators.py:1050-1106 hook)


def profile(fn):
    """No-op unless a profiler is active (reference @profile semantics):
    `klio_spark.udf.ACTIVE_PROFILER` is installed by the profiling harness
    and wraps the callable; production paths pay nothing."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if ACTIVE_PROFILER is not None:
            return ACTIVE_PROFILER(fn, *a, **kw)
        return fn(*a, **kw)

    return wrapper


def inject_klio_context(fn):
    """Prepend the KlioContext as first arg (reference @inject_klio_context,
    decorators.py:744-800) — context plumbing without envelope handling."""
    import functools

    from klio_spark.context import KlioContext

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        return fn(KlioContext.current(), *a, **kw)

    return wrapper


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ok, quarantine): the tagged `drop` output as real DataFrames."""
    ok = df.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    quarantine = df.filter(F.col(ERROR_COL).isNotNull())
    return ok, quarantine


def map_elements(
    df: DataFrame,
    fn: Callable[..., dict[str, Any] | None],
    output_schema: T.StructType | str,
    **kw,
) -> DataFrame:
    """Non-decorator form: map_elements(df, fn, schema) (beam.Map parity)."""
    return handle_klio(output_schema, **kw)(fn)(df)
