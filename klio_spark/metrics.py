"""Metrics registry + pluggable relays.

Reference: lib/src/klio/metrics/ — a client dispatching counters/gauges/
timers to pluggable relays (native Beam metrics, logger, shumway/ffwd),
wired via job config (core.py:78-120).

Spark-first: engine-level counts ride DataFrame ``observe()`` (zero-cost,
evaluated inside the materializing job — operators/counters.py); this
module is the dispatch layer that collects those observations plus
UDF-internal counters and fans them out to relays. Relays are plain
callables — the registry shape mirrors the reference's client/relay
split without inventing a daemon."""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Protocol

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class Relay(Protocol):  # pragma: no cover - typing only
    def emit(self, job: str, metrics: dict[str, Any]) -> None: ...


class LoggerRelay:
    """Log metrics lines (reference: metrics/logger.py:66-287)."""

    def __init__(self, level: int = logging.INFO) -> None:
        self.level = level
        self.log = logging.getLogger("klio_spark.metrics")

    def emit(self, job: str, metrics: dict[str, Any]) -> None:
        for name, value in sorted(metrics.items()):
            self.log.log(self.level, "[%s] %s=%s", job, name, value)


class CollectingRelay:
    """In-memory relay for tests/dashboards (reference: native.py pattern)."""

    def __init__(self) -> None:
        self.records: list[tuple[str, dict[str, Any]]] = []

    def emit(self, job: str, metrics: dict[str, Any]) -> None:
        self.records.append((job, dict(metrics)))


class MetricsRegistry:
    """Attach named observations to DataFrames; flush() gathers every
    completed observation and dispatches to the relays."""

    def __init__(self, job_name: str = "klio-spark", relays: list[Relay] | None = None):
        self.job_name = job_name
        self.relays: list[Relay] = relays if relays is not None else [LoggerRelay()]
        self._observations: dict[str, Observation] = {}
        self._counters: dict[str, int] = {}

    def observe(self, df: DataFrame, name: str, *aggs) -> DataFrame:
        """Attach aggregates (default: row count) observed during the next
        action on df."""
        obs = Observation(name)
        self._observations[name] = obs
        if not aggs:
            aggs = (F.count(F.lit(1)).alias("count"),)
        return df.observe(obs, *aggs)

    def incr(self, name: str, n: int = 1) -> None:
        """Driver-side counter (UDF-internal counts surface via logs)."""
        self._counters[name] = self._counters.get(name, 0) + n

    def timer(self, name: str):
        """Context manager recording elapsed seconds."""
        registry = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                registry._counters[f"{name}_sec"] = round(
                    time.perf_counter() - self.t0, 4
                )
                return False

        return _Timer()

    def flush(self) -> dict[str, Any]:
        """Gather observed + counter metrics, dispatch to relays, reset."""
        out: dict[str, Any] = dict(self._counters)
        for name, obs in self._observations.items():
            try:
                for k, v in obs.get.items():
                    out[f"{name}.{k}"] = v
            except Exception:  # observation never materialized
                out[f"{name}.count"] = None
        for relay in self.relays:
            relay.emit(self.job_name, out)
        self._observations.clear()
        self._counters.clear()
        return out
