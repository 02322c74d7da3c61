"""Dev/observability pass-through operators.

Reference: KlioDebugMessage (helpers.py:477-520) logs every message with a
prefix/level; KlioSetTrace (helpers.py:523-533) drops into pdb.

Spark-first: a pass-through mapInPandas stage that logs per batch —
executor-side logging, zero schema change, and the stage disappears from
the plan when debug is off (identity return, not a no-op UDF).
"""

from __future__ import annotations

import logging
import sys
from collections.abc import Iterator

from pyspark.sql import DataFrame


def debug_message(
    df: DataFrame,
    prefix: str = "klio-debug",
    level: int = logging.INFO,
    enabled: bool = True,
    max_per_batch: int = 20,
) -> DataFrame:
    """Log elements flowing through (KlioDebugMessage parity). Returns the
    input unchanged when disabled so production plans carry no UDF stage."""
    if not enabled:
        return df

    import pandas as pd  # noqa: F401

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        log = logging.getLogger("klio_spark.debug")
        for pdf in batches:
            for el in pdf["element"].head(max_per_batch):
                log.log(level, "%s: %s", prefix, el)
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def set_trace(df: DataFrame, debugger=None) -> DataFrame:
    """Drop into pdb on the first batch of each partition (KlioSetTrace
    parity — reference helpers.py:523-533). Only meaningful in local
    mode — executors have no tty on a cluster.

    ``debugger`` is an injectable zero-arg callable fired at the break
    point; it defaults to launching pdb. The indirection exists so the
    operator's plumbing (fires exactly once per partition, before the
    first batch, pass-through identity) is testable without a tty —
    tests ship a marker-writing callable through the closure
    (test_sinks_and_misc.test_set_trace_fires_and_passes_through)."""
    import pandas as pd  # noqa: F401

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        first = True
        for pdf in batches:
            if first:
                first = False
                if debugger is not None:
                    debugger()
                else:  # pragma: no cover - interactive
                    import pdb

                    pdb.Pdb(stdout=sys.stdout).set_trace()
            yield pdf

    return df.mapInPandas(run, schema=df.schema)
